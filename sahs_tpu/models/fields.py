"""Field networks as pure init/apply functions over parameter pytrees.

Architectural parity targets in the reference (we re-derive the math, the
code is new and functional):
  - NeRFMLP        nerf-pytorch/nerf/modules.py:168-295
  - WarpFieldMLP   nerf-pytorch/nerf/modules.py:323-398
  - HyperSheetMLP  nerf-pytorch/nerf/modules.py:401-462
  - AudioNet       nerf-pytorch/nerf/modules.py:43-73
  - AudioAttNet    nerf-pytorch/nerf/modules.py:6-36
  - MaskGeneratorMLP nerf-pytorch/nerf/modules.py:76-165

Parameters are plain nested dicts (JAX pytrees): a linear layer is
``{"w": (in, out), "b": (out,)}`` so application is ``x @ w + b``.
Initialization matches torch.nn.Linear / Conv1d defaults (uniform
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias) so that
training-from-scratch dynamics are comparable with the reference.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..config import HyperConfig, NeRFMLPConfig, WarpConfig
from ..ops.encoding import encoded_dim

Params = Dict[str, Any]

DRIVING_DIM = 76
POSE_PE_DIM = 36  # 6-dof pose, 3 freqs, no input passthrough (models.py:203-207)
SEG_CLASSES = 12
SPATIAL_EMBEDDING_DIM = 32
SPATIAL_GRID_RES = 32


def linear_init(key: jax.Array, fan_in: int, fan_out: int,
                dtype=jnp.float32) -> Params:
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), dtype, -bound, bound),
    }


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def leaky_relu(x: jnp.ndarray, slope: float) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)


# ---------------------------------------------------------------------------
# Generic skip-trunk MLP (the shared backbone shape of NeRF/warp/hyper MLPs)
# ---------------------------------------------------------------------------

def skip_trunk_init(key: jax.Array, input_dim: int, hidden: int,
                    num_layers: int, skip_every: int) -> List[Params]:
    keys = jax.random.split(key, num_layers)
    layers = [linear_init(keys[0], input_dim, hidden)]
    for i in range(1, num_layers):
        fan_in = input_dim + hidden if i == skip_every else hidden
        layers.append(linear_init(keys[i], fan_in, hidden))
    return layers


def skip_trunk_apply(layers: Sequence[Params], x0: jnp.ndarray,
                     skip_every: int, act) -> jnp.ndarray:
    """x0 is the full concatenated input; layer ``skip_every`` re-concats it
    (reference modules.py:268-273 / :382-387)."""
    x = x0
    for i, p in enumerate(layers):
        if i == skip_every:
            x = linear(p, jnp.concatenate([x, x0], axis=-1))
        else:
            x = linear(p, x)
        x = act(x)
    return x


# ---------------------------------------------------------------------------
# WarpFieldMLP
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class WarpSpec:
    num_layers: int
    hidden_size: int
    skip_connect_every: int
    pe_xyz_dim: int
    include_driving: bool
    include_pose_input: bool  # the raw 6-dof passthrough flag (include_pose)

    @property
    def input_dim(self) -> int:
        # dim_pose = include_pose + 2*6*3 is added UNCONDITIONALLY — the
        # reference always concatenates the PE'd pose (modules.py:345-358).
        d = self.pe_xyz_dim + POSE_PE_DIM + (6 if self.include_pose_input else 0)
        if self.include_driving:
            d += DRIVING_DIM
        return d

    @classmethod
    def from_config(cls, cfg: WarpConfig) -> "WarpSpec":
        return cls(
            num_layers=cfg.num_layers,
            hidden_size=cfg.hidden_size,
            skip_connect_every=cfg.skip_connect_every,
            pe_xyz_dim=encoded_dim(3, cfg.num_encoding_fn_xyz, cfg.include_input_xyz),
            include_driving=cfg.include_driving,
            include_pose_input=False,
        )


def warp_field_init(key: jax.Array, spec: WarpSpec) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "trunk": skip_trunk_init(k1, spec.input_dim, spec.hidden_size,
                                 spec.num_layers, spec.skip_connect_every),
        "out": linear_init(k2, spec.hidden_size, 3),
    }


def warp_field_apply(params: Params, spec: WarpSpec, pe_xyz: jnp.ndarray,
                     driving: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """pe_xyz: (P, pe_dim); driving: (P, 76) or (76,); pose: (P, 36) or (36,).
    Returns tanh-bounded Δx (P, 3) (reference modules.py:371-390)."""
    parts = [pe_xyz]
    if spec.include_driving:
        parts.append(jnp.broadcast_to(driving, pe_xyz.shape[:-1] + (DRIVING_DIM,)))
    parts.append(jnp.broadcast_to(pose, pe_xyz.shape[:-1] + (pose.shape[-1],)))
    x0 = jnp.concatenate(parts, axis=-1)
    h = skip_trunk_apply(params["trunk"], x0, spec.skip_connect_every, jax.nn.relu)
    return jnp.tanh(linear(params["out"], h))


# ---------------------------------------------------------------------------
# HyperSheetMLP
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class HyperSpec:
    num_layers: int
    hidden_size: int
    skip_connect_every: int
    pe_xyz_dim: int
    include_driving: bool
    ambient_coord_dim: int

    @property
    def input_dim(self) -> int:
        d = self.pe_xyz_dim + POSE_PE_DIM
        if self.include_driving:
            d += DRIVING_DIM
        return d

    @classmethod
    def from_config(cls, cfg: HyperConfig) -> "HyperSpec":
        return cls(
            num_layers=cfg.num_layers,
            hidden_size=cfg.hidden_size,
            skip_connect_every=cfg.skip_connect_every,
            pe_xyz_dim=encoded_dim(3, cfg.num_encoding_fn_xyz, cfg.include_input_xyz),
            include_driving=cfg.include_driving,
            ambient_coord_dim=cfg.ambient_coord_dim,
        )


def hyper_sheet_init(key: jax.Array, spec: HyperSpec) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "trunk": skip_trunk_init(k1, spec.input_dim, spec.hidden_size,
                                 spec.num_layers, spec.skip_connect_every),
        "out": linear_init(k2, spec.hidden_size, spec.ambient_coord_dim),
    }


def hyper_sheet_apply(params: Params, spec: HyperSpec, pe_xyz: jnp.ndarray,
                      driving: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Ambient ("bendy sheet") coordinates, (P, ambient_dim), linear output
    (reference modules.py:444-462)."""
    parts = [pe_xyz]
    if spec.include_driving:
        parts.append(jnp.broadcast_to(driving, pe_xyz.shape[:-1] + (DRIVING_DIM,)))
    parts.append(jnp.broadcast_to(pose, pe_xyz.shape[:-1] + (pose.shape[-1],)))
    x0 = jnp.concatenate(parts, axis=-1)
    h = skip_trunk_apply(params["trunk"], x0, spec.skip_connect_every, jax.nn.relu)
    return linear(params["out"], h)


# ---------------------------------------------------------------------------
# NeRFMLP (canonical field with rgb / 12-class seg / sigma heads)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NeRFSpec:
    num_layers: int
    hidden_size: int
    skip_connect_every: int
    pe_xyz_dim: int
    pe_dir_dim: int
    ambient_pe_dim: int       # 0 when use_ambient is False
    use_viewdirs: bool
    use_pose: bool
    include_pose_input: bool
    use_spatial_embeddings: bool
    include_driving: bool
    latent_code_dim: int

    @property
    def trunk_input_dim(self) -> int:
        d = self.pe_xyz_dim + self.ambient_pe_dim
        if self.use_pose:
            d += POSE_PE_DIM + (6 if self.include_pose_input else 0)
        d += self.latent_code_dim
        if self.include_driving:
            d += DRIVING_DIM
        return d

    @property
    def dir_input_dim(self) -> int:
        d = self.hidden_size
        if self.use_viewdirs:
            d += self.pe_dir_dim
            if self.use_spatial_embeddings:
                d += SPATIAL_EMBEDDING_DIM
        return d

    @classmethod
    def from_config(cls, cfg: NeRFMLPConfig, hyper: HyperConfig,
                    latent_code_dim: int = 0) -> "NeRFSpec":
        ambient_pe = 0
        if hyper.use_ambient:
            ambient_pe = encoded_dim(hyper.ambient_coord_dim,
                                     hyper.num_encoding_fn_ambient,
                                     hyper.include_input_ambient)
        return cls(
            num_layers=cfg.num_layers,
            hidden_size=cfg.hidden_size,
            # Reference quirk (caught by tools/parity_vs_reference.py): the
            # reference NEVER passes skip_connect_every to NeRFMLP
            # (models.py:258-297 omits it), so the constructor default 3
            # always wins over the config's 4 (modules.py:176). Preserve the
            # artifact, not the config. (Warp/hyper DO receive the config
            # value, models.py:234-254.)
            skip_connect_every=3,
            pe_xyz_dim=encoded_dim(3, cfg.num_encoding_fn_xyz, cfg.include_input_xyz),
            pe_dir_dim=encoded_dim(3, cfg.num_encoding_fn_dir, cfg.include_input_dir),
            ambient_pe_dim=ambient_pe,
            use_viewdirs=cfg.use_viewdirs,
            use_pose=cfg.use_pose,
            include_pose_input=cfg.include_pose,
            use_spatial_embeddings=cfg.use_spatial_embeddings,
            include_driving=cfg.include_driving,
            latent_code_dim=latent_code_dim,
        )


def nerf_mlp_init(key: jax.Array, spec: NeRFSpec) -> Params:
    keys = jax.random.split(key, 8)
    rgb_hidden = spec.hidden_size // 2
    seg_hidden = spec.hidden_size // 2
    dir_layers = [linear_init(keys[2], spec.dir_input_dim, rgb_hidden)]
    dir_layers += [linear_init(k, rgb_hidden, rgb_hidden)
                   for k in jax.random.split(keys[3], 3)]
    seg_layers = [linear_init(keys[5], spec.hidden_size, seg_hidden)]
    seg_layers += [linear_init(k, seg_hidden, seg_hidden)
                   for k in jax.random.split(keys[6], 3)]
    return {
        "trunk": skip_trunk_init(keys[0], spec.trunk_input_dim, spec.hidden_size,
                                 spec.num_layers, spec.skip_connect_every),
        "fc_feat": linear_init(keys[1], spec.hidden_size, spec.hidden_size),
        "fc_alpha": linear_init(keys[4], spec.hidden_size, 1),
        "dir": dir_layers,
        "fc_rgb": linear_init(keys[7], rgb_hidden, 3),
        "seg": seg_layers,
        "fc_seg": linear_init(jax.random.fold_in(keys[7], 1), seg_hidden, SEG_CLASSES),
    }


def nerf_mlp_apply(params: Params, spec: NeRFSpec, points_embed: jnp.ndarray,
                   dirs_embed: Optional[jnp.ndarray],
                   driving: Optional[jnp.ndarray] = None,
                   pose: Optional[jnp.ndarray] = None,
                   latent_code: Optional[jnp.ndarray] = None,
                   spatial_embedding: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """points_embed: (P, pe_xyz+ambient_pe). Output: (P, 16) = rgb3 | seg12 |
    sigma1 (reference modules.py:254-295). Input concat order parity:
    [points_embed, latent?, driving?, pose?]."""
    act = lambda x: leaky_relu(x, 0.01)
    parts = [points_embed]
    n = points_embed.shape[:-1]
    if spec.latent_code_dim > 0 and latent_code is not None:
        parts.append(jnp.broadcast_to(latent_code, n + (spec.latent_code_dim,)))
    if spec.include_driving:
        parts.append(jnp.broadcast_to(driving, n + (DRIVING_DIM,)))
    if spec.use_pose:
        parts.append(jnp.broadcast_to(pose, n + (pose.shape[-1],)))
    x0 = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

    h = skip_trunk_apply(params["trunk"], x0, spec.skip_connect_every, act)
    feat = linear(params["fc_feat"], h)  # no activation (modules.py:274)
    alpha = linear(params["fc_alpha"], feat)

    if spec.use_viewdirs:
        din = [feat, dirs_embed]
        if spec.use_spatial_embeddings and spatial_embedding is not None:
            din.append(spatial_embedding)
        x = jnp.concatenate(din, axis=-1)
    else:
        x = feat
    for p in params["dir"]:
        x = act(linear(p, x))
    rgb = linear(params["fc_rgb"], x)

    x = feat
    for p in params["seg"]:
        x = act(linear(p, x))
    seg = linear(params["fc_seg"], x)

    return jnp.concatenate([rgb, seg, alpha], axis=-1)


# ---------------------------------------------------------------------------
# AudioNet (DeepSpeech window -> 76-d driving vector)
# ---------------------------------------------------------------------------

AUDIO_CONV_CHANNELS = [(29, 32), (32, 32), (32, 64), (64, 64)]


def conv1d_init(key: jax.Array, cin: int, cout: int, ksize: int) -> Params:
    fan_in = cin * ksize
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
    kw, kb = jax.random.split(key)
    return {
        # Stored as (ksize, cin, cout) for lax.conv_general_dilated with
        # dimension_numbers ("NWC", "WIO", "NWC").
        "w": jax.random.uniform(kw, (ksize, cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def conv1d_stride2(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (N, W, Cin) -> (N, ceil(W/2), Cout); kernel 3, stride 2, pad 1."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(2,), padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y + p["b"]


def audio_net_init(key: jax.Array, dim_aud: int = DRIVING_DIM,
                   win_size: int = 16) -> Params:
    keys = jax.random.split(key, 6)
    convs = [conv1d_init(keys[i], cin, cout, 3)
             for i, (cin, cout) in enumerate(AUDIO_CONV_CHANNELS)]
    return {
        "convs": convs,
        "fc1": linear_init(keys[4], 64, 64),
        "fc2": linear_init(keys[5], 64, dim_aud),
    }


def audio_net_apply(params: Params, audio: jnp.ndarray,
                    win_size: int = 16) -> jnp.ndarray:
    """audio: (16, 29) DeepSpeech window (or (B,16,29)) -> (76,) driving
    vector (reference modules.py:68-73). The window crop x[:, 8-w/2:8+w/2]
    is the identity for win_size=16."""
    x = audio if audio.ndim == 3 else audio[None]
    half = win_size // 2
    x = x[:, 8 - half:8 + half, :]  # (B, win, 29): time-major, channel-last
    act = lambda v: leaky_relu(v, 0.02)
    for p in params["convs"]:
        x = act(conv1d_stride2(p, x))
    x = x[:, 0, :]  # (B, 64) after four stride-2 convs: 16->8->4->2->1
    x = act(linear(params["fc1"], x))
    x = linear(params["fc2"], x)
    return x[0] if audio.ndim == 2 else x


# ---------------------------------------------------------------------------
# AudioAttNet (temporal attention smoother; seq_len=8)
# ---------------------------------------------------------------------------

def conv1d_same_init(key: jax.Array, cin: int, cout: int) -> Params:
    return conv1d_init(key, cin, cout, 3)


def conv1d_same(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y + p["b"]


def audio_att_net_init(key: jax.Array, dim_aud: int = 32,
                       seq_len: int = 8) -> Params:
    keys = jax.random.split(key, 6)
    chans = [(dim_aud, 16), (16, 8), (8, 4), (4, 2), (2, 1)]
    return {
        "convs": [conv1d_same_init(keys[i], cin, cout)
                  for i, (cin, cout) in enumerate(chans)],
        "fc": linear_init(keys[5], seq_len, seq_len),
    }


def audio_att_net_apply(params: Params, x: jnp.ndarray,
                        dim_aud: int = 32) -> jnp.ndarray:
    """x: (seq_len, dim) -> attention-weighted sum over the sequence
    (reference modules.py:30-36)."""
    y = x[None, :, :dim_aud]  # (1, seq, dim) time-major channel-last
    act = lambda v: leaky_relu(v, 0.02)
    for p in params["convs"]:
        y = act(conv1d_same(p, y))
    y = y[0, :, 0]  # (seq,)
    att = jax.nn.softmax(linear(params["fc"], y))
    return jnp.sum(att[:, None] * x, axis=0)


# ---------------------------------------------------------------------------
# MaskGeneratorMLP (NeRF MLP variant with a 1-channel seg head and a latent
# code input; reference modules.py:76-165 — referenced by config key
# models.mask.module but never instantiated by the active scripts)
# ---------------------------------------------------------------------------

def mask_generator_init(key: jax.Array, num_encoding_fn_xyz: int = 10,
                        num_encoding_fn_dir: int = 4,
                        include_driving: bool = True,
                        latent_code_dim: int = 32) -> Params:
    from ..ops.encoding import encoded_dim
    dim_xyz = encoded_dim(3, num_encoding_fn_xyz, True)
    dim_dir = encoded_dim(3, num_encoding_fn_dir, True)
    input_dim = dim_xyz + latent_code_dim + (DRIVING_DIM if include_driving else 0)
    keys = jax.random.split(key, 6)
    return {
        "trunk": skip_trunk_init(keys[0], input_dim, 256, 6, 3),
        "fc_feat": linear_init(keys[1], 256, 256),
        "fc_alpha": linear_init(keys[2], 256, 1),
        "dir": [linear_init(k, d, 256) for k, d in
                zip(jax.random.split(keys[3], 4), [256 + dim_dir, 256, 256, 256])],
        "fc_rgb": linear_init(keys[4], 256, 3),
        "seg": [linear_init(k, 256, 256) for k in jax.random.split(keys[5], 4)],
        "fc_seg": linear_init(jax.random.fold_in(keys[5], 7), 256, 1),
    }


def mask_generator_apply(params: Params, xyz_embed: jnp.ndarray,
                         dirs_embed: jnp.ndarray,
                         driving: Optional[jnp.ndarray],
                         latent_code: jnp.ndarray) -> jnp.ndarray:
    """Output (P, 5) = rgb3 | seg1 | alpha1 (reference modules.py:133-165).
    Faithful quirk: the reference's seg branch re-reads ``feat`` every layer
    (a bug — `x = layers_seg[i](feat)`), so only its LAST layer matters;
    reproduced here by applying only seg[3] to feat."""
    act = lambda x: leaky_relu(x, 0.01)
    n = xyz_embed.shape[:-1]
    parts = [xyz_embed, jnp.broadcast_to(latent_code, n + (latent_code.shape[-1],))]
    if driving is not None:
        parts.append(jnp.broadcast_to(driving, n + (DRIVING_DIM,)))
    x0 = jnp.concatenate(parts, axis=-1)
    h = skip_trunk_apply(params["trunk"], x0, 3, act)
    feat = linear(params["fc_feat"], h)
    alpha = linear(params["fc_alpha"], feat)
    seg = linear(params["fc_seg"], act(linear(params["seg"][3], feat)))
    x = act(linear(params["dir"][0], jnp.concatenate([feat, dirs_embed], -1)))
    for p in params["dir"][1:3]:
        x = act(linear(p, x))
    rgb = linear(params["fc_rgb"], x)
    return jnp.concatenate([rgb, seg, alpha], axis=-1)


# ---------------------------------------------------------------------------
# WarpEmbeddingMLP (tiny generic MLP; reference modules.py:298-321, unused)
# ---------------------------------------------------------------------------

def warp_embedding_init(key: jax.Array, num_layers: int = 4,
                        hidden_size: int = 64, input_s: int = 36,
                        output_s: int = 36) -> Params:
    keys = jax.random.split(key, num_layers)
    dims = [input_s] + [hidden_size] * (num_layers - 1) + [output_s]
    return {"layers": [linear_init(k, dims[i], dims[i + 1])
                       for i, k in enumerate(keys)]}


def warp_embedding_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    for p in params["layers"]:
        x = jax.nn.relu(linear(p, x))
    return x


# ---------------------------------------------------------------------------
# Spatial-embedding grid
# ---------------------------------------------------------------------------

def spatial_grid_init(key: jax.Array) -> jnp.ndarray:
    """Learnable (C, D, H, W) feature grid, randn * 0.01
    (reference models.py:201)."""
    return jax.random.normal(
        key, (SPATIAL_EMBEDDING_DIM, SPATIAL_GRID_RES, SPATIAL_GRID_RES,
              SPATIAL_GRID_RES)) * 0.01
