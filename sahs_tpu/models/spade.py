"""Stage-II SPADE texture-refinement networks, functional JAX.

Architectural parity with reference nerf-pytorch/nerf/_init_spade.py:
  - ResBlock2d / IdEncoder                 (:7-37, :185-203)
  - SPADELayer (InstanceNorm + conv'd modulation of a nearest-resized
    feature map)                           (:114-139)
  - SPADEBlock (2x spade->lrelu->SN-conv + spade shortcut, optional
    down/up sampling)                      (:235-280)
  - RefineNetwork (6 SPADE blocks 64-64-128-256-256-128-64 + 3ch head)
                                           (:284-312)
  - Generator / Generator_audio            (:315-325, :359-373)
  - Discriminator (PatchGAN, returns all intermediate features) (:375-412)

Parameters and mutable buffers (BN running stats, spectral-norm power-
iteration vectors) are separate pytrees; apply functions take
``train: bool`` and return updated buffers. Convs run through XLA's conv
primitives (MXU path) in NHWC layout.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1
_IN_EPS = 1e-5


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------

def conv_init(key, cin, cout, k=3, gain_fan=None):
    """torch Conv2d default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = cin * k * k
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    kw, kb = jax.random.split(key)
    return {
        # HWIO layout for lax.conv with NHWC
        "w": jax.random.uniform(kw, (k, k, cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def conv2d(p, x, stride=1, padding=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def conv2d_transpose(p, x, stride=2, padding=1, output_padding=1):
    """torch ConvTranspose2d(k=3, stride=2, padding=1, output_padding=1):
    output H_out = (H-1)*s - 2p + k + output_padding = 2H."""
    k = p["w"].shape[0]
    # lax.conv_transpose with padding computed to match torch semantics.
    pad = k - 1 - padding
    y = jax.lax.conv_transpose(
        x, p["w"], strides=(stride, stride),
        padding=[(pad, pad + output_padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True)
    return y + p["b"]


def avg_pool2(x):
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID") / 4.0


def upsample_nearest2(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def resize_nearest(x, oh, ow):
    """torch F.interpolate(mode='nearest') index rule: src = floor(i*H/oh)."""
    n, h, w, c = x.shape
    ri = (jnp.arange(oh) * h // oh).astype(jnp.int32)
    ci = (jnp.arange(ow) * w // ow).astype(jnp.int32)
    return x[:, ri][:, :, ci]


def instance_norm(x):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + _IN_EPS)


def batch_norm_init(c):
    return {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,))}, \
           {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def batch_norm(p, buf, x, train: bool):
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_buf = {
            "mean": (1 - _BN_MOMENTUM) * buf["mean"] + _BN_MOMENTUM * mean,
            "var": (1 - _BN_MOMENTUM) * buf["var"] + _BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = buf["mean"], buf["var"]
        new_buf = buf
    y = (x - mean) * jax.lax.rsqrt(var + _BN_EPS)
    return y * p["gamma"] + p["beta"], new_buf


def spectral_norm_init(key, w_shape):
    cout = w_shape[-1]
    u = jax.random.normal(key, (cout,))
    return {"u": u / (jnp.linalg.norm(u) + 1e-12)}


def spectral_norm(p_conv, buf, train: bool):
    """torch.nn.utils.spectral_norm semantics: weight viewed as
    (cout, fan_in) — here HWIO reshaped to (fan_in, cout).
    train: one power-iteration step (v = norm(W^T u); u = norm(W v)),
    sigma = u_new . (W v). eval: sigma from the STORED u (and stored v when
    present — the torch-importer saves weight_v so released checkpoints
    reproduce torch eval exactly; otherwise v is recomputed from u, which is
    identical once the power iteration has converged)."""
    w = p_conv["w"]
    wm = w.reshape(-1, w.shape[-1])  # (fan_in, cout)
    u = buf["u"]
    if train:
        v = wm @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_used = wm.T @ v
        u_used = u_used / (jnp.linalg.norm(u_used) + 1e-12)
        new_buf = dict(buf)
        new_buf["u"] = jax.lax.stop_gradient(u_used)
        if "v" in buf:
            new_buf["v"] = jax.lax.stop_gradient(v)
    else:
        v = buf.get("v")
        if v is None:
            v = wm @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
        u_used = u
        new_buf = buf
    sigma = v @ (wm @ u_used)
    w_sn = w / sigma
    return {"w": w_sn, "b": p_conv["b"]}, new_buf


def lrelu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


# ---------------------------------------------------------------------------
# ResBlock2d / IdEncoder (reference _init_spade.py:7-37,185-203)
# ---------------------------------------------------------------------------

def resblock_init(key, cin, cout, downsample=False):
    ks = jax.random.split(key, 4)
    p: Params = {"initial": conv_init(ks[0], cin, cout)}
    bn_p, bn_b = batch_norm_init(cout)
    p["bn1"] = bn_p
    bufs = {"bn1": bn_b}
    if downsample:
        p["down_id"] = conv_init(ks[1], cin, cout)
        p["down_res"] = conv_init(ks[2], cout, cout)
    else:
        p["residual"] = conv_init(ks[3], cout, cout)
        bn2_p, bn2_b = batch_norm_init(cout)
        p["bn2"] = bn2_p
        bufs["bn2"] = bn2_b
    return p, bufs


def resblock_apply(p, bufs, x, downsample, train):
    identity = x
    out = conv2d(p["initial"], x)
    out, b1 = batch_norm(p["bn1"], bufs["bn1"], out, train)
    out = jax.nn.relu(out)
    new_bufs = {"bn1": b1}
    if downsample:
        identity = conv2d(p["down_id"], identity, stride=2)
        out = conv2d(p["down_res"], out, stride=2)
    else:
        out = conv2d(p["residual"], out)
        out, b2 = batch_norm(p["bn2"], bufs["bn2"], out, train)
        out = jax.nn.relu(out)
        new_bufs["bn2"] = b2
    return out + identity, new_bufs


def id_encoder_init(key):
    ks = jax.random.split(key, 4)
    p, bufs = {}, {}
    p["stem"] = conv_init(ks[0], 3, 64)
    p["l2"], bufs["l2"] = resblock_init(ks[1], 64, 64)
    p["l3"], bufs["l3"] = resblock_init(ks[2], 64, 128, downsample=True)
    p["l4"], bufs["l4"] = resblock_init(ks[3], 128, 256, downsample=True)
    return p, bufs


def id_encoder_apply(p, bufs, x, train):
    x = avg_pool2(conv2d(p["stem"], x))
    x1, b2 = resblock_apply(p["l2"], bufs["l2"], x, False, train)
    x2, b3 = resblock_apply(p["l3"], bufs["l3"], x1, True, train)
    x3, b4 = resblock_apply(p["l4"], bufs["l4"], x2, True, train)
    return (x1, x2, x3), {"l2": b2, "l3": b3, "l4": b4}


# ---------------------------------------------------------------------------
# SPADE layers / blocks (reference _init_spade.py:114-139,235-280)
# ---------------------------------------------------------------------------

def spade_layer_init(key, norm_nc, label_nc):
    ks = jax.random.split(key, 3)
    return {
        "shared": conv_init(ks[0], label_nc, 128),
        "gamma": conv_init(ks[1], 128, norm_nc),
        "beta": conv_init(ks[2], 128, norm_nc),
    }


def spade_layer_apply(p, x, fid):
    normalized = instance_norm(x)
    fid = resize_nearest(fid, x.shape[1], x.shape[2])
    actv = jax.nn.relu(conv2d(p["shared"], fid))
    gamma = conv2d(p["gamma"], actv)
    beta = conv2d(p["beta"], actv)
    return normalized * (1 + gamma) + beta


def spade_block_init(key, cin, cout, fid_c, downsample=False, upsample=False):
    ks = jax.random.split(key, 8)
    p: Params = {
        "spade1": spade_layer_init(ks[0], cin, fid_c),
        "conv1": conv_init(ks[1], cin, cout),
        "spade2": spade_layer_init(ks[2], cout, fid_c),
        "conv2": conv_init(ks[3], cout, cout),
        "spade_s": spade_layer_init(ks[4], cin, fid_c),
        "conv_s": conv_init(ks[5], cin, cout),
    }
    bufs = {
        "conv1": spectral_norm_init(jax.random.fold_in(ks[6], 0), p["conv1"]["w"].shape),
        "conv2": spectral_norm_init(jax.random.fold_in(ks[6], 1), p["conv2"]["w"].shape),
        "conv_s": spectral_norm_init(jax.random.fold_in(ks[6], 2), p["conv_s"]["w"].shape),
    }
    if downsample:
        p["down_id"] = conv_init(ks[7], cin, cin)
    if upsample:
        p["up_id"] = conv_init(ks[7], cin, cin)
    return p, bufs


def spade_block_apply(p, bufs, x, fid, downsample, upsample, train):
    identity = x
    x1 = lrelu(spade_layer_apply(p["spade1"], x, fid))
    c1, b1 = spectral_norm(p["conv1"], bufs["conv1"], train)
    x1 = conv2d(c1, x1)
    if downsample:
        x1 = avg_pool2(x1)
        identity = conv2d(p["down_id"], identity, stride=2)
    if upsample:
        x1 = upsample_nearest2(x1)
        identity = conv2d_transpose(p["up_id"], identity)
    x2 = lrelu(spade_layer_apply(p["spade2"], x1, fid))
    c2, b2 = spectral_norm(p["conv2"], bufs["conv2"], train)
    x2 = conv2d(c2, x2)
    xs = lrelu(spade_layer_apply(p["spade_s"], identity, fid))
    cs, bs = spectral_norm(p["conv_s"], bufs["conv_s"], train)
    xs = conv2d(cs, xs)
    return xs + x2, {"conv1": b1, "conv2": b2, "conv_s": bs}


# ---------------------------------------------------------------------------
# RefineNetwork / Generators (reference _init_spade.py:284-373)
# ---------------------------------------------------------------------------

_REFINE_LAYERS = [
    # (cin, cout, fid_idx, down, up)
    (64, 64, 0, True, False),
    (64, 128, 1, True, False),
    (128, 256, 2, False, False),
    (256, 256, 2, False, True),
    (256, 128, 1, False, True),
    (128, 64, 0, False, True),
]


def refine_network_init(key, fid_channels=(64, 128, 256)):
    ks = jax.random.split(key, len(_REFINE_LAYERS) + 2)
    p: Params = {"stem": conv_init(ks[0], 3, 64), "blocks": []}
    bufs = {"blocks": []}
    for i, (cin, cout, fidx, down, up) in enumerate(_REFINE_LAYERS):
        bp, bb = spade_block_init(ks[i + 1], cin, cout, fid_channels[fidx],
                                  down, up)
        p["blocks"].append(bp)
        bufs["blocks"].append(bb)
    p["head"] = conv_init(ks[-1], 64, 3)
    return p, bufs


def refine_network_apply(p, bufs, x, fids, train):
    x = avg_pool2(conv2d(p["stem"], x))
    new_blocks = []
    for i, (cin, cout, fidx, down, up) in enumerate(_REFINE_LAYERS):
        x, nb = spade_block_apply(p["blocks"][i], bufs["blocks"][i], x,
                                  fids[fidx], down, up, train)
        new_blocks.append(nb)
    return conv2d(p["head"], x), {"blocks": new_blocks}


def generator_init(key, audio: bool = False):
    ks = jax.random.split(key, 3)
    p, bufs = {}, {}
    p["idenc"], bufs["idenc"] = id_encoder_init(ks[0])
    p["refine"], bufs["refine"] = refine_network_init(ks[1])
    if audio:
        from .fields import audio_net_init
        p["audnet"] = audio_net_init(ks[2])
    return p, bufs


def _audionet_conv_features(p, audio):
    """Reference Generator_audio's AudioNet variant returns the 64-d conv
    features (the fc head is commented out, _init_spade.py:352-357)."""
    from .fields import conv1d_stride2
    from .fields import leaky_relu as lr
    x = audio[None]  # (1, 16, 29)
    for cp in p["convs"]:
        x = lr(conv1d_stride2(cp, x), 0.02)
    return x[:, 0, :]  # (1, 64)


def generator_apply(p, bufs, i_src, i_raw, audio=None, train=False
                    ) -> Tuple[jnp.ndarray, Params]:
    """i_src (identity photo), i_raw (Stage-I render): (N,H,W,3).
    audio: (16,29) or None. Returns (refined (N,H,W,3), new_bufs)."""
    fids, b_id = id_encoder_apply(p["idenc"], bufs["idenc"], i_src, train)
    if audio is not None and "audnet" in p:
        feat = _audionet_conv_features(p["audnet"], audio)  # (1, 64)
        # Reference broadcast: (1,64) -> repeat to a (1,256,64,64*64) map
        # (_init_spade.py:369-371, torch NCHW); equivalently in NHWC a
        # (1, 64, 4096, 256) map whose W axis tiles the 64-vector. SPADE
        # layers nearest-resize it immediately, so build it lazily.
        tile = jnp.broadcast_to(feat[0][None, None, :], (64, 64, 64))
        tile = tile.reshape(1, 64, 4096, 1)
        fid3 = jnp.broadcast_to(tile, (1, 64, 4096, 256))
        fids = (fids[0], fids[1], fid3)
    out, b_ref = refine_network_apply(p["refine"], bufs["refine"], i_raw,
                                      fids, train)
    return out, {"idenc": b_id, "refine": b_ref,
                 **({"audnet": bufs.get("audnet")} if "audnet" in bufs else {})}


# ---------------------------------------------------------------------------
# PatchGAN discriminator (reference _init_spade.py:375-412)
# ---------------------------------------------------------------------------

def conv_init_k4(key, cin, cout):
    fan_in = cin * 16
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    kw, kb = jax.random.split(key)
    return {"w": jax.random.uniform(kw, (4, 4, cin, cout), jnp.float32,
                                    -bound, bound),
            "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)}


def conv2d_k4(p, x, stride, padding):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def discriminator_init(key, style_size: int):
    ks = jax.random.split(key, 5)
    chans = [(style_size + 3, 64), (64, 128), (128, 256), (256, 512)]
    p = {"convs": [conv_init_k4(ks[i], cin, cout)
                   for i, (cin, cout) in enumerate(chans)],
         "final": conv_init_k4(ks[4], 512, 1)}
    bufs = {"convs": [spectral_norm_init(jax.random.fold_in(ks[i], 9),
                                         p["convs"][i]["w"].shape)
                      for i in range(4)],
            "final": spectral_norm_init(jax.random.fold_in(ks[4], 9),
                                        p["final"]["w"].shape)}
    return p, bufs


def discriminator_apply(p, bufs, x, a, train=False):
    """Returns the list of intermediate features (reference returns y[1:])."""
    y = jnp.concatenate([x, a], axis=-1)
    feats = []
    new_bufs = {"convs": [], "final": None}
    for i, cp in enumerate(p["convs"]):
        c, b = spectral_norm(cp, bufs["convs"][i], train)
        new_bufs["convs"].append(b)
        y = conv2d_k4(c, y, stride=2, padding=1)
        if i > 0:
            y = instance_norm(y)
        y = lrelu(y)
        feats.append(y)
    y2 = lrelu(instance_norm(y))
    feats.append(y2)
    c, b = spectral_norm(p["final"], bufs["final"], train)
    new_bufs["final"] = b
    feats.append(conv2d_k4(c, y2, stride=1, padding=0))
    return feats, new_bufs
