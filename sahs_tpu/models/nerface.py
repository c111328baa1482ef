"""Top-level deformable-NeRF models (3DMM- and audio-driven).

Functional re-design of the reference's NeRFaceModel / AudioFaceModel
(nerf-pytorch/nerf/models.py:189-528): parameters are a pytree, application
is a pure function of (params, spec, inputs). The observation->canonical
mapping is:

    x_obs --PE--> WarpFieldMLP --> Δx          (models.py:301-306)
    x_obs --PE--> HyperSheetMLP --> ambient w  (models.py:308-316)
    canonical hyper point = (x_obs + Δx, w)    (models.py:318-329)
    spatial_embedding = trilerp(grid, x+Δx)    (models.py:346-365)
    raw = NeRFMLP(PE(x+Δx) ⊕ PE(w) [⊕ driving][⊕ pose], PE(dir), se)

Driving is either the 76-d 3DMM expression vector (NeRFace path) or
AudioNet(window) (AudioFace path, models.py:507-528).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.encoding import get_embedding_function
from ..ops.grid import grid_sample_3d
from ..ops.rays import pose_to_euler_trans
from . import fields
from .fields import (HyperSpec, NeRFSpec, WarpSpec, audio_net_apply,
                     audio_net_init, hyper_sheet_apply, hyper_sheet_init,
                     nerf_mlp_apply, nerf_mlp_init, spatial_grid_init,
                     warp_field_apply, warp_field_init)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static (hashable) description of the full model; safe to close over
    inside jit."""
    kind: str                       # "NeRFaceModel" | "AudioFaceModel"
    use_warp: bool
    use_ambient: bool
    use_spatial_embeddings: bool
    use_viewdirs: bool
    warp: Optional[WarpSpec]
    hyper: Optional[HyperSpec]
    coarse: NeRFSpec
    fine: Optional[NeRFSpec]
    # PE settings
    num_encoding_fn_xyz: int
    include_input_xyz: bool
    log_sampling_xyz: bool
    num_encoding_fn_dir: int
    include_input_dir: bool
    log_sampling_dir: bool
    num_encoding_fn_ambient: int
    include_input_ambient: bool
    log_sampling_ambient: bool
    # deformation-MLP PE (may differ from the canonical field's)
    warp_num_encoding_fn_xyz: int

    @classmethod
    def from_config(cls, cfg: Config) -> "ModelSpec":
        m = cfg.models
        warp = WarpSpec.from_config(m.warp) if m.warp.use_warp else None
        hyper = HyperSpec.from_config(m.hyper) if m.hyper.use_ambient else None
        lcd = getattr(m.mask, "latent_code_dim", 0)
        coarse = NeRFSpec.from_config(m.coarse, m.hyper, latent_code_dim=lcd)
        # The reference builds the fine MLP with the *coarse* width/depth and
        # pose/spatial flags (models.py:278-296) — mirror that.
        fine = None
        if m.fine is not None:
            import copy
            fine_cfg = copy.deepcopy(m.fine)
            fine_cfg.num_layers = m.coarse.num_layers
            fine_cfg.hidden_size = m.coarse.hidden_size
            fine_cfg.use_pose = m.coarse.use_pose
            fine_cfg.include_pose = m.coarse.include_pose
            fine_cfg.use_spatial_embeddings = m.coarse.use_spatial_embeddings
            fine = NeRFSpec.from_config(fine_cfg, m.hyper, latent_code_dim=lcd)
        return cls(
            kind=m.mask.type,
            use_warp=m.warp.use_warp,
            use_ambient=m.hyper.use_ambient,
            use_spatial_embeddings=m.coarse.use_spatial_embeddings,
            use_viewdirs=m.coarse.use_viewdirs,
            warp=warp,
            hyper=hyper,
            coarse=coarse,
            fine=fine,
            num_encoding_fn_xyz=m.coarse.num_encoding_fn_xyz,
            include_input_xyz=m.coarse.include_input_xyz,
            log_sampling_xyz=m.coarse.log_sampling_xyz,
            num_encoding_fn_dir=m.coarse.num_encoding_fn_dir,
            include_input_dir=m.coarse.include_input_dir,
            log_sampling_dir=m.coarse.log_sampling_dir,
            num_encoding_fn_ambient=m.hyper.num_encoding_fn_ambient,
            include_input_ambient=m.hyper.include_input_ambient,
            log_sampling_ambient=m.hyper.log_sampling_ambient,
            warp_num_encoding_fn_xyz=m.warp.num_encoding_fn_xyz,
        )

    @property
    def is_audio(self) -> bool:
        return self.kind in ("AudioFaceModel", "AudioMaskGenerator")


def init_model_params(key: jax.Array, spec: ModelSpec) -> Params:
    keys = jax.random.split(key, 6)
    params: Params = {}
    if spec.use_warp:
        params["warp"] = warp_field_init(keys[0], spec.warp)
    if spec.use_ambient:
        params["hyper"] = hyper_sheet_init(keys[1], spec.hyper)
    params["coarse"] = nerf_mlp_init(keys[2], spec.coarse)
    if spec.fine is not None:
        params["fine"] = nerf_mlp_init(keys[3], spec.fine)
    if spec.use_spatial_embeddings:
        params["spatial_embeddings"] = spatial_grid_init(keys[4])
    if spec.is_audio:
        params["audnet"] = audio_net_init(keys[5])
    return params


# ---------------------------------------------------------------------------
# Application
# ---------------------------------------------------------------------------

def encode_pose(pose: jnp.ndarray) -> jnp.ndarray:
    """(3,4) c2w pose -> (36,) PE of the 6-dof euler+trans
    (reference models.py:371-372, 519-520)."""
    pe = get_embedding_function(3, include_input=False, log_sampling=True)
    return pe(pose_to_euler_trans(pose[None]))[0]


def compute_driving(params: Params, spec: ModelSpec,
                    driving_or_audio: jnp.ndarray) -> jnp.ndarray:
    """AudioFace: run AudioNet on the (16,29) window; NeRFace: identity on
    the (76,) expression vector."""
    if spec.is_audio:
        return audio_net_apply(params["audnet"], driving_or_audio)
    return driving_or_audio


def map_points(params: Params, spec: ModelSpec, points: jnp.ndarray,
               driving: jnp.ndarray, pose_enc: jnp.ndarray) -> jnp.ndarray:
    """(P,3) observation points -> (P, 3[+ambient]) canonical hyper points
    (reference models.py:301-329). The deformation MLPs use the *warp* PE
    frequency count, which can differ from the canonical field's."""
    pe_warp = get_embedding_function(spec.warp_num_encoding_fn_xyz,
                                     include_input=True, log_sampling=True)
    pe_x = pe_warp(points)
    spatial = points
    if spec.use_warp:
        dx = warp_field_apply(params["warp"], spec.warp, pe_x, driving, pose_enc)
        spatial = points + dx
    if spec.use_ambient:
        w = hyper_sheet_apply(params["hyper"], spec.hyper, pe_x, driving, pose_enc)
        return jnp.concatenate([spatial, w], axis=-1)
    return spatial


def query_template(params: Params, spec: ModelSpec, level: str,
                   mapped_points: jnp.ndarray, viewdirs: Optional[jnp.ndarray],
                   driving: jnp.ndarray, pose_enc: jnp.ndarray,
                   latent_code: Optional[jnp.ndarray],
                   spatial_embedding: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Canonical-field query (reference models.py:331-344)."""
    nerf_spec: NeRFSpec = getattr(spec, level)
    pe_pos = get_embedding_function(spec.num_encoding_fn_xyz,
                                    spec.include_input_xyz, spec.log_sampling_xyz)
    points_embed = pe_pos(mapped_points[..., :3])
    if mapped_points.shape[-1] > 3:
        pe_amb = get_embedding_function(spec.num_encoding_fn_ambient,
                                        spec.include_input_ambient,
                                        spec.log_sampling_ambient)
        points_embed = jnp.concatenate(
            [points_embed, pe_amb(mapped_points[..., 3:])], axis=-1)
    dirs_embed = None
    if spec.use_viewdirs:
        pe_dir = get_embedding_function(spec.num_encoding_fn_dir,
                                        spec.include_input_dir,
                                        spec.log_sampling_dir)
        dirs_embed = pe_dir(viewdirs)
    return nerf_mlp_apply(params[level], nerf_spec, points_embed, dirs_embed,
                          driving=driving,
                          pose=pose_enc if nerf_spec.use_pose else None,
                          latent_code=latent_code,
                          spatial_embedding=spatial_embedding)


def level_kernel_compatible(samples: int) -> bool:
    """True when the fully-fused MLP+composite level kernel can tile this
    sample count (point tiles must cover whole rays, fwd and bwd)."""
    from ..ops.pallas.field_mlp import BWD_TILE, TILE
    return bool(samples) and TILE % samples == 0 and BWD_TILE % samples == 0


def pair_kernel_ok(spec: "ModelSpec") -> bool:
    """One fused kernel for BOTH deformation MLPs (shared PE pass) whenever
    they take the same conditioning — always true for the reference nets
    (modules.py:323-462: warp and hyper both take driving+pose)."""
    return (spec.use_warp and spec.use_ambient
            and spec.warp.include_driving == spec.hyper.include_driving)


def build_pe_specs(spec: "ModelSpec"):
    """In-kernel PE specs shared by every fused Pallas evaluator: every
    kernel takes the packed RAW coordinates and (re)computes its positional
    encoding inside the kernel from static frequency tables — the wide PE
    banks never exist in HBM and XLA's PE fwd/bwd kernels disappear from
    the hot path. in_width=8: the PE dot's contracting dim only needs the
    3-5 real coordinate columns. Returns (warp_pe, pts_pe, dir_pe)."""
    from ..ops.encoding import encoded_dim
    from ..ops.pallas.field_mlp import PESpec, _rup

    warp_pe = PESpec(
        groups=((0, 3, spec.warp_num_encoding_fn_xyz, True, True),),
        in_width=8,
        out_width=_rup(encoded_dim(3, spec.warp_num_encoding_fn_xyz, True)))

    amb_dim = spec.hyper.ambient_coord_dim if spec.use_ambient else 0
    pts_groups = [(0, 3, spec.num_encoding_fn_xyz, spec.include_input_xyz,
                   spec.log_sampling_xyz)]
    if amb_dim:
        pts_groups.append((3, amb_dim, spec.num_encoding_fn_ambient,
                           spec.include_input_ambient,
                           spec.log_sampling_ambient))
    pts_pe_dim = (encoded_dim(3, spec.num_encoding_fn_xyz,
                              spec.include_input_xyz)
                  + encoded_dim(amb_dim, spec.num_encoding_fn_ambient,
                                spec.include_input_ambient))
    pts_pe = PESpec(groups=tuple(pts_groups), in_width=8,
                    out_width=_rup(pts_pe_dim))

    dir_pe = PESpec(
        groups=((0, 3, spec.num_encoding_fn_dir, spec.include_input_dir,
                 spec.log_sampling_dir),),
        in_width=8,
        out_width=_rup(encoded_dim(3, spec.num_encoding_fn_dir,
                                   spec.include_input_dir)))
    return warp_pe, pts_pe, dir_pe


class RenderFns(NamedTuple):
    """Field evaluators built by make_render_fns.

    field_fn(level, pts_flat (P,3), dirs_ray (R,3), samples) -> (P,16);
    level_fn: fused MLP+composite variant or None;
    front_fn(pts_flat) -> (pts_raw, se): the level-independent deformation
    front half (warp+hyper+grid sample), exposed so the pipeline can reuse
    the coarse positions' outputs at the fine level (None on oracle path);
    nerf_fn(level, (pts_raw, se), dirs_ray, samples) -> (P,16): the NeRF
    back half consuming a precomputed front half (None on oracle path)."""
    field_fn: Callable
    level_fn: Optional[Callable]
    front_fn: Optional[Callable]
    nerf_fn: Optional[Callable]
    # Desired width of the flat points arrays fed to the evaluators: the
    # Pallas path wants them built directly at the pair kernel's 8-wide
    # input (XLA lane-pads (P, 3) f32 to 128 lanes physically, so a
    # separate (P,3)->(P,8) pad is a full extra memory pass); the oracle
    # path wants plain (P, 3).
    pts_width: int = 3


def make_render_fns(params: Params, spec: ModelSpec,
                    driving_or_audio: jnp.ndarray, pose: jnp.ndarray,
                    latent_code=None, use_pallas: bool = False,
                    compute_dtype: str = "bfloat16"):
    """Build the field evaluators used by the render pipeline. Returns
    ``(field_fn, level_fn)``:

    field_fn(level, pts_flat (P,3), dirs_ray (R,3), samples) -> (P, 16),
    with P == R * samples and ray-major point order (dirs are per-RAY; the
    per-point broadcast happens inside the evaluator, or not at all on the
    Pallas path, whose NeRF kernel encodes directions once per ray).

    level_fn(level, pts_flat, dirs_ray, samples, z (R,S), bg (R,15)|None,
    noise (R,S)|None) -> (rgb_map (R,16), weights (R,S)) is the fully-fused
    MLP + in-kernel volume-compositing path (reference semantics of
    train_utils.py:135-136 + volume_rendering_utils.py:7-78 inside one
    kernel); None when the Pallas path is off or kernel-incompatible. Call
    it only when level_kernel_compatible(samples).

    use_pallas=True routes the MLPs through the fused Pallas kernels
    (ops/pallas/field_mlp.py): per-frame conditioning is folded into biases,
    all layer activations stay in VMEM. Falls back to the pure-jnp oracle
    when the configuration isn't kernel-compatible (no viewdirs / latent
    codes in use)."""
    driving = compute_driving(params, spec, driving_or_audio)
    pose_enc = encode_pose(pose)

    # Latent codes are per-frame constants, folded into effective biases
    # exactly like driving/pose (trunk input order [pe, latent?, driving?,
    # pose?], fields.py:292) — so they ride the Pallas fast path too.
    pallas_ok = (use_pallas and spec.use_viewdirs)
    if not pallas_ok:
        def field_fn(level, pts_flat, dirs_ray, samples):
            dirs_flat = None
            if dirs_ray is not None:
                dirs_flat = jnp.broadcast_to(
                    dirs_ray[:, None, :],
                    (dirs_ray.shape[0], samples, dirs_ray.shape[-1])
                ).reshape(-1, dirs_ray.shape[-1])
            mapped = map_points(params, spec, pts_flat, driving, pose_enc)
            se = None
            if spec.use_spatial_embeddings:
                se = grid_sample_3d(params["spatial_embeddings"], mapped[..., :3])
            return query_template(params, spec, level, mapped, dirs_flat,
                                  driving, pose_enc, latent_code, se)
        return RenderFns(field_fn, None, None, None)

    from ..ops.encoding import encoded_dim
    from ..ops.pallas.field_mlp import (PESpec, _rup, deform_mlp_apply_fused,
                                        deform_pair_apply_fused,
                                        nerf_mlp_apply_fused)

    warp_pe, pts_pe, dir_pe = build_pe_specs(spec)
    amb_dim = spec.hyper.ambient_coord_dim if spec.use_ambient else 0
    se_dim = fields.SPATIAL_EMBEDDING_DIM if spec.use_spatial_embeddings else 0
    extra_groups = [(0, 3, spec.num_encoding_fn_dir, spec.include_input_dir,
                     spec.log_sampling_dir)]
    if se_dim:
        extra_groups.append((3, se_dim, 0, True, True))   # passthrough
    extra_dim = encoded_dim(3, spec.num_encoding_fn_dir,
                            spec.include_input_dir) + se_dim
    extra_pe = PESpec(groups=tuple(extra_groups), in_width=40,
                      out_width=_rup(extra_dim))

    def deform_cond(sub):
        parts = []
        if sub.include_driving:
            parts.append(driving)
        parts.append(pose_enc)
        return jnp.concatenate(parts)

    # One fused kernel for BOTH deformation MLPs (shared PE pass) whenever
    # they take the same conditioning — always true for the reference nets
    # (modules.py:323-462: warp and hyper both take driving+pose).
    pair_ok = pair_kernel_ok(spec)

    def front_half(pts_flat, samples=None):
        """Shared deformation front half: packed canonical points (kept as
        the (P,128) kernel block when the pair kernel runs). The spatial
        embedding is NOT sampled here — it is folded into the grid-coupled
        NeRF ops (ops/pallas/field_grid.py) so interp/dCoords run in-kernel
        and dGrid uses the z-slab contraction.

        With ``samples`` (and the pair kernel + grid active) returns
        (packed, rows): the pair kernel also emits the exact corner-table
        row of every warped point in dense (P//S, S) layout, sparing the
        grid ops the strided-lane cell-geometry pass (field_mlp
        emit_rows). Otherwise returns (packed, None)."""
        warped = pts_flat
        pts_raw = pts_flat
        rows = None
        if pair_ok:
            emit = ((samples, tuple(params["spatial_embeddings"].shape[1:]))
                    if (samples is not None and use_grid) else None)
            # packed (P, 128) [x + warp | ambient | zeros]: consumed AS-IS
            # by the grid sampler (first 3 cols) and the NeRF kernel (first
            # 3+amb cols) — no intermediate (P, small) array ever exists.
            packed = deform_pair_apply_fused(
                params["warp"], params["hyper"],
                (spec.warp.num_layers, spec.warp.hidden_size,
                 spec.warp.skip_connect_every, 3, "tanh"),
                (spec.hyper.num_layers, spec.hyper.hidden_size,
                 spec.hyper.skip_connect_every,
                 spec.hyper.ambient_coord_dim, "linear"),
                pts_flat, deform_cond(spec.warp),
                compute_dtype=compute_dtype, pe_spec=warp_pe,
                need_input_grad=False, emit_rows=emit)
            if emit is not None:
                packed, rows = packed
            warped = packed
            pts_raw = packed
        else:
            if spec.use_warp:
                dx = deform_mlp_apply_fused(
                    params["warp"], spec.warp.num_layers,
                    spec.warp.hidden_size, spec.warp.skip_connect_every,
                    pts_flat, deform_cond(spec.warp), 3,
                    out_act="tanh", compute_dtype=compute_dtype,
                    pe_spec=warp_pe)
                warped = pts_flat + dx
            pts_raw = warped
            if spec.use_ambient:
                amb = deform_mlp_apply_fused(
                    params["hyper"], spec.hyper.num_layers,
                    spec.hyper.hidden_size, spec.hyper.skip_connect_every,
                    pts_flat, deform_cond(spec.hyper),
                    spec.hyper.ambient_coord_dim,
                    out_act="linear", compute_dtype=compute_dtype,
                    pe_spec=warp_pe)
                pts_raw = jnp.concatenate([pts_raw, amb], axis=-1)
        return pts_raw, rows

    def nerf_cond(level, dtype):
        nerf_spec: NeRFSpec = getattr(spec, level)
        cond_parts = []
        if latent_code is not None and nerf_spec.latent_code_dim > 0:
            cond_parts.append(latent_code)
        if nerf_spec.include_driving:
            cond_parts.append(driving)
        if nerf_spec.use_pose:
            cond_parts.append(pose_enc)
        return (jnp.concatenate(cond_parts) if cond_parts
                else jnp.zeros((0,), dtype))

    use_grid = spec.use_spatial_embeddings

    def nerf_fn(level, fh, dirs_ray, samples):
        """NeRF evaluation from a precomputed deformation front half
        ``fh = front_half(pts_flat)`` — lets the pipeline REUSE the coarse
        z-positions' warp/hyper outputs at the fine level instead of
        recomputing them (the fine sample set is coarse ∪ importance; the
        deformation nets are level-independent). With spatial embeddings
        the grid sample rides inside the grid-coupled kernel op."""
        pts_raw, _ = fh
        nerf_spec: NeRFSpec = getattr(spec, level)
        cond = nerf_cond(level, pts_raw.dtype)

        from ..ops.pallas.field_mlp import nerf_mlp_apply_rayd
        if level_kernel_compatible(samples):
            if use_grid:
                from ..ops.pallas.field_grid import nerf_mlp_apply_rayd_grid
                return nerf_mlp_apply_rayd_grid(
                    params[level], params["spatial_embeddings"],
                    nerf_spec.num_layers, nerf_spec.skip_connect_every,
                    pts_raw, dirs_ray, samples, cond,
                    compute_dtype=compute_dtype,
                    pe_spec=pts_pe, dir_pe_spec=dir_pe)
            # per-RAY direction PE (point tiles cover whole rays)
            return nerf_mlp_apply_rayd(
                params[level], nerf_spec.num_layers,
                nerf_spec.skip_connect_every, pts_raw, dirs_ray, None,
                samples, cond, compute_dtype=compute_dtype,
                pe_spec=pts_pe, dir_pe_spec=dir_pe)
        # fallback: per-point dirs (sample count doesn't tile evenly)
        se = None
        if use_grid:
            se = grid_sample_3d(params["spatial_embeddings"], pts_raw,
                                compute_dtype=compute_dtype)
        dirs_flat = jnp.broadcast_to(
            dirs_ray[:, None, :],
            (dirs_ray.shape[0], samples, 3)).reshape(-1, 3)
        extra_raw = dirs_flat
        if se is not None:
            extra_raw = jnp.concatenate([extra_raw, se], axis=-1)
        raw_cols = 3 + (spec.hyper.ambient_coord_dim if spec.use_ambient
                        else 0)
        if pts_raw.shape[-1] > 8:
            pts_raw = pts_raw[:, :raw_cols]
        return nerf_mlp_apply_fused(
            params[level], nerf_spec.num_layers, nerf_spec.skip_connect_every,
            pts_raw, extra_raw, cond, compute_dtype=compute_dtype,
            pe_spec=pts_pe, extra_pe_spec=extra_pe)

    def field_fn(level, pts_flat, dirs_ray, samples):
        return nerf_fn(level, front_half(pts_flat), dirs_ray, samples)

    def level_fn(level, pts_flat, dirs_ray, samples, z, bg, noise):
        """Fully-fused level: deformation pair -> grid sample -> NeRF MLP
        with in-kernel volume compositing (per-RAY outputs; no (P,128) raw
        round-trip, no XLA (R,S,C) compositing chain)."""
        nerf_spec: NeRFSpec = getattr(spec, level)
        pts_raw, rows = front_half(pts_flat, samples=samples)
        if use_grid:
            from ..ops.pallas.field_grid import nerf_render_level_grid
            return nerf_render_level_grid(
                params[level], params["spatial_embeddings"],
                nerf_spec.num_layers, nerf_spec.skip_connect_every,
                pts_raw, dirs_ray, samples, z, bg, noise,
                nerf_cond(level, pts_flat.dtype),
                compute_dtype=compute_dtype,
                pe_spec=pts_pe, dir_pe_spec=dir_pe, rows=rows)
        from ..ops.pallas.field_mlp import nerf_render_level
        return nerf_render_level(
            params[level], nerf_spec.num_layers, nerf_spec.skip_connect_every,
            pts_raw, dirs_ray, None, samples, z, bg, noise,
            nerf_cond(level, pts_flat.dtype), compute_dtype=compute_dtype,
            pe_spec=pts_pe, dir_pe_spec=dir_pe)

    return RenderFns(field_fn, level_fn, front_half, nerf_fn, pts_width=8)


def make_field_fn(params: Params, spec: ModelSpec,
                  driving_or_audio: jnp.ndarray, pose: jnp.ndarray,
                  latent_code=None, use_pallas: bool = False,
                  compute_dtype: str = "bfloat16"):
    """Back-compat wrapper around make_render_fns: just the field_fn."""
    return make_render_fns(params, spec, driving_or_audio, pose,
                           latent_code=latent_code, use_pallas=use_pallas,
                           compute_dtype=compute_dtype)[0]


def apply_field(params: Params, spec: ModelSpec, level: str,
                points: jnp.ndarray, viewdirs: Optional[jnp.ndarray],
                driving_or_audio: jnp.ndarray, pose: jnp.ndarray,
                latent_code: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full per-point field evaluation: (P,3) points (+ (P,3) raw view dirs)
    -> (P, 16) raw radiance field. ``pose`` is the (3,4) camera pose; its
    6-dof PE is computed once per call (reference models.py:367-380,514-528).
    """
    driving = compute_driving(params, spec, driving_or_audio)
    pose_enc = encode_pose(pose)
    mapped = map_points(params, spec, points, driving, pose_enc)
    spatial_embedding = None
    if spec.use_spatial_embeddings:
        spatial_embedding = grid_sample_3d(params["spatial_embeddings"],
                                           mapped[..., :3])
    return query_template(params, spec, level, mapped, viewdirs, driving,
                          pose_enc, latent_code, spatial_embedding)
