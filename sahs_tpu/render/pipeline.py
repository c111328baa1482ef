"""Hierarchical coarse/fine rendering pipeline.

Re-design of the reference hot path (nerf-pytorch/nerf/train_utils.py:9-321)
for XLA: one fused, shape-static function per ray batch instead of Python
chunk loops; chunking for full-image eval is expressed as ``lax.map`` over
fixed-size ray blocks so everything stays on device under a single jit.

Reference quirks preserved (verified against train_utils.py):
  - viewdirs fed to the field are the RAW (unnormalized) ray directions —
    run_network reads ray_batch[..., 3:6] (train_utils.py:15) and the
    normalized copy is discarded (train_utils.py:267).
  - the last coarse/fine sample's first 15 channels are overwritten with the
    background prior BEFORE compositing (train_utils.py:135-136,184-185).
  - fine z-values = sort(cat(coarse z, sample_pdf(mid, weights[1:-1])))
    with the importance samples detached (train_utils.py:157-166).
  - the returned "weights" after the fine pass are the FINE weights, and the
    train loop additionally receives weights[:, -1] (train_utils.py:193,205).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import Config, NerfModeConfig
from ..models import nerface
from ..models.nerface import ModelSpec, Params
from ..ops.rendering import volume_render_radiance_field
from ..ops.sampling import coarse_z_vals, merge_z_vals, sample_pdf


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static per-mode settings (hashable; safe as a jit static arg)."""
    num_coarse: int = 64
    num_fine: int = 64
    perturb: bool = True
    lindisp: bool = False
    radiance_field_noise_std: float = 0.0
    white_background: bool = False
    chunksize: int = 131072
    use_pallas: bool = False      # fused Pallas field kernels (TPU fast path)
    # PIPELINE INVARIANT (relied on by the Pallas fast paths): sample
    # positions never carry gradient — rays are camera-derived and fine z
    # is stop_gradient'd by sample_pdf — so the deformation kernels skip
    # the d(points) cotangent (need_input_grad=False in
    # models/nerface.py front_half, and the fused train path's pair
    # backward). Any future path that differentiates through sample
    # positions (test-time pose refinement, trainable ray jitter) must
    # flip those flags or it will silently receive zero d(points).
    compute_dtype: str = "bfloat16"
    use_ndc: bool = False         # cfg.dataset.no_ndc=False (train_utils:243)
    fuse_composite: bool = True   # with use_pallas: volume-composite inside
                                  # the NeRF kernel (per-ray outputs)

    @classmethod
    def from_mode_config(cls, mc: NerfModeConfig, use_pallas: bool = False,
                         compute_dtype: str = "bfloat16",
                         use_ndc: bool = False,
                         fuse_composite: bool = True) -> "RenderSettings":
        return cls(
            num_coarse=mc.num_coarse,
            num_fine=mc.num_fine,
            perturb=bool(mc.perturb),
            lindisp=bool(mc.lindisp),
            radiance_field_noise_std=float(mc.radiance_field_noise_std),
            white_background=bool(mc.white_background),
            chunksize=int(mc.chunksize),
            use_pallas=bool(use_pallas),
            compute_dtype=compute_dtype,
            use_ndc=bool(use_ndc),
            fuse_composite=bool(fuse_composite),
        )

    @classmethod
    def from_config(cls, cfg: Config, mode: str) -> "RenderSettings":
        return cls.from_mode_config(
            getattr(cfg.nerf, mode),
            use_pallas=cfg.runtime.use_pallas,
            compute_dtype=cfg.runtime.compute_dtype,
            use_ndc=not cfg.dataset.no_ndc,
            fuse_composite=getattr(cfg.runtime, "fuse_composite", True))


@jax.custom_vjp
def permute_samples(x: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Reorder the sample axis of x (R, S, C) by perm (R, S).

    The transpose of a permutation gather is a gather with the inverse
    permutation — this custom VJP keeps the backward a gather too (XLA
    would otherwise emit a TPU scatter, which is ~an order of magnitude
    slower at these shapes)."""
    return jnp.take_along_axis(x, perm[..., None], axis=1)


def _permute_samples_fwd(x, perm):
    inv = jnp.argsort(perm, axis=-1)
    return jnp.take_along_axis(x, perm[..., None], axis=1), inv


def _permute_samples_bwd(inv, g):
    return jnp.take_along_axis(g, inv[..., None], axis=1), None


permute_samples.defvjp(_permute_samples_fwd, _permute_samples_bwd)


class RayRenderResult(NamedTuple):
    rgb_coarse: jnp.ndarray            # (R, C) rgb(3) [+ seg(12)]
    disp_coarse: jnp.ndarray
    acc_coarse: jnp.ndarray
    rgb_fine: Optional[jnp.ndarray]
    disp_fine: Optional[jnp.ndarray]
    acc_fine: Optional[jnp.ndarray]
    weights: Optional[jnp.ndarray]     # fine weights (R, Nc+Nf)
    depth_fine: Optional[jnp.ndarray]


def render_rays(
    params: Params,
    spec: ModelSpec,
    settings: RenderSettings,
    ray_origins: jnp.ndarray,          # (R, 3)
    ray_directions: jnp.ndarray,       # (R, 3) raw
    near: float,
    far: float,
    driving_or_audio: jnp.ndarray,     # (76,) expression or (16, 29) audio
    pose: jnp.ndarray,                 # (3, 4)
    key: Optional[jax.Array] = None,
    background_prior: Optional[jnp.ndarray] = None,  # (R, 15)
    latent_code: Optional[jnp.ndarray] = None,
    field_fn=None,
) -> RayRenderResult:
    """Render one batch of rays. ``field_fn`` optionally overrides the
    field evaluation (used to swap in the fused Pallas path):
    field_fn(level, pts_flat (R*S,3), dirs_ray (R,3), S) -> (R*S, 16),
    points ray-major — dirs stay per-ray so the Pallas kernel can encode
    each direction once instead of once per sample."""
    num_rays = ray_origins.shape[0]
    dtype = ray_origins.dtype
    needs_rng = settings.perturb or settings.radiance_field_noise_std > 0
    if key is None and needs_rng:
        raise ValueError("render_rays needs a PRNG key when perturb/noise on")
    keys = jax.random.split(key, 4) if key is not None else [None] * 4

    nearv = jnp.full((num_rays,), near, dtype=dtype)
    farv = jnp.full((num_rays,), far, dtype=dtype)

    # Shared per-frame conditioning, computed once (the reference recomputes
    # per chunk/level with identical results, models.py:514-521).
    level_fn = front_fn = nerf_fn = None
    pw = 3
    if field_fn is None:
        fns = nerface.make_render_fns(
            params, spec, driving_or_audio, pose, latent_code=latent_code,
            use_pallas=settings.use_pallas,
            compute_dtype=settings.compute_dtype)
        field_fn, level_fn, front_fn, nerf_fn = (
            fns.field_fn, fns.level_fn, fns.front_fn, fns.nerf_fn)
        pw = fns.pts_width
    if not settings.fuse_composite:
        level_fn = None
    # Points built directly at the evaluators' input width (RenderFns
    # .pts_width): padded o/d columns are zero so the extra lanes are 0.
    ro_w = (jnp.pad(ray_origins, ((0, 0), (0, pw - 3))) if pw > 3
            else ray_origins)
    rd_w = (jnp.pad(ray_directions, ((0, 0), (0, pw - 3))) if pw > 3
            else ray_directions)

    def run_level(level, z_vals, noise_key, raw_override=None):
        S = z_vals.shape[-1]
        if raw_override is None:
            pts = (ro_w[:, None, :]
                   + rd_w[:, None, :] * z_vals[..., None])
            pts_flat = pts.reshape(-1, pw)
        if raw_override is None and level_fn is not None \
                and nerface.level_kernel_compatible(S):
            # Fully-fused path: MLP + volume compositing in one kernel
            # (per-ray outputs). disp/acc/depth are the same cheap (R,S)
            # reductions the oracle computes (volume_rendering_utils.py:71-73).
            noise = None
            if settings.radiance_field_noise_std > 0:
                noise = (jax.random.normal(noise_key, z_vals.shape,
                                           dtype=z_vals.dtype)
                         * settings.radiance_field_noise_std)
            rgb_map, weights = level_fn(level, pts_flat, ray_directions, S,
                                        z_vals, background_prior, noise)
            rgb = rgb_map[:, :15]
            depth = jnp.sum(weights * z_vals, axis=-1)
            acc = jnp.sum(weights, axis=-1)
            disp = 1.0 / jnp.maximum(1e-10, depth / acc)
            if settings.white_background:
                rgb = rgb + (1.0 - acc[..., None])
            from ..ops.rendering import RenderOutputs
            return RenderOutputs(rgb, disp, acc, weights, depth)
        if raw_override is not None:
            raw = raw_override
        else:
            raw = field_fn(level, pts_flat, ray_directions, S)
            raw = raw.reshape(num_rays, S, raw.shape[-1])
        if background_prior is not None:
            raw = raw.at[:, -1, :-1].set(background_prior)
        return volume_render_radiance_field(
            raw, z_vals, ray_directions,
            radiance_field_noise_std=settings.radiance_field_noise_std,
            white_background=settings.white_background,
            background_prior=background_prior,
            noise_key=noise_key,
        )

    # Deformation reuse (Pallas non-fused path): the fine sample set is
    # coarse UNION importance, and the warp/hyper/grid front half is
    # level-independent -- compute it ONCE per position. The fine NeRF MLP
    # runs on concat-order points (a per-point field is order-invariant
    # within a ray) and only the (R, S, 16) raw output is permuted into
    # ascending-z order for compositing. Identical math to the recompute
    # path. The last sorted sample is always the coarse far sample
    # (importance draws come from interior bin midpoints), so the
    # background-prior last-row substitution is unaffected.
    reuse = (front_fn is not None and level_fn is None
             and settings.num_fine > 0 and spec.fine is not None)

    z_coarse = coarse_z_vals(nearv, farv, settings.num_coarse,
                             lindisp=settings.lindisp,
                             perturb=settings.perturb, key=keys[0])
    fh_coarse = None
    if reuse:
        Sc = z_coarse.shape[-1]
        pts_c = (ro_w[:, None, :]
                 + rd_w[:, None, :] * z_coarse[..., None])
        fh_coarse = front_fn(pts_c.reshape(-1, pw))
        raw_c = nerf_fn("coarse", fh_coarse, ray_directions, Sc)
        coarse = run_level("coarse", z_coarse, keys[1],
                           raw_override=raw_c.reshape(num_rays, Sc, -1))
    else:
        coarse = run_level("coarse", z_coarse, keys[1])

    if settings.num_fine <= 0 or spec.fine is None:
        return RayRenderResult(coarse.rgb, coarse.disp, coarse.acc,
                               None, None, None, coarse.weights, None)

    z_mid = 0.5 * (z_coarse[..., 1:] + z_coarse[..., :-1])
    z_samples = sample_pdf(z_mid, coarse.weights[..., 1:-1], settings.num_fine,
                           det=(not settings.perturb), key=keys[2])
    if reuse:
        Sc = z_coarse.shape[-1]
        Sn = z_samples.shape[-1]
        S = Sc + Sn
        pts_n = (ro_w[:, None, :]
                 + rd_w[:, None, :] * z_samples[..., None])
        fh_new = front_fn(pts_n.reshape(-1, pw))
        fh_fine = tuple(
            (None if c is None else jnp.concatenate(
                [c.reshape(num_rays, Sc, -1), n.reshape(num_rays, Sn, -1)],
                axis=1).reshape(num_rays * S, -1))
            for c, n in zip(fh_coarse, fh_new))
        raw_f = nerf_fn("fine", fh_fine, ray_directions, S)
        z_cat = jnp.concatenate([z_coarse, z_samples], axis=-1)
        perm = jnp.argsort(z_cat, axis=-1)
        z_fine = jnp.take_along_axis(z_cat, perm, axis=-1)
        raw_sorted = permute_samples(raw_f.reshape(num_rays, S, -1), perm)
        fine = run_level("fine", z_fine, keys[3], raw_override=raw_sorted)
    else:
        z_fine = merge_z_vals(z_coarse, z_samples)
        fine = run_level("fine", z_fine, keys[3])

    return RayRenderResult(coarse.rgb, coarse.disp, coarse.acc,
                           fine.rgb, fine.disp, fine.acc,
                           fine.weights, fine.depth)


def render_rays_chunked(params, spec, settings, ray_origins, ray_directions,
                        near, far, driving_or_audio, pose,
                        key=None, background_prior=None, latent_code=None,
                        chunksize: Optional[int] = None,
                        ray_constraint=None) -> RayRenderResult:
    """Full-bundle rendering via lax.map over fixed-size ray chunks (the
    TPU equivalent of the reference's get_minibatches python loop,
    train_utils.py:274-295). Rays are padded to a multiple of the chunk.

    ray_constraint: optional NamedSharding over (n_chunks, chunksize, ...)
    arrays (PartitionSpec(None, RAY_AXIS)) — eval frames then render
    data-parallel over the mesh: every device runs the same chunk loop on
    its ray shard and the per-ray outputs gather by the output sharding
    (SURVEY §2.5.4)."""
    chunksize = chunksize or settings.chunksize
    R = ray_origins.shape[0]
    n_chunks = max(1, -(-R // chunksize))
    pad = n_chunks * chunksize - R

    def pad0(x):
        if x is None:
            return None
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    ro = pad0(ray_origins).reshape(n_chunks, chunksize, 3)
    rd = pad0(ray_directions).reshape(n_chunks, chunksize, 3)
    has_bg = background_prior is not None
    bg = (pad0(background_prior).reshape(n_chunks, chunksize, -1) if has_bg
          else jnp.zeros((n_chunks, chunksize, 1), dtype=ro.dtype))
    if ray_constraint is not None:
        constrain = lambda x: jax.lax.with_sharding_constraint(
            x, ray_constraint)
        ro, rd, bg = constrain(ro), constrain(rd), constrain(bg)
    chunk_keys = (jax.random.split(key, n_chunks) if key is not None
                  else jnp.zeros((n_chunks,) + jax.random.PRNGKey(0).shape,
                                 dtype=jax.random.PRNGKey(0).dtype))

    def render_chunk(args):
        ro_c, rd_c, bg_c, k_c = args
        return render_rays(params, spec, settings, ro_c, rd_c, near, far,
                           driving_or_audio, pose,
                           key=k_c if key is not None else None,
                           background_prior=bg_c if has_bg else None,
                           latent_code=latent_code)

    out = jax.lax.map(render_chunk, (ro, rd, bg, chunk_keys))

    def unchunk(x):
        if x is None:
            return None
        x = x.reshape((n_chunks * chunksize,) + x.shape[2:])
        return x[:R]

    return RayRenderResult(*[unchunk(x) for x in out])


def render_image(params, spec, settings, H, W, intrinsics, pose, near, far,
                 driving_or_audio, key=None, background=None,
                 latent_code=None, chunksize: Optional[int] = None,
                 ray_constraint=None) -> Dict[str, Any]:
    """Full-image render (the reference's mode='validation' path,
    train_utils.py:303-319). background: (H, W, 15) or None.
    ray_constraint: see render_rays_chunked (multi-device eval)."""
    from ..ops.rays import get_ray_bundle, ndc_rays
    ro, rd = get_ray_bundle(H, W, intrinsics, pose)
    if settings.use_ndc:
        # Reference applies the NDC warp to the bundle before chunking with
        # near=1.0 (train_utils.py:243-254); config near/far stay as-is.
        ro, rd = ndc_rays(H, W, intrinsics, 1.0, ro, rd)
    bg = background.reshape(-1, background.shape[-1]) if background is not None else None
    res = render_rays_chunked(params, spec, settings,
                              ro.reshape(-1, 3), rd.reshape(-1, 3), near, far,
                              driving_or_audio, pose, key=key,
                              background_prior=bg, latent_code=latent_code,
                              chunksize=chunksize,
                              ray_constraint=ray_constraint)

    def img(x):
        if x is None:
            return None
        return x.reshape((H, W, -1)) if x.ndim == 2 else x.reshape((H, W))

    return {
        "rgb_coarse": img(res.rgb_coarse),
        "disp_coarse": img(res.disp_coarse),
        "acc_coarse": img(res.acc_coarse),
        "rgb_fine": img(res.rgb_fine),
        "disp_fine": img(res.disp_fine),
        "acc_fine": img(res.acc_fine),
        "weights": res.weights,
        "depth_fine": img(res.depth_fine),
    }
