"""Depth-sample generation and device-side ray selection.

Parity targets in the reference:
  - coarse linspace + stratified perturb   nerf-pytorch/nerf/train_utils.py:93-113
  - sample_pdf_2 (inverse-CDF importance)  nerf-pytorch/nerf/nerf_helpers.py:454-497
  - weighted pixel draw (host-side np.random.choice without replacement,
    train_stage_rays_auto.py:417-422) -> re-designed as a device-side
    Gumbel-top-k gather so the whole train step stays on-device with static
    shapes (no host round trip, no dynamic shapes).

All randomness is explicit via jax.random keys.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def coarse_z_vals(near: jnp.ndarray, far: jnp.ndarray, num_coarse: int,
                  lindisp: bool = False,
                  perturb: bool = False,
                  key: Optional[jax.Array] = None) -> jnp.ndarray:
    """(R,) near/far -> (R, num_coarse) depth values, depth- or
    disparity-spaced, with optional stratified jitter
    (reference train_utils.py:93-113)."""
    t = jnp.linspace(0.0, 1.0, num_coarse, dtype=near.dtype)
    near = near[..., None]
    far = far[..., None]
    if not lindisp:
        z = near * (1.0 - t) + far * t
    else:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    if perturb:
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
        lower = jnp.concatenate([z[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z.shape, dtype=z.dtype)
        z = lower + (upper - lower) * t_rand
    return z


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, num_samples: int,
               det: bool = False,
               key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Inverse-CDF importance sampling; exact math parity with the variant
    the reference actually uses (sample_pdf_2, nerf_helpers.py:454-497):
    +1e-5 weight floor, zero-prepended cumsum CDF, searchsorted-right on a
    *detached* CDF, denom<1e-5 -> 1 clamp.

    bins: (R, B), weights: (R, B-1) -> (R, num_samples). The result carries
    gradients only through ``bins`` interpolation endpoints — the CDF is
    detached, matching `torch.searchsorted(cdf.detach(), ...)` combined with
    the caller's `.detach()` on the output (train_utils.py:164); we stop
    gradients on the whole output accordingly.

    PRECONDITION: ``bins`` must be monotonically non-decreasing per row.
    The masked min/max reductions below reproduce searchsorted's
    below/above lookups only for sorted bins (the earlier take_along_axis
    form did not need this). All call sites satisfy it: z-value midpoints
    of sorted coarse z, and sort-merged z levels.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (R, B)

    if det:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=weights.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (num_samples,),
                               dtype=weights.dtype)

    # searchsorted(side='right') per row as a vectorized compare-reduce:
    # le[r,s,b] = cdf[r,b] <= u[r,s]; below = #le - 1, above = #le (clamped).
    # The four index lookups are masked min/max reductions over the SAME
    # compare tensor instead of take_along_axis: per-row gathers lower to
    # a serial scalar loop on TPU (measured 8.9 ms of a 61 ms train step);
    # the reductions are pure VPU at the same (R,S,B) footprint (<0.3 ms).
    # Exactness: cdf row 0 is the prepended 0 <= u, so le always holds at
    # b=0 and the maxes never see an empty mask; when le holds everywhere
    # (u beyond the last knot) `above` clamps to the last column, matching
    # torch.searchsorted + the reference's index clamp.
    le = cdf[:, None, :] <= u[..., None]
    inds = jnp.sum(le, axis=-1)
    all_le = inds == cdf.shape[-1]
    big = jnp.asarray(jnp.finfo(weights.dtype).max, weights.dtype)

    cdf_below = jnp.max(jnp.where(le, cdf[:, None, :], -big), axis=-1)
    cdf_above = jnp.min(jnp.where(le, big, cdf[:, None, :]), axis=-1)
    cdf_above = jnp.where(all_le, cdf[:, -1:], cdf_above)
    bins_below = jnp.max(jnp.where(le, bins[:, None, :], -big), axis=-1)
    bins_above = jnp.min(jnp.where(le, big, bins[:, None, :]), axis=-1)
    bins_above = jnp.where(all_le, bins[:, -1:], bins_above)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    tt = (u - cdf_below) / denom
    samples = bins_below + tt * (bins_above - bins_below)
    return jax.lax.stop_gradient(samples)


def merge_z_vals(z_vals: jnp.ndarray, z_samples: jnp.ndarray) -> jnp.ndarray:
    """sort(cat(coarse, fine)) along the sample axis
    (reference train_utils.py:166)."""
    return jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)


# ---------------------------------------------------------------------------
# Device-side semantic-weighted ray selection
# ---------------------------------------------------------------------------

def semantic_ray_probs(sample_prob: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """probs[h,w] = sum_c sample_prob[c] * mask[h,w,c], normalized
    (reference train_stage_rays_auto.py:390-394)."""
    probs = jnp.sum(sample_prob[None, None, :] * mask, axis=-1)
    probs = probs / jnp.sum(probs)
    return probs


def bbox_ray_probs(bbox: jnp.ndarray, H: int, W: int,
                   p: float = 0.9) -> jnp.ndarray:
    """NerFACE-style bbox-weighted pixel probabilities — the reference's
    fallback when dynamic semantic sampling is off: probability mass ``p``
    inside the face bbox rows [b0,b1) x cols [b2,b3), ``1-p`` outside,
    normalized (reference nerface_dataloader.py:63-87 /
    audio_dataloader.py:58-88; consumed at train_stage_rays_auto.py:417-422).
    bbox: (4,) int [row0, row1, col0, col1]. Static shapes: bbox is data."""
    rows = jnp.arange(H)
    cols = jnp.arange(W)
    in_r = (rows >= bbox[0]) & (rows < bbox[1])
    in_c = (cols >= bbox[2]) & (cols < bbox[3])
    inside = in_r[:, None] & in_c[None, :]
    probs = jnp.where(inside, p, 1.0 - p)
    return probs / jnp.sum(probs)


def weighted_ray_indices(key: jax.Array, probs_flat: jnp.ndarray,
                         num_rays: int, replace: bool = False) -> jnp.ndarray:
    """Draw ``num_rays`` flat pixel indices ~ probs.

    The reference uses host-side ``np.random.choice(..., replace=False)``
    (train_stage_rays_auto.py:417-422). On TPU we keep shapes static and stay
    on-device: without replacement == Gumbel-top-k over log-probabilities
    (the Gumbel-max trick); with replacement == categorical draw.
    """
    if replace:
        return jax.random.categorical(key, jnp.log(probs_flat + 1e-12),
                                      shape=(num_rays,))
    g = jax.random.gumbel(key, probs_flat.shape, dtype=probs_flat.dtype)
    scores = jnp.log(probs_flat + 1e-12) + g
    # EXACT top_k everywhere: tools/sampling_check.py measured on-TPU that
    # approx_max_k biases per-semantic-class draw frequencies by up to 2.1%
    # (>1% decision threshold; recorded 2026-08-20), distorting the
    # dynamic-sampling distribution the reference trains with. Selection is
    # ~1.4 ms of a ~60 ms step, so exactness is cheap.
    _, idx = jax.lax.top_k(scores, num_rays)
    return idx


def gather_rays(flat_idx: jnp.ndarray, *arrays: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Gather rows at flat pixel indices from any number of (H*W, C) or
    (H, W, C) arrays (the latter are flattened first)."""
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        if a.ndim == 3:
            a = a.reshape(-1, a.shape[-1])
        out.append(jnp.take(a, flat_idx, axis=0))
    return tuple(out)
