"""Loss stack: masked per-semantic-class MSE / cross-entropy.

Parity targets in the reference:
  - MaskCrossEntropyLoss   nerf-pytorch/nerf/nerf_helpers.py:14-37
  - MaskMSELoss            nerf-pytorch/nerf/nerf_helpers.py:40-62
  - img2mse / mse2psnr     nerf-pytorch/nerf/nerf_helpers.py:65-73

Both masked losses return (unmasked mean, per-class masked vector,
class-weight-scaled vector); the per-class count has a zero guard
(count==0 -> 1). Weights are passed explicitly (the reference mutates a
module attribute; here they are pure inputs).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp


def _class_counts(mask: jnp.ndarray) -> jnp.ndarray:
    counts = jnp.sum(mask != 0, axis=0).astype(mask.dtype)
    return jnp.where(counts == 0, jnp.ones_like(counts), counts)


def mask_mse_loss(mask: jnp.ndarray, pred: jnp.ndarray, target: jnp.ndarray,
                  weights: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """mask: (N, 12) one-hot; pred/target: (N, 3).

    Per-pixel 'diff' is the SUM of squared channel errors (so the unmasked
    mean equals 3x a standard per-element MSE) — exact reference semantics
    (nerf_helpers.py:56-58)."""
    mask = mask.reshape(-1, mask.shape[-1])
    pred = pred.reshape(-1, 3)
    target = target.reshape(-1, 3)
    counts = _class_counts(mask)
    diff = jnp.sum(jnp.square(pred - target), axis=-1, keepdims=True)
    unmasked = jnp.mean(diff)
    masked = jnp.sum(diff * mask, axis=0) / counts
    if weights is None:
        weights = jnp.ones((mask.shape[-1],), dtype=mask.dtype)
    return unmasked, masked, weights * masked


def mask_cross_entropy_loss(mask: jnp.ndarray, probs: jnp.ndarray,
                            target: jnp.ndarray,
                            weights: Optional[jnp.ndarray] = None
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """mask/target: (N, 12) one-hot; probs: (N, 12) *probabilities* (the
    renderer composites softmaxed seg, reference volume_rendering_utils.py:31),
    hence -sum(target * log(probs + 1e-10)) (nerf_helpers.py:31)."""
    mask = mask.reshape(-1, mask.shape[-1])
    probs = probs.reshape(-1, probs.shape[-1])
    target = target.reshape(-1, target.shape[-1])
    counts = _class_counts(mask)
    ce = -jnp.sum(target * jnp.log(probs + 1e-10), axis=-1, keepdims=True)
    unmasked = jnp.mean(ce)
    masked = jnp.sum(ce * mask, axis=0) / counts
    if weights is None:
        weights = jnp.ones((mask.shape[-1],), dtype=mask.dtype)
    return unmasked, masked, weights * masked


def img2mse(img_src: jnp.ndarray, img_tgt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(img_src - img_tgt))


def mse2psnr(mse: float) -> float:
    """Host-side scalar helper with the reference's zero guard
    (nerf_helpers.py:69-73)."""
    mse = float(mse)
    if mse == 0:
        mse = 1e-5
    return -10.0 * math.log10(mse)
