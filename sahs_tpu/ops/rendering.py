"""Differentiable volume rendering (pure-jnp oracle path).

Exact math parity with reference nerf-pytorch/nerf/volume_rendering_utils.py:7-78
including its quirks (all load-bearing for pixel parity):
  - dists: z-diffs with 1e10 appended, scaled by ||ray_dir||        (:16-26)
  - with a background prior: sigmoid on rgb of all but the LAST sample,
    softmax over the 12 seg channels of all but the last sample, and the
    last sample's channels taken RAW (they hold the background prior values
    written by the pipeline)                                        (:28-33)
  - sigma = relu(raw[...,-1] + noise); sigma[:, -1] += 1e-6         (:56-57)
  - weights = alpha * cumprod_exclusive(1 - alpha + 1e-10)          (:58-59)
  - disp = 1 / max(1e-10, depth / acc)                              (:73)
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RenderOutputs(NamedTuple):
    rgb: jnp.ndarray      # (R, C) composited rgb(+seg) map
    disp: jnp.ndarray     # (R,)
    acc: jnp.ndarray      # (R,)
    weights: jnp.ndarray  # (R, S)
    depth: jnp.ndarray    # (R,)


def cumprod_exclusive(x: jnp.ndarray) -> jnp.ndarray:
    """tf.math.cumprod(..., exclusive=True) along the last axis
    (reference nerf_helpers.py:99-120)."""
    cp = jnp.cumprod(x, axis=-1)
    return jnp.concatenate([jnp.ones_like(cp[..., :1]), cp[..., :-1]], axis=-1)


def volume_render_radiance_field(
    radiance_field: jnp.ndarray,       # (R, S, C+1); last channel is sigma
    depth_values: jnp.ndarray,         # (R, S)
    ray_directions: jnp.ndarray,       # (R, 3) raw (unnormalized) directions
    radiance_field_noise_std: float = 0.0,
    white_background: bool = False,
    background_prior: Optional[jnp.ndarray] = None,  # (R, C) raw prior values
    noise_key: Optional[jax.Array] = None,
) -> RenderOutputs:
    one_e_10 = jnp.asarray(1e10, dtype=depth_values.dtype)
    dists = jnp.concatenate(
        [depth_values[..., 1:] - depth_values[..., :-1],
         jnp.broadcast_to(one_e_10, depth_values[..., :1].shape)],
        axis=-1,
    )
    dists = dists * jnp.linalg.norm(ray_directions, axis=-1)[..., None]

    if background_prior is not None:
        rgb = jax.nn.sigmoid(radiance_field[:, :-1, :3])
        if background_prior.shape[1] > 4:
            seg = jax.nn.softmax(radiance_field[:, :-1, 3:-1], axis=-1)
            rgb = jnp.concatenate([rgb, seg], axis=-1)
        # Last sample carries the raw background prior (written by caller).
        rgb = jnp.concatenate([rgb, radiance_field[:, -1:, :-1]], axis=1)
    else:
        rgb = jax.nn.sigmoid(radiance_field[..., :-1])

    sigma_raw = radiance_field[..., -1]
    if radiance_field_noise_std > 0.0:
        noise = jax.random.normal(noise_key, sigma_raw.shape,
                                  dtype=sigma_raw.dtype) * radiance_field_noise_std
        sigma_raw = sigma_raw + noise
    sigma = jax.nn.relu(sigma_raw)
    sigma = sigma.at[:, -1].add(1e-6)

    alpha = 1.0 - jnp.exp(-sigma * dists)
    weights = alpha * cumprod_exclusive(1.0 - alpha + 1e-10)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * depth_values, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if white_background:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RenderOutputs(rgb_map, disp_map, acc_map, weights, depth_map)
