"""Camera / ray geometry primitives.

Parity targets in the reference:
  - get_ray_bundle          nerf-pytorch/nerf/nerf_helpers.py:178-233
  - ndc_rays                nerf-pytorch/nerf/nerf_helpers.py:362-391
  - rot_to_euler / pose_to_euler_trans   nerf-pytorch/nerf/models.py:482-504
  - so3 exponential map (pure-JAX Rodrigues, replacing the pytorch3d CUDA op
    used by the dead get_ray_bundle_axis_angles path, nerf_helpers.py:287)

All functions are shape-static and jit-friendly.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ii, jj) with ii varying along the last axis (x / column index) —
    equivalent to np.meshgrid(..., indexing='xy') as used by meshgrid_xy
    (reference nerf_helpers.py:84-96). Returns (H, W) arrays."""
    ii = jnp.broadcast_to(jnp.arange(width, dtype=dtype)[None, :], (height, width))
    jj = jnp.broadcast_to(jnp.arange(height, dtype=dtype)[:, None], (height, width))
    return ii, jj


def get_ray_bundle(height: int, width: int, intrinsics: jnp.ndarray,
                   tform_cam2world: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel ray origins/directions.

    intrinsics = [fx, fy, cx, cy] with cx, cy *relative* to image size
    (reference nerf_helpers.py:188). tform_cam2world: (3,4) or (4,4) c2w.
    Returns ((H,W,3) origins, (H,W,3) directions) — directions NOT normalized,
    matching the reference (callers feed raw directions to the renderer).
    """
    intrinsics = jnp.asarray(intrinsics)
    c2w = jnp.asarray(tform_cam2world)
    ii, jj = pixel_grid(height, width, dtype=c2w.dtype)
    dirs = jnp.stack(
        [
            (ii - width * intrinsics[2]) / intrinsics[0],
            -(jj - height * intrinsics[3]) / intrinsics[1],
            -jnp.ones_like(ii),
        ],
        axis=-1,
    )
    # Elementwise broadcast-multiply-sum (not a matmul): exact f32 regardless
    # of the backend's default matmul precision (TPU defaults to bf16).
    ray_directions = jnp.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    ray_origins = jnp.broadcast_to(c2w[:3, -1], ray_directions.shape)
    return ray_origins, ray_directions


def get_rays_at(flat_idx: jnp.ndarray, height: int, width: int,
                intrinsics: jnp.ndarray, tform_cam2world: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray origins/directions for a set of flat pixel indices (row-major
    h*W+w), identical math to get_ray_bundle but computed only at the
    selected pixels — avoids building the full H*W bundle per train step."""
    intrinsics = jnp.asarray(intrinsics)
    c2w = jnp.asarray(tform_cam2world)
    ii = (flat_idx % width).astype(c2w.dtype)
    jj = (flat_idx // width).astype(c2w.dtype)
    dirs = jnp.stack(
        [
            (ii - width * intrinsics[2]) / intrinsics[0],
            -(jj - height * intrinsics[3]) / intrinsics[1],
            -jnp.ones_like(ii),
        ],
        axis=-1,
    )
    ray_directions = jnp.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    ray_origins = jnp.broadcast_to(c2w[:3, -1], ray_directions.shape)
    return ray_origins, ray_directions


def get_ray_bundle_by_mask(height: int, width: int, intrinsics: jnp.ndarray,
                           tform_cam2world: jnp.ndarray,
                           mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked blend of camera-frame vs world-frame rays
    (reference nerf_helpers.py:122-176)."""
    intrinsics = jnp.asarray(intrinsics)
    c2w = jnp.asarray(tform_cam2world)
    ii, jj = pixel_grid(height, width, dtype=c2w.dtype)
    dirs = jnp.stack(
        [
            (ii - width * intrinsics[2]) / intrinsics[0],
            -(jj - height * intrinsics[3]) / intrinsics[1],
            -jnp.ones_like(ii),
        ],
        axis=-1,
    )
    world_dirs = jnp.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    m = mask[..., None].astype(dirs.dtype)
    ray_directions = (1.0 - m) * dirs + m * world_dirs
    world_origins = jnp.broadcast_to(c2w[:3, -1], ray_directions.shape)
    ray_origins = m * world_origins
    return ray_origins, ray_directions


def ndc_rays(height: int, width: int, focal, near: float,
             rays_o: jnp.ndarray, rays_d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Standard NeRF NDC warp (reference nerf_helpers.py:362-391). Off by
    default in every shipped config (``no_ndc: True``)."""
    if not hasattr(focal, "__len__"):
        focal = (focal, focal)
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d
    o0 = -1.0 / (width / (2.0 * focal[0])) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (height / (2.0 * focal[1])) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (width / (2.0 * focal[0])) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (height / (2.0 * focal[1])) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]
    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def rot_to_euler(R: jnp.ndarray) -> jnp.ndarray:
    """(B,3,3) rotation -> (B,3) euler-ish angles; exact formula parity with
    reference models.py:482-498 (note the reference's unusual axis choices)."""
    e2 = jnp.arctan2(R[:, 0, 0], -R[:, 0, 1])
    e1 = jnp.arcsin(-R[:, 0, 2])
    e0 = jnp.arctan2(R[:, 2, 2], R[:, 1, 2])
    return jnp.stack([e0, e1, e2], axis=-1)


def pose_to_euler_trans(poses: jnp.ndarray) -> jnp.ndarray:
    """(B,3,4) or (B,4,4) pose -> (B,6) [euler(3), trans(3)]
    (reference models.py:501-504)."""
    e = rot_to_euler(poses)
    t = poses[:, :3, 3]
    return jnp.concatenate([e, t], axis=1)


def so3_exponential_map(log_rot: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rodrigues' formula; pure-JAX replacement for the single pytorch3d CUDA
    call in the reference (nerf_helpers.py:287). (B,3) axis-angle -> (B,3,3)."""
    theta2 = jnp.sum(log_rot * log_rot, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, eps))
    k = log_rot / theta
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zeros = jnp.zeros_like(kx)
    K = jnp.stack([
        jnp.stack([zeros, -kz, ky], axis=-1),
        jnp.stack([kz, zeros, -kx], axis=-1),
        jnp.stack([-ky, kx, zeros], axis=-1),
    ], axis=-2)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=log_rot.dtype), K.shape)
    return eye + s * K + (1.0 - c) * (K @ K)
