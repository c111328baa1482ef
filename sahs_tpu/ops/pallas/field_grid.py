"""Grid-coupled NeRF kernels: one differentiable op spanning
corner-gather -> fused NeRF MLP (-> in-kernel compositing).

Why a spanning custom_vjp: the spatial-embedding trilinear sample
(reference torch F.grid_sample on the 32ch x 32^3 grid, models.py:346-365)
decomposes TPU-natively as

  fwd:  rows  = cell geometry of the warped coords          (XLA, cheap)
        corners = one aligned row-gather of the packed
                  corner table                               (XLA gather)
        se    = trilinear interp from the corner rows        (IN-kernel)
  bwd:  dSE -> dCoords: corner differences                   (IN-kernel,
        folded into the packed gx)
        dSE -> dGrid: z-slab-predicated factorized
        contraction on SAMPLE-major points                   (grid_dg_slab)

Neither half matches a per-array custom_vjp boundary (the kernel emits the
SE cotangent, not a corner cotangent), so grid+MLP differentiate as one op.
This removes the XLA interp chain, the separate (P, C) se array, and the
dense 550-GFLOP dGrid contraction from the hot path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..grid import _cell_geometry, pack_corner_table
from .field_mlp import (PESpec, _rayd_spec_of, fold_conditioning,
                        fold_skip_conditioning, nerf_level_forward,
                        nerf_level_vjp, nerf_rayd_forward, nerf_rayd_vjp)
from .grid_bwd import grid_dg_slab

import os

_PACK_GATHER = os.environ.get("SAHS_PACK_GATHER", "0") == "1"


def gather_corners(grid: jnp.ndarray, coords: jnp.ndarray,
                   compute_dtype: str) -> jnp.ndarray:
    """(C, D, H, W) grid + (P, >=3) warped coords -> (P, 8C) packed corner
    rows (ops/grid.py corner-packed layout; bf16 gather in bf16 mode).

    SAHS_PACK_GATHER=1 gathers bf16 rows as f32 LANE PAIRS (bitcast, no
    value change) on the theory that XLA's TPU gather cost scales with
    element count. Re-ablated in r5 ISOLATION (it shipped in r4 only
    inside a net-negative trio, commit efa276a): measured 39.5 vs
    34.5 ms/step — the (N, L/2, 2) bitcast reshapes cost far more than
    the gather saves — so the default is OFF. rows are already clipped
    into the table by _cell_geometry; mode="clip" (vs the default
    "fill") drops XLA's out-of-bounds predicate + select over the
    gathered block."""
    gdt = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    table = pack_corner_table(grid, gather_dtype=gdt)
    rows, _, _ = _cell_geometry(coords, grid.shape[1:])
    if gdt is not None and _PACK_GATHER and table.shape[1] % 2 == 0:
        N, L = table.shape
        packed = jax.lax.bitcast_convert_type(
            table.reshape(N, L // 2, 2), jnp.float32)
        out = jnp.take(packed, rows, axis=0, mode="clip")
        return jax.lax.bitcast_convert_type(out, jnp.bfloat16).reshape(
            rows.shape[0], L)
    return jnp.take(table, rows, axis=0, mode="clip")


def gather_corners_from_rows(grid: jnp.ndarray, rows_f: jnp.ndarray,
                             compute_dtype: str) -> jnp.ndarray:
    """gather_corners with the table rows already computed (as exact-int
    f32, the pair kernel's emit_rows output — see
    field_mlp.deform_pair_forward): skips the XLA cell-geometry fusion
    that strided-reads 3 lanes of the physically 128-lane-padded packed
    array (~0.5 ms/step at fine counts)."""
    gdt = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    table = pack_corner_table(grid, gather_dtype=gdt)
    rows = rows_f.reshape(-1).astype(jnp.int32)
    return jnp.take(table, rows, axis=0, mode="clip")


def _sample_major(x: jnp.ndarray, R: int, S: int) -> jnp.ndarray:
    """(R*S, k) ray-major -> sample-major: all rays' sample s adjacent.
    Same-sample points share depth (one camera per step), so the slab-dG
    kernel's tiles stay z-coherent."""
    return x.reshape(R, S, x.shape[-1]).transpose(1, 0, 2).reshape(
        R * S, x.shape[-1])


def _grid_dg(grid_shape, coords: jnp.ndarray, gse: jnp.ndarray,
             compute_dtype: str) -> jnp.ndarray:
    """dGrid dispatch: the z-slab kernel when the full (D*H, W*C) f32 dG
    block fits VMEM (slab_kernel_ok), else the XLA dense factorized
    contraction — a larger spatial-embedding config must degrade to the
    slow path, not die in Mosaic VMEM allocation."""
    from .grid_bwd import slab_kernel_ok
    if slab_kernel_ok(grid_shape):
        return grid_dg_slab(grid_shape, coords, gse, compute_dtype)
    from ..grid import _grid_cotangent
    mdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    return _grid_cotangent(grid_shape, coords, gse, mdt)


def _grid_spec(num_layers, skip_every, pe_dim, samples, compute_dtype,
               dir_raw, grid_shape, params):
    spec, hidden = _rayd_spec_of(num_layers, skip_every, pe_dim, dir_raw,
                                 grid_shape[0], samples, compute_dtype,
                                 params)
    import dataclasses
    spec = dataclasses.replace(spec, corner_interp=True,
                               grid_dims=tuple(grid_shape[1:]))
    return spec, hidden


def _fold(params, cond, pe_dim, skip_every, hidden):
    trunk = fold_conditioning(params["trunk"], cond, pe_dim)
    trunk = fold_skip_conditioning(hidden, trunk, skip_every, cond, pe_dim)
    p2 = dict(params)
    p2["trunk"] = trunk
    return p2


# ---------------------------------------------------------------------------
# Raw-field variant (separate XLA compositing downstream)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _nerf_rayd_grid(num_layers, skip_every, pe_dim, samples, compute_dtype,
                    pe_spec, dir_pe_spec, grid_shape,
                    params, grid, pts_raw, dirs_ray, cond):
    spec, hidden = _grid_spec(num_layers, skip_every, pe_dim, samples,
                              compute_dtype, dir_pe_spec.raw_out, grid_shape,
                              params)
    p2 = _fold(params, cond, pe_dim, skip_every, hidden)
    corners = gather_corners(grid, pts_raw, compute_dtype)
    return nerf_rayd_forward(spec, pts_raw, dirs_ray, corners, p2,
                             pe_spec, dir_pe_spec)


def _nerf_rayd_grid_fwd(num_layers, skip_every, pe_dim, samples,
                        compute_dtype, pe_spec, dir_pe_spec, grid_shape,
                        params, grid, pts_raw, dirs_ray, cond):
    spec, hidden = _grid_spec(num_layers, skip_every, pe_dim, samples,
                              compute_dtype, dir_pe_spec.raw_out, grid_shape,
                              params)
    p2 = _fold(params, cond, pe_dim, skip_every, hidden)
    corners = gather_corners(grid, pts_raw, compute_dtype)
    y = nerf_rayd_forward(spec, pts_raw, dirs_ray, corners, p2,
                          pe_spec, dir_pe_spec)
    return y, (params, pts_raw, dirs_ray, cond, corners)


def _nerf_rayd_grid_bwd(num_layers, skip_every, pe_dim, samples,
                        compute_dtype, pe_spec, dir_pe_spec, grid_shape,
                        res, g):
    from .field_mlp import _unfold_cond_grads
    params, pts_raw, dirs_ray, cond, corners = res
    spec, hidden = _grid_spec(num_layers, skip_every, pe_dim, samples,
                              compute_dtype, dir_pe_spec.raw_out, grid_shape,
                              params)
    p2 = _fold(params, cond, pe_dim, skip_every, hidden)
    gx, gse, grads_folded = nerf_rayd_vjp(spec, pts_raw, dirs_ray, corners,
                                          p2, g, pe_spec, dir_pe_spec)
    trunk_grads, dcond = _unfold_cond_grads(params["trunk"],
                                            grads_folded["trunk"], cond,
                                            skip_every, hidden, pe_dim)
    grads = dict(grads_folded)
    grads["trunk"] = trunk_grads
    R = dirs_ray.shape[0]
    dG = _grid_dg(grid_shape, _sample_major(pts_raw[:, :3], R, samples),
                  _sample_major(gse, R, samples), compute_dtype)
    return (grads, dG, gx, jnp.zeros_like(dirs_ray), dcond)


_nerf_rayd_grid.defvjp(_nerf_rayd_grid_fwd, _nerf_rayd_grid_bwd)


def nerf_mlp_apply_rayd_grid(params, grid, num_layers: int, skip_every: int,
                             pts_raw: jnp.ndarray, dirs_ray: jnp.ndarray,
                             samples: int, cond: jnp.ndarray,
                             compute_dtype: str = "bfloat16",
                             pe_spec: PESpec = None,
                             dir_pe_spec: PESpec = None) -> jnp.ndarray:
    """Fused NeRF MLP with the spatial-embedding sample folded in:
    pts_raw (P, >=3) packed [warped | ambient]; grid (C, D, H, W).
    Returns (P, 16) raw field; differentiable wrt params, grid, pts_raw,
    cond."""
    return _nerf_rayd_grid(num_layers, skip_every, pe_spec.raw_out, samples,
                           compute_dtype, pe_spec, dir_pe_spec, grid.shape,
                           params, grid, pts_raw, dirs_ray, cond)


# ---------------------------------------------------------------------------
# Fully-fused level variant (in-kernel volume compositing)
# ---------------------------------------------------------------------------

def _gather(grid, pts_raw, rows, compute_dtype):
    if rows is not None:
        return gather_corners_from_rows(grid, rows, compute_dtype)
    return gather_corners(grid, pts_raw, compute_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _nerf_level_grid(num_layers, skip_every, pe_dim, samples, compute_dtype,
                     pe_spec, dir_pe_spec, grid_shape,
                     params, grid, pts_raw, dirs_ray, z, bg, noise, cond,
                     rows):
    spec, hidden = _grid_spec(num_layers, skip_every, pe_dim, samples,
                              compute_dtype, dir_pe_spec.raw_out, grid_shape,
                              params)
    p2 = _fold(params, cond, pe_dim, skip_every, hidden)
    corners = _gather(grid, pts_raw, rows, compute_dtype)
    return nerf_level_forward(spec, pts_raw, dirs_ray, corners, z, bg,
                              noise, p2, pe_spec, dir_pe_spec)


def _nerf_level_grid_fwd(num_layers, skip_every, pe_dim, samples,
                         compute_dtype, pe_spec, dir_pe_spec, grid_shape,
                         params, grid, pts_raw, dirs_ray, z, bg, noise,
                         cond, rows):
    spec, hidden = _grid_spec(num_layers, skip_every, pe_dim, samples,
                              compute_dtype, dir_pe_spec.raw_out, grid_shape,
                              params)
    p2 = _fold(params, cond, pe_dim, skip_every, hidden)
    corners = _gather(grid, pts_raw, rows, compute_dtype)
    y = nerf_level_forward(spec, pts_raw, dirs_ray, corners, z, bg, noise,
                           p2, pe_spec, dir_pe_spec)
    return y, (params, pts_raw, dirs_ray, z, bg, noise, cond, corners,
               rows)


def _nerf_level_grid_bwd(num_layers, skip_every, pe_dim, samples,
                         compute_dtype, pe_spec, dir_pe_spec, grid_shape,
                         res, gs):
    from .field_mlp import _unfold_cond_grads
    params, pts_raw, dirs_ray, z, bg, noise, cond, corners, rows = res
    g_rgb, g_w = gs
    spec, hidden = _grid_spec(num_layers, skip_every, pe_dim, samples,
                              compute_dtype, dir_pe_spec.raw_out, grid_shape,
                              params)
    p2 = _fold(params, cond, pe_dim, skip_every, hidden)
    gx, gse, g_bg, grads_folded = nerf_level_vjp(
        spec, pts_raw, dirs_ray, corners, z, bg, noise, p2, g_rgb, g_w,
        pe_spec, dir_pe_spec)
    trunk_grads, dcond = _unfold_cond_grads(params["trunk"],
                                            grads_folded["trunk"], cond,
                                            skip_every, hidden, pe_dim)
    grads = dict(grads_folded)
    grads["trunk"] = trunk_grads
    R = dirs_ray.shape[0]
    dG = _grid_dg(grid_shape, _sample_major(pts_raw[:, :3], R, samples),
                  _sample_major(gse, R, samples), compute_dtype)
    if g_bg is None and bg is not None:
        g_bg = jnp.zeros_like(bg)
    g_noise = jnp.zeros_like(noise) if noise is not None else None
    g_rows = jnp.zeros_like(rows) if rows is not None else None
    return (grads, dG, gx, jnp.zeros_like(dirs_ray),
            jnp.zeros_like(z), g_bg, g_noise, dcond, g_rows)


_nerf_level_grid.defvjp(_nerf_level_grid_fwd, _nerf_level_grid_bwd)


def nerf_render_level_grid(params, grid, num_layers: int, skip_every: int,
                           pts_raw: jnp.ndarray, dirs_ray: jnp.ndarray,
                           samples: int, z: jnp.ndarray, bg, noise,
                           cond: jnp.ndarray,
                           compute_dtype: str = "bfloat16",
                           pe_spec: PESpec = None,
                           dir_pe_spec: PESpec = None, rows=None):
    """Fully-fused level with the spatial-embedding sample folded in:
    NeRF MLP + trilinear interp + volume compositing in one kernel pass.
    Returns (rgb_map (R, 16), weights (R, S)); differentiable wrt params,
    grid, pts_raw, bg, cond. rows: optional kernel-emitted corner-table
    rows (gradient-free; see gather_corners_from_rows)."""
    return _nerf_level_grid(num_layers, skip_every, pe_spec.raw_out, samples,
                            compute_dtype, pe_spec, dir_pe_spec, grid.shape,
                            params, grid, pts_raw, dirs_ray, z, bg, noise,
                            cond, rows)
