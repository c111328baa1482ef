"""Fused Pallas backward kernel for the trilinear 3-D grid sample.

Replaces the XLA backward of ops/grid.py (reference semantics:
torch F.grid_sample(..., align_corners=True, padding_mode='zeros') on the
(C, D, H, W) spatial-embedding grid, reference models.py:346-365) for the
production 32^3 x 32ch grid:

  - dGrid: the scatter-free factorized contraction
    dG[(z,y),(x,c)] = sum_p (Az (x) Ay)[p,zy] (Ax (x) g)[p,xc]
    with BOTH rank-1 expansions built IN VMEM from the raw coords and the
    (TILE, DH)/(TILE, WC) blocks consumed by the MXU straight from VMEM —
    the two (P, 1024) expansion matrices never exist in HBM (the XLA
    version materializes ~1 GB of them per fine level).
  - dCoords: the analytic corner-difference form from the stashed packed
    corner rows (one VPU pass; the XLA version chains ~24 lane-padded
    (P,1) ops = ~3 GB of HBM traffic).

Both cotangents come out of ONE kernel pass over the points.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field_mlp import _interpret, _rup


def _axis_weight_tile(c, n, f32):
    """(T, 1) coords in [-1,1] -> (A (T, n), i0 (T, 1), f (T, 1), band).
    A[p, k] = (k == i0) (1-f) + (k == i0+1) f  — per-corner zeros padding
    (grid.py:_axis_weights)."""
    i = (c.astype(f32) + 1.0) * 0.5 * (n - 1)
    i0 = jnp.floor(i)
    f = i - i0
    # Mosaic's tpu.iota only produces integers (f32 iota fails verification
    # on-chip even though interpret mode accepts it)
    idx = jax.lax.broadcasted_iota(jnp.int32, (c.shape[0], n), 1).astype(f32)
    A = (jnp.where(idx == i0, 1.0 - f, 0.0)
         + jnp.where(idx == i0 + 1, f, 0.0))
    band = (i0 >= -1) & (i0 <= n - 1)
    return A, f, band


def _expand_cols(col_mat, rhs, n_cols):
    """rows (T, n_cols) x rhs (T, m) -> (T, n_cols*m) with
    out[:, k*m:(k+1)*m] = col_mat[:, k:k+1] * rhs  (rank-1 row expansion)."""
    pieces = [col_mat[:, k:k + 1] * rhs for k in range(n_cols)]
    return jnp.concatenate(pieces, axis=-1)


def _expand_cols_mxu(col_mat, rhs, n_cols, f32):
    """Same rank-1 row expansion, but built by two tiny 0/1 matmuls + one
    multiply instead of an n_cols-piece lane concat (Mosaic lowers wide
    lane concats as register shuffles; the MXU spread is much cheaper).
    out = (col_mat @ SPREAD) * (rhs @ TILEM) where
    SPREAD (n_cols, n_cols*m) repeats column k over lanes [k*m,(k+1)*m) and
    TILEM (m, n_cols*m) tiles rhs n_cols times."""
    m = rhs.shape[-1]
    lanes = n_cols * m
    col_id = jax.lax.broadcasted_iota(jnp.int32, (n_cols, lanes), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (n_cols, lanes), 1)
    spread = (lane_id // m == col_id).astype(col_mat.dtype)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (m, lanes), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (m, lanes), 1)
    tilem = (lane2 % m == row_id).astype(rhs.dtype)
    # 0/1 matrices are exact in bf16; bf16 operands + DEFAULT keep the MXU
    # on its fast path. f32 operands need HIGHEST (DEFAULT would round the
    # copied values to bf16).
    prec = (jax.lax.Precision.DEFAULT if col_mat.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    a = jnp.dot(col_mat, spread.astype(col_mat.dtype),
                preferred_element_type=f32, precision=prec)
    b = jnp.dot(rhs, tilem.astype(rhs.dtype),
                preferred_element_type=f32, precision=prec)
    return a * b


def grid_bwd_kernel_ok(grid_shape, n_points: int) -> bool:
    """The fused kernel targets the production spatial-embedding grid
    (fields.py: 32ch x 32^3); other shapes use the XLA fallback."""
    C, D, H, W = grid_shape
    return (C, D, H, W) == (32, 32, 32, 32) and n_points >= 8


def slab_kernel_ok(grid_shape) -> bool:
    """Eligibility of the z-slab-predicated dGrid kernels: the FULL
    (D*H, W*C) f32 dG block stays VMEM-resident across the grid, so a
    larger spatial-embedding config would fail deep in Mosaic with an
    obscure VMEM error rather than fall back. Callers (field_grid.py,
    train/fused.py) must route ineligible shapes to the XLA dense
    contraction (ops/grid._grid_cotangent)."""
    C, D, H, W = grid_shape
    vmem_block = D * H * W * C * 4          # f32 dG accumulator
    return (D % 4 == 0 and (W * C) % 128 == 0
            and vmem_block <= 48 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("grid_shape", "compute_dtype"))
def grid_dg_slab(grid_shape, coords: jnp.ndarray, g: jnp.ndarray,
                 compute_dtype: str = "bfloat16") -> jnp.ndarray:
    """dGrid only, via a z-slab-PREDICATED factorized contraction.

    The dense contraction dG[(z,y),(x,c)] = sum_p (Az⊗Ay)[p] (Ax⊗g)[p]
    pays P·DH·WC FLOPs (~550 GF at the fine level) although each point
    touches only 2 z-rows. This kernel loops over D/4 groups of 4 z-rows;
    a group's (128, WC) contribution is computed ONLY when the tile's
    [min_i0z, max_i0z + 1] span intersects it (`@pl.when`), so the cost
    scales with the tile's actual z-extent, not D.

    The caller should pass points in SAMPLE-MAJOR order (all rays' sample
    s adjacent): per-step rays share one camera, so same-sample points
    share depth and each tile spans ~1-2 z-slabs (~16x fewer MACs).
    Correctness never depends on the order — an adversarial order just
    degrades to the dense cost.

    coords (P, >=3) raw [-1,1] xyz; g (P, C) cotangent of the sampled
    features -> dG (C, D, H, W) f32. Reference semantics: backward of
    torch F.grid_sample(align_corners=True, padding_mode='zeros')
    (models.py:346-365)."""
    C, D, H, W = grid_shape
    assert D % 4 == 0
    P = coords.shape[0]
    f32 = jnp.float32
    bf16_mm = compute_dtype == "bfloat16"
    tile = 1024
    Pp = _rup(P, tile)
    cw = 8
    cp = jnp.pad(coords[:, :3].astype(f32), ((0, Pp - P), (0, cw - 3)))
    gp = jnp.pad(g.astype(f32), ((0, Pp - P), (0, 0)))
    # padding rows land in no z-row: fz=0, i0z=floor of (0+1)*.5*(D-1)...
    # give them coords far outside the band instead
    if Pp > P:
        cp = cp.at[P:, :3].set(99.0)
    DH, WC = D * H, W * C
    n_tiles = Pp // tile

    def kernel(c_ref, g_ref, dg_ref):
        t = pl.program_id(0)
        cx = c_ref[:, 0:1]
        cy = c_ref[:, 1:2]
        cz = c_ref[:, 2:3]
        Ax, _, _ = _axis_weight_tile(cx, W, f32)
        Ay, _, _ = _axis_weight_tile(cy, H, f32)
        iz = (cz.astype(f32) + 1.0) * 0.5 * (D - 1)
        i0z = jnp.floor(iz)
        fz = iz - i0z
        gt = g_ref[:]
        mdt = jnp.bfloat16 if bf16_mm else f32
        t2 = _expand_cols_mxu(Ax.astype(mdt), gt.astype(mdt), W,
                              f32).astype(mdt)  # (T, WC)
        Ay = Ay.astype(mdt)

        @pl.when(t == 0)
        def _init():
            dg_ref[:] = jnp.zeros_like(dg_ref)

        # contributing z-rows of this tile: [lo, hi] (clipped to [0, D-1]);
        # out-of-band points (i0z < -1 or > D-1) produce no contribution
        # through the i0z==k / i0z==k-1 matches below, and their absurd
        # i0z values must not widen the span — mask them out of the
        # reductions entirely.
        in_band = (i0z >= -1) & (i0z <= D - 1)
        lo_all = jnp.where(in_band, i0z, D + 99.0)
        hi_all = jnp.where(in_band, i0z + 1.0, -99.0)
        lo = jnp.min(lo_all)
        hi = jnp.max(hi_all)

        for kgrp in range(D // 4):
            z0 = 4 * kgrp

            @pl.when((hi >= z0) & (lo <= z0 + 3))
            def _():
                # Az columns for z-rows z0..z0+3: (T, 4)
                idx = (jax.lax.broadcasted_iota(jnp.int32, (tile, 4), 1)
                       .astype(f32) + z0)
                Azg = (jnp.where(idx == i0z, 1.0 - fz, 0.0)
                       + jnp.where(idx == i0z + 1.0, fz, 0.0))
                t1 = _expand_cols_mxu(Azg.astype(mdt), Ay, 4,
                                      f32).astype(mdt)   # (T, 4H)
                contrib = jax.lax.dot_general(
                    t1, t2, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=(jax.lax.Precision.DEFAULT if bf16_mm
                               else jax.lax.Precision.HIGHEST))
                dg_ref[z0 * H:(z0 + 4) * H, :] += contrib

    dg = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, cw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((DH, WC), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((DH, WC), f32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(cp, gp)
    return dg.reshape(D, H, W, C).transpose(3, 0, 1, 2)


@functools.partial(jax.jit, static_argnames=("grid_shape", "compute_dtype"))
def grid_dg_slab_packed(grid_shape, packed: jnp.ndarray,
                        compute_dtype: str = "bfloat16",
                        packed2=None) -> jnp.ndarray:
    """grid_dg_slab on ONE packed input emitted by the train-level kernel
    (ops/pallas/level_train.py): packed (P, 64) rows
    [x_hi(3) | x_lo(3) | x_lo2(3) | gse(C=32) | pad]. Coords reconstruct
    as hi + lo + lo2 — a 3-level bf16 split carrying 24 mantissa bits, so
    the cell geometry matches the f32 coords to below half an f32 ulp (in
    f32 mode the lo/lo2 columns are zero and hi is the native f32 coord,
    exact). Halves the slab's input traffic and removes
    the separate (P, 3) f32 sample-major transpose (lane-padded to 128,
    ~1.4 ms/step) from the hot path. Same contraction + z-slab predication
    as grid_dg_slab.

    packed may instead be RAY-major 3-D (R, S, 64): when the shapes tile
    evenly the kernel DMAs sample-coherent (ray-block, one-or-few-samples)
    blocks via a 3-D BlockSpec — same z-slab predication win as the
    sample-major transpose, without materializing the transposed copy
    (~0.2 ms/step at fine counts).

    packed2: optional second input of the same shape whose gse block is
    added IN-kernel (cell geometry is read from `packed` alone, so no
    channel masking is needed) — the fused train path's coarse-slot
    scatter addend skips an XLA add's extra HBM round trip."""
    C, D, H, W = grid_shape
    assert D % 4 == 0 and C == 32 and packed.shape[-1] == 64
    f32 = jnp.float32
    bf16_mm = compute_dtype == "bfloat16"
    tile = 1024
    DH, WC = D * H, W * C

    threed = packed.ndim == 3
    if threed:
        R, S = packed.shape[0], packed.shape[1]
        P = R * S
        # Mosaic block rule: last two block dims divisible by (8, 128) or
        # equal to the array dims -> blocks are (ray-chunk, 8 samples, 64)
        rb = tile // 8
        if S % 8 == 0 and R % rb == 0:
            blk = (rb, 8, 64)
            nr = R // rb
            n_tiles = nr * (S // 8)
            index_map = lambda i: (i % nr, i // nr, 0)
        else:       # irregular test shapes: transpose fallback
            from .field_grid import _sample_major
            sm = _sample_major(packed.reshape(P, 64), R, S)
            sm2 = (_sample_major(packed2.reshape(P, 64), R, S)
                   if packed2 is not None else None)
            return grid_dg_slab_packed(grid_shape, sm, compute_dtype,
                                       packed2=sm2)
        pp = packed
    else:
        P = packed.shape[0]
        Pp = _rup(P, tile)
        # zero padding rows: coords 0 are in-band but their gse is 0, so
        # they contribute exactly nothing to the contraction
        pp = jnp.pad(packed, ((0, Pp - P), (0, 0)))
        if packed2 is not None:
            packed2 = jnp.pad(packed2, ((0, Pp - P), (0, 0)))
        n_tiles = Pp // tile
        blk = (tile, 64)
        index_map = lambda i: (i, 0)

    def kernel(p_ref, *rest):
        p2_ref = rest[0] if packed2 is not None else None
        dg_ref = rest[-1]
        t = pl.program_id(0)
        pk = p_ref[:].reshape(tile, 64)
        cx = (pk[:, 0:1].astype(f32) + pk[:, 3:4].astype(f32)
              + pk[:, 6:7].astype(f32))
        cy = (pk[:, 1:2].astype(f32) + pk[:, 4:5].astype(f32)
              + pk[:, 7:8].astype(f32))
        cz = (pk[:, 2:3].astype(f32) + pk[:, 5:6].astype(f32)
              + pk[:, 8:9].astype(f32))
        gt = pk[:, 9:9 + C].astype(f32)
        if p2_ref is not None:
            gt = gt + p2_ref[:].reshape(tile, 64)[:, 9:9 + C].astype(f32)
        Ax, _, _ = _axis_weight_tile(cx, W, f32)
        Ay, _, _ = _axis_weight_tile(cy, H, f32)
        iz = (cz + 1.0) * 0.5 * (D - 1)
        i0z = jnp.floor(iz)
        fz = iz - i0z
        mdt = jnp.bfloat16 if bf16_mm else f32
        t2 = _expand_cols_mxu(Ax.astype(mdt), gt.astype(mdt), W,
                              f32).astype(mdt)  # (T, WC)
        Ay = Ay.astype(mdt)

        @pl.when(t == 0)
        def _init():
            dg_ref[:] = jnp.zeros_like(dg_ref)

        in_band = (i0z >= -1) & (i0z <= D - 1)
        lo_all = jnp.where(in_band, i0z, D + 99.0)
        hi_all = jnp.where(in_band, i0z + 1.0, -99.0)
        lo = jnp.min(lo_all)
        hi = jnp.max(hi_all)

        for kgrp in range(D // 4):
            z0 = 4 * kgrp

            @pl.when((hi >= z0) & (lo <= z0 + 3))
            def _():
                idx = (jax.lax.broadcasted_iota(jnp.int32, (tile, 4), 1)
                       .astype(f32) + z0)
                Azg = (jnp.where(idx == i0z, 1.0 - fz, 0.0)
                       + jnp.where(idx == i0z + 1.0, fz, 0.0))
                t1 = _expand_cols_mxu(Azg.astype(mdt), Ay, 4,
                                      f32).astype(mdt)   # (T, 4H)
                contrib = jax.lax.dot_general(
                    t1, t2, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=(jax.lax.Precision.DEFAULT if bf16_mm
                               else jax.lax.Precision.HIGHEST))
                dg_ref[z0 * H:(z0 + 4) * H, :] += contrib

    ins = [pp] if packed2 is None else [pp, packed2]
    dg = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(blk, index_map,
                               memory_space=pltpu.VMEM)] * len(ins),
        out_specs=pl.BlockSpec((DH, WC), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((DH, WC), f32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*ins)
    return dg.reshape(D, H, W, C).transpose(3, 0, 1, 2)


@functools.partial(jax.jit, static_argnames=("grid_shape", "compute_dtype"))
def grid_bwd_fused(grid_shape, coords: jnp.ndarray, g: jnp.ndarray,
                   vals: jnp.ndarray, compute_dtype: str = "float32"):
    """coords (P, >=3) raw [-1,1] xyz (extra lanes ignored), g (P, C)
    cotangent of the sampled features, vals (P, 8C) stashed packed corner
    rows -> (dG (C, D, H, W) f32, dcoords (P, 3) f32)."""
    C, D, H, W = grid_shape
    P = coords.shape[0]
    f32 = jnp.float32
    bf16_mm = compute_dtype == "bfloat16"
    tile = 1024 if bf16_mm else 512

    Pp = _rup(P, tile)
    cw = 8
    cp = coords[:, :3].astype(f32)
    cp = jnp.pad(cp, ((0, Pp - P), (0, cw - 3)))
    gp = jnp.pad(g.astype(f32), ((0, Pp - P), (0, 0)))
    vp = jnp.pad(vals, ((0, Pp - P), (0, 0))).astype(f32)

    DH, WC = D * H, W * C
    n_tiles = Pp // tile

    def kernel(c_ref, g_ref, v_ref, dg_ref, dc_ref):
        i = pl.program_id(0)
        cx = c_ref[:, 0:1]
        cy = c_ref[:, 1:2]
        cz = c_ref[:, 2:3]
        Ax, fx, bx = _axis_weight_tile(cx, W, f32)
        Ay, fy, by = _axis_weight_tile(cy, H, f32)
        Az, fz, bz = _axis_weight_tile(cz, D, f32)
        gt = g_ref[:]

        # ---- dG: acc[(z,y),(x,c)] += t1^T @ t2 --------------------------
        mdt = jnp.bfloat16 if bf16_mm else f32
        t1 = _expand_cols_mxu(Az.astype(mdt), Ay.astype(mdt), D,
                              f32).astype(mdt)  # (T, DH)
        t2 = _expand_cols_mxu(Ax.astype(mdt), gt.astype(mdt), W,
                              f32).astype(mdt)  # (T, WC)
        contrib = jax.lax.dot_general(
            t1, t2, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=(jax.lax.Precision.DEFAULT if bf16_mm
                       else jax.lax.Precision.HIGHEST))

        @pl.when(i == 0)
        def _init():
            dg_ref[:] = jnp.zeros_like(dg_ref)

        dg_ref[:] += contrib

        # ---- dCoords: analytic corner differences (grid.py:_grid_sample_bwd)
        v = v_ref[:]
        okf = (bx & by & bz).astype(f32)
        dfx = jnp.zeros_like(fx)
        dfy = jnp.zeros_like(fy)
        dfz = jnp.zeros_like(fz)
        for s in range(8):
            dz_, dy_, dx_ = (s >> 2) & 1, (s >> 1) & 1, s & 1
            gv = jnp.sum(gt * v[:, s * C:(s + 1) * C], axis=-1,
                         keepdims=True)
            wz = fz if dz_ else 1.0 - fz
            wy = fy if dy_ else 1.0 - fy
            wx = fx if dx_ else 1.0 - fx
            dfx = dfx + (1.0 if dx_ else -1.0) * wz * wy * gv
            dfy = dfy + (1.0 if dy_ else -1.0) * wz * wx * gv
            dfz = dfz + (1.0 if dz_ else -1.0) * wy * wx * gv
        dc = jnp.concatenate(
            [dfx * okf * (0.5 * (W - 1)),
             dfy * okf * (0.5 * (H - 1)),
             dfz * okf * (0.5 * (D - 1)),
             jnp.zeros((tile, cw - 3), f32)], axis=-1)
        dc_ref[:] = dc

    dg, dc = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, cw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 8 * C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((DH, WC), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((DH, WC), f32),
                   jax.ShapeDtypeStruct((Pp, cw), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(cp, gp, vp)

    dG = dg.reshape(D, H, W, C).transpose(3, 0, 1, 2)
    return dG, dc[:P, :3]
