"""Trilinear 3-D feature-grid sampling (TPU-native fast paths).

Replaces torch ``F.grid_sample(..., mode='bilinear', padding_mode='zeros',
align_corners=True)`` on a 5-D grid as used by the learnable spatial
embedding (reference nerf-pytorch/nerf/models.py:346-365). Coordinate
convention parity with PyTorch:

  - coords in [-1, 1], last-dim order (x, y, z) indexing the grid's
    (W, H, D) axes respectively, for a grid stored as (C, D, H, W);
  - align_corners=True:   i = (c + 1) / 2 * (dim - 1);
  - zeros padding: out-of-range corners contribute 0.

TPU design (measured on v5e):
  - FORWARD — "corner-packed" gather: the grid is zero-border-padded and
    re-laid-out once per step into a table whose row ``(z, y, x)`` holds all
    8 corner values of that base cell (8*C lanes). Sampling is then ONE
    aligned row-gather per point instead of 8 scattered ones (~3x faster;
    XLA's TPU gather cost scales with the number of gathered rows). The
    zero border materializes the zeros-padding rule in the values, so no
    per-corner masks are needed — only a per-point in-band predicate.
  - BACKWARD wrt grid — scatter-free factorized MXU contraction
    dG = (Az (x) Ay)^T @ (Ax (x) g), ~25x faster than TPU scatter-add.
  - BACKWARD wrt coords — analytic from one re-gather of the packed row
    (d out/d f_axis is a difference of corner values), no autodiff
    re-materialization.

Fully differentiable w.r.t. both the grid and the coordinates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _grid_sample_3d_impl(grid: jnp.ndarray, coords: jnp.ndarray,
                         gather_dtype=None) -> jnp.ndarray:
    """Reference 8-gather implementation (oracle path; kept for parity
    tests and as the adjoint-of-coords oracle).
    grid: (C, D, H, W); coords: (..., 3) in [-1, 1] as (x, y, z).
    Returns (..., C)."""
    C, D, H, W = grid.shape
    shape = coords.shape[:-1]
    coords = coords.reshape(-1, 3)

    ix = (coords[:, 0] + 1.0) * 0.5 * (W - 1)
    iy = (coords[:, 1] + 1.0) * 0.5 * (H - 1)
    iz = (coords[:, 2] + 1.0) * 0.5 * (D - 1)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    iz0 = jnp.floor(iz)
    fx = ix - ix0
    fy = iy - iy0
    fz = iz - iz0

    # (C, D, H, W) -> (D*H*W, C) table for row gathers.
    table = grid.reshape(C, -1).T
    if gather_dtype is not None:
        table = table.astype(gather_dtype)

    out = None
    for dz in (0, 1):
        wz = jnp.where(dz == 1, fz, 1.0 - fz)
        z_i = iz0 + dz
        z_ok = (z_i >= 0) & (z_i <= D - 1)
        for dy in (0, 1):
            wy = jnp.where(dy == 1, fy, 1.0 - fy)
            y_i = iy0 + dy
            y_ok = (y_i >= 0) & (y_i <= H - 1)
            for dx in (0, 1):
                wx = jnp.where(dx == 1, fx, 1.0 - fx)
                x_i = ix0 + dx
                x_ok = (x_i >= 0) & (x_i <= W - 1)
                ok = z_ok & y_ok & x_ok
                flat = (jnp.clip(z_i, 0, D - 1) * H
                        + jnp.clip(y_i, 0, H - 1)) * W + jnp.clip(x_i, 0, W - 1)
                vals = jnp.take(table, flat.astype(jnp.int32), axis=0)
                w = (wz * wy * wx * ok.astype(grid.dtype))[:, None]
                contrib = vals * w
                out = contrib if out is None else out + contrib
    return out.reshape(shape + (C,))


# ---------------------------------------------------------------------------
# Corner-packed fast path
# ---------------------------------------------------------------------------

def pack_corner_table(grid: jnp.ndarray, gather_dtype=None) -> jnp.ndarray:
    """(C, D, H, W) -> ((D+1)*(H+1)*(W+1), 8*C) packed-corner table over the
    zero-border-padded grid. Row (z, y, x) slot (dz*4 + dy*2 + dx)*C + c =
    Gpad[c, z+dz, y+dy, x+dx] with Gpad one zero cell on every side."""
    C, D, H, W = grid.shape
    g = jnp.pad(grid.transpose(1, 2, 3, 0),
                ((1, 1), (1, 1), (1, 1), (0, 0)))  # (D+2, H+2, W+2, C)
    corners = [g[dz:dz + D + 1, dy:dy + H + 1, dx:dx + W + 1]
               for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
    table = jnp.stack(corners, axis=-2)  # (D+1, H+1, W+1, 8, C)
    table = table.reshape((D + 1) * (H + 1) * (W + 1), 8 * C)
    if gather_dtype is not None:
        table = table.astype(gather_dtype)
    return table


def _cell_geometry(coords: jnp.ndarray, dims):
    """coords (P, 3) -> (rows (P,), fracs [fx, fy, fz], in_band (P,)).
    rows index the packed table's base cells (floor+1 per axis, clipped);
    fracs are wrt the true floor; in_band is the all-axes zeros-padding
    predicate (floor in [-1, dim-1])."""
    D, H, W = dims
    fs, bases, ok = [], [], None
    for axis, n in ((0, W), (1, H), (2, D)):
        i = (coords[:, axis] + 1.0) * 0.5 * (n - 1)
        i0 = jnp.floor(i)
        fs.append(i - i0)
        band = (i0 >= -1) & (i0 <= n - 1)
        ok = band if ok is None else (ok & band)
        bases.append(jnp.clip(i0 + 1, 0, n).astype(jnp.int32))
    bx, by, bz = bases
    rows = (bz * (H + 1) + by) * (W + 1) + bx
    return rows, fs, ok


def _packed_weights(fs, ok, dtype):
    """8 per-point scalar weights in slot order (dz, dy, dx)."""
    fx, fy, fz = fs
    okf = ok.astype(dtype)
    ws = []
    for dz in (0, 1):
        wz = fz if dz else 1.0 - fz
        for dy in (0, 1):
            wy = fy if dy else 1.0 - fy
            for dx in (0, 1):
                wx = fx if dx else 1.0 - fx
                ws.append((wz * wy * wx * okf).astype(dtype))
    return ws


def _grid_sample_packed_fwd_impl(table: jnp.ndarray, coords: jnp.ndarray,
                                 dims) -> jnp.ndarray:
    D, H, W = dims
    C = table.shape[1] // 8
    shape = coords.shape[:-1]
    cf = coords.reshape(-1, coords.shape[-1])
    rows, fs, ok = _cell_geometry(cf, dims)
    vals = jnp.take(table, rows, axis=0)          # (P, 8C) one gather
    ws = _packed_weights(fs, ok, jnp.float32)
    out = None
    for s in range(8):
        contrib = vals[:, s * C:(s + 1) * C].astype(jnp.float32) * ws[s][:, None]
        out = contrib if out is None else out + contrib
    return out.reshape(shape + (C,))


def _axis_weights(c: jnp.ndarray, n: int) -> jnp.ndarray:
    """(P,) coords in [-1,1] -> (P, n) dense linear-interp weight rows
    (2 nonzeros per row; out-of-range coords contribute 0 = zeros padding)."""
    i = (c + 1.0) * 0.5 * (n - 1)
    i0 = jnp.floor(i)
    f = i - i0
    idx = jnp.arange(n, dtype=i0.dtype)[None, :]
    w = (jnp.where(idx == i0[:, None], 1.0 - f[:, None], 0.0)
         + jnp.where(idx == i0[:, None] + 1, f[:, None], 0.0))
    # zeros padding: rows whose corners fall outside keep only in-range terms
    return w


def _grid_cotangent(grid_shape, coords, g, mdt):
    """Scatter-free dGrid via two dense MXU contractions:
    dG[c,z,y,x] = sum_p Az[p,z] Ay[p,y] Ax[p,x] g[p,c]
                = reshape( (Az (x) Ay)^T @ (Ax (x) g) )."""
    C, D, H, W = grid_shape
    cf = coords.reshape(-1, coords.shape[-1])
    gf = g.reshape(-1, C)
    P = cf.shape[0]
    az = _axis_weights(cf[:, 2], D)
    ay = _axis_weights(cf[:, 1], H)
    ax = _axis_weights(cf[:, 0], W)
    CHUNK = 65536
    n_chunks = max(1, -(-P // CHUNK))
    pad = n_chunks * CHUNK - P
    azp = jnp.pad(az, ((0, pad), (0, 0))).reshape(n_chunks, CHUNK, D)
    ayp = jnp.pad(ay, ((0, pad), (0, 0))).reshape(n_chunks, CHUNK, H)
    axp = jnp.pad(ax, ((0, pad), (0, 0))).reshape(n_chunks, CHUNK, W)
    gfp = jnp.pad(gf, ((0, pad), (0, 0))).reshape(n_chunks, CHUNK, C)

    def chunk_contrib(args):
        azc, ayc, axc, gc = args
        t1 = (azc[:, :, None] * ayc[:, None, :]).reshape(CHUNK, D * H)
        t2 = (axc[:, :, None] * gc[:, None, :]).reshape(CHUNK, W * C)
        return jnp.dot(t1.T.astype(mdt), t2.astype(mdt),
                       preferred_element_type=jnp.float32)

    dg = jnp.sum(jax.lax.map(chunk_contrib, (azp, ayp, axp, gfp)), axis=0)
    return dg.reshape(D, H, W, C).transpose(3, 0, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _grid_sample_3d(grid: jnp.ndarray, coords: jnp.ndarray,
                    compute_dtype: str) -> jnp.ndarray:
    """Differentiable trilinear grid sample (see module docstring).

    compute_dtype="bfloat16" gathers the packed table in bf16 (halves the
    gather's HBM traffic) and runs the backward contraction's matmul inputs
    in bf16 (f32 accumulate) — the training fast path; "float32" is the
    exact/oracle-parity path (f32 gathers, f32-accurate weights)."""
    gdt = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    dims = grid.shape[1:]
    table = pack_corner_table(grid, gather_dtype=gdt)
    return _grid_sample_packed_fwd_impl(table, coords, dims)


def _grid_sample_fwd(grid, coords, compute_dtype):
    # Stash the gathered corner rows for the coords backward: a sequential
    # re-read of (P, 8C) is ~10x cheaper than repeating the random-row
    # gather (measured 3.2 ms vs ~0.3 ms at 262k points).
    gdt = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    dims = grid.shape[1:]
    table = pack_corner_table(grid, gather_dtype=gdt)
    cf = coords.reshape(-1, coords.shape[-1])
    rows, fs, ok = _cell_geometry(cf, dims)
    vals = jnp.take(table, rows, axis=0)          # (P, 8C) one gather
    C = table.shape[1] // 8
    ws = _packed_weights(fs, ok, jnp.float32)
    out = None
    for s in range(8):
        contrib = vals[:, s * C:(s + 1) * C].astype(jnp.float32) * ws[s][:, None]
        out = contrib if out is None else out + contrib
    out = out.reshape(coords.shape[:-1] + (C,))
    return out, (grid, coords, vals)


def _grid_sample_bwd(compute_dtype, res, g):
    grid, coords, vals = res
    mdt = jnp.bfloat16 if compute_dtype == "bfloat16" else grid.dtype
    C, D, H, W = grid.shape

    from .pallas.grid_bwd import grid_bwd_fused, grid_bwd_kernel_ok
    cf_all = coords.reshape(-1, coords.shape[-1])
    if grid_bwd_kernel_ok(grid.shape, cf_all.shape[0]):
        # Fused Pallas backward: dG accumulation + analytic dCoords in one
        # pass over the points (the rank-1 expansion matrices and the
        # per-point (P,1) chains never touch HBM).
        gf_all = g.reshape(-1, C)
        dg, dc = grid_bwd_fused(grid.shape, cf_all, gf_all, vals,
                                compute_dtype=compute_dtype)
        W_in = coords.shape[-1]
        if W_in > 3:
            dc = jnp.pad(dc, ((0, 0), (0, W_in - 3)))
        dcoords = dc.reshape(coords.shape).astype(coords.dtype)
        return dg.astype(grid.dtype), dcoords

    dg = _grid_cotangent(grid.shape, coords, g, mdt).astype(grid.dtype)

    # dCoords: analytic from the stashed packed corner rows.
    # out = sum_corners wz(fz) wy(fy) wx(fx) V; d out/d fx is the same sum
    # with the x-factor replaced by ±1, i.e. a (V[..,1] - V[..,0]) pairing;
    # chain rule: d i/d c = (dim - 1) / 2 per axis. Out-of-band points get 0
    # through the ok factor baked into the weights.
    shape = coords.shape[:-1]
    cf = coords.reshape(-1, coords.shape[-1])
    gf = g.reshape(-1, C).astype(jnp.float32)
    dims = (D, H, W)
    _, fs, ok = _cell_geometry(cf, dims)
    vals = vals.astype(jnp.float32)               # (P, 8C) stashed
    fx, fy, fz = fs
    okf = ok.astype(jnp.float32)

    def corner(s):
        return vals[:, s * C:(s + 1) * C]

    # gv[s] = <g, V_s> per point — the only reduction over channels needed.
    gv = [jnp.sum(gf * corner(s), axis=-1) for s in range(8)]

    def lin(d, f):
        return f if d else 1.0 - f

    dfx = dfy = dfz = 0.0
    for s in range(8):
        dz, dy, dx = (s >> 2) & 1, (s >> 1) & 1, s & 1
        wz, wy, wx = lin(dz, fz), lin(dy, fy), lin(dx, fx)
        sx = 1.0 if dx else -1.0
        sy = 1.0 if dy else -1.0
        sz = 1.0 if dz else -1.0
        dfx = dfx + sx * wz * wy * gv[s]
        dfy = dfy + sy * wz * wx * gv[s]
        dfz = dfz + sz * wy * wx * gv[s]
    dcx = dfx * okf * (0.5 * (W - 1))
    dcy = dfy * okf * (0.5 * (H - 1))
    dcz = dfz * okf * (0.5 * (D - 1))
    dcoords = jnp.stack([dcx, dcy, dcz], axis=-1)
    W_in = coords.shape[-1]
    if W_in > 3:
        # wide (packed) coordinate blocks: only the first 3 columns are
        # coords; their cotangent is zero elsewhere
        dcoords = jnp.pad(dcoords, ((0, 0), (0, W_in - 3)))
    dcoords = dcoords.reshape(shape + (W_in,))
    return dg, dcoords.astype(coords.dtype)


_grid_sample_3d.defvjp(_grid_sample_fwd, _grid_sample_bwd)


def grid_sample_3d(grid: jnp.ndarray, coords: jnp.ndarray,
                   compute_dtype: str = "float32") -> jnp.ndarray:
    """Public entry; see _grid_sample_3d."""
    return _grid_sample_3d(grid, coords, compute_dtype)
