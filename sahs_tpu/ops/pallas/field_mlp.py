"""Fused Pallas TPU kernels for the field-MLP hot path.

Why: XLA materializes every MLP layer's activations in HBM — for 393k
points x 256 features x ~20 layers that is gigabytes of HBM traffic per
step, which dominates the step time. These kernels keep ALL activations in
VMEM across the whole MLP (weights are VMEM-resident across the point-tile
grid, ~1-2 MB per network), so HBM traffic collapses to one read of the
inputs and one write of the outputs per point.

Design (tpu-first, not a translation):
  - points are tiled along the batch axis (grid = P / TILE); every weight
    uses a constant index_map so Mosaic keeps it in VMEM for all tiles;
  - the skip re-concat is algebraically split: cat(h, x0) @ W_skip ==
    h @ W_h + x0 @ W_x, avoiding odd concat shapes in VMEM;
  - per-frame conditioning (driving / pose PE) is folded into effective
    biases OUTSIDE the kernel (one tiny matmul per step), so the kernel's
    per-point input is only the positional encoding;
  - backward is a custom_vjp: one Pallas kernel per tile recomputes the
    forward (activation-derivatives are recovered from outputs: relu/leaky
    sign, tanh 1-y^2), computes dX on the fly and accumulates dW/db into
    VMEM-resident output blocks (constant index_map, init at tile 0);
  - matmuls run on the MXU with preferred_element_type=f32; compute dtype
    (bf16/f32) is a static switch.

Reference behaviour being fused (for parity): the trunk/head structure of
WarpFieldMLP / HyperSheetMLP / NeRFMLP (reference nerf-pytorch/nerf/
modules.py:168-462).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..encoding import frequency_bands

import os

TILE = int(os.environ.get("SAHS_TILE", "1024"))


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests / debugging)."""
    return jax.default_backend() != "tpu"


def _rup(x: int, m: int = 128) -> int:
    return ((x + m - 1) // m) * m


def _pad2(a, rows: int, cols: int):
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))


def _pad_bias(b, cols: int):
    return jnp.pad(b, (0, cols - b.shape[0]))[None, :]


def _act(name: str):
    if name == "relu":
        return lambda x: jnp.maximum(x, 0.0)
    if name == "leaky":
        return lambda x: jnp.where(x >= 0, x, 0.01 * x)
    if name == "tanh":
        return jnp.tanh
    if name == "linear":
        return lambda x: x
    raise ValueError(name)


def _dact_from_out(name: str):
    """Activation derivative recovered from the activation OUTPUT (valid for
    monotone relu/leaky/tanh; linear)."""
    if name == "relu":
        return lambda y: (y > 0).astype(y.dtype)
    if name == "leaky":
        return lambda y: jnp.where(y > 0, 1.0, 0.01).astype(y.dtype)
    if name == "tanh":
        return lambda y: 1.0 - y * y
    if name == "linear":
        return lambda y: jnp.ones_like(y)
    raise ValueError(name)


def _mm(a, b, dtype):
    # float32 mode must force 3-pass f32 on the MXU (default is bf16).
    prec = (jax.lax.Precision.HIGHEST if jnp.dtype(dtype) == jnp.float32
            else jax.lax.Precision.DEFAULT)
    return jnp.dot(a.astype(dtype), b.astype(dtype),
                   preferred_element_type=jnp.float32, precision=prec)


# ===========================================================================
# In-kernel positional encoding
#
# The kernels take the RAW packed coordinates (a few columns) instead of the
# precomputed PE banks: the encoding is (re)computed inside the kernel from
# static per-column frequency rows. This removes the (P, 63..96)-wide HBM
# interfaces, the XLA PE kernels and their backward from the hot path
# entirely — PE becomes a handful of VPU broadcast-madds + one sin.
# ===========================================================================

@dataclasses.dataclass(frozen=True)
class PESpec:
    """Static in-kernel PE description over a packed raw-input tile.

    groups: ordered (src_col, dim, num_freq, include_input, log_sampling);
    output slots are laid out exactly like ops/encoding.py (reference
    nerf_helpers.py:341-349): [x?, sin(f0 x)(dim), cos(f0 x)(dim),
    sin(f1 x)(dim), ...] per group, groups concatenated. A group with
    num_freq=0 and include_input=True is a passthrough (identity) block
    (used to pass the grid spatial embedding alongside the dir PE)."""
    groups: Tuple[Tuple[int, int, int, bool, bool], ...]
    in_width: int       # packed raw input cols (kernel input block width)
    out_width: int      # padded PE width (multiple of 128)

    @property
    def raw_out(self) -> int:
        return sum((d if inc else 0) + 2 * d * f
                   for _, d, f, inc, _ in self.groups)


@functools.lru_cache(maxsize=None)
def _pe_tables(pe: PESpec):
    """-> (scale (in_width, out_width), phase (1, out_width),
    is_input (1, out_width)) static np.float32 tables. Slot value =
    sin(x @ scale + phase), or the raw input where is_input (phase 0).
    Cos slots are sin with a pi/2 phase, so one transcendental serves both
    and the backward is cos with the same phase trick."""
    scale = np.zeros((pe.in_width, pe.out_width), np.float32)
    phase = np.zeros((1, pe.out_width), np.float32)
    is_input = np.zeros((1, pe.out_width), np.float32)
    col = 0
    for (src, D, F, inc, log_s) in pe.groups:
        freqs = frequency_bands(F, log_s)
        if inc:
            for d in range(D):
                scale[src + d, col] = 1.0
                is_input[0, col] = 1.0
                col += 1
        for f in range(F):
            for trig in range(2):           # sin block then cos block
                for d in range(D):
                    scale[src + d, col] = freqs[f]
                    phase[0, col] = np.float32(np.pi / 2) if trig else 0.0
                    col += 1
    assert col == pe.raw_out <= pe.out_width
    return scale, phase, is_input


def _pe_input_arrays(pe: PESpec):
    """Device arrays for the PE tables, appended to a kernel's inputs
    (Pallas kernels cannot capture array constants)."""
    if pe is None:
        return []
    scale, phase, is_input = _pe_tables(pe)
    return [jnp.asarray(scale), jnp.asarray(phase), jnp.asarray(is_input)]


def _pe_block_specs(pe: PESpec):
    if pe is None:
        return []
    return [pl.BlockSpec((pe.in_width, pe.out_width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pe.out_width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pe.out_width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)]


_PE_SPLIT_DOT = os.environ.get("SAHS_PE_SPLIT_DOT", "1") == "1"


def _pe_f32_dot(a, b):
    """f32-accurate a @ b for the PE tables on the MXU.

    The PE scale/phase tables contain only 0, 1, pi/2 phases and the
    frequency values; with log_sampling=True those are exact powers of two,
    exactly representable in bf16. Splitting only the ACTIVATION into
    bf16 hi/lo halves (a = hi + lo exactly) then makes
    hi@b + lo@b == a*f up to one f32 rounding — two DEFAULT-precision MXU
    passes instead of Precision.HIGHEST's six (Mosaic has no HIGH lowering).
    With linear frequencies (log_sampling=False, unused by the shipped
    configs) b itself rounds to bf16 and the result picks up ~2^-9 relative
    error; the HIGHEST fallback covers that case exactly.
    """
    if not _PE_SPLIT_DOT:
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    # precision must be EXPLICIT: a global jax_default_matmul_precision of
    # "float32" would otherwise stamp fp32 contract precision onto these
    # bf16-operand dots, which Mosaic rejects ("Bad lhs type").
    return (jnp.dot(hi, bb, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
            + jnp.dot(lo, bb, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT))


# Diagnostic switch: SAHS_PE_SIN=0 replaces the transcendental with a cheap
# linear op (WRONG results; only for bisecting kernel time).
_PE_SIN = os.environ.get("SAHS_PE_SIN", "1") == "1"


def _sin(t):
    return jnp.sin(t) if _PE_SIN else t * 0.25


# SAHS_PE_BCAST=1: the PE "matmul" as per-input-column VPU broadcast-FMAs
# instead of MXU dots (each PE output slot depends on exactly ONE input
# column). Measured SLOWER on v5e (45.36 vs 44.91 ms/step): these kernels
# are VPU-bound — sin/selects/composite keep the VPU busy while the tiny
# PE dots ride the otherwise-idle MXU — so the default stays 0. Kept as
# an ablation switch and as the record of WHY the dot form wins.
_PE_BCAST = os.environ.get("SAHS_PE_BCAST", "0") == "1"


def _pe_angles(x_raw, scale, phase):
    """t = x_raw @ scale + phase, computed per the _PE_BCAST switch."""
    if not _PE_BCAST:
        return _pe_f32_dot(x_raw, scale) + phase
    t = jnp.broadcast_to(phase, (x_raw.shape[0], scale.shape[1]))
    for a in range(scale.shape[0]):
        t = t + x_raw[:, a:a + 1].astype(jnp.float32) * scale[a:a + 1, :]
    return t


def _pe_apply(x_raw, pe_refs):
    """In-kernel PE forward from table refs [scale, phase, is_input]:
    (T, in_width) f32 -> (T, out_width) f32. Padding slots have zero
    scale/phase -> sin(0) = 0, matching the zero-padded no-PE path."""
    scale, phase, mask = pe_refs[0][:], pe_refs[1][:], pe_refs[2][:]
    t = _pe_angles(x_raw, scale, phase)
    return jnp.where(mask > 0, t - phase, _sin(t))


def _pe_bwd(x_raw, g_pe, pe_refs):
    """In-kernel PE backward: cotangent wrt the PE output (T, out_width)
    -> cotangent wrt the raw input (T, in_width)."""
    scale, phase, mask = pe_refs[0][:], pe_refs[1][:], pe_refs[2][:]
    t = _pe_angles(x_raw, scale, phase)
    dt = jnp.where(mask > 0, g_pe, g_pe * jnp.cos(t))
    if not _PE_BCAST:
        return _pe_f32_dot(dt, scale.T)
    in_w = scale.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, in_w), 1)
    gx = jnp.zeros((x_raw.shape[0], in_w), jnp.float32)
    for a in range(in_w):
        red = jnp.sum(dt * scale[a:a + 1, :], axis=-1, keepdims=True)
        gx = gx + red * (cols == a).astype(jnp.float32)
    return gx


# ===========================================================================
# Generic fused skip-trunk MLP (+ single output head): warp / hyper networks
# ===========================================================================

@dataclasses.dataclass(frozen=True)
class TrunkSpec:
    num_layers: int
    skip_every: int
    in_dim: int          # padded per-point input dim
    hidden: int          # padded hidden dim
    out_dim: int         # padded head output dim
    act: str = "relu"
    out_act: str = "linear"
    compute_dtype: str = "bfloat16"


def _trunk_forward(spec: TrunkSpec, x, ws: Sequence, bs: Sequence,
                   keep: bool = False):
    """Shared trunk math on VMEM values. ws layout: [W0, W1.., (Wh,Wx) at
    skip, ...]; returns final hidden (and all activations when keep)."""
    act = _act(spec.act)
    cdt = jnp.dtype(spec.compute_dtype)
    acts = []
    h = act(_mm(x, ws[0], cdt) + bs[0])
    if keep:
        acts.append(h)
    wi = 1
    for i in range(1, spec.num_layers):
        if i == spec.skip_every:
            wh, wx = ws[wi]
            h = act(_mm(h, wh, cdt) + _mm(x, wx, cdt) + bs[wi])
        else:
            h = act(_mm(h, ws[wi], cdt) + bs[wi])
        if keep:
            acts.append(h)
        wi += 1
    return (h, acts) if keep else h


def _flatten_trunk_weights(spec: TrunkSpec, trunk_params, out_params):
    """Pad + split the pytree weights into the kernel's positional layout.
    Weight matrices are pre-cast to the compute dtype (bf16 halves their
    VMEM residency and removes per-tile casts); biases stay f32 (added to
    the f32 matmul accumulators)."""
    D, H, O = spec.in_dim, spec.hidden, spec.out_dim
    wdt = jnp.dtype(spec.compute_dtype)
    flat = []
    for i, p in enumerate(trunk_params):
        w = p["w"]
        if i == 0:
            flat.append(_pad2(w, D, H).astype(wdt))
        elif i == spec.skip_every:
            # rows are [hidden part ; x0 part], matching the reference's
            # cat(h, x0) order (modules.py:268-273)
            hid = w.shape[1]
            flat.append(_pad2(w[:hid], H, H).astype(wdt))
            flat.append(_pad2(w[hid:], D, H).astype(wdt))
        else:
            flat.append(_pad2(w, H, H).astype(wdt))
        flat.append(_pad_bias(p["b"], H))
    flat.append(_pad2(out_params["w"], H, O).astype(wdt))
    flat.append(_pad_bias(out_params["b"], O))
    return flat


def _unflatten_trunk_weights(spec: TrunkSpec, flat):
    """Regroup the flat kernel-arg list into (ws, bs, wo, bo) where ws
    entries are arrays or (wh, wx) tuples."""
    ws, bs = [], []
    it = iter(flat)
    for i in range(spec.num_layers):
        if i == spec.skip_every and i > 0:
            wh = next(it)
            wx = next(it)
            ws.append((wh, wx))
        else:
            ws.append(next(it))
        bs.append(next(it))
    wo = next(it)
    bo = next(it)
    return ws, bs, wo, bo


def skip_mlp_forward(spec: TrunkSpec, x: jnp.ndarray, trunk_params,
                     out_params, pe_spec: "PESpec" = None) -> jnp.ndarray:
    """x: (P, raw_in) unpadded; returns (P, raw_out).
    pe_spec: when given, ``x`` is the packed RAW coordinates and the PE is
    computed inside the kernel (x stays f32; sin needs full precision)."""
    P = x.shape[0]
    Pp = _rup(P, TILE)
    in_width = pe_spec.in_width if pe_spec is not None else spec.in_dim
    xp = jnp.pad(x, ((0, Pp - P), (0, in_width - x.shape[1])))
    if pe_spec is None:
        xp = xp.astype(jnp.dtype(spec.compute_dtype))
    flat = _flatten_trunk_weights(spec, trunk_params, out_params)
    n_flat = len(flat)
    pe_in = _pe_input_arrays(pe_spec)
    cdt = jnp.dtype(spec.compute_dtype)

    def kernel(x_ref, *refs):
        w_refs = refs[:n_flat]
        pe_refs = refs[n_flat:n_flat + len(pe_in)]
        o_ref = refs[n_flat + len(pe_in)]
        ws, bs, wo, bo = _unflatten_trunk_weights(spec, [r[:] for r in w_refs])
        x_t = (_pe_apply(x_ref[:], pe_refs).astype(cdt)
               if pe_spec is not None else x_ref[:])
        h = _trunk_forward(spec, x_t, ws, bs)
        y = _act(spec.out_act)(_mm(h, wo, cdt) + bo)
        o_ref[:] = y.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(Pp // TILE,),
        in_specs=[pl.BlockSpec((TILE, in_width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                                 memory_space=pltpu.VMEM) for f in flat]
                 + _pe_block_specs(pe_spec),
        out_specs=pl.BlockSpec((TILE, spec.out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pp, spec.out_dim), x.dtype),
        interpret=_interpret(),
    )(xp, *flat, *pe_in)
    return out[:P]


def fold_conditioning(trunk_params, cond: jnp.ndarray, pe_dim: int):
    """Fold the per-frame conditioning tail (driving ⊕ pose, constant across
    points) into effective biases: for the input and skip layers, whose
    weight rows beyond ``pe_dim`` multiply the conditioning, compute
    b_eff = b + cond @ W[pe_dim:]. Returns new trunk params whose weights
    only keep the first ``pe_dim`` rows. Exact up to fp reassociation."""
    new_params = []
    for i, p in enumerate(trunk_params):
        w, b = p["w"], p["b"]
        if i == 0:
            b_eff = b + jnp.dot(cond, w[pe_dim:],
                                precision=jax.lax.Precision.HIGHEST)
            new_params.append({"w": w[:pe_dim], "b": b_eff})
        else:
            new_params.append(p)
    return new_params


def fold_skip_conditioning(spec_num_hidden: int, trunk_params, skip_every: int,
                           cond: jnp.ndarray, pe_dim: int):
    """Same folding for the skip layer: its weight rows are
    [hidden ; pe ; cond]. No-op when the skip never fires (reference
    semantics: 'won't take effect unless num_layers > skip_connect_every')."""
    if skip_every <= 0 or skip_every >= len(trunk_params):
        return trunk_params
    new_params = list(trunk_params)
    p = trunk_params[skip_every]
    w, b = p["w"], p["b"]
    h = spec_num_hidden
    b_eff = b + jnp.dot(cond, w[h + pe_dim:],
                        precision=jax.lax.Precision.HIGHEST)
    new_params[skip_every] = {"w": w[:h + pe_dim], "b": b_eff}
    return new_params


# ===========================================================================
# Backward: per-tile recompute + VMEM-accumulated weight grads
# ===========================================================================

# Diagnostic switches (WRONG gradients; only for bisecting bwd kernel time):
# SAHS_BWD_SKIP_DW=1 zeroes the weight-grad accumulation (DCEs the dW
# contractions); SAHS_BWD_SKIP_GX=1 zeroes the input cotangent (DCEs the
# trunk dX chain + PE backward).
_BWD_SKIP_DW = os.environ.get("SAHS_BWD_SKIP_DW", "0") == "1"
_BWD_SKIP_GX = os.environ.get("SAHS_BWD_SKIP_GX", "0") == "1"
# Coarser bisect (rayd vjp only; WRONG results, timing only):
#   0 = DMA + accumulate machinery alone (no math)
#   1 = + in-kernel PE        2 = + trunk recompute        -1 = full
_BWD_STAGE = int(os.environ.get("SAHS_BWD_STAGE", "-1"))
# SAHS_BWD_NO_DWREFS=1 removes the dW output refs from the rayd vjp
# pallas_call entirely (returns zero weight grads; timing only).
_BWD_NO_DWREFS = os.environ.get("SAHS_BWD_NO_DWREFS", "0") == "1"
# SAHS_BWD_NO_VMEMLIM=1 drops the vmem_limit_bytes compiler param.
_BWD_NO_VMEMLIM = os.environ.get("SAHS_BWD_NO_VMEMLIM", "0") == "1"

# SAHS_LVL_STAGE: timing bisect of the LEVEL bwd kernel (WRONG results):
#   0 = DMA + dW-accumulate machinery only
#   1 = + in-kernel PE      2 = + trunk fwd recompute      -1 = full
_LVL_STAGE = int(os.environ.get("SAHS_LVL_STAGE", "-1"))

BWD_TILE = int(os.environ.get("SAHS_BWD_TILE", "1024"))
                 # bwd holds weights + dW accumulators + per-tile activations
                 # in VMEM (~25 MB; vmem_limit_bytes raised on the bwd
                 # pallas_calls). Small tiles are grid-overhead-bound.

_MMT_VIA_DOT_GENERAL = os.environ.get("SAHS_MMT_DOTGEN", "1") == "1"


def _mmT(a, gz, dtype):
    """a.T @ gz — the dW contraction over the point axis. Expressed as a
    dot_general contracting dim 0 of both operands so Mosaic feeds the MXU
    with a transposed-LHS matmul instead of materializing a VPU transpose of
    the (TILE, width) activation block."""
    prec = (jax.lax.Precision.HIGHEST if jnp.dtype(dtype) == jnp.float32
            else jax.lax.Precision.DEFAULT)
    if not _MMT_VIA_DOT_GENERAL:
        return _mm(a.T, gz, dtype)
    return jax.lax.dot_general(
        a.astype(dtype), gz.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def _trunk_backward(spec: TrunkSpec, x, ws, bs, acts, ga,
                    need_gx: bool = True):
    """Backprop through the trunk given d(final hidden) = ga.
    Returns (gx, dws, dbs) where dws mirrors ws structure. need_gx=False
    skips the input-cotangent matmuls (layer-0 and skip-layer wx chains) —
    the inter-layer ga chain is still fully computed for the dW terms."""
    cdt = jnp.dtype(spec.compute_dtype)
    dact = _dact_from_out(spec.act)
    dws: List = [None] * len(ws)
    dbs: List = [None] * len(bs)
    gx = jnp.zeros_like(x)
    for i in range(spec.num_layers - 1, -1, -1):
        gz = ga * dact(acts[i])
        a_prev = x if i == 0 else acts[i - 1]
        if i == spec.skip_every and i > 0:
            wh, wx = ws[i]
            dws[i] = (_mm(a_prev.T, gz, cdt), _mm(x.T, gz, cdt))
            if need_gx:
                gx = gx + _mm(gz, wx.T, cdt)
            ga = _mm(gz, wh.T, cdt)
        else:
            dws[i] = _mm(a_prev.T, gz, cdt)
            if i == 0:
                if need_gx:
                    gx = gx + _mm(gz, ws[0].T, cdt)
            else:
                ga = _mm(gz, ws[i].T, cdt)
        dbs[i] = jnp.sum(gz, axis=0, keepdims=True)
    return gx, dws, dbs


def _accumulate(refs, values, first):
    """Accumulate each value into its (constant-index) output ref; one
    predicated region zeroes everything on the first tile (per-ref
    init/else-add pairs — ~90 predicated regions — made the Mosaic compile
    take many minutes)."""
    @pl.when(first)
    def _():
        for r in refs:
            r[:] = jnp.zeros(r.shape, r.dtype)

    for r, v in zip(refs, values):
        r[:] = r[:] + v.astype(r.dtype)


def skip_mlp_vjp(spec: TrunkSpec, x: jnp.ndarray, trunk_params, out_params,
                 g: jnp.ndarray, pe_spec: "PESpec" = None):
    """Backward pass of skip_mlp_forward. g: (P, raw_out) cotangent.
    Returns (gx (P, raw_in), trunk_grads, out_grads). With pe_spec the
    kernel recomputes the PE from the raw coords and chains the cotangent
    back through it (gx is wrt the raw coords)."""
    P = x.shape[0]
    Pp = _rup(P, BWD_TILE)
    raw_in = x.shape[1]
    in_width = pe_spec.in_width if pe_spec is not None else spec.in_dim
    xp = jnp.pad(x, ((0, Pp - P), (0, in_width - raw_in)))
    gp = jnp.pad(g, ((0, Pp - P), (0, spec.out_dim - g.shape[1])))
    flat = _flatten_trunk_weights(spec, trunk_params, out_params)
    n_flat = len(flat)
    pe_in = _pe_input_arrays(pe_spec)
    n_pe = len(pe_in)
    n_grid = Pp // BWD_TILE

    def kernel(x_ref, g_ref, *refs):
        w_refs = refs[:n_flat]
        pe_refs = refs[n_flat:n_flat + n_pe]
        gx_ref = refs[n_flat + n_pe]
        dw_refs = refs[n_flat + n_pe + 1:]
        vals = [r[:] for r in w_refs]
        ws, bs, wo, bo = _unflatten_trunk_weights(spec, vals)
        cdt = jnp.dtype(spec.compute_dtype)
        x_raw = x_ref[:]
        x_t = _pe_apply(x_raw, pe_refs) if pe_spec is not None else x_raw
        h, acts = _trunk_forward(spec, x_t, ws, bs, keep=True)
        y = _act(spec.out_act)(_mm(h, wo, cdt) + bo)
        gz = g_ref[:] * _dact_from_out(spec.out_act)(y)
        dwo = _mm(h.T, gz, cdt)
        dbo = jnp.sum(gz, axis=0, keepdims=True)
        ga = _mm(gz, wo.T, cdt)
        gx, dws, dbs = _trunk_backward(spec, x_t, ws, bs, acts, ga)
        if pe_spec is not None:
            gx = _pe_bwd(x_raw, gx, pe_refs)
        gx_ref[:] = gx.astype(gx_ref.dtype)
        # flatten grads to the same order as `flat`
        grads = []
        for i in range(spec.num_layers):
            if i == spec.skip_every and i > 0:
                grads.extend([dws[i][0], dws[i][1]])
            else:
                grads.append(dws[i])
            grads.append(dbs[i])
        grads.extend([dwo, dbo])
        _accumulate(dw_refs, grads, pl.program_id(0) == 0)

    out_shapes = ([jax.ShapeDtypeStruct((Pp, in_width), x.dtype)]
                  + [jax.ShapeDtypeStruct(f.shape, jnp.float32) for f in flat])
    out_specs = ([pl.BlockSpec((BWD_TILE, in_width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                                 memory_space=pltpu.VMEM) for f in flat])
    outs = pl.pallas_call(
        kernel,
        grid=(n_grid,),
        in_specs=[pl.BlockSpec((BWD_TILE, in_width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BWD_TILE, spec.out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                                 memory_space=pltpu.VMEM) for f in flat]
                 + _pe_block_specs(pe_spec),
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xp, gp, *flat, *pe_in)

    gx = outs[0][:P, :raw_in]
    flat_grads = outs[1:]
    # unpad back into the param pytrees
    it = iter(flat_grads)
    trunk_grads = []
    for i, p in enumerate(trunk_params):
        w = p["w"]
        if i == 0:
            dw = next(it)[:w.shape[0], :w.shape[1]]
        elif i == spec.skip_every:
            hid = w.shape[1]
            dwh = next(it)
            dwx = next(it)
            dw = jnp.concatenate([dwh[:hid, :hid],
                                  dwx[:w.shape[0] - hid, :hid]], axis=0)
        else:
            dw = next(it)[:w.shape[0], :w.shape[1]]
        db = next(it)[0, :p["b"].shape[0]]
        trunk_grads.append({"w": dw, "b": db})
    wo = out_params["w"]
    dwo = next(it)[:wo.shape[0], :wo.shape[1]]
    dbo = next(it)[0, :out_params["b"].shape[0]]
    return gx, trunk_grads, {"w": dwo, "b": dbo}


# ===========================================================================
# Public fast-path wrappers for the deformation networks
# ===========================================================================

def _unfold_cond_grads(raw_trunk, folded_grads, cond, skip_every: int,
                       hidden: int, pe_dim: int):
    """Invert fold_conditioning for the gradients: the folded layers' weight
    grads only cover the pe rows; the conditioning rows' grads are
    outer(cond, db) (b_eff = b + cond @ W_tail), and d(cond) accumulates
    W_tail @ db from both folded layers."""
    out_grads = []
    dcond = jnp.zeros_like(cond)
    if skip_every <= 0 or skip_every >= len(raw_trunk):
        skip_every = -1  # skip never fires for this depth
    for i, (p, gfold) in enumerate(zip(raw_trunk, folded_grads)):
        w = p["w"]
        db = gfold["b"]
        if i == 0:
            tail = w[pe_dim:]
            dw = jnp.concatenate([gfold["w"],
                                  jnp.outer(cond, db)], axis=0)
            dcond = dcond + jnp.dot(tail, db,
                                    precision=jax.lax.Precision.HIGHEST)
        elif i == skip_every:
            tail = w[hidden + pe_dim:]
            dw = jnp.concatenate([gfold["w"], jnp.outer(cond, db)], axis=0)
            dcond = dcond + jnp.dot(tail, db,
                                    precision=jax.lax.Precision.HIGHEST)
        else:
            dw = gfold["w"]
        out_grads.append({"w": dw, "b": db})
    return out_grads, dcond


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _deform_fused(num_layers, hidden, skip_every, out_dim, out_act,
                  compute_dtype, pe_spec, params, pe_x, cond):
    pe_dim = pe_spec.raw_out if pe_spec is not None else pe_x.shape[-1]
    trunk = fold_conditioning(params["trunk"], cond, pe_dim)
    trunk = fold_skip_conditioning(hidden, trunk, skip_every, cond, pe_dim)
    spec = TrunkSpec(num_layers=num_layers, skip_every=skip_every,
                     in_dim=_rup(pe_dim), hidden=_rup(hidden),
                     out_dim=_rup(out_dim), act="relu", out_act=out_act,
                     compute_dtype=compute_dtype)
    out = skip_mlp_forward(spec, pe_x, trunk, params["out"], pe_spec=pe_spec)
    return out[:, :out_dim]


def _deform_fused_fwd(num_layers, hidden, skip_every, out_dim, out_act,
                      compute_dtype, pe_spec, params, pe_x, cond):
    y = _deform_fused(num_layers, hidden, skip_every, out_dim, out_act,
                      compute_dtype, pe_spec, params, pe_x, cond)
    return y, (params, pe_x, cond)


def _deform_fused_bwd(num_layers, hidden, skip_every, out_dim, out_act,
                      compute_dtype, pe_spec, res, g):
    params, pe_x, cond = res
    pe_dim = pe_spec.raw_out if pe_spec is not None else pe_x.shape[-1]
    trunk = fold_conditioning(params["trunk"], cond, pe_dim)
    trunk = fold_skip_conditioning(hidden, trunk, skip_every, cond, pe_dim)
    spec = TrunkSpec(num_layers=num_layers, skip_every=skip_every,
                     in_dim=_rup(pe_dim), hidden=_rup(hidden),
                     out_dim=_rup(out_dim), act="relu", out_act=out_act,
                     compute_dtype=compute_dtype)
    gx, trunk_grads_folded, out_grads = skip_mlp_vjp(spec, pe_x, trunk,
                                                     params["out"], g,
                                                     pe_spec=pe_spec)
    trunk_grads, dcond = _unfold_cond_grads(params["trunk"],
                                            trunk_grads_folded, cond,
                                            skip_every, hidden, pe_dim)
    return ({"trunk": trunk_grads, "out": out_grads}, gx, dcond)


_deform_fused.defvjp(_deform_fused_fwd, _deform_fused_bwd)


def deform_mlp_apply_fused(params, num_layers: int, hidden: int,
                           skip_every: int, pe_x: jnp.ndarray,
                           cond: jnp.ndarray, out_dim: int,
                           out_act: str = "linear",
                           compute_dtype: str = "bfloat16",
                           pe_spec: PESpec = None) -> jnp.ndarray:
    """Fused warp/hyper-sheet MLP: pe_x (P, pe_dim) precomputed PE — or,
    with pe_spec, the packed RAW coords (P, <=pe_spec.in_width) with the PE
    computed in-kernel. cond (76+36,) per-frame conditioning. Equivalent to
    fields.warp_field_apply / hyper_sheet_apply up to fp reassociation.
    Differentiable (custom VJP with per-tile recompute + VMEM-accumulated
    weight grads)."""
    return _deform_fused(num_layers, hidden, skip_every, out_dim, out_act,
                         compute_dtype, pe_spec, params, pe_x, cond)


# ===========================================================================
# Fused warp+hyper pair: ONE kernel, ONE shared in-kernel PE pass
# ===========================================================================

# The pair kernels are narrow (128/64-wide trunks, 12 short matmuls per
# tile) and run well below the deep NeRF kernels' MXU rate at 1024-row
# tiles; larger tiles amortize per-tile weight setup and lengthen each
# matmul. VMEM is no constraint here (pair weights ~100 KB).
PAIR_TILE = int(os.environ.get("SAHS_PAIR_TILE", "1024"))
PAIR_BWD_TILE = int(os.environ.get("SAHS_PAIR_BWD_TILE", "1024"))


def _pts_from_rays_tile(o_blk, d_blk, z_blk, S: int, tile: int, in_width):
    """In-kernel per-point positions from per-ray data: (G, 8) origins and
    directions + (G, S) z -> (tile, in_width) [o + d*z | zeros]. The 0/1
    expand/sel dots run at HIGHEST precision (tiny shapes; exact copy of
    f32 ray data). Re-ablated from r4 (commit efa276a): with the fused
    train path the (P, 8) position array (physically lane-padded to 128
    lanes in HBM) never needs to exist."""
    f32 = jnp.float32
    expand = _ray_expand(tile, S, f32)
    hp = jax.lax.Precision.HIGHEST
    o_pt = jnp.dot(expand, o_blk[:, :in_width].astype(f32),
                   preferred_element_type=f32, precision=hp)
    d_pt = jnp.dot(expand, d_blk[:, :in_width].astype(f32),
                   preferred_element_type=f32, precision=hp)
    zfull = jnp.dot(expand, z_blk.astype(f32),
                    preferred_element_type=f32, precision=hp)   # (tile, S)
    sel = _sel_matrix(tile, S, f32)
    z_pt = jnp.sum(zfull * sel, axis=-1, keepdims=True)
    # padded o/d columns are zero -> 0 + 0*z = 0, matching zero-padded pts
    return o_pt + d_pt * z_pt


# ---------------------------------------------------------------------------
# Two-points-per-row hyper chain ("pair2").
#
# The hyper MLP is 64 wide, but a (T,64)@(64,64) matmul still pays T MXU
# row-passes (only a quadrant of the 128x128 array lights up) — so the
# hyper chain costs as much as the 128-wide warp chain. When every real
# hyper dimension fits in 64 lanes, the kernels instead process TWO points
# per row: the shared PE block is re-laid out (T,128) -> (T/2, [pe(p0)|
# pe(p1)]) and every hyper weight becomes blockdiag(W, W) in its existing
# (128,128) padded array. Each layer is then a (T/2,128)@(128,128) matmul:
# half the row-passes, and the VPU activation work halves too (full lanes
# instead of 64 padded). Bitwise-exact vs the unpaired chain: the same
# products are accumulated in f32 plus exact zero terms from the off-
# diagonal blocks. Measured on v5e (tools/exp_pair2.py): a 6-layer 64-wide
# chain over 262k points drops 1.47 -> 1.14 ms including the in-kernel
# relayout. SAHS_PAIR2=0 reverts to the unpaired chain.
# ---------------------------------------------------------------------------
_PAIR2 = os.environ.get("SAHS_PAIR2", "1") == "1"


def _pair2_enabled(pe_spec, h_trunk, h_out, ho_dim: int, need_gx=False):
    """All real hyper dims must fit one 64-lane half; the input-cotangent
    path (need_gx) keeps the unpaired chain (the PE backward would need an
    extra un-pairing relayout that the fused train path never pays)."""
    if not _PAIR2 or need_gx:
        return False
    if pe_spec.raw_out > 64 or ho_dim > 64:
        return False
    if any(p["w"].shape[1] > 64 for p in h_trunk):
        return False
    return h_out["w"].shape[0] <= 64


def _blockdiag2(flat):
    """Duplicate each padded (128,128)/(1,128) hyper array's real top-left
    64-block onto the second diagonal block (weights) / lane half (bias)."""
    out = []
    for a in flat:
        if a.shape[0] == 1:
            out.append(a.at[:, 64:128].set(a[:, :64]))
        else:
            out.append(a.at[64:128, 64:128].set(a[:64, :64]))
    return out


def _pair2_fold_grads(flat_grads):
    """Inverse of _blockdiag2 for the dW accumulators: the two diagonal
    blocks hold the two points-per-row contributions; their sum (placed
    top-left, which is all _unpack_trunk_grads reads) is the true grad."""
    out = []
    for g in flat_grads:
        if g.shape[0] == 1:
            out.append(g[:, :64] + g[:, 64:128])
        else:
            out.append(g[:64, :64] + g[64:128, 64:128])
    return out


def _pair2_lanes(x):
    """(T, 128) -> (T/2, 128): row i = [x[2i][:64] | x[2i+1][:64]]."""
    T = x.shape[0]
    x2 = x.reshape(T // 2, 256)
    return jnp.concatenate([x2[:, :64], x2[:, 128:192]], axis=1)


def _unpair2_lanes(y2):
    """(T/2, 128) paired output -> (T, 128) per-point rows: row 2i gets
    y2[:, :64] (point 0's lane half), row 2i+1 gets y2[:, 64:]."""
    T2 = y2.shape[0]
    z = jnp.zeros((T2, 64), y2.dtype)
    wide = jnp.concatenate([y2[:, :64], z, y2[:, 64:], z], axis=1)
    return wide.reshape(T2 * 2, 128)


def build_pts(o8, d8, z, S: int) -> jnp.ndarray:
    """(R, 8) origins / directions + (R, S) z -> (R*S, 8) f32 positions
    o + d*z in ray-major point order.

    The XLA broadcast-FMA for the same math materializes a (R, S, 8) f32
    broadcast intermediate AND the output — both physically 128-lane
    padded (~134 MB each at fine counts, ~0.7 ms/step measured on v5e).
    This kernel is write-bound only: the expand/sel dots run at HIGHEST
    precision so the positions are bit-identical to o8 + d8*z per row
    (the coarse-in-fine cotangent merge in train/fused.py relies on
    bit-equal positions across the two calls)."""
    R = d8.shape[0]
    P = R * S
    assert PAIR_TILE % S == 0
    Pp = _rup(P, PAIR_TILE)
    Rp = Pp // S
    G = PAIR_TILE // S
    op = jnp.pad(o8.astype(jnp.float32), ((0, Rp - R), (0, 8 - o8.shape[1])))
    dp = jnp.pad(d8.astype(jnp.float32), ((0, Rp - R), (0, 8 - d8.shape[1])))
    zp = jnp.pad(z.astype(jnp.float32), ((0, Rp - R), (0, 0)))

    def kernel(o_ref, d_ref, z_ref, out_ref):
        out_ref[:] = _pts_from_rays_tile(o_ref[:], d_ref[:], z_ref[:],
                                         S, PAIR_TILE, 8)

    out = pl.pallas_call(
        kernel,
        grid=(Pp // PAIR_TILE,),
        in_specs=[pl.BlockSpec((G, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((PAIR_TILE, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pp, 8), jnp.float32),
        interpret=_interpret(),
    )(op, dp, zp)
    return out[:P]


def _pair_specs(wp, hp, pe_dim, compute_dtype):
    """(warp, hyper) TrunkSpecs from the (num_layers, hidden, skip, out_dim,
    out_act) int tuples."""
    ws = TrunkSpec(num_layers=wp[0], skip_every=wp[2], in_dim=_rup(pe_dim),
                   hidden=_rup(wp[1]), out_dim=128, act="relu",
                   out_act=wp[4], compute_dtype=compute_dtype)
    hs = TrunkSpec(num_layers=hp[0], skip_every=hp[2], in_dim=_rup(pe_dim),
                   hidden=_rup(hp[1]), out_dim=128, act="relu",
                   out_act=hp[4], compute_dtype=compute_dtype)
    return ws, hs


def deform_pair_forward(wspec: TrunkSpec, hspec: TrunkSpec, x: jnp.ndarray,
                        w_trunk, w_out, h_trunk, h_out,
                        pe_spec: "PESpec", wo_dim: int,
                        ho_dim: int, rays=None,
                        emit_rows=None) -> jnp.ndarray:
    """Both deformation MLPs on the SAME in-kernel PE of the packed raw
    coords. Returns (P, 128) packed canonical hyper-points:
    cols [0:wo_dim] = x + warp(x) (the warped coords — the +x residual is
    applied IN-kernel), cols [wo_dim:wo_dim+ho_dim] = hyper ambient, rest
    zero. This layout is exactly the downstream NeRF kernel's packed raw
    input and the grid sampler's coordinate block, so no XLA concat/pad
    ever materializes between the kernels (a (P, small) f32 array is
    lane-padded to 128 in HBM — every glue op on one costs ~134 MB).

    rays=(o (R,8), d (R,8), z (R,S), S): points are built IN-kernel from
    per-ray origin/direction + z and the per-point position array never
    exists in HBM at all; x is ignored.

    emit_rows=(S, (D, H, W)): ALSO emit the corner-table row index of
    every warped point as a SECOND output shaped (P//S, S) f32 — exact
    integers (< 2^16, exact through the hi/lo-split 0/1 layout dots).
    The DENSE (rows, S) layout is the point: computing rows in XLA from
    the (P, 128) packed output reads 3 strided lanes of a physically
    lane-padded array (~0.5 ms/step at fine counts), while this output
    reads at full bandwidth. Expressions mirror ops/grid._cell_geometry
    EXACTLY so the gathered rows always match the level kernel's
    in-kernel trilinear floors."""
    in_width = pe_spec.in_width
    pts3 = rays is None and x.ndim == 3
    if pts3:
        # transposed per-ray positions (R, 8, S): S rides the lane dim so
        # the array is physically unpadded (~8 MB vs ~134 MB for (P, 8)
        # f32 at fine counts); the kernel un-transposes per tile
        R3, _, S = x.shape
        P = R3 * S
        assert PAIR_TILE % S == 0
        Pp = _rup(P, PAIR_TILE)
        pt_in = [jnp.pad(x, ((0, Pp // S - R3), (0, 0), (0, 0)))]
        out_dtype = x.dtype
    elif rays is None:
        P = x.shape[0]
        Pp = _rup(P, PAIR_TILE)
        xp = jnp.pad(x, ((0, Pp - P), (0, in_width - x.shape[1])))
        pt_in = [xp]
        out_dtype = x.dtype
        S = 0
    else:
        o, d, z, S = rays
        assert PAIR_TILE % S == 0
        R = d.shape[0]
        P = R * S
        Pp = _rup(P, PAIR_TILE)
        Rp = Pp // S
        op = jnp.pad(o.astype(jnp.float32),
                     ((0, Rp - R), (0, 8 - o.shape[1])))
        dp = jnp.pad(d.astype(jnp.float32),
                     ((0, Rp - R), (0, 8 - d.shape[1])))
        zp = jnp.pad(z.astype(jnp.float32), ((0, Rp - R), (0, 0)))
        pt_in = [op, dp, zp]
        out_dtype = jnp.float32
    pair2 = _pair2_enabled(pe_spec, h_trunk, h_out, ho_dim)
    w_flat = _flatten_trunk_weights(wspec, w_trunk, w_out)
    h_flat = _flatten_trunk_weights(hspec, h_trunk, h_out)
    if pair2:
        h_flat = _blockdiag2(h_flat)
    n_w, n_h = len(w_flat), len(h_flat)
    pe_in = _pe_input_arrays(pe_spec)
    cdt = jnp.dtype(wspec.compute_dtype)
    n_pt = len(pt_in)

    def kernel(*allrefs):
        pt_refs = allrefs[:n_pt]
        refs = allrefs[n_pt:]
        w_refs = refs[:n_w]
        h_refs = refs[n_w:n_w + n_h]
        pe_refs = refs[n_w + n_h:n_w + n_h + len(pe_in)]
        o_ref = refs[n_w + n_h + len(pe_in)]
        if pts3:
            x_raw = jnp.swapaxes(pt_refs[0][:], 1, 2).reshape(PAIR_TILE, 8)
            if in_width > 8:
                x_raw = jnp.pad(x_raw, ((0, 0), (0, in_width - 8)))
        elif rays is None:
            x_raw = pt_refs[0][:]
        else:
            x_raw = _pts_from_rays_tile(pt_refs[0][:], pt_refs[1][:],
                                        pt_refs[2][:], S, PAIR_TILE,
                                        in_width)
        pe = _pe_apply(x_raw, pe_refs).astype(cdt)
        ws, bs, wo, bo = _unflatten_trunk_weights(wspec, [r[:] for r in w_refs])
        hw, hb, hwo, hbo = _unflatten_trunk_weights(hspec, [r[:] for r in h_refs])
        hid_w = _trunk_forward(wspec, pe, ws, bs)
        y_w = _act(wspec.out_act)(_mm(hid_w, wo, cdt) + bo)
        if pair2:
            hid_h = _trunk_forward(hspec, _pair2_lanes(pe), hw, hb)
            y_h = _unpair2_lanes(
                _act(hspec.out_act)(_mm(hid_h, hwo, cdt) + hbo))
        else:
            hid_h = _trunk_forward(hspec, pe, hw, hb)
            y_h = _act(hspec.out_act)(_mm(hid_h, hwo, cdt) + hbo)
        warped = x_raw[:, :wo_dim] + y_w[:, :wo_dim]
        out = jnp.concatenate(
            [warped, y_h[:, :ho_dim],
             jnp.zeros((warped.shape[0], 128 - wo_dim - ho_dim),
                       warped.dtype)], axis=-1)
        o_ref[:] = out.astype(o_ref.dtype)
        if emit_rows is not None:
            rows_ref = refs[n_w + n_h + len(pe_in) + 1]
            S_r, (D_, H_, W_) = emit_rows
            f32 = jnp.float32
            wf = warped.astype(f32)
            bases = []
            for axis, n in ((0, W_), (1, H_), (2, D_)):
                # MUST mirror ops/grid._cell_geometry exactly (same floor
                # association) so rows match the level kernel's interp
                i = (wf[:, axis:axis + 1] + 1.0) * 0.5 * (n - 1)
                bases.append(jnp.clip(jnp.floor(i) + 1.0, 0.0, float(n)))
            bx, by, bz = bases
            rowf = (bz * (H_ + 1) + by) * (W_ + 1) + bx     # (tile, 1)
            tile_n = rowf.shape[0]
            expand = _ray_expand(tile_n, S_r, f32)
            sel = _sel_matrix(tile_n, S_r, f32)
            # exact=True: hi/lo bf16 split — exact for integers < 2^16
            # (hi's rounding error is an integer <= 128, itself exact in
            # bf16), and each (g, s) output sums exactly one nonzero term
            rows_ref[:] = _01dotT(expand, rowf * sel, True)

    if pts3:
        pt_specs = [pl.BlockSpec((PAIR_TILE // S, 8, S),
                                 lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)]
    elif rays is None:
        pt_specs = [pl.BlockSpec((PAIR_TILE, in_width), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
    else:
        G = PAIR_TILE // S
        pt_specs = [pl.BlockSpec((G, 8), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((G, 8), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((G, S), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
    flat = w_flat + h_flat
    out_specs = pl.BlockSpec((PAIR_TILE, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Pp, 128), out_dtype)
    if emit_rows is not None:
        S_r = emit_rows[0]
        assert PAIR_TILE % S_r == 0
        out_specs = [out_specs,
                     pl.BlockSpec((PAIR_TILE // S_r, S_r),
                                  lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((Pp // S_r, S_r), jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid=(Pp // PAIR_TILE,),
        in_specs=pt_specs
                 + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                                 memory_space=pltpu.VMEM) for f in flat]
                 + _pe_block_specs(pe_spec),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*pt_in, *flat, *pe_in)
    if emit_rows is not None:
        return out[0][:P], out[1][:P // emit_rows[0]]
    return out[:P]


def _pair_bwd_math(wspec: TrunkSpec, hspec: TrunkSpec, x_raw, g_t,
                   w_vals, h_vals, pe_refs, wo_dim: int, ho_dim: int,
                   need_gx: bool, pair2: bool = False):
    """Pair backward on VMEM values: recompute both trunks' forward from
    the shared PE, then backprop the packed cotangent g_t (T, >=wo+ho)
    [warped | ambient]. Returns (gx (T, in_width)|None, grads list in
    w_flat + h_flat order). Shared between deform_pair_vjp and the
    pair-folded train-level kernel (ops/pallas/level_train.py).

    pair2: the hyper chain runs two points per row on blockdiag weights
    (h_vals must be _blockdiag2'd; grads come back in that layout for
    _pair2_fold_grads). Requires need_gx=False."""
    assert not (pair2 and need_gx)
    cdt = jnp.dtype(wspec.compute_dtype)
    tile = g_t.shape[0]
    ws, bs, wo, bo = _unflatten_trunk_weights(wspec, w_vals)
    hw, hb, hwo, hbo = _unflatten_trunk_weights(hspec, h_vals)
    pe = _pe_apply(x_raw, pe_refs)
    g_w = jnp.concatenate(
        [g_t[:, :wo_dim],
         jnp.zeros((tile, 128 - wo_dim), g_t.dtype)], axis=-1)
    g_h = jnp.concatenate(
        [g_t[:, wo_dim:wo_dim + ho_dim],
         jnp.zeros((tile, 128 - ho_dim), g_t.dtype)], axis=-1)

    def back(spec, ws_, bs_, wo_, bo_, gout, x_in):
        h, acts = _trunk_forward(spec, x_in, ws_, bs_, keep=True)
        y = _act(spec.out_act)(_mm(h, wo_, cdt) + bo_)
        gz = gout * _dact_from_out(spec.out_act)(y)
        dwo = _mmT(h, gz, cdt)
        dbo = jnp.sum(gz, axis=0, keepdims=True)
        ga = _mm(gz, wo_.T, cdt)
        gx, dws, dbs = _trunk_backward(spec, x_in, ws_, bs_, acts, ga,
                                       need_gx=need_gx)
        grads = []
        for i in range(spec.num_layers):
            if i == spec.skip_every and i > 0:
                grads.extend([dws[i][0], dws[i][1]])
            else:
                grads.append(dws[i])
            grads.append(dbs[i])
        grads.extend([dwo, dbo])
        return gx, grads

    gpe_w, grads_w = back(wspec, ws, bs, wo, bo, g_w, pe)
    if pair2:
        gpe_h, grads_h = back(hspec, hw, hb, hwo, hbo, _pair2_lanes(g_h),
                              _pair2_lanes(pe))
    else:
        gpe_h, grads_h = back(hspec, hw, hb, hwo, hbo, g_h, pe)
    gx = None
    if need_gx:
        gx = _pe_bwd(x_raw, gpe_w + gpe_h, pe_refs)
        # +x residual of the warped coords
        gx = gx + jnp.concatenate(
            [g_t[:, :wo_dim],
             jnp.zeros((tile, gx.shape[1] - wo_dim), gx.dtype)], axis=-1)
    return gx, grads_w + grads_h


def deform_pair_vjp(wspec: TrunkSpec, hspec: TrunkSpec, x: jnp.ndarray,
                    w_trunk, w_out, h_trunk, h_out, g: jnp.ndarray,
                    pe_spec: "PESpec", wo_dim: int, ho_dim: int,
                    need_gx: bool = True, rays=None, g2=None):
    """Backward of deform_pair_forward; g is (P, 128) in the packed output
    layout [warped | ambient]. Shares ONE PE recompute and ONE PE backward
    between the two trunks; the +x residual contributes g's warped block to
    gx directly. Returns (gx, w_trunk_grads, w_out_grads, h_trunk_grads,
    h_out_grads).

    rays=(o, d, z, S): positions are rebuilt IN-kernel from the per-ray
    data (x is ignored; requires need_gx=False — the fused train path's
    sample positions are camera-derived and carry no gradient).

    g2: optional second cotangent (P, 128), added to g IN-kernel — the
    fused train path's coarse-slot scatter addend rides its own DMA
    stream instead of an XLA add's extra HBM round trip."""
    in_width = pe_spec.in_width
    if rays is not None:
        assert not need_gx
        o, d, z, S = rays
        assert PAIR_BWD_TILE % S == 0
        P = g.shape[0]
        Pp = _rup(P, PAIR_BWD_TILE)
        Rp = Pp // S
        R = d.shape[0]
        pt_in = [jnp.pad(o.astype(jnp.float32),
                         ((0, Rp - R), (0, 8 - o.shape[1]))),
                 jnp.pad(d.astype(jnp.float32),
                         ((0, Rp - R), (0, 8 - d.shape[1]))),
                 jnp.pad(z.astype(jnp.float32), ((0, Rp - R), (0, 0)))]
        raw_in = in_width
        gx_dtype = jnp.float32
        pts3 = False
    elif x.ndim == 3:
        # transposed per-ray positions (R, 8, S): S rides the lane dim so
        # the array is physically unpadded (~8 MB vs ~134 MB for (P, 8)
        # f32 at fine counts); the kernel un-transposes per tile
        R3, _, S = x.shape
        P = R3 * S
        assert PAIR_BWD_TILE % S == 0
        Pp = _rup(P, PAIR_BWD_TILE)
        raw_in = 8
        pt_in = [jnp.pad(x, ((0, Pp // S - R3), (0, 0), (0, 0)))]
        gx_dtype = x.dtype
        pts3 = True
    else:
        P = x.shape[0]
        Pp = _rup(P, PAIR_BWD_TILE)
        raw_in = x.shape[1]
        pt_in = [jnp.pad(x, ((0, Pp - P), (0, in_width - raw_in)))]
        gx_dtype = x.dtype
        pts3 = False
    gp = jnp.pad(g, ((0, Pp - P), (0, 0)))
    g2p = jnp.pad(g2, ((0, Pp - P), (0, 0))) if g2 is not None else None
    n_g = 1 if g2 is None else 2
    pair2 = _pair2_enabled(pe_spec, h_trunk, h_out, ho_dim,
                           need_gx=need_gx)
    w_flat = _flatten_trunk_weights(wspec, w_trunk, w_out)
    h_flat = _flatten_trunk_weights(hspec, h_trunk, h_out)
    if pair2:
        h_flat = _blockdiag2(h_flat)
    n_w, n_h = len(w_flat), len(h_flat)
    flat = w_flat + h_flat
    pe_in = _pe_input_arrays(pe_spec)
    n_pe = len(pe_in)
    n_grid = Pp // PAIR_BWD_TILE
    cdt = jnp.dtype(wspec.compute_dtype)
    n_pt = len(pt_in)

    def kernel(*allrefs):
        pt_refs = allrefs[:n_pt]
        g_ref = allrefs[n_pt]
        g2_ref = allrefs[n_pt + 1] if n_g == 2 else None
        refs = allrefs[n_pt + n_g:]
        w_refs = refs[:n_w]
        h_refs = refs[n_w:n_w + n_h]
        pe_refs = refs[n_w + n_h:n_w + n_h + n_pe]
        at = n_w + n_h + n_pe
        gx_ref = refs[at] if need_gx else None
        dw_refs = refs[at + (1 if need_gx else 0):]
        ws, bs, wo, bo = _unflatten_trunk_weights(wspec, [r[:] for r in w_refs])
        hw, hb, hwo, hbo = _unflatten_trunk_weights(hspec, [r[:] for r in h_refs])
        if rays is None:
            if pts3:
                x_raw = jnp.swapaxes(pt_refs[0][:], 1, 2).reshape(
                    PAIR_BWD_TILE, 8)
                if in_width > 8:
                    x_raw = jnp.pad(x_raw, ((0, 0), (0, in_width - 8)))
            else:
                x_raw = pt_refs[0][:]
        else:
            x_raw = _pts_from_rays_tile(pt_refs[0][:], pt_refs[1][:],
                                        pt_refs[2][:], S, PAIR_BWD_TILE,
                                        in_width)
        gval = g_ref[:].astype(jnp.float32)
        if g2_ref is not None:
            gval = gval + g2_ref[:].astype(jnp.float32)
        gx, grads = _pair_bwd_math(
            wspec, hspec, x_raw, gval,
            [r[:] for r in w_refs], [r[:] for r in h_refs],
            pe_refs, wo_dim, ho_dim, need_gx, pair2=pair2)
        if need_gx:
            gx_ref[:] = gx.astype(gx_ref.dtype)
        _accumulate(dw_refs, grads, pl.program_id(0) == 0)

    # the gx output exists only when requested — a need_gx=False pass used
    # to write a full (Pp, in_width) zeros array (~134 MB physical at fine
    # counts, ~0.3 ms of pure waste per call)
    out_shapes = ([jax.ShapeDtypeStruct((Pp, in_width), gx_dtype)]
                  if need_gx else []) \
        + [jax.ShapeDtypeStruct(f.shape, jnp.float32) for f in flat]
    out_specs = ([pl.BlockSpec((PAIR_BWD_TILE, in_width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 if need_gx else []) \
        + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                        memory_space=pltpu.VMEM) for f in flat]
    if rays is None:
        if pts3:
            G3 = PAIR_BWD_TILE // S
            pt_specs = [pl.BlockSpec((G3, 8, S), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM)]
        else:
            pt_specs = [pl.BlockSpec((PAIR_BWD_TILE, in_width),
                                     lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)]
    else:
        G = PAIR_BWD_TILE // S
        pt_specs = [pl.BlockSpec((G, 8), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((G, 8), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((G, S), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
    g_in = [gp] if g2p is None else [gp, g2p]
    outs = pl.pallas_call(
        kernel,
        grid=(n_grid,),
        in_specs=pt_specs
                 + [pl.BlockSpec((PAIR_BWD_TILE, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)] * n_g
                 + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                                 memory_space=pltpu.VMEM) for f in flat]
                 + _pe_block_specs(pe_spec),
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*pt_in, *g_in, *flat, *pe_in)

    gx = outs[0][:P, :raw_in] if need_gx else None
    flat_grads = list(outs[1:]) if need_gx else list(outs)
    if pair2:
        flat_grads = (flat_grads[:n_w]
                      + _pair2_fold_grads(flat_grads[n_w:]))
    it = iter(flat_grads)
    wt_g, wo_g = _unpack_trunk_grads(wspec, w_trunk, w_out, it)
    ht_g, ho_g = _unpack_trunk_grads(hspec, h_trunk, h_out, it)
    return gx, wt_g, wo_g, ht_g, ho_g


def _unpack_trunk_grads(spec: TrunkSpec, trunk_params, out_params, it):
    """Rebuild one trunk+head grads pytree from the kernel's padded flat
    dW iterator (in _flatten_trunk_weights order)."""
    trunk_grads = []
    for i, p in enumerate(trunk_params):
        w = p["w"]
        if i == 0:
            dw = next(it)[:w.shape[0], :w.shape[1]]
        elif i == spec.skip_every:
            hid = w.shape[1]
            dwh = next(it)
            dwx = next(it)
            dw = jnp.concatenate([dwh[:hid, :hid],
                                  dwx[:w.shape[0] - hid, :hid]], axis=0)
        else:
            dw = next(it)[:w.shape[0], :w.shape[1]]
        db = next(it)[0, :p["b"].shape[0]]
        trunk_grads.append({"w": dw, "b": db})
    wo = out_params["w"]
    dwo = next(it)[:wo.shape[0], :wo.shape[1]]
    dbo = next(it)[0, :out_params["b"].shape[0]]
    return trunk_grads, {"w": dwo, "b": dbo}


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _deform_pair_fused(wp, hp, compute_dtype, pe_spec, pe_dim, need_gx,
                       emit_rows, params_w, params_h, x_raw, cond):
    """wp/hp: (num_layers, hidden, skip_every, out_dim, out_act) static
    tuples. Returns packed (P, 128) [x + warp | hyper ambient | zeros];
    with emit_rows=(S, grid_dims) also the exact corner-table rows
    (P//S, S) f32 (see deform_pair_forward) — rows carry no gradient."""
    wspec, hspec = _pair_specs(wp, hp, pe_dim, compute_dtype)
    wt = fold_conditioning(params_w["trunk"], cond, pe_dim)
    wt = fold_skip_conditioning(wp[1], wt, wp[2], cond, pe_dim)
    ht = fold_conditioning(params_h["trunk"], cond, pe_dim)
    ht = fold_skip_conditioning(hp[1], ht, hp[2], cond, pe_dim)
    return deform_pair_forward(wspec, hspec, x_raw, wt, params_w["out"],
                               ht, params_h["out"], pe_spec, wp[3], hp[3],
                               emit_rows=emit_rows)


def _deform_pair_fwd(wp, hp, compute_dtype, pe_spec, pe_dim, need_gx,
                     emit_rows, params_w, params_h, x_raw, cond):
    y = _deform_pair_fused(wp, hp, compute_dtype, pe_spec, pe_dim, need_gx,
                           emit_rows, params_w, params_h, x_raw, cond)
    return y, (params_w, params_h, x_raw, cond)


def _deform_pair_bwd(wp, hp, compute_dtype, pe_spec, pe_dim, need_gx,
                     emit_rows, res, g):
    params_w, params_h, x_raw, cond = res
    if emit_rows is not None:
        g = g[0]        # rows output: structurally no gradient
    wspec, hspec = _pair_specs(wp, hp, pe_dim, compute_dtype)
    wt = fold_conditioning(params_w["trunk"], cond, pe_dim)
    wt = fold_skip_conditioning(wp[1], wt, wp[2], cond, pe_dim)
    ht = fold_conditioning(params_h["trunk"], cond, pe_dim)
    ht = fold_skip_conditioning(hp[1], ht, hp[2], cond, pe_dim)
    gx, wt_g, wo_g, ht_g, ho_g = deform_pair_vjp(
        wspec, hspec, x_raw, wt, params_w["out"], ht, params_h["out"], g,
        pe_spec, wp[3], hp[3], need_gx=need_gx)
    wt_grads, dcond_w = _unfold_cond_grads(params_w["trunk"], wt_g, cond,
                                           wp[2], wp[1], pe_dim)
    ht_grads, dcond_h = _unfold_cond_grads(params_h["trunk"], ht_g, cond,
                                           hp[2], hp[1], pe_dim)
    return ({"trunk": wt_grads, "out": wo_g},
            {"trunk": ht_grads, "out": ho_g},
            gx, dcond_w + dcond_h)


_deform_pair_fused.defvjp(_deform_pair_fwd, _deform_pair_bwd)


def deform_pair_apply_fused(params_w, params_h, wp, hp, x_raw: jnp.ndarray,
                            cond: jnp.ndarray, compute_dtype: str,
                            pe_spec: PESpec,
                            need_input_grad: bool = True,
                            emit_rows=None) -> jnp.ndarray:
    """Fused warp+hyper evaluation sharing one in-kernel PE pass.
    wp/hp: (num_layers, hidden, skip_every, out_dim, out_act). Returns the
    packed (P, 128) canonical hyper-points [x + warp(x) @0:wo | ambient
    @wo:wo+ho | zeros] — directly consumable as the NeRF kernel's packed
    raw input and the grid sampler's coordinate block.

    need_input_grad=False skips the d(x_raw) cotangent in the backward
    (returns zeros for it): sample points are camera-ray + z-value derived
    in every pipeline path, so nothing upstream is trainable and the
    input-layer dX chain + PE backward are structurally dead compute.

    emit_rows=(samples, grid_dims): additionally return the exact
    corner-table rows as a gradient-free (P//S, S) f32 array."""
    return _deform_pair_fused(tuple(wp), tuple(hp), compute_dtype, pe_spec,
                              pe_spec.raw_out, bool(need_input_grad),
                              emit_rows, params_w, params_h, x_raw, cond)


def _nerf_spec_of(num_layers, skip_every, pe_dim, extra_dim, compute_dtype,
                  params):
    hidden = params["fc_feat"]["w"].shape[1]
    return NerfKernelSpec(num_layers=num_layers, skip_every=skip_every,
                          in_dim=_rup(pe_dim), hidden=_rup(hidden),
                          branch=_rup(hidden // 2), extra_dim=_rup(extra_dim),
                          compute_dtype=compute_dtype), hidden


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _nerf_fused(num_layers, skip_every, pe_dim, extra_dim, compute_dtype,
                pe_spec, extra_pe_spec, params, pts_embed, dir_extra, cond):
    spec, hidden = _nerf_spec_of(num_layers, skip_every, pe_dim, extra_dim,
                                 compute_dtype, params)
    trunk = fold_conditioning(params["trunk"], cond, pe_dim)
    trunk = fold_skip_conditioning(hidden, trunk, skip_every, cond, pe_dim)
    p2 = dict(params)
    p2["trunk"] = trunk
    return nerf_mlp_forward_fused(spec, pts_embed, dir_extra, p2,
                                  pe_spec=pe_spec,
                                  extra_pe_spec=extra_pe_spec)


def _nerf_fused_fwd(num_layers, skip_every, pe_dim, extra_dim, compute_dtype,
                    pe_spec, extra_pe_spec, params, pts_embed, dir_extra,
                    cond):
    y = _nerf_fused(num_layers, skip_every, pe_dim, extra_dim, compute_dtype,
                    pe_spec, extra_pe_spec, params, pts_embed, dir_extra, cond)
    return y, (params, pts_embed, dir_extra, cond)


def _nerf_fused_bwd(num_layers, skip_every, pe_dim, extra_dim, compute_dtype,
                    pe_spec, extra_pe_spec, res, g):
    params, pts_embed, dir_extra, cond = res
    spec, hidden = _nerf_spec_of(num_layers, skip_every, pe_dim, extra_dim,
                                 compute_dtype, params)
    trunk = fold_conditioning(params["trunk"], cond, pe_dim)
    trunk = fold_skip_conditioning(hidden, trunk, skip_every, cond, pe_dim)
    p2 = dict(params)
    p2["trunk"] = trunk
    gx, gextra, grads_folded = nerf_mlp_vjp(spec, pts_embed, dir_extra, p2, g,
                                            pe_spec=pe_spec,
                                            extra_pe_spec=extra_pe_spec)
    trunk_grads, dcond = _unfold_cond_grads(params["trunk"],
                                            grads_folded["trunk"], cond,
                                            skip_every, hidden, pe_dim)
    grads = dict(grads_folded)
    grads["trunk"] = trunk_grads
    return (grads, gx, gextra, dcond)


_nerf_fused.defvjp(_nerf_fused_fwd, _nerf_fused_bwd)


def nerf_mlp_apply_fused(params, num_layers: int, skip_every: int,
                         pts_embed: jnp.ndarray, dir_extra: jnp.ndarray,
                         cond: jnp.ndarray,
                         compute_dtype: str = "bfloat16",
                         pe_spec: PESpec = None,
                         extra_pe_spec: PESpec = None) -> jnp.ndarray:
    """Fused NeRFMLP: pts_embed (P, pe_xyz+pe_amb), dir_extra
    (P, pe_dir [+ spatial_embedding]), cond = per-frame trunk conditioning
    (pose PE and/or driving, concatenated in the reference's input order).
    With pe specs the two inputs are the packed RAW coords
    ([warped xyz, ambient] / [dirs, spatial embedding]) and the PEs are
    computed in-kernel. Returns (P, 16) raw field. Differentiable."""
    pe_dim = (pe_spec.raw_out if pe_spec is not None
              else pts_embed.shape[-1])
    extra_dim = (extra_pe_spec.raw_out if extra_pe_spec is not None
                 else dir_extra.shape[-1])
    return _nerf_fused(num_layers, skip_every, pe_dim, extra_dim,
                       compute_dtype, pe_spec, extra_pe_spec, params,
                       pts_embed, dir_extra, cond)


# ===========================================================================
# Fused NeRFMLP (trunk + feat/alpha + dir branch + seg branch)
# ===========================================================================

@dataclasses.dataclass(frozen=True)
class NerfKernelSpec:
    num_layers: int
    skip_every: int
    in_dim: int        # padded pe(xyz)+pe(ambient) dim
    hidden: int        # padded trunk hidden (256)
    branch: int        # padded branch hidden (128)
    extra_dim: int     # padded dir-branch extra input (pe_dir [+ se]) dim
    compute_dtype: str = "bfloat16"

    # output layout in the padded (TILE, 128) block
    OUT_DIM = 128


def _flatten_nerf_weights(spec: NerfKernelSpec, params):
    """Pad + split NeRFMLP params into the kernel's positional layout.
    dir layer 0 rows are [feat ; extra] per the reference concat order
    (modules.py:276-280). Weight matrices pre-cast to the compute dtype."""
    D, H, B, E = spec.in_dim, spec.hidden, spec.branch, spec.extra_dim
    wdt = jnp.dtype(spec.compute_dtype)
    _c = lambda a: a.astype(wdt)
    flat = []
    for i, p in enumerate(params["trunk"]):
        if i == 0:
            flat.append(_c(_pad2(p["w"], D, H)))
        elif i == spec.skip_every:
            hid = p["w"].shape[1]
            flat.append(_c(_pad2(p["w"][:hid], H, H)))
            flat.append(_c(_pad2(p["w"][hid:], D, H)))
        else:
            flat.append(_c(_pad2(p["w"], H, H)))
        flat.append(_pad_bias(p["b"], H))
    flat.append(_c(_pad2(params["fc_feat"]["w"], H, H)))
    flat.append(_pad_bias(params["fc_feat"]["b"], H))
    flat.append(_c(_pad2(params["fc_alpha"]["w"], H, 128)))
    flat.append(_pad_bias(params["fc_alpha"]["b"], 128))
    d0 = params["dir"][0]
    hid = params["fc_feat"]["w"].shape[1]
    flat.append(_c(_pad2(d0["w"][:hid], H, B)))   # feat part
    flat.append(_c(_pad2(d0["w"][hid:], E, B)))   # extra part
    flat.append(_pad_bias(d0["b"], B))
    for p in params["dir"][1:]:
        flat.append(_c(_pad2(p["w"], B, B)))
        flat.append(_pad_bias(p["b"], B))
    flat.append(_c(_pad2(params["fc_rgb"]["w"], B, 128)))
    flat.append(_pad_bias(params["fc_rgb"]["b"], 128))
    flat.append(_c(_pad2(params["seg"][0]["w"], H, B)))
    flat.append(_pad_bias(params["seg"][0]["b"], B))
    for p in params["seg"][1:]:
        flat.append(_c(_pad2(p["w"], B, B)))
        flat.append(_pad_bias(p["b"], B))
    flat.append(_c(_pad2(params["fc_seg"]["w"], B, 128)))
    flat.append(_pad_bias(params["fc_seg"]["b"], 128))
    return flat


def _nerf_forward_math(spec: NerfKernelSpec, x, extra, vals,
                       keep: bool = False):
    """Forward math shared by fwd and bwd kernels. vals = unpadded ref
    values in _flatten_nerf_weights order."""
    cdt = jnp.dtype(spec.compute_dtype)
    leaky = _act("leaky")
    it = iter(vals)
    ws, bs = [], []
    for i in range(spec.num_layers):
        if i == spec.skip_every and i > 0:
            ws.append((next(it), next(it)))
        else:
            ws.append(next(it))
        bs.append(next(it))
    wf, bf = next(it), next(it)
    wa, ba = next(it), next(it)
    wd0f, wd0e, bd0 = next(it), next(it), next(it)
    dir_rest = [(next(it), next(it)) for _ in range(3)]
    wrgb, brgb = next(it), next(it)
    ws0, bs0 = next(it), next(it)
    seg_rest = [(next(it), next(it)) for _ in range(3)]
    wseg, bseg = next(it), next(it)

    acts = {}
    tspec = TrunkSpec(spec.num_layers, spec.skip_every, spec.in_dim,
                      spec.hidden, 0, act="leaky",
                      compute_dtype=spec.compute_dtype)
    if keep:
        h, trunk_acts = _trunk_forward(tspec, x, ws, bs, keep=True)
        acts["trunk"] = trunk_acts
    else:
        h = _trunk_forward(tspec, x, ws, bs)
    feat = _mm(h, wf, cdt) + bf          # linear (modules.py:274)
    alpha = _mm(feat, wa, cdt) + ba      # (TILE, 128), col 0 is alpha
    d = leaky(_mm(feat, wd0f, cdt) + _mm(extra, wd0e, cdt) + bd0)
    dacts = [d]
    for wd, bd in dir_rest:
        d = leaky(_mm(d, wd, cdt) + bd)
        dacts.append(d)
    rgb = _mm(d, wrgb, cdt) + brgb       # (TILE, 128), cols 0:3
    s = leaky(_mm(feat, ws0, cdt) + bs0)
    sacts = [s]
    for wsk, bsk in seg_rest:
        s = leaky(_mm(s, wsk, cdt) + bsk)
        sacts.append(s)
    seg = _mm(s, wseg, cdt) + bseg       # (TILE, 128), cols 0:12
    if keep:
        acts.update(feat=feat, dacts=dacts, sacts=sacts)
        weights = dict(ws=ws, bs=bs, wf=wf, wa=wa, wd0f=wd0f, wd0e=wd0e,
                       dir_rest=dir_rest, wrgb=wrgb, ws0=ws0,
                       seg_rest=seg_rest, wseg=wseg)
        return rgb, seg, alpha, acts, weights
    return rgb, seg, alpha


def nerf_mlp_vjp(spec: NerfKernelSpec, pts_embed: jnp.ndarray,
                 dir_extra: jnp.ndarray, params, g: jnp.ndarray,
                 pe_spec: PESpec = None, extra_pe_spec: PESpec = None):
    """Backward of nerf_mlp_forward_fused: g (P, 16) -> (gx, gextra,
    flat_param_grads in _flatten_nerf_weights order, unpadded pytree).
    With pe specs the inputs are packed RAW coords; the kernel recomputes
    the PEs and chains the cotangents back through them (gx/gextra are wrt
    the raw coords)."""
    P = pts_embed.shape[0]
    Pp = _rup(P, BWD_TILE)
    raw_in = pts_embed.shape[1]
    raw_extra = dir_extra.shape[1]
    x_width = pe_spec.in_width if pe_spec is not None else spec.in_dim
    e_width = (extra_pe_spec.in_width if extra_pe_spec is not None
               else spec.extra_dim)
    xp = jnp.pad(pts_embed, ((0, Pp - P), (0, x_width - raw_in)))
    ep = jnp.pad(dir_extra, ((0, Pp - P), (0, e_width - raw_extra)))
    gp = jnp.pad(g, ((0, Pp - P), (0, 128 - g.shape[1])))
    flat = _flatten_nerf_weights(spec, params)
    n_flat = len(flat)
    pe_in = _pe_input_arrays(pe_spec)
    epe_in = _pe_input_arrays(extra_pe_spec)
    n_pe, n_epe = len(pe_in), len(epe_in)
    n_grid = Pp // BWD_TILE
    leakyd = _dact_from_out("leaky")

    def kernel(x_ref, e_ref, g_ref, *refs):
        w_refs = refs[:n_flat]
        pe_refs = refs[n_flat:n_flat + n_pe]
        epe_refs = refs[n_flat + n_pe:n_flat + n_pe + n_epe]
        gx_ref = refs[n_flat + n_pe + n_epe]
        ge_ref = refs[n_flat + n_pe + n_epe + 1]
        dw_refs = refs[n_flat + n_pe + n_epe + 2:]
        vals = [r[:] for r in w_refs]
        cdt = jnp.dtype(spec.compute_dtype)
        x_raw = x_ref[:]
        e_raw = e_ref[:]
        x_t = _pe_apply(x_raw, pe_refs) if pe_spec is not None else x_raw
        e_t = (_pe_apply(e_raw, epe_refs)
               if extra_pe_spec is not None else e_raw)
        rgb, seg, alpha, acts, W = _nerf_forward_math(spec, x_t, e_t, vals,
                                                      keep=True)
        g_t = g_ref[:]
        # split + left-align the cotangent into per-head padded blocks
        # (concat instead of .at[].set: Mosaic lacks a scatter lowering)
        grgb = jnp.concatenate(
            [g_t[:, :3], jnp.zeros_like(g_t[:, :125])], axis=-1)
        gseg = jnp.concatenate(
            [g_t[:, 3:15], jnp.zeros_like(g_t[:, :116])], axis=-1)
        galpha = jnp.concatenate(
            [g_t[:, 15:16], jnp.zeros_like(g_t[:, :127])], axis=-1)

        feat = acts["feat"]
        dacts = acts["dacts"]
        sacts = acts["sacts"]

        # seg head
        dwseg = _mm(sacts[3].T, gseg, cdt)
        dbseg = jnp.sum(gseg, axis=0, keepdims=True)
        gs = _mm(gseg, W["wseg"].T, cdt)
        seg_grads = []
        for k in range(3, 0, -1):
            gz = gs * leakyd(sacts[k])
            wsk, _ = W["seg_rest"][k - 1]
            a_prev = sacts[k - 1]
            seg_grads.append((_mm(a_prev.T, gz, cdt),
                              jnp.sum(gz, axis=0, keepdims=True)))
            gs = _mm(gz, wsk.T, cdt)
        gz0 = gs * leakyd(sacts[0])
        dws0 = _mm(feat.T, gz0, cdt)
        dbs0 = jnp.sum(gz0, axis=0, keepdims=True)
        gfeat = _mm(gz0, W["ws0"].T, cdt)

        # dir head
        dwrgb = _mm(dacts[3].T, grgb, cdt)
        dbrgb = jnp.sum(grgb, axis=0, keepdims=True)
        gd = _mm(grgb, W["wrgb"].T, cdt)
        dir_grads = []
        for k in range(3, 0, -1):
            gz = gd * leakyd(dacts[k])
            wd, _ = W["dir_rest"][k - 1]
            a_prev = dacts[k - 1]
            dir_grads.append((_mm(a_prev.T, gz, cdt),
                              jnp.sum(gz, axis=0, keepdims=True)))
            gd = _mm(gz, wd.T, cdt)
        gzd0 = gd * leakyd(dacts[0])
        dwd0f = _mm(feat.T, gzd0, cdt)
        dwd0e = _mm(e_t.T, gzd0, cdt)
        dbd0 = jnp.sum(gzd0, axis=0, keepdims=True)
        gfeat = gfeat + _mm(gzd0, W["wd0f"].T, cdt)
        gextra = _mm(gzd0, W["wd0e"].T, cdt)

        # alpha head
        dwa = _mm(feat.T, galpha, cdt)
        dba = jnp.sum(galpha, axis=0, keepdims=True)
        gfeat = gfeat + _mm(galpha, W["wa"].T, cdt)

        # feat (linear)
        h_last = acts["trunk"][-1]
        dwf = _mm(h_last.T, gfeat, cdt)
        dbf = jnp.sum(gfeat, axis=0, keepdims=True)
        gh = _mm(gfeat, W["wf"].T, cdt)

        tspec = TrunkSpec(spec.num_layers, spec.skip_every, spec.in_dim,
                          spec.hidden, 0, act="leaky",
                          compute_dtype=spec.compute_dtype)
        gx, dws, dbs = _trunk_backward(tspec, x_t, W["ws"], W["bs"],
                                       acts["trunk"], gh)
        if pe_spec is not None:
            gx = _pe_bwd(x_raw, gx, pe_refs)
        if extra_pe_spec is not None:
            gextra = _pe_bwd(e_raw, gextra, epe_refs)
        gx_ref[:] = gx.astype(gx_ref.dtype)
        ge_ref[:] = gextra.astype(ge_ref.dtype)

        grads = []
        for i in range(spec.num_layers):
            if i == spec.skip_every and i > 0:
                grads.extend([dws[i][0], dws[i][1]])
            else:
                grads.append(dws[i])
            grads.append(dbs[i])
        grads.extend([dwf, dbf, dwa, dba, dwd0f, dwd0e, dbd0])
        for dw, db in reversed(dir_grads):
            grads.extend([dw, db])
        grads.extend([dwrgb, dbrgb, dws0, dbs0])
        for dw, db in reversed(seg_grads):
            grads.extend([dw, db])
        grads.extend([dwseg, dbseg])
        _accumulate(dw_refs, grads, pl.program_id(0) == 0)

    out_shapes = ([jax.ShapeDtypeStruct((Pp, x_width), pts_embed.dtype),
                   jax.ShapeDtypeStruct((Pp, e_width), pts_embed.dtype)]
                  + [jax.ShapeDtypeStruct(f.shape, jnp.float32) for f in flat])
    out_specs = ([pl.BlockSpec((BWD_TILE, x_width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BWD_TILE, e_width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                                 memory_space=pltpu.VMEM) for f in flat])
    outs = pl.pallas_call(
        kernel,
        grid=(n_grid,),
        in_specs=[pl.BlockSpec((BWD_TILE, x_width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BWD_TILE, e_width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BWD_TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                                 memory_space=pltpu.VMEM) for f in flat]
                 + _pe_block_specs(pe_spec) + _pe_block_specs(extra_pe_spec),
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xp, ep, gp, *flat, *pe_in, *epe_in)

    gx = outs[0][:P, :raw_in]
    gextra = outs[1][:P, :raw_extra]
    flat_grads = list(outs[2:])

    # unpad into the param pytree
    it = iter(flat_grads)
    grads_tree = {"trunk": [], "dir": [], "seg": []}
    for i, p in enumerate(params["trunk"]):
        w = p["w"]
        if i == 0:
            dw = next(it)[:w.shape[0], :w.shape[1]]
        elif i == spec.skip_every:
            hid = w.shape[1]
            dwh = next(it)
            dwx = next(it)
            dw = jnp.concatenate([dwh[:hid, :hid],
                                  dwx[:w.shape[0] - hid, :hid]], axis=0)
        else:
            dw = next(it)[:w.shape[0], :w.shape[1]]
        db = next(it)[0, :p["b"].shape[0]]
        grads_tree["trunk"].append({"w": dw, "b": db})

    def head(p):
        dw = next(it)[:p["w"].shape[0], :p["w"].shape[1]]
        db = next(it)[0, :p["b"].shape[0]]
        return {"w": dw, "b": db}

    grads_tree["fc_feat"] = head(params["fc_feat"])
    grads_tree["fc_alpha"] = head(params["fc_alpha"])
    d0 = params["dir"][0]
    hid = params["fc_feat"]["w"].shape[1]
    dwd0f = next(it)
    dwd0e = next(it)
    dw0 = jnp.concatenate([dwd0f[:hid, :d0["w"].shape[1]],
                           dwd0e[:d0["w"].shape[0] - hid, :d0["w"].shape[1]]],
                          axis=0)
    db0 = next(it)[0, :d0["b"].shape[0]]
    grads_tree["dir"].append({"w": dw0, "b": db0})
    for p in params["dir"][1:]:
        grads_tree["dir"].append(head(p))
    grads_tree["fc_rgb"] = head(params["fc_rgb"])
    for p in params["seg"]:
        grads_tree["seg"].append(head(p))
    grads_tree["fc_seg"] = head(params["fc_seg"])
    return gx, gextra, grads_tree


# ===========================================================================
# NeRFMLP with PER-RAY direction PE ("rayd" variant)
#
# Points arrive ray-major ((ray, sample) order, S samples per ray), so a
# point tile of TILE rows covers exactly G = TILE // S whole rays. The
# direction PE (27 slots + sin) is computed once per RAY on a (G, ·) block —
# S times less transcendental work than the per-point variant — and the
# dir-branch's first-layer contribution is expanded to points by one tiny
# (TILE, G) indicator matmul. The spatial embedding stays a per-point input
# (no PE). Ray directions carry no gradient (they are camera data, nothing
# upstream is trainable), so the dirs cotangent is simply not computed.
# ===========================================================================

@dataclasses.dataclass(frozen=True)
class NerfRaydSpec:
    num_layers: int
    skip_every: int
    in_dim: int        # padded pe(xyz)+pe(ambient) dim
    hidden: int        # padded trunk hidden (256)
    branch: int        # padded branch hidden (128)
    dir_raw: int       # UNpadded pe(dir) dim (27)
    se_dim: int        # spatial-embedding channels (32) or 0
    samples: int       # S — points per ray (static)
    compute_dtype: str = "bfloat16"
    # corner-interp mode: the kernel's spatial-embedding input is the
    # (T, 8*se_dim) packed corner rows (one XLA row-gather per point) and
    # the trilinear interpolation runs IN-kernel from the warped coords
    # (x_raw cols 0:3); the bwd also emits the warped-coords cotangent of
    # the sample (corner differences) folded into gx. Replaces the
    # separate XLA interp + Pallas dCoords of ops/grid.py on the hot path.
    corner_interp: bool = False
    grid_dims: Tuple[int, int, int] = (32, 32, 32)   # (D, H, W)


def _interp_corners(x_raw, corners, dims, C, f32):
    """In-kernel trilinear interp from packed corner rows.
    x_raw (T, >=3) warped coords in [-1,1] (cols x,y,z -> grid W,H,D),
    corners (T, 8C) rows of ops/grid.pack_corner_table (slot order
    (dz,dy,dx)) -> (se (T, C) f32, aux for the backward). Semantics match
    ops/grid.py exactly: align_corners=True + zeros padding (the table's
    zero border realizes out-of-range corners; okf masks out-of-band
    points). Reference: torch F.grid_sample, models.py:346-365."""
    D_, H_, W_ = dims
    fs, ok = [], None
    for axis, n in ((0, W_), (1, H_), (2, D_)):
        # MUST be the exact expression of ops/grid._cell_geometry: the XLA
        # row selection floors (c + 1) * 0.5 * (n-1); a reassociated form
        # can floor boundary points into a different cell than the row
        # that was gathered.
        i = (x_raw[:, axis:axis + 1].astype(f32) + 1.0) * (0.5 * (n - 1))
        i0 = jnp.floor(i)
        fs.append(i - i0)
        band = (i0 >= -1) & (i0 <= n - 1)
        ok = band if ok is None else ok & band
    fx, fy, fz = fs
    okf = ok.astype(f32)
    ws = []
    for dz in (0, 1):
        wz = fz if dz else 1.0 - fz
        for dy in (0, 1):
            wy = fy if dy else 1.0 - fy
            for dx in (0, 1):
                wx = fx if dx else 1.0 - fx
                ws.append(wz * wy * wx * okf)
    cf = corners.astype(f32)
    se = None
    for s in range(8):
        contrib = cf[:, s * C:(s + 1) * C] * ws[s]
        se = contrib if se is None else se + contrib
    return se, (fx, fy, fz, okf, cf)


def _corner_dcoords(gse, aux, dims, C, f32):
    """Warped-coords cotangent of the in-kernel trilinear sample:
    d out/d f_axis is the corner sum with that axis' weight replaced by
    +-1 (ops/grid.py:_grid_sample_bwd). gse (T, C) f32 -> (T, 3)."""
    fx, fy, fz, okf, cf = aux
    dfx = dfy = dfz = 0.0
    for s in range(8):
        dz_, dy_, dx_ = (s >> 2) & 1, (s >> 1) & 1, s & 1
        gv = jnp.sum(gse * cf[:, s * C:(s + 1) * C], axis=-1, keepdims=True)
        wz = fz if dz_ else 1.0 - fz
        wy = fy if dy_ else 1.0 - fy
        wx = fx if dx_ else 1.0 - fx
        dfx = dfx + (1.0 if dx_ else -1.0) * wz * wy * gv
        dfy = dfy + (1.0 if dy_ else -1.0) * wz * wx * gv
        dfz = dfz + (1.0 if dz_ else -1.0) * wy * wx * gv
    D_, H_, W_ = dims
    return jnp.concatenate(
        [dfx * okf * (0.5 * (W_ - 1)),
         dfy * okf * (0.5 * (H_ - 1)),
         dfz * okf * (0.5 * (D_ - 1))], axis=-1)


def _flatten_nerf_weights_rayd(spec: NerfRaydSpec, params):
    """Like _flatten_nerf_weights but the dir layer-0 weight splits three
    ways: [feat(H) ; pe_dir(dir_raw) ; se(se_dim)] row blocks (the
    reference's dir-branch input concat order, modules.py:276-280)."""
    D, H, B = spec.in_dim, spec.hidden, spec.branch
    wdt = jnp.dtype(spec.compute_dtype)
    _c = lambda a: a.astype(wdt)
    flat = []
    for i, p in enumerate(params["trunk"]):
        if i == 0:
            flat.append(_c(_pad2(p["w"], D, H)))
        elif i == spec.skip_every:
            hid = p["w"].shape[1]
            flat.append(_c(_pad2(p["w"][:hid], H, H)))
            flat.append(_c(_pad2(p["w"][hid:], D, H)))
        else:
            flat.append(_c(_pad2(p["w"], H, H)))
        flat.append(_pad_bias(p["b"], H))
    flat.append(_c(_pad2(params["fc_feat"]["w"], H, H)))
    flat.append(_pad_bias(params["fc_feat"]["b"], H))
    flat.append(_c(_pad2(params["fc_alpha"]["w"], H, 128)))
    flat.append(_pad_bias(params["fc_alpha"]["b"], 128))
    d0 = params["dir"][0]
    hid = params["fc_feat"]["w"].shape[1]
    dr, se = spec.dir_raw, spec.se_dim
    flat.append(_c(_pad2(d0["w"][:hid], H, B)))                    # feat part
    flat.append(_c(_pad2(d0["w"][hid:hid + dr], _rup(dr), B)))     # dir part
    if se:
        flat.append(_c(_pad2(d0["w"][hid + dr:hid + dr + se], se, B)))
    flat.append(_pad_bias(d0["b"], B))
    for p in params["dir"][1:]:
        flat.append(_c(_pad2(p["w"], B, B)))
        flat.append(_pad_bias(p["b"], B))
    flat.append(_c(_pad2(params["fc_rgb"]["w"], B, 128)))
    flat.append(_pad_bias(params["fc_rgb"]["b"], 128))
    flat.append(_c(_pad2(params["seg"][0]["w"], H, B)))
    flat.append(_pad_bias(params["seg"][0]["b"], B))
    for p in params["seg"][1:]:
        flat.append(_c(_pad2(p["w"], B, B)))
        flat.append(_pad_bias(p["b"], B))
    flat.append(_c(_pad2(params["fc_seg"]["w"], B, 128)))
    flat.append(_pad_bias(params["fc_seg"]["b"], 128))
    return flat


def _rayd_unflatten(spec: NerfRaydSpec, vals):
    """vals (in _flatten_nerf_weights_rayd order) -> named weight dict."""
    it = iter(vals)
    ws, bs = [], []
    for i in range(spec.num_layers):
        if i == spec.skip_every and i > 0:
            ws.append((next(it), next(it)))
        else:
            ws.append(next(it))
        bs.append(next(it))
    W = dict(ws=ws, bs=bs)
    W["wf"], W["bf"] = next(it), next(it)
    W["wa"], W["ba"] = next(it), next(it)
    W["wd0f"] = next(it)
    W["wd0d"] = next(it)
    W["wd0s"] = next(it) if spec.se_dim else None
    W["bd0"] = next(it)
    W["dir_rest"] = [(next(it), next(it)) for _ in range(3)]
    W["wrgb"], W["brgb"] = next(it), next(it)
    W["ws0"], W["bs0"] = next(it), next(it)
    W["seg_rest"] = [(next(it), next(it)) for _ in range(3)]
    W["wseg"], W["bseg"] = next(it), next(it)
    return W


def _ray_expand(tile: int, S: int, dtype):
    """(tile, tile // S) 0/1 indicator: expand[p, g] = [p // S == g].
    expand @ per_ray broadcasts ray rows to points; expand.T @ per_point
    sums points per ray — both ride the MXU, no 3-D reshapes in Mosaic."""
    G = tile // S
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, G), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, G), 1)
    return (row // S == col).astype(dtype)


def _rayd_forward_math(spec: NerfRaydSpec, x, dir_pe, se, W,
                       keep: bool = False, expand=None):
    """x (T, in_dim), dir_pe (G, pe_dir padded), se (T, se_dim) or None.
    expand: optional precomputed (T, G) 0/1 ray-expand block (the fused
    level kernels pass it as a VMEM-resident input — these kernels are
    VPU-bound and per-tile iota+compare regeneration is real cost)."""
    cdt = jnp.dtype(spec.compute_dtype)
    leaky = _act("leaky")
    tspec = TrunkSpec(spec.num_layers, spec.skip_every, spec.in_dim,
                      spec.hidden, 0, act="leaky",
                      compute_dtype=spec.compute_dtype)
    acts = {}
    if keep:
        h, trunk_acts = _trunk_forward(tspec, x, W["ws"], W["bs"], keep=True)
        acts["trunk"] = trunk_acts
    else:
        h = _trunk_forward(tspec, x, W["ws"], W["bs"])
    feat = _mm(h, W["wf"], cdt) + W["bf"]
    alpha = _mm(feat, W["wa"], cdt) + W["ba"]
    if expand is None:
        expand = _ray_expand(x.shape[0], spec.samples, cdt)
    else:
        expand = expand.astype(cdt)
    dir_head = _mm(dir_pe, W["wd0d"], cdt)            # (G, B)
    d_in = (_mm(feat, W["wd0f"], cdt)
            + _mm(expand, dir_head.astype(cdt), cdt) + W["bd0"])
    if spec.se_dim:
        d_in = d_in + _mm(se, W["wd0s"], cdt)
    d = leaky(d_in)
    dacts = [d]
    for wd, bd in W["dir_rest"]:
        d = leaky(_mm(d, wd, cdt) + bd)
        dacts.append(d)
    rgb = _mm(d, W["wrgb"], cdt) + W["brgb"]
    s = leaky(_mm(feat, W["ws0"], cdt) + W["bs0"])
    sacts = [s]
    for wsk, bsk in W["seg_rest"]:
        s = leaky(_mm(s, wsk, cdt) + bsk)
        sacts.append(s)
    seg = _mm(s, W["wseg"], cdt) + W["bseg"]
    if keep:
        acts.update(feat=feat, dacts=dacts, sacts=sacts, expand=expand,
                    dir_head=dir_head, dir_pe=dir_pe)
        return rgb, seg, alpha, acts
    return rgb, seg, alpha


def nerf_rayd_forward(spec: NerfRaydSpec, pts_raw: jnp.ndarray,
                      dirs_ray: jnp.ndarray, se, params,
                      pe_spec: PESpec, dir_pe_spec: PESpec) -> jnp.ndarray:
    """pts_raw (P, <=pe in_width) packed [xyz(+ambient)], dirs_ray (R, 3)
    with P == R * spec.samples, se (P, se_dim) or None -> (P, 16)."""
    P = pts_raw.shape[0]
    S = spec.samples
    assert TILE % S == 0
    Pp = _rup(P, TILE)
    Rp = Pp // S
    G = TILE // S
    xw = pe_spec.in_width
    dw = dir_pe_spec.in_width
    # pts_raw may be WIDER than the PE input (the deform pair's packed
    # 128-col output): the kernel then takes full-width blocks (Mosaic
    # requires lane dims of 128 or the whole array) and lane-slices to xw
    # in-kernel — no XLA slice/pad materializes in between.
    xp = (pts_raw if pts_raw.shape[1] >= xw
          else jnp.pad(pts_raw, ((0, 0), (0, xw - pts_raw.shape[1]))))
    if Pp > P:
        xp = jnp.pad(xp, ((0, Pp - P), (0, 0)))
    xw_blk = xp.shape[1]
    dp = jnp.pad(dirs_ray, ((0, Rp - dirs_ray.shape[0]),
                            (0, dw - dirs_ray.shape[1])))
    se_width = spec.se_dim * (8 if spec.corner_interp else 1)
    se_in = []
    if spec.se_dim:
        se_p = jnp.pad(se, ((0, Pp - P), (0, 0)))
        se_in = [se_p if spec.corner_interp
                 else se_p.astype(jnp.dtype(spec.compute_dtype))]
    flat = _flatten_nerf_weights_rayd(spec, params)
    n_flat = len(flat)
    pe_in = _pe_input_arrays(pe_spec)
    dpe_in = _pe_input_arrays(dir_pe_spec)
    n_pe, n_dpe = len(pe_in), len(dpe_in)
    cdt = jnp.dtype(spec.compute_dtype)
    n_se = len(se_in)

    def kernel(x_ref, d_ref, *refs):
        se_refs = refs[:n_se]
        w_refs = refs[n_se:n_se + n_flat]
        pe_refs = refs[n_se + n_flat:n_se + n_flat + n_pe]
        dpe_refs = refs[n_se + n_flat + n_pe:n_se + n_flat + n_pe + n_dpe]
        o_ref = refs[n_se + n_flat + n_pe + n_dpe]
        W = _rayd_unflatten(spec, [r[:] for r in w_refs])
        x_raw = x_ref[:]
        if xw_blk > xw:
            x_raw = x_raw[:, :xw]
        x_t = _pe_apply(x_raw, pe_refs).astype(cdt)
        dir_pe = _pe_apply(d_ref[:], dpe_refs).astype(cdt)
        se_t = None
        if n_se:
            if spec.corner_interp:
                se_t, _ = _interp_corners(x_raw, se_refs[0][:],
                                          spec.grid_dims, spec.se_dim,
                                          jnp.float32)
                se_t = se_t.astype(cdt)
            else:
                se_t = se_refs[0][:]
        rgb, seg, alpha = _rayd_forward_math(spec, x_t, dir_pe, se_t, W)
        out = jnp.concatenate(
            [rgb[:, :3], seg[:, :12], alpha[:, :1],
             jnp.zeros((rgb.shape[0], 112), rgb.dtype)], axis=-1)
        o_ref[:] = out.astype(o_ref.dtype)

    se_specs = ([pl.BlockSpec((TILE, se_width), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] if n_se else [])
    out = pl.pallas_call(
        kernel,
        grid=(Pp // TILE,),
        in_specs=[pl.BlockSpec((TILE, xw_blk), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, dw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + se_specs
                 + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                                 memory_space=pltpu.VMEM) for f in flat]
                 + _pe_block_specs(pe_spec) + _pe_block_specs(dir_pe_spec),
        out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pp, 128), pts_raw.dtype),
        interpret=_interpret(),
    )(xp, dp, *se_in, *flat, *pe_in, *dpe_in)
    return out[:P, :16]


def nerf_rayd_vjp(spec: NerfRaydSpec, pts_raw, dirs_ray, se, params, g,
                  pe_spec: PESpec, dir_pe_spec: PESpec):
    """-> (gx wrt pts_raw, gse wrt se (or None), grads pytree). No dirs
    cotangent (camera data, never differentiated)."""
    P = pts_raw.shape[0]
    S = spec.samples
    assert BWD_TILE % S == 0
    Pp = _rup(P, BWD_TILE)
    Rp = Pp // S
    G = BWD_TILE // S
    raw_in = pts_raw.shape[1]
    xw = pe_spec.in_width
    dw = dir_pe_spec.in_width
    xp = (pts_raw if raw_in >= xw
          else jnp.pad(pts_raw, ((0, 0), (0, xw - raw_in))))
    if Pp > P:
        xp = jnp.pad(xp, ((0, Pp - P), (0, 0)))
    xw_blk = xp.shape[1]
    # gx comes back at the INPUT's width: for wide (packed) inputs the
    # kernel zero-fills the unread columns so no XLA pad is needed after.
    gx_width = raw_in if raw_in >= xw else xw
    dp = jnp.pad(dirs_ray, ((0, Rp - dirs_ray.shape[0]),
                            (0, dw - dirs_ray.shape[1])))
    gp = jnp.pad(g, ((0, Pp - P), (0, 128 - g.shape[1])))
    se_width = spec.se_dim * (8 if spec.corner_interp else 1)
    se_in = []
    if spec.se_dim:
        se_p = jnp.pad(se, ((0, Pp - P), (0, 0)))
        se_in = [se_p if spec.corner_interp
                 else se_p.astype(jnp.dtype(spec.compute_dtype))]
    flat = _flatten_nerf_weights_rayd(spec, params)
    n_flat = len(flat)
    pe_in = _pe_input_arrays(pe_spec)
    dpe_in = _pe_input_arrays(dir_pe_spec)
    n_pe, n_dpe = len(pe_in), len(dpe_in)
    n_se = len(se_in)
    n_grid = Pp // BWD_TILE
    cdt = jnp.dtype(spec.compute_dtype)
    leakyd = _dact_from_out("leaky")

    def kernel(x_ref, d_ref, g_ref, *refs):
        se_refs = refs[:n_se]
        w_refs = refs[n_se:n_se + n_flat]
        pe_refs = refs[n_se + n_flat:n_se + n_flat + n_pe]
        dpe_refs = refs[n_se + n_flat + n_pe:n_se + n_flat + n_pe + n_dpe]
        o_at = n_se + n_flat + n_pe + n_dpe
        gx_ref = refs[o_at]
        gse_ref = refs[o_at + 1] if n_se else None
        dw_refs = refs[o_at + 1 + n_se:]
        W = _rayd_unflatten(spec, [r[:] for r in w_refs])
        x_raw = x_ref[:]
        if xw_blk > xw:
            x_raw = x_raw[:, :xw]
        if _BWD_STAGE >= 0:
            probe = x_raw
            if _BWD_STAGE >= 1:
                probe = _pe_apply(x_raw, pe_refs)
            if _BWD_STAGE >= 2:
                tspec_p = TrunkSpec(spec.num_layers, spec.skip_every,
                                    spec.in_dim, spec.hidden, 0, act="leaky",
                                    compute_dtype=spec.compute_dtype)
                probe = _trunk_forward(tspec_p, probe.astype(cdt),
                                       W["ws"], W["bs"])
            gx_ref[:] = jnp.broadcast_to(
                jnp.sum(probe, axis=-1, keepdims=True) + g_ref[0, 0],
                gx_ref.shape).astype(gx_ref.dtype)
            if not _BWD_NO_DWREFS:
                _accumulate(dw_refs, [jnp.zeros(r.shape, jnp.float32)
                                      for r in dw_refs], pl.program_id(0) == 0)
            if gse_ref is not None:
                gse_ref[:] = jnp.zeros(gse_ref.shape, gse_ref.dtype)
            return
        x_t = _pe_apply(x_raw, pe_refs)
        dir_pe = _pe_apply(d_ref[:], dpe_refs).astype(cdt)
        se_t = None
        se_aux = None
        if n_se:
            if spec.corner_interp:
                se_f32, se_aux = _interp_corners(x_raw, se_refs[0][:],
                                                 spec.grid_dims, spec.se_dim,
                                                 jnp.float32)
                se_t = se_f32.astype(cdt)
            else:
                se_t = se_refs[0][:]
        rgb, seg, alpha, acts = _rayd_forward_math(spec, x_t, dir_pe, se_t,
                                                   W, keep=True)
        g_t = g_ref[:]
        grgb = jnp.concatenate(
            [g_t[:, :3], jnp.zeros_like(g_t[:, :125])], axis=-1)
        gseg = jnp.concatenate(
            [g_t[:, 3:15], jnp.zeros_like(g_t[:, :116])], axis=-1)
        galpha = jnp.concatenate(
            [g_t[:, 15:16], jnp.zeros_like(g_t[:, :127])], axis=-1)

        feat = acts["feat"]
        dacts = acts["dacts"]
        sacts = acts["sacts"]

        # seg head
        dwseg = _mmT(sacts[3], gseg, cdt)
        dbseg = jnp.sum(gseg, axis=0, keepdims=True)
        gs = _mm(gseg, W["wseg"].T, cdt)
        seg_grads = []
        for k in range(3, 0, -1):
            gz = gs * leakyd(sacts[k])
            wsk, _ = W["seg_rest"][k - 1]
            seg_grads.append((_mmT(sacts[k - 1], gz, cdt),
                              jnp.sum(gz, axis=0, keepdims=True)))
            gs = _mm(gz, wsk.T, cdt)
        gz0 = gs * leakyd(sacts[0])
        dws0 = _mmT(feat, gz0, cdt)
        dbs0 = jnp.sum(gz0, axis=0, keepdims=True)
        gfeat = _mm(gz0, W["ws0"].T, cdt)

        # dir head
        dwrgb = _mmT(dacts[3], grgb, cdt)
        dbrgb = jnp.sum(grgb, axis=0, keepdims=True)
        gd = _mm(grgb, W["wrgb"].T, cdt)
        dir_grads = []
        for k in range(3, 0, -1):
            gz = gd * leakyd(dacts[k])
            wd, _ = W["dir_rest"][k - 1]
            dir_grads.append((_mmT(dacts[k - 1], gz, cdt),
                              jnp.sum(gz, axis=0, keepdims=True)))
            gd = _mm(gz, wd.T, cdt)
        gzd0 = gd * leakyd(dacts[0])
        dwd0f = _mmT(feat, gzd0, cdt)
        # per-ray sum of gzd0, then contract with the per-ray dir PE
        gsum = _mmT(acts["expand"], gzd0, cdt)          # (G, B)
        dwd0d = _mmT(dir_pe, gsum, cdt)                 # (pe_dir, B)
        dbd0 = jnp.sum(gzd0, axis=0, keepdims=True)
        gfeat = gfeat + _mm(gzd0, W["wd0f"].T, cdt)
        gse_val = None
        if n_se:
            dwd0s = _mmT(se_t, gzd0, cdt)
            gse_val = _mm(gzd0, W["wd0s"].T, cdt)[:, :spec.se_dim]
            gse_ref[:] = gse_val.astype(gse_ref.dtype)

        # alpha head
        dwa = _mmT(feat, galpha, cdt)
        dba = jnp.sum(galpha, axis=0, keepdims=True)
        gfeat = gfeat + _mm(galpha, W["wa"].T, cdt)

        # feat (linear)
        h_last = acts["trunk"][-1]
        dwf = _mmT(h_last, gfeat, cdt)
        dbf = jnp.sum(gfeat, axis=0, keepdims=True)
        gh = _mm(gfeat, W["wf"].T, cdt)

        tspec = TrunkSpec(spec.num_layers, spec.skip_every, spec.in_dim,
                          spec.hidden, 0, act="leaky",
                          compute_dtype=spec.compute_dtype)
        gx, dws, dbs = _trunk_backward(tspec, x_t, W["ws"], W["bs"],
                                       acts["trunk"], gh)
        if _BWD_SKIP_GX:
            gx_ref[:] = jnp.zeros(gx_ref.shape, gx_ref.dtype)
        else:
            gx = _pe_bwd(x_raw, gx, pe_refs)
            if se_aux is not None:
                # warped-coords cotangent of the in-kernel trilinear sample
                dc = _corner_dcoords(gse_val, se_aux, spec.grid_dims,
                                     spec.se_dim, jnp.float32)
                gx = gx + jnp.concatenate(
                    [dc, jnp.zeros((dc.shape[0], gx.shape[1] - 3),
                                   jnp.float32)], axis=-1)
            if gx_width > gx.shape[1]:
                gx = jnp.concatenate(
                    [gx, jnp.zeros((gx.shape[0], gx_width - gx.shape[1]),
                                   gx.dtype)], axis=-1)
            gx_ref[:] = gx.astype(gx_ref.dtype)

        grads = []
        for i in range(spec.num_layers):
            if i == spec.skip_every and i > 0:
                grads.extend([dws[i][0], dws[i][1]])
            else:
                grads.append(dws[i])
            grads.append(dbs[i])
        grads.extend([dwf, dbf, dwa, dba, dwd0f, dwd0d])
        if n_se:
            grads.append(dwd0s)
        grads.append(dbd0)
        for dw_, db_ in reversed(dir_grads):
            grads.extend([dw_, db_])
        grads.extend([dwrgb, dbrgb, dws0, dbs0])
        for dw_, db_ in reversed(seg_grads):
            grads.extend([dw_, db_])
        grads.extend([dwseg, dbseg])
        if _BWD_SKIP_DW or _BWD_NO_DWREFS:
            # NO_DWREFS must also drop the dW compute (not just the refs),
            # or the timing still includes the full contraction chain.
            grads = [jnp.zeros(r.shape, jnp.float32) for r in dw_refs]
        _accumulate(dw_refs, grads, pl.program_id(0) == 0)

    out_shapes = [jax.ShapeDtypeStruct((Pp, gx_width), pts_raw.dtype)]
    out_specs = [pl.BlockSpec((BWD_TILE, gx_width), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if n_se:
        out_shapes.append(jax.ShapeDtypeStruct((Pp, spec.se_dim),
                                               pts_raw.dtype))
        out_specs.append(pl.BlockSpec((BWD_TILE, spec.se_dim),
                                      lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    if not _BWD_NO_DWREFS:
        out_shapes += [jax.ShapeDtypeStruct(f.shape, jnp.float32)
                       for f in flat]
        out_specs += [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                                   memory_space=pltpu.VMEM) for f in flat]
    se_specs = ([pl.BlockSpec((BWD_TILE, se_width), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] if n_se else [])
    outs = pl.pallas_call(
        kernel,
        grid=(n_grid,),
        in_specs=[pl.BlockSpec((BWD_TILE, xw_blk), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, dw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BWD_TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + se_specs
                 + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                                 memory_space=pltpu.VMEM) for f in flat]
                 + _pe_block_specs(pe_spec) + _pe_block_specs(dir_pe_spec),
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=(None if _BWD_NO_VMEMLIM else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)),
        interpret=_interpret(),
    )(xp, dp, gp, *se_in, *flat, *pe_in, *dpe_in)

    gx = outs[0][:P, :raw_in]
    gse = outs[1][:P].astype(pts_raw.dtype) if n_se else None
    if _BWD_NO_DWREFS:
        flat_grads = [jnp.zeros(f.shape, jnp.float32) for f in flat]
    else:
        flat_grads = list(outs[1 + n_se:])

    it = iter(flat_grads)
    grads_tree = {"trunk": [], "dir": [], "seg": []}
    for i, p in enumerate(params["trunk"]):
        w = p["w"]
        if i == 0:
            dw = next(it)[:w.shape[0], :w.shape[1]]
        elif i == spec.skip_every:
            hid = w.shape[1]
            dwh = next(it)
            dwx = next(it)
            dw = jnp.concatenate([dwh[:hid, :hid],
                                  dwx[:w.shape[0] - hid, :hid]], axis=0)
        else:
            dw = next(it)[:w.shape[0], :w.shape[1]]
        db = next(it)[0, :p["b"].shape[0]]
        grads_tree["trunk"].append({"w": dw, "b": db})

    def head(p):
        dw = next(it)[:p["w"].shape[0], :p["w"].shape[1]]
        db = next(it)[0, :p["b"].shape[0]]
        return {"w": dw, "b": db}

    grads_tree["fc_feat"] = head(params["fc_feat"])
    grads_tree["fc_alpha"] = head(params["fc_alpha"])
    d0 = params["dir"][0]
    hid = params["fc_feat"]["w"].shape[1]
    B_real = d0["w"].shape[1]
    dwd0f = next(it)[:hid, :B_real]
    dwd0d = next(it)[:spec.dir_raw, :B_real]
    parts = [dwd0f, dwd0d]
    if spec.se_dim:
        parts.append(next(it)[:spec.se_dim, :B_real])
    dw0 = jnp.concatenate(parts, axis=0)
    db0 = next(it)[0, :d0["b"].shape[0]]
    grads_tree["dir"].append({"w": dw0, "b": db0})
    for p in params["dir"][1:]:
        grads_tree["dir"].append(head(p))
    grads_tree["fc_rgb"] = head(params["fc_rgb"])
    for p in params["seg"]:
        grads_tree["seg"].append(head(p))
    grads_tree["fc_seg"] = head(params["fc_seg"])
    return gx, gse, grads_tree


def _rayd_spec_of(num_layers, skip_every, pe_dim, dir_raw, se_dim, samples,
                  compute_dtype, params):
    hidden = params["fc_feat"]["w"].shape[1]
    return NerfRaydSpec(num_layers=num_layers, skip_every=skip_every,
                        in_dim=_rup(pe_dim), hidden=_rup(hidden),
                        branch=_rup(hidden // 2), dir_raw=dir_raw,
                        se_dim=se_dim, samples=samples,
                        compute_dtype=compute_dtype), hidden


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _nerf_rayd_fused(num_layers, skip_every, pe_dim, se_dim, samples,
                     compute_dtype, pe_spec, dir_pe_spec,
                     params, pts_raw, dirs_ray, se, cond):
    spec, hidden = _rayd_spec_of(num_layers, skip_every, pe_dim,
                                 dir_pe_spec.raw_out, se_dim, samples,
                                 compute_dtype, params)
    trunk = fold_conditioning(params["trunk"], cond, pe_dim)
    trunk = fold_skip_conditioning(hidden, trunk, skip_every, cond, pe_dim)
    p2 = dict(params)
    p2["trunk"] = trunk
    return nerf_rayd_forward(spec, pts_raw, dirs_ray, se, p2,
                             pe_spec, dir_pe_spec)


def _nerf_rayd_fwd(num_layers, skip_every, pe_dim, se_dim, samples,
                   compute_dtype, pe_spec, dir_pe_spec,
                   params, pts_raw, dirs_ray, se, cond):
    y = _nerf_rayd_fused(num_layers, skip_every, pe_dim, se_dim, samples,
                         compute_dtype, pe_spec, dir_pe_spec,
                         params, pts_raw, dirs_ray, se, cond)
    return y, (params, pts_raw, dirs_ray, se, cond)


def _nerf_rayd_bwd(num_layers, skip_every, pe_dim, se_dim, samples,
                   compute_dtype, pe_spec, dir_pe_spec, res, g):
    params, pts_raw, dirs_ray, se, cond = res
    spec, hidden = _rayd_spec_of(num_layers, skip_every, pe_dim,
                                 dir_pe_spec.raw_out, se_dim, samples,
                                 compute_dtype, params)
    trunk = fold_conditioning(params["trunk"], cond, pe_dim)
    trunk = fold_skip_conditioning(hidden, trunk, skip_every, cond, pe_dim)
    p2 = dict(params)
    p2["trunk"] = trunk
    gx, gse, grads_folded = nerf_rayd_vjp(spec, pts_raw, dirs_ray, se, p2, g,
                                          pe_spec, dir_pe_spec)
    trunk_grads, dcond = _unfold_cond_grads(params["trunk"],
                                            grads_folded["trunk"], cond,
                                            skip_every, hidden, pe_dim)
    grads = dict(grads_folded)
    grads["trunk"] = trunk_grads
    if gse is None and se is not None:
        gse = jnp.zeros_like(se)
    return (grads, gx, jnp.zeros_like(dirs_ray), gse, dcond)


_nerf_rayd_fused.defvjp(_nerf_rayd_fwd, _nerf_rayd_bwd)


def nerf_mlp_apply_rayd(params, num_layers: int, skip_every: int,
                        pts_raw: jnp.ndarray, dirs_ray: jnp.ndarray,
                        se, samples: int, cond: jnp.ndarray,
                        compute_dtype: str = "bfloat16",
                        pe_spec: PESpec = None,
                        dir_pe_spec: PESpec = None) -> jnp.ndarray:
    """Fused NeRFMLP with per-ray direction PE. pts_raw (P, <=in_width)
    packed raw [warped xyz, ambient]; dirs_ray (R, 3) RAW per-ray directions
    with P == R * samples (ray-major point order); se (P, se_dim) spatial
    embedding or None; cond = per-frame trunk conditioning. Returns (P, 16).
    Dirs carry no cotangent (camera data)."""
    pe_dim = pe_spec.raw_out
    se_dim = se.shape[-1] if se is not None else 0
    return _nerf_rayd_fused(num_layers, skip_every, pe_dim, se_dim, samples,
                            compute_dtype, pe_spec, dir_pe_spec,
                            params, pts_raw, dirs_ray,
                            se if se_dim else None, cond)


# ===========================================================================
# Fully-fused render level: NeRF MLP + volume compositing in ONE kernel
#
# The rayd kernel's point tiles cover whole rays, so the per-ray
# exclusive-cumprod compositing (reference volume_rendering_utils.py:7-78)
# can run inside the kernel and the kernel can emit PER-RAY outputs
# (rgb_map (R, 15), weights (R, S)) instead of the (P, 128) raw field.
# This removes the raw round-trip AND the whole XLA compositing chain —
# every (R, S, 15) op out there is lane-padded to 128 (~134 MB each).
#
# Mosaic-friendly formulation (no 3-D reshapes):
#   - all per-point scalars live as (TILE, 1) columns;
#   - ray<->point moves are 0/1-matrix matmuls: expand (TILE, G) broadcasts
#     per-ray rows to points, sel (TILE, S) picks the in-ray sample slot;
#   - the exclusive cumprod is exp(M @ log(1-alpha+1e-10)) with M the
#     (TILE, TILE) block-diagonal strictly-lower 0/1 matrix (one matmul);
#   - 0/1 matrices are exact in bf16; the f32 operand is hi/lo-split like
#     the PE dot, so the compositing matches the f32 oracle to rounding.
# ===========================================================================

def _sel_matrix(tile: int, S: int, dtype):
    """(tile, S) 0/1: sel[p, s] = [p % S == s]."""
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, S), 1)
    return ((row % S) == col).astype(dtype)


def _01dot(mask, v, exact: bool):
    """mask @ v where mask is 0/1 (exact in bf16) and v is f32.
    exact=True: hi/lo split of v -> f32-exact in two DEFAULT passes.
    exact=False: single bf16 pass (training bf16 mode)."""
    if not exact:
        return jnp.dot(mask, v.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(mask, hi, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
            + jnp.dot(mask, lo, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT))


def _01dotT(mask, v, exact: bool):
    """mask.T @ v (contract dim 0 of both) with the same 0/1 exactness."""
    dn = (((0,), (0,)), ((), ()))
    if not exact:
        return jax.lax.dot_general(mask, v.astype(jnp.bfloat16), dn,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jax.lax.dot_general(mask, hi, dn,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
            + jax.lax.dot_general(mask, lo, dn,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.DEFAULT))


def _excl_cumsum_lanes(x, reverse: bool = False):
    """EXCLUSIVE cumulative sum along the last (lane) axis via log2(S)
    shifted adds — O(S log S) VPU work on a (G, S) block, no (TILE, TILE)
    mask matmuls. reverse=True gives the transpose (sum over later lanes),
    i.e. the backward of the forward scan."""
    S = x.shape[-1]
    c = x
    k = 1
    while k < S:
        if reverse:
            shifted = jnp.concatenate(
                [c[:, k:], jnp.zeros_like(c[:, :k])], axis=-1)
        else:
            shifted = jnp.concatenate(
                [jnp.zeros_like(c[:, :k]), c[:, :-k]], axis=-1)
        c = c + shifted
        k *= 2
    return c - x


def _composite_fwd(spec: NerfRaydSpec, rgb, seg, alpha, z, rd_raw, bg,
                   noise, has_bg: bool, exact: bool, keep: bool = False,
                   consts=None):
    """In-kernel compositing on one tile (G rays x S samples = TILE points).
    rgb/seg/alpha: (TILE, 128) head blocks; z/noise: (G, S); rd_raw: (G, >=3)
    raw ray dirs; bg: (G, 16) raw prior or None. Returns (rgb_map (G, 16),
    weights (G, S)) [+ stash dict when keep].

    The transmittance scan runs entirely in the per-RAY (G, S) layout:
    the per-point sigma column crosses to (G, S) through one tiny 0/1
    matmul, the exclusive cumsum of log-transmittance is log2(S) lane
    shifts, and only the channel compositing touches per-point rows. The
    earlier (TILE, TILE) cum-matrix formulation generated and multiplied
    1024^2 masks per tile — measured 2.7 ms/step SLOWER than not fusing."""
    S = spec.samples
    tile = rgb.shape[0]
    G = tile // S
    f32 = jnp.float32

    dz = jnp.concatenate([z[:, 1:] - z[:, :-1],
                          jnp.full((G, 1), 1e10, f32)], axis=-1)
    rdn = jnp.sqrt(jnp.sum(rd_raw[:, :3].astype(f32) ** 2, axis=-1,
                           keepdims=True))
    dists = dz * rdn                                       # (G, S)

    if consts is not None:
        expand = consts[0].astype(jnp.bfloat16)
        sel = consts[1].astype(f32)
    else:
        expand = _ray_expand(tile, S, jnp.bfloat16)        # exact 0/1
        sel = _sel_matrix(tile, S, f32)

    sig_pt = alpha[:, :1].astype(f32)                      # (TILE, 1)
    sig_gs = _01dotT(expand, sig_pt * sel, exact)          # (G, S)
    if noise is not None:
        sig_gs = sig_gs + noise
    col = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
    is_last_gs = (col == S - 1).astype(f32)
    sigma = jnp.maximum(sig_gs, 0.0) + 1e-6 * is_last_gs
    # Keep the transmittance term t = exp(-sigma*dist) = 1 - alpha explicitly:
    # reconstructing it as (1.0 - alpha + 1e-10) lets XLA reassociate the
    # constants into (1.0 + 1e-10) - alpha == 0.0 at alpha == 1, whose
    # log(-inf) NaN-poisons the cumsum (0 * -inf).
    t_term = jnp.exp(-sigma * dists)                       # (G, S)
    alpha_gs = 1.0 - t_term
    logterm = jnp.log(t_term + 1e-10)
    T = jnp.exp(_excl_cumsum_lanes(logterm))               # (G, S)
    w_gs = alpha_gs * T                                    # == weights out

    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    is_last = ((row % S) == S - 1).astype(f32)
    rgb_sig = jax.nn.sigmoid(rgb[:, :3].astype(f32))       # (TILE, 3)
    if has_bg:
        sl = seg[:, :12].astype(f32)
        mx = jnp.max(sl, axis=-1, keepdims=True)
        e = jnp.exp(sl - mx)
        ssm = e / jnp.sum(e, axis=-1, keepdims=True)
        ch = jnp.concatenate(
            [rgb_sig, ssm, jnp.zeros((tile, 1), f32)], axis=-1)
        bg_flat = _01dot(expand, bg.astype(f32), exact)    # (TILE, 16)
        ch = jnp.where(is_last > 0, bg_flat, ch)
        ssm_s = ssm
    else:
        # reference no-prior path: sigmoid on ALL channels, no softmax,
        # no last-row substitution (volume_rendering_utils.py:62)
        seg_sig = jax.nn.sigmoid(seg[:, :12].astype(f32))
        ch = jnp.concatenate(
            [rgb_sig, seg_sig, jnp.zeros((tile, 1), f32)], axis=-1)
        ssm_s = seg_sig

    w_flat = jnp.sum(_01dot(expand, w_gs, exact) * sel, axis=-1,
                     keepdims=True)                        # (TILE, 1)
    rgb_map = _01dotT(expand, w_flat * ch, exact)          # (G, 16)
    weights = w_gs
    if not keep:
        return rgb_map, weights
    stash = dict(expand=expand, sel=sel, is_last=is_last, sig_gs=sig_gs,
                 dists=dists, alpha_gs=alpha_gs, t_term=t_term, T=T,
                 w_flat=w_flat, ch=ch, rgb_sig=rgb_sig, ssm=ssm_s)
    return rgb_map, weights, stash


def _composite_bwd(spec: NerfRaydSpec, st, g_rgb, g_w, has_bg: bool,
                   exact: bool):
    """Backward of _composite_fwd given per-ray cotangents g_rgb (G, 16),
    g_w (G, S). Returns (grgb3 (TILE,3), gseg12 (TILE,12),
    gsigraw (TILE,1), g_bg (G,16))."""
    expand, sel = st["expand"], st["sel"]
    T, alpha_gs, ch = st["T"], st["alpha_gs"], st["ch"]
    w_flat, t_term = st["w_flat"], st["t_term"]
    is_last = st["is_last"]
    f32 = jnp.float32

    g_rgb_flat = _01dot(expand, g_rgb.astype(f32), exact)   # (TILE, 16)
    g_ch = w_flat * g_rgb_flat                               # (TILE, 16)
    g_bg = _01dotT(expand, is_last * g_ch, exact) if has_bg \
        else jnp.zeros_like(g_rgb)

    # dL/dw in (G, S): the external weights cotangent plus the channel dot
    cg_pt = jnp.sum(ch * g_rgb_flat, axis=-1, keepdims=True)  # (TILE, 1)
    g_w_tot = g_w.astype(f32) + _01dotT(expand, cg_pt * sel, exact)

    # alpha/T chain: w = a*T, T = exp(exclusive_cumsum(log t))
    g_T = g_w_tot * alpha_gs
    g_cum = T * g_T
    g_logterm = _excl_cumsum_lanes(g_cum, reverse=True)      # transpose scan
    # t_term = exp(-sigma*dist) = 1 - alpha, stashed (same reassociation
    # hazard as in the forward: never recompute it as 1 - alpha + eps).
    g_alpha = g_w_tot * T - g_logterm / (t_term + 1e-10)
    g_sigma = g_alpha * t_term * st["dists"]
    g_sigraw_gs = g_sigma * (st["sig_gs"] > 0).astype(f32)   # (G, S)
    g_sigraw = jnp.sum(_01dot(expand, g_sigraw_gs, exact) * sel,
                       axis=-1, keepdims=True)               # (TILE, 1)

    not_last = (1.0 - is_last) if has_bg else jnp.ones_like(is_last)
    rgb_sig = st["rgb_sig"]
    grgb3 = g_ch[:, :3] * rgb_sig * (1.0 - rgb_sig) * not_last
    gs = g_ch[:, 3:15]
    if has_bg:
        ssm = st["ssm"]
        gseg12 = ssm * (gs - jnp.sum(gs * ssm, axis=-1, keepdims=True)) \
            * not_last
    else:
        seg_sig = st["ssm"]   # sigmoid activations in the no-prior path
        gseg12 = gs * seg_sig * (1.0 - seg_sig)
    return grgb3, gseg12, g_sigraw, g_bg


def _level_io(spec, pts_raw, dirs_ray, se, z, bg, noise, pe_spec,
              dir_pe_spec, tile):
    """Shared input padding/flattening for the level kernels."""
    P = pts_raw.shape[0]
    S = spec.samples
    assert tile % S == 0
    Pp = _rup(P, tile)
    Rp = Pp // S
    R = dirs_ray.shape[0]
    xw = pe_spec.in_width
    dw = dir_pe_spec.in_width
    xp = (pts_raw if pts_raw.shape[1] >= xw
          else jnp.pad(pts_raw, ((0, 0), (0, xw - pts_raw.shape[1]))))
    if Pp > P:
        xp = jnp.pad(xp, ((0, Pp - P), (0, 0)))
    dp = jnp.pad(dirs_ray, ((0, Rp - R), (0, dw - dirs_ray.shape[1])))
    zp = jnp.pad(z, ((0, Rp - R), (0, 0))).astype(jnp.float32)
    extras = []
    if bg is not None:
        extras.append(jnp.pad(bg, ((0, Rp - R), (0, 16 - bg.shape[1]))
                              ).astype(jnp.float32))
    if noise is not None:
        extras.append(jnp.pad(noise, ((0, Rp - R), (0, 0))
                              ).astype(jnp.float32))
    se_in = []
    if spec.se_dim:
        se_p = jnp.pad(se, ((0, Pp - P), (0, 0)))
        se_in = [se_p if spec.corner_interp
                 else se_p.astype(jnp.dtype(spec.compute_dtype))]
    return P, Pp, Rp, xp, dp, zp, extras, se_in



def _const_index_arrays(tile: int, S: int):
    """Host-precomputed (tile, G) ray-expand and (tile, S) sample-select
    0/1 blocks, passed to the level kernels as VMEM-resident constant
    inputs (constant index map) instead of per-tile iota+compare
    regeneration — the kernels are VPU-bound."""
    import numpy as _np
    G = tile // S
    row = _np.arange(tile)[:, None]
    expand = (row // S == _np.arange(G)[None, :])
    sel = ((row % S) == _np.arange(S)[None, :])
    return [jnp.asarray(expand.astype(_np.float32), jnp.bfloat16),
            jnp.asarray(sel.astype(_np.float32))]


def _const_index_specs(tile: int, S: int):
    G = tile // S
    return [pl.BlockSpec((tile, G), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)]


def nerf_level_forward(spec: NerfRaydSpec, pts_raw, dirs_ray, se, z, bg,
                       noise, params, pe_spec: PESpec,
                       dir_pe_spec: PESpec):
    """NeRF MLP + volume compositing fused: per-RAY outputs.
    pts_raw (P, *) packed raw coords (P = R*S ray-major), dirs_ray (R, 3),
    se (P, se_dim) | None, z (R, S) depth values, bg (R, 15) raw prior |
    None, noise (R, S) sigma noise | None.
    Returns (rgb_map (R, 16; cols 0:15 used), weights (R, S))."""
    has_bg = bg is not None
    has_noise = noise is not None
    exact = jnp.dtype(spec.compute_dtype) == jnp.float32
    S = spec.samples
    G = TILE // S
    P, Pp, Rp, xp, dp, zp, extras, se_in = _level_io(
        spec, pts_raw, dirs_ray, se, z, bg, noise, pe_spec, dir_pe_spec, TILE)
    R = dirs_ray.shape[0]
    xw_blk = xp.shape[1]
    xw = pe_spec.in_width
    dw = dir_pe_spec.in_width
    flat = _flatten_nerf_weights_rayd(spec, params)
    n_flat = len(flat)
    pe_in = _pe_input_arrays(pe_spec)
    dpe_in = _pe_input_arrays(dir_pe_spec)
    n_pe, n_dpe = len(pe_in), len(dpe_in)
    n_se = len(se_in)
    n_ex = len(extras)
    cdt = jnp.dtype(spec.compute_dtype)

    def kernel(x_ref, d_ref, z_ref, cexp_ref, csel_ref, *refs):
        ex_refs = refs[:n_ex]
        se_refs = refs[n_ex:n_ex + n_se]
        w_refs = refs[n_ex + n_se:n_ex + n_se + n_flat]
        pe_refs = refs[n_ex + n_se + n_flat:n_ex + n_se + n_flat + n_pe]
        dpe_refs = refs[n_ex + n_se + n_flat + n_pe:
                        n_ex + n_se + n_flat + n_pe + n_dpe]
        o_rgb = refs[n_ex + n_se + n_flat + n_pe + n_dpe]
        o_w = refs[n_ex + n_se + n_flat + n_pe + n_dpe + 1]
        W = _rayd_unflatten(spec, [r[:] for r in w_refs])
        x_raw = x_ref[:]
        if xw_blk > xw:
            x_raw = x_raw[:, :xw]
        x_t = _pe_apply(x_raw, pe_refs).astype(cdt)
        d_raw = d_ref[:]
        dir_pe = _pe_apply(d_raw, dpe_refs).astype(cdt)
        se_t = None
        if n_se:
            if spec.corner_interp:
                se_t, _ = _interp_corners(x_raw, se_refs[0][:],
                                          spec.grid_dims, spec.se_dim,
                                          jnp.float32)
                se_t = se_t.astype(cdt)
            else:
                se_t = se_refs[0][:]
        cexp = cexp_ref[:]
        rgb, seg, alpha = _rayd_forward_math(spec, x_t, dir_pe, se_t, W,
                                             expand=cexp)
        i = 0
        bg_t = None
        if has_bg:
            bg_t = ex_refs[i][:]
            i += 1
        noise_t = ex_refs[i][:] if has_noise else None
        rgb_map, weights = _composite_fwd(spec, rgb, seg, alpha, z_ref[:],
                                          d_raw, bg_t, noise_t, has_bg,
                                          exact,
                                          consts=(cexp, csel_ref[:]))
        o_rgb[:] = rgb_map.astype(o_rgb.dtype)
        o_w[:] = weights.astype(o_w.dtype)

    se_width = spec.se_dim * (8 if spec.corner_interp else 1)
    ex_specs = []
    if has_bg:
        ex_specs.append(pl.BlockSpec((G, 16), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
    if has_noise:
        ex_specs.append(pl.BlockSpec((G, S), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
    se_specs = ([pl.BlockSpec((TILE, se_width), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] if n_se else [])
    consts_in = _const_index_arrays(TILE, S)
    outs = pl.pallas_call(
        kernel,
        grid=(Pp // TILE,),
        in_specs=[pl.BlockSpec((TILE, xw_blk), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, dw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + _const_index_specs(TILE, S)
                 + ex_specs + se_specs
                 + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                                 memory_space=pltpu.VMEM) for f in flat]
                 + _pe_block_specs(pe_spec) + _pe_block_specs(dir_pe_spec),
        out_specs=[pl.BlockSpec((G, 16), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((G, S), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Rp, 16), jnp.float32),
                   jax.ShapeDtypeStruct((Rp, S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xp, dp, zp, *consts_in, *extras, *se_in, *flat, *pe_in, *dpe_in)
    return outs[0][:R], outs[1][:R]


def _level_bwd_chains(spec: NerfRaydSpec, W, x_raw, x_t, acts, st, se_t,
                      se_aux, grgb_ray, gw_ray, pe_refs, has_bg: bool,
                      exact: bool, gx_width: int):
    """Backward chains of the fused level kernel, from per-ray cotangents
    (grgb_ray (G,16), gw_ray (G,S), both f32) down to the input/weight
    cotangents: composite bwd -> seg/dir/alpha heads -> trunk -> PE (+
    in-kernel trilinear dCoords when corner_interp). All operands are VMEM
    values. Returns (gx (T, gx_width), gse_val (T, se_dim)|None,
    g_bg (G, 16)|None, grads list in _flatten_nerf_weights_rayd order).

    Shared verbatim between nerf_level_vjp (recompute-based custom-vjp
    backward) and nerf_level_train (single-pass fwd+grad kernel)."""
    cdt = jnp.dtype(spec.compute_dtype)
    leakyd = _dact_from_out("leaky")
    grgb3, gseg12, g_sigraw, g_bg = _composite_bwd(
        spec, st, grgb_ray, gw_ray, has_bg, exact)

    tile = grgb3.shape[0]
    grgb = jnp.concatenate(
        [grgb3, jnp.zeros((tile, 125), jnp.float32)], axis=-1)
    gseg = jnp.concatenate(
        [gseg12, jnp.zeros((tile, 116), jnp.float32)], axis=-1)
    galpha = jnp.concatenate(
        [g_sigraw, jnp.zeros((tile, 127), jnp.float32)], axis=-1)

    feat = acts["feat"]
    dacts = acts["dacts"]
    sacts = acts["sacts"]

    # seg head
    dwseg = _mmT(sacts[3], gseg, cdt)
    dbseg = jnp.sum(gseg, axis=0, keepdims=True)
    gs = _mm(gseg, W["wseg"].T, cdt)
    seg_grads = []
    for k in range(3, 0, -1):
        gz = gs * leakyd(sacts[k])
        wsk, _ = W["seg_rest"][k - 1]
        seg_grads.append((_mmT(sacts[k - 1], gz, cdt),
                          jnp.sum(gz, axis=0, keepdims=True)))
        gs = _mm(gz, wsk.T, cdt)
    gz0 = gs * leakyd(sacts[0])
    dws0 = _mmT(feat, gz0, cdt)
    dbs0 = jnp.sum(gz0, axis=0, keepdims=True)
    gfeat = _mm(gz0, W["ws0"].T, cdt)

    # dir head
    dwrgb = _mmT(dacts[3], grgb, cdt)
    dbrgb = jnp.sum(grgb, axis=0, keepdims=True)
    gd = _mm(grgb, W["wrgb"].T, cdt)
    dir_grads = []
    for k in range(3, 0, -1):
        gz = gd * leakyd(dacts[k])
        wd, _ = W["dir_rest"][k - 1]
        dir_grads.append((_mmT(dacts[k - 1], gz, cdt),
                          jnp.sum(gz, axis=0, keepdims=True)))
        gd = _mm(gz, wd.T, cdt)
    gzd0 = gd * leakyd(dacts[0])
    dwd0f = _mmT(feat, gzd0, cdt)
    gsum = _mmT(acts["expand"], gzd0, cdt)
    dwd0d = _mmT(acts["dir_pe"], gsum, cdt)
    dbd0 = jnp.sum(gzd0, axis=0, keepdims=True)
    gfeat = gfeat + _mm(gzd0, W["wd0f"].T, cdt)
    gse_val = None
    dwd0s = None
    if se_t is not None:
        dwd0s = _mmT(se_t, gzd0, cdt)
        gse_val = _mm(gzd0, W["wd0s"].T, cdt)[:, :spec.se_dim]

    # alpha head
    dwa = _mmT(feat, galpha, cdt)
    dba = jnp.sum(galpha, axis=0, keepdims=True)
    gfeat = gfeat + _mm(galpha, W["wa"].T, cdt)

    # feat (linear)
    h_last = acts["trunk"][-1]
    dwf = _mmT(h_last, gfeat, cdt)
    dbf = jnp.sum(gfeat, axis=0, keepdims=True)
    gh = _mm(gfeat, W["wf"].T, cdt)

    tspec = TrunkSpec(spec.num_layers, spec.skip_every, spec.in_dim,
                      spec.hidden, 0, act="leaky",
                      compute_dtype=spec.compute_dtype)
    gx, dws, dbs = _trunk_backward(tspec, x_t, W["ws"], W["bs"],
                                   acts["trunk"], gh)
    gx = _pe_bwd(x_raw, gx, pe_refs)
    if se_aux is not None:
        dc = _corner_dcoords(gse_val, se_aux, spec.grid_dims,
                             spec.se_dim, jnp.float32)
        gx = gx + jnp.concatenate(
            [dc, jnp.zeros((dc.shape[0], gx.shape[1] - 3),
                           jnp.float32)], axis=-1)
    if gx_width > gx.shape[1]:
        gx = jnp.concatenate(
            [gx, jnp.zeros((gx.shape[0], gx_width - gx.shape[1]),
                           gx.dtype)], axis=-1)

    grads = []
    for li in range(spec.num_layers):
        if li == spec.skip_every and li > 0:
            grads.extend([dws[li][0], dws[li][1]])
        else:
            grads.append(dws[li])
        grads.append(dbs[li])
    grads.extend([dwf, dbf, dwa, dba, dwd0f, dwd0d])
    if dwd0s is not None:
        grads.append(dwd0s)
    grads.append(dbd0)
    for dw_, db_ in reversed(dir_grads):
        grads.extend([dw_, db_])
    grads.extend([dwrgb, dbrgb, dws0, dbs0])
    for dw_, db_ in reversed(seg_grads):
        grads.extend([dw_, db_])
    grads.extend([dwseg, dbseg])
    return gx, gse_val, g_bg, grads


def _rayd_grads_tree(spec: NerfRaydSpec, params, flat_grads):
    """Rebuild the (unpadded) grads pytree from the kernel's flat dW output
    list (in _flatten_nerf_weights_rayd order)."""
    it = iter(flat_grads)
    grads_tree = {"trunk": [], "dir": [], "seg": []}
    for li, p in enumerate(params["trunk"]):
        w = p["w"]
        if li == 0:
            dw = next(it)[:w.shape[0], :w.shape[1]]
        elif li == spec.skip_every:
            hid = w.shape[1]
            dwh = next(it)
            dwx = next(it)
            dw = jnp.concatenate([dwh[:hid, :hid],
                                  dwx[:w.shape[0] - hid, :hid]], axis=0)
        else:
            dw = next(it)[:w.shape[0], :w.shape[1]]
        db = next(it)[0, :p["b"].shape[0]]
        grads_tree["trunk"].append({"w": dw, "b": db})

    def head(p):
        dw = next(it)[:p["w"].shape[0], :p["w"].shape[1]]
        db = next(it)[0, :p["b"].shape[0]]
        return {"w": dw, "b": db}

    grads_tree["fc_feat"] = head(params["fc_feat"])
    grads_tree["fc_alpha"] = head(params["fc_alpha"])
    d0 = params["dir"][0]
    hid = params["fc_feat"]["w"].shape[1]
    B_real = d0["w"].shape[1]
    dwd0f = next(it)[:hid, :B_real]
    dwd0d = next(it)[:spec.dir_raw, :B_real]
    parts = [dwd0f, dwd0d]
    if spec.se_dim:
        parts.append(next(it)[:spec.se_dim, :B_real])
    dw0 = jnp.concatenate(parts, axis=0)
    db0 = next(it)[0, :d0["b"].shape[0]]
    grads_tree["dir"].append({"w": dw0, "b": db0})
    for p in params["dir"][1:]:
        grads_tree["dir"].append(head(p))
    grads_tree["fc_rgb"] = head(params["fc_rgb"])
    for p in params["seg"]:
        grads_tree["seg"].append(head(p))
    grads_tree["fc_seg"] = head(params["fc_seg"])
    return grads_tree


def nerf_level_vjp(spec: NerfRaydSpec, pts_raw, dirs_ray, se, z, bg, noise,
                   params, g_rgb, g_w, pe_spec: PESpec,
                   dir_pe_spec: PESpec):
    """Backward of nerf_level_forward: per-ray cotangents g_rgb (R, 16)
    and g_w (R, S) -> (gx, gse | None, g_bg | None, grads pytree)."""
    has_bg = bg is not None
    has_noise = noise is not None
    exact = jnp.dtype(spec.compute_dtype) == jnp.float32
    S = spec.samples
    G = BWD_TILE // S
    P, Pp, Rp, xp, dp, zp, extras, se_in = _level_io(
        spec, pts_raw, dirs_ray, se, z, bg, noise, pe_spec, dir_pe_spec,
        BWD_TILE)
    R = dirs_ray.shape[0]
    raw_in = pts_raw.shape[1]
    xw = pe_spec.in_width
    dw = dir_pe_spec.in_width
    xw_blk = xp.shape[1]
    gx_width = raw_in if raw_in >= xw else xw
    grp = jnp.pad(g_rgb, ((0, Rp - R), (0, 16 - g_rgb.shape[1]))
                  ).astype(jnp.float32)
    gwp = jnp.pad(g_w, ((0, Rp - R), (0, 0))).astype(jnp.float32)
    flat = _flatten_nerf_weights_rayd(spec, params)
    n_flat = len(flat)
    pe_in = _pe_input_arrays(pe_spec)
    dpe_in = _pe_input_arrays(dir_pe_spec)
    n_pe, n_dpe = len(pe_in), len(dpe_in)
    n_se = len(se_in)
    n_ex = len(extras)
    n_grid = Pp // BWD_TILE
    cdt = jnp.dtype(spec.compute_dtype)

    def kernel(x_ref, d_ref, z_ref, grgb_ref, gw_ref, cexp_ref, csel_ref,
               *refs):
        ex_refs = refs[:n_ex]
        se_refs = refs[n_ex:n_ex + n_se]
        w_refs = refs[n_ex + n_se:n_ex + n_se + n_flat]
        pe_refs = refs[n_ex + n_se + n_flat:n_ex + n_se + n_flat + n_pe]
        dpe_refs = refs[n_ex + n_se + n_flat + n_pe:
                        n_ex + n_se + n_flat + n_pe + n_dpe]
        o_at = n_ex + n_se + n_flat + n_pe + n_dpe
        gx_ref = refs[o_at]
        nxt = o_at + 1
        gse_ref = None
        if n_se:
            gse_ref = refs[nxt]
            nxt += 1
        gbg_ref = None
        if has_bg:
            gbg_ref = refs[nxt]
            nxt += 1
        dw_refs = refs[nxt:]

        W = _rayd_unflatten(spec, [r[:] for r in w_refs])
        x_raw = x_ref[:]
        if xw_blk > xw:
            x_raw = x_raw[:, :xw]
        if _LVL_STAGE >= 0:
            # timing bisect (WRONG results): stage 0 = DMA + accumulate
            # machinery only; 1 = + PE; 2 = + trunk fwd recompute
            probe = x_raw
            if _LVL_STAGE >= 1:
                probe = _pe_apply(x_raw, pe_refs)
            if _LVL_STAGE >= 2:
                tspec_p = TrunkSpec(spec.num_layers, spec.skip_every,
                                    spec.in_dim, spec.hidden, 0, act="leaky",
                                    compute_dtype=spec.compute_dtype)
                probe = _trunk_forward(tspec_p, probe.astype(cdt),
                                       W["ws"], W["bs"])
            gx_ref[:] = jnp.broadcast_to(
                jnp.sum(probe, axis=-1, keepdims=True) + grgb_ref[0, 0],
                gx_ref.shape).astype(gx_ref.dtype)
            if gse_ref is not None:
                gse_ref[:] = jnp.zeros(gse_ref.shape, gse_ref.dtype)
            if gbg_ref is not None:
                gbg_ref[:] = jnp.zeros(gbg_ref.shape, gbg_ref.dtype)
            _accumulate(dw_refs, [jnp.zeros(r.shape, jnp.float32)
                                  for r in dw_refs], pl.program_id(0) == 0)
            return
        x_t = _pe_apply(x_raw, pe_refs)
        d_raw = d_ref[:]
        dir_pe = _pe_apply(d_raw, dpe_refs).astype(cdt)
        se_t = None
        se_aux = None
        if n_se:
            if spec.corner_interp:
                se_f32, se_aux = _interp_corners(x_raw, se_refs[0][:],
                                                 spec.grid_dims, spec.se_dim,
                                                 jnp.float32)
                se_t = se_f32.astype(cdt)
            else:
                se_t = se_refs[0][:]
        cexp = cexp_ref[:]
        rgb, seg, alpha, acts = _rayd_forward_math(spec, x_t, dir_pe, se_t,
                                                   W, keep=True, expand=cexp)
        i = 0
        bg_t = None
        if has_bg:
            bg_t = ex_refs[i][:]
            i += 1
        noise_t = ex_refs[i][:] if has_noise else None
        _, _, st = _composite_fwd(spec, rgb, seg, alpha, z_ref[:], d_raw,
                                  bg_t, noise_t, has_bg, exact, keep=True,
                                  consts=(cexp, csel_ref[:]))
        gx, gse_val, g_bg, grads = _level_bwd_chains(
            spec, W, x_raw, x_t, acts, st, se_t, se_aux,
            grgb_ref[:], gw_ref[:], pe_refs, has_bg, exact, gx_width)
        if has_bg:
            gbg_ref[:] = g_bg.astype(gbg_ref.dtype)
        if gse_ref is not None and gse_val is not None:
            gse_ref[:] = gse_val.astype(gse_ref.dtype)
        gx_ref[:] = gx.astype(gx_ref.dtype)
        _accumulate(dw_refs, grads, pl.program_id(0) == 0)

    ex_specs = []
    if has_bg:
        ex_specs.append(pl.BlockSpec((G, 16), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
    if has_noise:
        ex_specs.append(pl.BlockSpec((G, S), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
    se_width = spec.se_dim * (8 if spec.corner_interp else 1)
    se_specs = ([pl.BlockSpec((BWD_TILE, se_width), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] if n_se else [])
    out_shapes = [jax.ShapeDtypeStruct((Pp, gx_width), pts_raw.dtype)]
    out_specs = [pl.BlockSpec((BWD_TILE, gx_width), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if n_se:
        out_shapes.append(jax.ShapeDtypeStruct((Pp, spec.se_dim),
                                               pts_raw.dtype))
        out_specs.append(pl.BlockSpec((BWD_TILE, spec.se_dim),
                                      lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    if has_bg:
        out_shapes.append(jax.ShapeDtypeStruct((Rp, 16), jnp.float32))
        out_specs.append(pl.BlockSpec((G, 16), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    out_shapes += [jax.ShapeDtypeStruct(f.shape, jnp.float32) for f in flat]
    out_specs += [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                               memory_space=pltpu.VMEM) for f in flat]
    outs = pl.pallas_call(
        kernel,
        grid=(n_grid,),
        in_specs=[pl.BlockSpec((BWD_TILE, xw_blk), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, dw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + _const_index_specs(BWD_TILE, S)
                 + ex_specs + se_specs
                 + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                                 memory_space=pltpu.VMEM) for f in flat]
                 + _pe_block_specs(pe_spec) + _pe_block_specs(dir_pe_spec),
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xp, dp, zp, grp, gwp, *_const_index_arrays(BWD_TILE, S), *extras,
      *se_in, *flat, *pe_in, *dpe_in)

    gx = outs[0][:P, :raw_in]
    k = 1
    gse = None
    if n_se:
        gse = outs[k][:P].astype(pts_raw.dtype)
        k += 1
    g_bg = None
    if has_bg:
        g_bg = outs[k][:R, :bg.shape[1]]
        k += 1
    flat_grads = list(outs[k:])
    grads_tree = _rayd_grads_tree(spec, params, flat_grads)
    return gx, gse, g_bg, grads_tree


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _nerf_level_fused(num_layers, skip_every, pe_dim, se_dim, samples,
                      compute_dtype, pe_spec, dir_pe_spec,
                      params, pts_raw, dirs_ray, se, z, bg, noise, cond):
    spec, hidden = _rayd_spec_of(num_layers, skip_every, pe_dim,
                                 dir_pe_spec.raw_out, se_dim, samples,
                                 compute_dtype, params)
    trunk = fold_conditioning(params["trunk"], cond, pe_dim)
    trunk = fold_skip_conditioning(hidden, trunk, skip_every, cond, pe_dim)
    p2 = dict(params)
    p2["trunk"] = trunk
    return nerf_level_forward(spec, pts_raw, dirs_ray, se, z, bg, noise, p2,
                              pe_spec, dir_pe_spec)


def _nerf_level_fwd(num_layers, skip_every, pe_dim, se_dim, samples,
                    compute_dtype, pe_spec, dir_pe_spec,
                    params, pts_raw, dirs_ray, se, z, bg, noise, cond):
    y = _nerf_level_fused(num_layers, skip_every, pe_dim, se_dim, samples,
                          compute_dtype, pe_spec, dir_pe_spec,
                          params, pts_raw, dirs_ray, se, z, bg, noise, cond)
    return y, (params, pts_raw, dirs_ray, se, z, bg, noise, cond)


def _nerf_level_bwd(num_layers, skip_every, pe_dim, se_dim, samples,
                    compute_dtype, pe_spec, dir_pe_spec, res, gs):
    params, pts_raw, dirs_ray, se, z, bg, noise, cond = res
    g_rgb, g_w = gs
    spec, hidden = _rayd_spec_of(num_layers, skip_every, pe_dim,
                                 dir_pe_spec.raw_out, se_dim, samples,
                                 compute_dtype, params)
    trunk = fold_conditioning(params["trunk"], cond, pe_dim)
    trunk = fold_skip_conditioning(hidden, trunk, skip_every, cond, pe_dim)
    p2 = dict(params)
    p2["trunk"] = trunk
    gx, gse, g_bg, grads_folded = nerf_level_vjp(
        spec, pts_raw, dirs_ray, se, z, bg, noise, p2, g_rgb, g_w,
        pe_spec, dir_pe_spec)
    trunk_grads, dcond = _unfold_cond_grads(params["trunk"],
                                            grads_folded["trunk"], cond,
                                            skip_every, hidden, pe_dim)
    grads = dict(grads_folded)
    grads["trunk"] = trunk_grads
    if gse is None and se is not None:
        gse = jnp.zeros_like(se)
    if g_bg is None and bg is not None:
        g_bg = jnp.zeros_like(bg)
    g_noise = jnp.zeros_like(noise) if noise is not None else None
    return (grads, gx, jnp.zeros_like(dirs_ray), gse,
            jnp.zeros_like(z), g_bg, g_noise, dcond)


_nerf_level_fused.defvjp(_nerf_level_fwd, _nerf_level_bwd)


def nerf_render_level(params, num_layers: int, skip_every: int,
                      pts_raw: jnp.ndarray, dirs_ray: jnp.ndarray, se,
                      samples: int, z: jnp.ndarray, bg, noise,
                      cond: jnp.ndarray, compute_dtype: str = "bfloat16",
                      pe_spec: PESpec = None, dir_pe_spec: PESpec = None):
    """Fully-fused NeRF level: MLP + in-kernel volume compositing.
    Returns (rgb_map (R, 16; [rgb3|seg12|pad]), weights (R, S)). z carries
    no gradient (fine z is stop-gradiented by sample_pdf; coarse z is pure
    RNG); dirs carry none (camera data)."""
    pe_dim = pe_spec.raw_out
    se_dim = se.shape[-1] if se is not None else 0
    return _nerf_level_fused(num_layers, skip_every, pe_dim, se_dim, samples,
                             compute_dtype, pe_spec, dir_pe_spec,
                             params, pts_raw, dirs_ray,
                             se if se_dim else None, z, bg, noise, cond)


def nerf_mlp_forward_fused(spec: NerfKernelSpec, pts_embed: jnp.ndarray,
                           dir_extra: jnp.ndarray, params,
                           pe_spec: PESpec = None,
                           extra_pe_spec: PESpec = None) -> jnp.ndarray:
    """pts_embed (P, raw_in), dir_extra (P, raw_extra) -> (P, 16) raw field
    [rgb3 | seg12 | alpha1], matching fields.nerf_mlp_apply. With pe specs
    the two inputs are packed RAW coords ([warped xyz, ambient] and
    [dirs, spatial embedding]) and the PEs are computed in-kernel."""
    P = pts_embed.shape[0]
    Pp = _rup(P, TILE)
    x_width = pe_spec.in_width if pe_spec is not None else spec.in_dim
    e_width = (extra_pe_spec.in_width if extra_pe_spec is not None
               else spec.extra_dim)
    cdt = jnp.dtype(spec.compute_dtype)
    xp = jnp.pad(pts_embed, ((0, Pp - P), (0, x_width - pts_embed.shape[1])))
    ep = jnp.pad(dir_extra, ((0, Pp - P), (0, e_width - dir_extra.shape[1])))
    if pe_spec is None:
        xp = xp.astype(cdt)
    if extra_pe_spec is None:
        ep = ep.astype(cdt)
    flat = _flatten_nerf_weights(spec, params)
    n_flat = len(flat)
    pe_in = _pe_input_arrays(pe_spec)
    epe_in = _pe_input_arrays(extra_pe_spec)
    n_pe, n_epe = len(pe_in), len(epe_in)

    def kernel(x_ref, e_ref, *refs):
        w_refs = refs[:n_flat]
        pe_refs = refs[n_flat:n_flat + n_pe]
        epe_refs = refs[n_flat + n_pe:n_flat + n_pe + n_epe]
        o_ref = refs[n_flat + n_pe + n_epe]
        vals = [r[:] for r in w_refs]
        x_t = (_pe_apply(x_ref[:], pe_refs).astype(cdt)
               if pe_spec is not None else x_ref[:])
        e_t = (_pe_apply(e_ref[:], epe_refs).astype(cdt)
               if extra_pe_spec is not None else e_ref[:])
        rgb, seg, alpha, = _nerf_forward_math(spec, x_t, e_t, vals)
        out = jnp.concatenate(
            [rgb[:, :3], seg[:, :12], alpha[:, :1],
             jnp.zeros((rgb.shape[0], 112), rgb.dtype)], axis=-1)
        o_ref[:] = out.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(Pp // TILE,),
        in_specs=[pl.BlockSpec((TILE, x_width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, e_width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                                 memory_space=pltpu.VMEM) for f in flat]
                 + _pe_block_specs(pe_spec) + _pe_block_specs(extra_pe_spec),
        out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pp, 128), pts_embed.dtype),
        interpret=_interpret(),
    )(xp, ep, *flat, *pe_in, *epe_in)
    return out[:P, :16]
