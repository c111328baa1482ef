"""Single-pass train-level kernel: forward + loss cotangents + backward.

The Stage-I loss is per-ray analytic (masked MSE + CE with mask-only
normalizers, reference nerf-pytorch/nerf/nerf_helpers.py:14-62 via
train_stage_rays_auto.py:455-492): every per-ray cotangent is a closed-form
function of (composited rgb/seg, target, per-ray loss weights) — all of
which live in VMEM at the end of the level forward. So instead of the
fwd-kernel + recompute-bwd-kernel pair (ops/pallas/field_mlp.py
nerf_level_forward / nerf_level_vjp), training runs ONE kernel per level:

  PE -> trilinear interp -> trunk -> heads -> in-kernel compositing
     -> in-kernel d(loss)/d(rgb_map, weights)
     -> composite bwd -> head/trunk dX+dW chains -> PE/interp bwd

Activations never leave VMEM and the entire forward recompute of the
backward kernel disappears (PE 0.4 ms + trunk 1.8 ms + heads/interp/
composite, per the r4 stage bisect) along with both separate forward
kernel launches and their input DMA.

The caller (train/fused.py) wraps this in a custom_vjp whose backward just
scales the stashed gradients by the incoming scalar loss cotangent — valid
because the level outputs are consumed stop-gradiented everywhere except
through the scalar loss (fine z is stop_gradient'd by sample_pdf, metrics
are reporting-only).

In-kernel loss-cotangent formulas (per ray r, f32):
  g_rgb[r, 0:3]  = w_l2(r) * 2 * (rgb[r] - target[r])         (masked MSE)
  g_rgb[r, 3:15] = w_ce(r) * (-mask[r,c] / (seg[r,c] + 1e-10)) (masked CE
                   on composited probabilities, nerf_helpers.py:31)
  g_w[r, S-1]    = coef_bg * ||bg[r,:3] - target[r]||^2   (background
                   supervision, train_stage_rays_auto.py:484-489)
  g_bg[r, 0:3]  += coef_bg * w_last(r) * 2 * (bg[r] - target[r])
with w_l2 / w_ce per-ray weights precomputed OUTSIDE the kernel from the
mask alone (the per-class count normalizers don't depend on predictions).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field_mlp import (BWD_TILE, PESpec, TrunkSpec, _composite_fwd,
                        _const_index_arrays, _const_index_specs,
                        _flatten_nerf_weights_rayd, _interp_corners,
                        _interpret, _level_bwd_chains, _level_io,
                        _pair_bwd_math, _pe_apply, _pe_block_specs,
                        _pe_input_arrays, _pts_from_rays_tile,
                        _rayd_forward_math, _rayd_grads_tree,
                        _rayd_spec_of, _rayd_unflatten, _rup, _accumulate,
                        _unfold_cond_grads, fold_conditioning,
                        fold_skip_conditioning, NerfRaydSpec)


def nerf_level_train(spec: NerfRaydSpec, pts_raw, dirs_ray, se, z, bg,
                     noise, tgt, lw, params, pe_spec: PESpec,
                     dir_pe_spec: PESpec, bg_sup: float = 0.0,
                     pair=None):
    """One fused fwd+grad pass over a level.

    pts_raw (P, *) packed raw coords (P = R*S ray-major), dirs_ray (R, 3),
    se (P, 8C) packed corner rows (corner_interp) | (P, C) | None,
    z (R, S), bg (R, 15)|None, noise (R, S)|None,
    tgt (R, 15) [target rgb3 | seg mask12], lw (R, 2) [w_l2, w_ce] per-ray
    loss weights, bg_sup: static coef_bg (0.0 disables the bg-supervision
    term). params: conditioning-folded level params.

    pair=(wspec, hspec, w_flat, h_flat, warp_pe, wo_dim, ho_dim, o8):
    ALSO run the deformation-pair backward in this kernel — the sample
    positions rebuild from (o8 (R,8), dirs, z) per tile, gx feeds the pair
    chains directly from VMEM and never exists in HBM, and the pair dW
    accumulators ride the same grid. (Sample positions carry no gradient:
    camera-derived + stop-gradient z.) The gx output is dropped in this
    mode; the pair's padded flat grads are returned as a second list.

    Returns (rgb_map (R, 16) f32, weights (R, S) f32, gx (P, gx_width) |
    None, gse (P, se_dim)|None, g_bg (R, 16) f32|None, flat dW grads list,
    pair flat grads list | None)."""
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
    tgtp = jnp.pad(tgt, ((0, Rp - R), (0, 16 - tgt.shape[1]))
                   ).astype(jnp.float32)
    lwp = jnp.pad(lw, ((0, Rp - R), (0, 8 - lw.shape[1]))
                  ).astype(jnp.float32)
    flat = _flatten_nerf_weights_rayd(spec, params)
    n_flat = len(flat)
    pe_in = _pe_input_arrays(pe_spec)
    dpe_in = _pe_input_arrays(dir_pe_spec)
    n_pe, n_dpe = len(pe_in), len(dpe_in)
    n_se = len(se_in)
    n_ex = len(extras)
    n_grid = Pp // BWD_TILE
    cdt = jnp.dtype(spec.compute_dtype)

    has_pair = pair is not None
    pair_in = []
    n_pw = n_ph = n_ppe = 0
    if has_pair:
        (p_wspec, p_hspec, p_wflat, p_hflat, p_warp_pe,
         p_wo, p_ho, o8) = pair
        op8 = jnp.pad(o8.astype(jnp.float32), ((0, Rp - R), (0, 0)))
        p_pe_in = _pe_input_arrays(p_warp_pe)
        pair_in = [op8] + list(p_wflat) + list(p_hflat) + p_pe_in
        n_pw, n_ph, n_ppe = len(p_wflat), len(p_hflat), len(p_pe_in)
    n_pair = len(pair_in)

    def kernel(x_ref, d_ref, z_ref, tgt_ref, lw_ref, cexp_ref, csel_ref,
               *refs):
        ex_refs = refs[:n_ex]
        se_refs = refs[n_ex:n_ex + n_se]
        w_refs = refs[n_ex + n_se:n_ex + n_se + n_flat]
        pe_refs = refs[n_ex + n_se + n_flat:n_ex + n_se + n_flat + n_pe]
        dpe_refs = refs[n_ex + n_se + n_flat + n_pe:
                        n_ex + n_se + n_flat + n_pe + n_dpe]
        at = n_ex + n_se + n_flat + n_pe + n_dpe
        pair_refs = refs[at:at + n_pair]
        o_at = at + n_pair
        o_rgb = refs[o_at]
        o_w = refs[o_at + 1]
        nxt = o_at + 2
        gx_ref = None
        if not has_pair:
            gx_ref = refs[nxt]
            nxt += 1
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
        rgb_map, weights, st = _composite_fwd(
            spec, rgb, seg, alpha, z_ref[:], d_raw, bg_t, noise_t, has_bg,
            exact, keep=True, consts=(cexp, csel_ref[:]))
        o_rgb[:] = rgb_map.astype(o_rgb.dtype)
        o_w[:] = weights.astype(o_w.dtype)

        # ---- in-kernel loss cotangents (see module docstring) ----------
        t = tgt_ref[:]
        l = lw_ref[:]
        g_rgb = jnp.concatenate(
            [l[:, 0:1] * 2.0 * (rgb_map[:, :3] - t[:, :3]),
             l[:, 1:2] * (-(t[:, 3:15]) / (rgb_map[:, 3:15] + 1e-10)),
             jnp.zeros((rgb_map.shape[0], 1), jnp.float32)], axis=-1)
        if bg_sup > 0.0 and has_bg:
            bgerr = jnp.sum(jnp.square(bg_t[:, :3] - t[:, :3]), axis=-1,
                            keepdims=True)
            g_w = jnp.concatenate(
                [jnp.zeros((rgb_map.shape[0], S - 1), jnp.float32),
                 bg_sup * bgerr], axis=-1)
        else:
            g_w = jnp.zeros((rgb_map.shape[0], S), jnp.float32)

        gx, gse_val, g_bg, grads = _level_bwd_chains(
            spec, W, x_raw, x_t, acts, st, se_t, se_aux, g_rgb, g_w,
            pe_refs, has_bg, exact, gx_width)
        if has_bg:
            if bg_sup > 0.0:
                g_bg = g_bg + jnp.concatenate(
                    [bg_sup * weights[:, S - 1:S] * 2.0
                     * (bg_t[:, :3] - t[:, :3]),
                     jnp.zeros((rgb_map.shape[0], 13), jnp.float32)],
                    axis=-1)
            gbg_ref[:] = g_bg.astype(gbg_ref.dtype)
        if gse_ref is not None and gse_val is not None:
            if spec.corner_interp:
                # Packed z-slab-dGrid input [x_hi|x_lo|x_lo2|gse] (see
                # grid_bwd.grid_dg_slab_packed): emitting the coords
                # alongside gse here removes the separate lane-padded
                # (P, 3) f32 sample-major transpose from the hot path and
                # halves the slab kernel's input traffic. The 3-level
                # bf16 split carries 24 mantissa bits so the slab's cell
                # geometry matches this kernel's interp to <0.5 f32 ulp.
                x3 = x_raw[:, :3].astype(jnp.float32)
                T_ = x3.shape[0]
                if cdt == jnp.bfloat16:
                    hi = x3.astype(cdt)
                    r1 = x3 - hi.astype(jnp.float32)
                    lo = r1.astype(cdt)
                    lo2 = (r1 - lo.astype(jnp.float32)).astype(cdt)
                else:
                    hi = x3
                    lo = jnp.zeros((T_, 3), cdt)
                    lo2 = jnp.zeros((T_, 3), cdt)
                row = jnp.concatenate(
                    [hi.astype(cdt), lo, lo2, gse_val.astype(cdt),
                     jnp.zeros((T_, 64 - 9 - spec.se_dim), cdt)], axis=-1)
                gse_ref[:] = row.astype(gse_ref.dtype)
            else:
                gse_ref[:] = gse_val.astype(gse_ref.dtype)
        if has_pair:
            # Deformation-pair backward folded in: gx (the packed
            # [warped|ambient] cotangent) feeds the pair chains straight
            # from VMEM; positions rebuild from the per-ray (o, d, z)
            # blocks already on hand (bit-identical o + d*z).
            pts_tile = _pts_from_rays_tile(pair_refs[0][:], d_ref[:],
                                           z_ref[:], S, BWD_TILE,
                                           p_warp_pe.in_width)
            p_pe_refs = pair_refs[1 + n_pw + n_ph:]
            _, pair_grads = _pair_bwd_math(
                p_wspec, p_hspec, pts_tile, gx,
                [r[:] for r in pair_refs[1:1 + n_pw]],
                [r[:] for r in pair_refs[1 + n_pw:1 + n_pw + n_ph]],
                p_pe_refs, p_wo, p_ho, need_gx=False)
            grads = grads + pair_grads
        else:
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
    out_shapes = [jax.ShapeDtypeStruct((Rp, 16), jnp.float32),
                  jax.ShapeDtypeStruct((Rp, S), jnp.float32)]
    out_specs = [pl.BlockSpec((G, 16), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((G, S), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if not has_pair:
        # bf16 mode: gx goes to HBM in bf16 — the pair-vjp kernel rounds
        # it to bf16 for its matmuls anyway, and halving the (P, 128)
        # array halves the cotangent-merge + vjp-input traffic.
        gx_dt = jnp.dtype(pts_raw.dtype) if exact else cdt
        out_shapes.append(jax.ShapeDtypeStruct((Pp, gx_width), gx_dt))
        out_specs.append(pl.BlockSpec((BWD_TILE, gx_width),
                                      lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    if n_se:
        gse_w = 64 if spec.corner_interp else spec.se_dim
        gse_dt = cdt if spec.corner_interp else jnp.dtype(pts_raw.dtype)
        out_shapes.append(jax.ShapeDtypeStruct((Pp, gse_w), gse_dt))
        out_specs.append(pl.BlockSpec((BWD_TILE, gse_w),
                                      lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    if has_bg:
        out_shapes.append(jax.ShapeDtypeStruct((Rp, 16), jnp.float32))
        out_specs.append(pl.BlockSpec((G, 16), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    out_shapes += [jax.ShapeDtypeStruct(f.shape, jnp.float32) for f in flat]
    out_specs += [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                               memory_space=pltpu.VMEM) for f in flat]
    pair_specs = []
    n_pair_grads = 0
    if has_pair:
        p_flats = list(p_wflat) + list(p_hflat)
        n_pair_grads = len(p_flats)
        out_shapes += [jax.ShapeDtypeStruct(f.shape, jnp.float32)
                       for f in p_flats]
        out_specs += [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                                   memory_space=pltpu.VMEM)
                      for f in p_flats]
        pair_specs = ([pl.BlockSpec((G, 8), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)]
                      + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                                      memory_space=pltpu.VMEM)
                         for f in p_flats]
                      + _pe_block_specs(p_warp_pe))
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
                  pl.BlockSpec((G, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + _const_index_specs(BWD_TILE, S)
                 + ex_specs + se_specs
                 + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim,
                                 memory_space=pltpu.VMEM) for f in flat]
                 + _pe_block_specs(pe_spec) + _pe_block_specs(dir_pe_spec)
                 + pair_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(xp, dp, zp, tgtp, lwp, *_const_index_arrays(BWD_TILE, S), *extras,
      *se_in, *flat, *pe_in, *dpe_in, *pair_in)

    rgb_map = outs[0][:R]
    weights = outs[1][:R]
    k = 2
    gx = None
    if not has_pair:
        gx = outs[k][:P, :raw_in]
        k += 1
    gse = None
    if n_se:
        # corner_interp mode: the packed [x_hi|x_lo|x_lo2|gse] slab input,
        # kept in the compute dtype (bf16 transposes at half the traffic)
        gse = outs[k][:P]
        if not spec.corner_interp:
            gse = gse.astype(pts_raw.dtype)
        k += 1
    g_bg = None
    if has_bg:
        g_bg = outs[k][:R, :bg.shape[1]]
        k += 1
    flat_grads = list(outs[k:len(outs) - n_pair_grads]) \
        if has_pair else list(outs[k:])
    pair_grads = list(outs[len(outs) - n_pair_grads:]) if has_pair else None
    return rgb_map, weights, gx, gse, g_bg, flat_grads, pair_grads


def level_train_apply(params, num_layers: int, skip_every: int,
                      pts_raw, dirs_ray, se, samples: int, z, bg, noise,
                      cond, tgt, lw, compute_dtype: str,
                      pe_spec: PESpec, dir_pe_spec: PESpec,
                      grid_dims=None, bg_sup: float = 0.0, pair=None):
    """Fold conditioning, run the fused train kernel, unfold gradients.

    se: packed (P, 8C) corner rows when grid_dims is given (in-kernel
    trilinear interp; gse comes back per-sample for the external z-slab
    dGrid contraction), else (P, C) raw embedding rows or None.

    pair=(wspec, hspec, w_flat, h_flat, warp_pe, wo_dim, ho_dim, o8):
    fold the deformation-pair backward into the kernel (see
    nerf_level_train); gx comes back None and the pair's padded flat
    grads are returned instead.

    Returns (rgb_map, weights, gx, gse, g_bg, grads_tree, dcond,
    pair_flat_grads) — the grads_tree has UNfolded trunk grads
    (conditioning rows restored)."""
    import dataclasses
    pe_dim = pe_spec.raw_out
    if grid_dims is not None:
        se_dim = se.shape[-1] // 8
    else:
        se_dim = se.shape[-1] if se is not None else 0
    spec, hidden = _rayd_spec_of(num_layers, skip_every, pe_dim,
                                 dir_pe_spec.raw_out, se_dim, samples,
                                 compute_dtype, params)
    if grid_dims is not None:
        spec = dataclasses.replace(spec, corner_interp=True,
                                   grid_dims=tuple(grid_dims))
    trunk = fold_conditioning(params["trunk"], cond, pe_dim)
    trunk = fold_skip_conditioning(hidden, trunk, skip_every, cond, pe_dim)
    p2 = dict(params)
    p2["trunk"] = trunk
    rgb_map, weights, gx, gse, g_bg, flat_grads, pair_grads = \
        nerf_level_train(spec, pts_raw, dirs_ray, se, z, bg, noise, tgt,
                         lw, p2, pe_spec, dir_pe_spec, bg_sup=bg_sup,
                         pair=pair)
    # slice by the FOLDED shapes (pe-only trunk rows); _unfold_cond_grads
    # then restores the conditioning rows
    grads_folded = _rayd_grads_tree(spec, p2, flat_grads)
    trunk_grads, dcond = _unfold_cond_grads(params["trunk"],
                                            grads_folded["trunk"], cond,
                                            skip_every, hidden, pe_dim)
    grads = dict(grads_folded)
    grads["trunk"] = trunk_grads
    return rgb_map, weights, gx, gse, g_bg, grads, dcond, pair_grads
