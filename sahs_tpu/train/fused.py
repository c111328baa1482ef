"""Fully-fused Stage-I gradient path: both render levels + loss grads in
the forward pass.

The default Stage-I train step differentiates render_rays with jax.grad,
which runs each level kernel twice (forward, then a backward that first
recomputes the forward — ops/pallas/field_mlp.py nerf_level_vjp) and the
deformation pair on every level's point set (64 + 128 samples/ray = 3x the
unique points). This module restructures the train step around two facts:

  1. The Stage-I loss is per-ray ANALYTIC: masked MSE + CE whose per-ray
     weights depend only on the mask (train_stage_rays_auto.py:455-492,
     nerf_helpers.py:14-62), and the background-supervision term is a
     closed form in (bg, target, weights[:, -1]). So the loss cotangents
     can be computed inside the level kernel and the whole backward runs
     in the SAME kernel pass as the forward — activations never leave
     VMEM, the recompute disappears (ops/pallas/level_train.py).
  2. The sorted fine sample set IS coarse ∪ importance, with every
     coarse point bit-identical in it (same f32 o + d*z at equal z), and
     the pair backward + z-slab dGrid are linear in their cotangents. So
     the coarse level's cotangents are scattered into their sorted-fine
     slots (one-hot MXU matmuls; ranks from a compare-count, no argsort)
     and BOTH backwards run once over the 262k fine points instead of
     393k. The scatter addends ride second input streams of the pair-vjp
     and slab kernels (added in VMEM). Exact up to f32 summation order —
     certified by test_merged_backward_matches_split.

The result is exposed as ONE custom_vjp, `stage1_fused`, returning
(loss, rgb_coarse, rgb_fine, weights_fine). Gradients for every
differentiable input (model params, grid, driving, pose_enc, latent,
background rays) are computed IN the forward and stashed; the backward
just scales them by the incoming scalar loss cotangent. This is exact
under two call-site invariants (enforced by train/stage1.py):

  - rgb/weights outputs are consumed under stop_gradient (metrics and the
    dynamic sample_prob update are reporting-only; fine z is already
    stop_gradient'd by sample_pdf);
  - the in-kernel cotangent formulas match the loss formula below, which
    is the total differentiated (equivalence-tested against the
    jax.grad-of-render_rays path in tests/test_fused_train.py).

Reference hot path being replaced: nerf-pytorch/nerf/train_utils.py:72-206
+ train_stage_rays_auto.py:400-500 (torch autograd over the same math).
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.nerface import (ModelSpec, build_pe_specs, encode_pose,
                              compute_driving, level_kernel_compatible,
                              pair_kernel_ok)
from ..ops.pallas.field_grid import _sample_major, gather_corners
from ..ops.pallas.field_mlp import (_flatten_trunk_weights, _pair_specs, build_pts,
                                    _unfold_cond_grads, _unpack_trunk_grads,
                                    deform_pair_forward, deform_pair_vjp,
                                    fold_conditioning,
                                    fold_skip_conditioning)
from ..ops.pallas.grid_bwd import grid_dg_slab, grid_dg_slab_packed
from ..ops.pallas.level_train import level_train_apply
from ..ops.sampling import coarse_z_vals, sample_pdf


@dataclasses.dataclass(frozen=True)
class FusedCfg:
    """Static config of the fused train renderer (hashable)."""
    num_coarse: int
    num_fine: int
    near: float
    far: float
    perturb: bool
    noise_std: float
    lindisp: bool
    compute_dtype: str
    bg_sup_weight: float       # background_loss_weight when supervised, 0 off


def stage1_fused_eligible(spec: ModelSpec, render) -> bool:
    """The fused gradient path covers the flagship training configuration;
    anything outside it falls back to jax.grad over render_rays."""
    if spec.use_spatial_embeddings:
        # the packed-gse emission (level_train.py) and grid_dg_slab_packed
        # are built for the reference's fixed 32ch x 32^3 grid; any other
        # shape must take the jax.grad fallback, not die in an assert
        from ..models.fields import SPATIAL_EMBEDDING_DIM, SPATIAL_GRID_RES
        from ..ops.pallas.grid_bwd import slab_kernel_ok
        gshape = (SPATIAL_EMBEDDING_DIM,) + (SPATIAL_GRID_RES,) * 3
        if SPATIAL_EMBEDDING_DIM != 32 or not slab_kernel_ok(gshape):
            return False
    return (render.use_pallas and render.fuse_composite
            and not render.white_background
            and spec.use_viewdirs and pair_kernel_ok(spec)
            and spec.fine is not None and render.num_fine > 0
            and level_kernel_compatible(render.num_coarse)
            and level_kernel_compatible(render.num_coarse + render.num_fine))


def ray_loss_weights(mask_s: jnp.ndarray, ce_weight: float,
                     mouth_loss_weight: float) -> jnp.ndarray:
    """Per-ray (R, 2) [w_l2, w_ce] such that
    total_level_loss = sum_r w_l2(r)*||rgb-t||^2 + w_ce(r)*CE(r), which
    equals l2 + ce_weight*ce + mouth_loss_weight*sum(masked_l2[7:9] +
    masked_ce[7:9]) exactly (train/stage1.py _stage1_losses): the per-class
    count normalizers depend only on the mask, never on predictions."""
    R = mask_s.shape[0]
    counts = jnp.sum(mask_s != 0, axis=0).astype(mask_s.dtype)
    counts = jnp.where(counts == 0, jnp.ones_like(counts), counts)
    mouth = jnp.sum(mask_s[:, 7:9] / counts[7:9], axis=-1)   # (R,)
    w_l2 = 1.0 / R + mouth_loss_weight * mouth
    w_ce = ce_weight / R + mouth_loss_weight * mouth
    return jnp.stack([w_l2, w_ce], axis=-1)


def _level_loss(rgb_map, tgt, lw):
    """The scalar the in-kernel cotangents differentiate (see
    ray_loss_weights); must stay in lock-step with
    ops/pallas/level_train.py's g_rgb formulas."""
    diff = jnp.sum(jnp.square(rgb_map[:, :3] - tgt[:, :3]), axis=-1)
    ce = -jnp.sum(tgt[:, 3:15] * jnp.log(rgb_map[:, 3:15] + 1e-10), axis=-1)
    return jnp.sum(lw[:, 0] * diff + lw[:, 1] * ce)


# Ablation: 1 = build sample positions INSIDE the pair kernels from the
# per-ray (o, d, z) blocks instead of materializing (P, 8) f32 position
# arrays. Saves the ~134 MB-physical position passes but measured NET
# SLOWER on v5e in r4 (45.0 regime) AND r5 (36.2 vs 34.7 ms/step): three
# blocked input streams + in-kernel expand/sel dots hurt Mosaic
# pipelining more than the saved build. Kept as the recorded negative.
_PAIR_RAYS = os.environ.get("SAHS_PAIR_RAYS", "0") == "1"

# Ablation: 1 = fold the deformation-pair BACKWARD into the train-level
# kernels (gx consumed in VMEM, no separate pair-vjp launches, pair dW
# accumulators ride the level grid). Sounds like a pure win — measured
# 39.0 vs 34.7 ms/step on v5e: the mega-kernel's working set (nerf acts +
# pair trunk acts + both dW banks live at once) starves Mosaic's
# double-buffering and the whole pipeline slows more than the saved
# ~134 MB gx round-trip. Third confirmation of the r4/r5 rule: past a
# depth sweet spot, MORE fusion into one Mosaic kernel is a regression.
_PAIR_FOLD = os.environ.get("SAHS_PAIR_FOLD", "0") == "1"

# Ablation: 1 = share the pair forward/backward and the slab dGrid across
# levels over the coarse∪fine UNION points (262k instead of 393k). Sounds
# like a pure win but measured NET SLOWER on v5e: the bookkeeping is
# per-ray permutations of (R, 128, 128) arrays, and XLA's take_along_axis
# gathers at that shape run ~2.7 ms each (~8x the copy bandwidth cost) —
# three of them eat the 3.5 ms the union saves. The shipped path instead
# RECOMPUTES the pair on the sorted fine points (0.8 ms/131k on the MXU)
# and runs pair-bwd/slab per level; only the (R, S) z sort remains.
_UNION = os.environ.get("SAHS_FUSED_UNION", "0") == "1"

# Ablation: 1 = build the (P, 8) position arrays with the dedicated
# Pallas kernel (field_mlp.build_pts) instead of the XLA broadcast-FMA.
# The XLA path materializes a 128-lane-padded (R, S, 8) broadcast
# intermediate (~0.7 ms/step total) and the kernel is write-bound only —
# but measured NET SLOWER on v5e (31.4 vs 30.5 ms/step): the (TILE, 8)
# output DMA + per-tile expand/sel dots cost more than the saved
# intermediate. Same failure mode as SAHS_PAIR_RAYS.
_PTS_KERNEL = os.environ.get("SAHS_PTS_KERNEL", "0") == "1"

# Ablation: 1 = run the pair backward + slab dGrid SEPARATELY per level
# (the r4/early-r5 structure: coarse 131k + fine 262k = 393k backward
# points). Default 0 = merge the coarse cotangents into their sorted-fine
# slots and run both backwards ONCE over the 262k fine points — the
# sorted fine set IS coarse ∪ importance, every coarse point is
# bit-identical in it (same ro8 + rd8*z f32 arithmetic), and pair-vjp /
# slab are linear in the cotangent, so the merge is exact up to summation
# order. Unlike the SAHS_FUSED_UNION permutes, the scatter needs no
# argsort (z_c is per-ray sorted: slot(j) = j + #{z_new < z_c[j]}) and
# runs as one-hot MXU matmuls (single-term sums -> exact values).
_BWD_SPLIT = os.environ.get("SAHS_BWD_SPLIT", "0") == "1"


def _split_sizes(vec, sizes):
    out, o = [], 0
    for s in sizes:
        out.append(vec[o:o + s])
        o += s
    return out


def _stage1_fused_fwd(spec: ModelSpec, fcfg: FusedCfg, params, driving,
                      pose_enc, latent, ro, rd, tgt, lw, bg, key):
    cdt = fcfg.compute_dtype
    R = ro.shape[0]
    Sc, Sn = fcfg.num_coarse, fcfg.num_fine
    Sf = Sc + Sn
    dtype = ro.dtype
    use_grid = spec.use_spatial_embeddings
    amb = spec.hyper.ambient_coord_dim
    warp_pe, pts_pe, dir_pe = build_pe_specs(spec)
    keys = jax.random.split(key, 4)

    # --- conditioning (mirrors models/nerface.py deform_cond/nerf_cond) --
    pair_parts = ([driving] if spec.warp.include_driving else []) + [pose_enc]
    cond_pair = jnp.concatenate(pair_parts)

    def nerf_cond(nerf_spec):
        parts = []
        if latent is not None and nerf_spec.latent_code_dim > 0:
            parts.append(latent)
        if nerf_spec.include_driving:
            parts.append(driving)
        if nerf_spec.use_pose:
            parts.append(pose_enc)
        return (jnp.concatenate(parts) if parts
                else jnp.zeros((0,), dtype))

    cond_c = nerf_cond(spec.coarse)
    cond_f = nerf_cond(spec.fine)

    # --- deformation pair, folded once ----------------------------------
    wp = (spec.warp.num_layers, spec.warp.hidden_size,
          spec.warp.skip_connect_every, 3, "tanh")
    hp = (spec.hyper.num_layers, spec.hyper.hidden_size,
          spec.hyper.skip_connect_every, amb, "linear")
    pe_dim = warp_pe.raw_out
    wspec, hspec = _pair_specs(wp, hp, pe_dim, cdt)
    wt = fold_conditioning(params["warp"]["trunk"], cond_pair, pe_dim)
    wt = fold_skip_conditioning(wp[1], wt, wp[2], cond_pair, pe_dim)
    ht = fold_conditioning(params["hyper"]["trunk"], cond_pair, pe_dim)
    ht = fold_skip_conditioning(hp[1], ht, hp[2], cond_pair, pe_dim)

    def pair_fwd(pts, rays=None, samples=None):
        """-> (packed (P, 128), rows (P//S, S) f32 | None). With a grid
        and known per-ray sample count the kernel also emits the exact
        corner-table rows (field_mlp emit_rows) so the gather needs no
        XLA cell-geometry pass over the packed output."""
        emit = ((samples, grid.shape[1:])
                if (use_grid and samples is not None) else None)
        out = deform_pair_forward(wspec, hspec, pts, wt,
                                  params["warp"]["out"], ht,
                                  params["hyper"]["out"], warp_pe, 3, amb,
                                  rays=rays, emit_rows=emit)
        return out if emit is not None else (out, None)

    def pair_bwd(gx, rays, g2=None):
        """Rays-mode pair backward: positions rebuilt in-kernel, no
        per-point input array. Returns (wt_g, wo_g, ht_g, ho_g)."""
        _, wt_g, wo_g, ht_g, ho_g = deform_pair_vjp(
            wspec, hspec, None, wt, params["warp"]["out"], ht,
            params["hyper"]["out"], gx, warp_pe, 3, amb, need_gx=False,
            rays=rays, g2=g2)
        return wt_g, wo_g, ht_g, ho_g

    grid = params.get("spatial_embeddings") if use_grid else None
    grid_dims = grid.shape[1:] if use_grid else None
    pair_fold = _PAIR_FOLD and not _UNION
    p_wflat = p_hflat = None
    if pair_fold:
        p_wflat = _flatten_trunk_weights(wspec, wt, params["warp"]["out"])
        p_hflat = _flatten_trunk_weights(hspec, ht, params["hyper"]["out"])

    def run_level(level_params, nerf_spec, packed, z, noise_key, cond,
                  samples, bg_sup, rows=None):
        from ..ops.pallas.field_grid import gather_corners_from_rows
        corners = None
        if use_grid:
            corners = (gather_corners_from_rows(grid, rows, cdt)
                       if rows is not None
                       else gather_corners(grid, packed, cdt))
        noise = None
        if fcfg.noise_std > 0:
            noise = (jax.random.normal(noise_key, z.shape, dtype=z.dtype)
                     * fcfg.noise_std)
        pair_ctx = None
        if pair_fold:
            pair_ctx = (wspec, hspec, p_wflat, p_hflat, warp_pe, 3, amb,
                        ro8)
        return level_train_apply(
            level_params, nerf_spec.num_layers, nerf_spec.skip_connect_every,
            packed, rd, corners, samples, z, bg, noise, cond, tgt, lw,
            cdt, pts_pe, dir_pe, grid_dims=grid_dims, bg_sup=bg_sup,
            pair=pair_ctx)

    # --- coarse level ----------------------------------------------------
    # Points are built directly at the pair kernel's 8-wide input width:
    # XLA lane-pads (P, 3) f32 arrays to 128 lanes physically, so a
    # separate (P,3)->(P,8) pad would be a full extra pass (~0.4 ms/level).
    ro8 = jnp.pad(ro, ((0, 0), (0, 8 - ro.shape[1])))
    rd8 = jnp.pad(rd, ((0, 0), (0, 8 - rd.shape[1])))
    nearv = jnp.full((R,), fcfg.near, dtype=dtype)
    farv = jnp.full((R,), fcfg.far, dtype=dtype)
    z_c = coarse_z_vals(nearv, farv, Sc, lindisp=fcfg.lindisp,
                        perturb=fcfg.perturb, key=keys[0])
    if _PAIR_RAYS:
        packed_c, rows_c = pair_fwd(None, rays=(ro8, rd8, z_c, Sc),
                                    samples=Sc)
    else:
        # (R, 8, S) transposed positions: S rides the lane dim, so the
        # array is physically unpadded (~8 MB vs ~134 MB at fine counts)
        # and the build has no 128-lane-padded broadcast intermediate
        pts_c = (build_pts(ro8, rd8, z_c, Sc) if _PTS_KERNEL
                 else (ro8[:, None, :] + rd8[:, None, :] * z_c[..., None]
                       ).reshape(-1, 8))
        packed_c, rows_c = pair_fwd(pts_c, samples=Sc)
    (rgb_c, w_c, gx_c, gse_c, gbg_c, grads_c, dcond_c,
     pg_c) = run_level(params["coarse"], spec.coarse, packed_c, z_c,
                       keys[1], cond_c, Sc, 0.0, rows=rows_c)

    # --- fine level: union points, per-ray sorted view -------------------
    z_mid = 0.5 * (z_c[..., 1:] + z_c[..., :-1])
    z_new = sample_pdf(z_mid, w_c[..., 1:-1], Sn, det=(not fcfg.perturb),
                       key=keys[2])
    if _UNION:
        pts_c = (ro8[:, None, :]
                 + rd8[:, None, :] * z_c[..., None]).reshape(-1, 8)
        pts_n = (ro8[:, None, :]
                 + rd8[:, None, :] * z_new[..., None]).reshape(-1, 8)
        packed_n, _ = pair_fwd(pts_n)
    bg_sup = (fcfg.bg_sup_weight / R
              if (fcfg.bg_sup_weight > 0 and bg is not None) else 0.0)
    z_cat = jnp.concatenate([z_c, z_new], axis=-1)
    if _UNION:
        perm = jnp.argsort(z_cat, axis=-1)
        z_f = jnp.take_along_axis(z_cat, perm, axis=-1)
        packed_u = jnp.concatenate([packed_c.reshape(R, Sc, -1),
                                    packed_n.reshape(R, Sn, -1)], axis=1)
        packed_f = jnp.take_along_axis(packed_u, perm[..., None],
                                       axis=1).reshape(R * Sf, -1)
        rows_f = None
    else:
        z_f = jnp.sort(z_cat, axis=-1)
        if _PAIR_RAYS:
            packed_f, rows_f = pair_fwd(None, rays=(ro8, rd8, z_f, Sf),
                                        samples=Sf)
        else:
            pts_f = (build_pts(ro8, rd8, z_f, Sf) if _PTS_KERNEL
                     else (ro8[:, None, :] + rd8[:, None, :] * z_f[..., None]
                           ).reshape(-1, 8))
            packed_f, rows_f = pair_fwd(pts_f, samples=Sf)
    (rgb_f, w_f, gx_f, gse_f, gbg_f, grads_f, dcond_f,
     pg_f) = run_level(params["fine"], spec.fine, packed_f, z_f, keys[3],
                       cond_f, Sf, bg_sup, rows=rows_f)

    if _UNION:
        # fold fine cotangents back onto the union through the inverse
        # permutation, then ONE pair backward + ONE slab over 262k points
        inv = jnp.argsort(perm, axis=-1)

        def to_union(x_f, x_c):
            xu = jnp.take_along_axis(x_f.reshape(R, Sf, -1),
                                     inv[..., None], axis=1)
            xu = xu.at[:, :Sc].add(x_c.reshape(R, Sc, -1))
            return xu.reshape(R * Sf, -1)

        gx_u = to_union(gx_f, gx_c)
        dG = None
        if use_grid:
            # gse arrives packed ([x_hi|x_lo|x_lo2|gse], level_train.py);
            # unpack the gse block for the union sum
            C_ = grid.shape[0]
            gse_u = to_union(gse_f[:, 9:9 + C_].astype(jnp.float32),
                             gse_c[:, 9:9 + C_].astype(jnp.float32))
            dG = grid_dg_slab(
                grid.shape,
                _sample_major(packed_u.reshape(R * Sf, -1)[:, :3], R, Sf),
                _sample_major(gse_u, R, Sf), cdt)
        pts_u = jnp.concatenate([pts_c.reshape(R, Sc, 8),
                                 pts_n.reshape(R, Sn, 8)],
                                axis=1).reshape(-1, 8)
        _, wt_g, wo_g, ht_g, ho_g = deform_pair_vjp(
            wspec, hspec, pts_u, wt, params["warp"]["out"], ht,
            params["hyper"]["out"], gx_u, warp_pe, 3, amb, need_gx=False)
    else:
        merge = not (_BWD_SPLIT or pair_fold)
        if merge:
            # Merge the coarse cotangents into their sorted-fine slots:
            # the sorted fine set IS coarse ∪ importance (bit-identical
            # f32 z values -> bit-identical sample points), and both the
            # pair vjp and the slab dGrid are linear in the cotangent, so
            # ONE backward over the 262k fine points replaces the 393k
            # split. No argsort: z_c is per-ray sorted, so the slot of
            # coarse sample j is j + #{z_new < z_c[j]} (ties "not less"
            # = coarse-first, matching stable jnp.sort on [z_c | z_new]).
            pos_c = (jnp.arange(Sc)[None, :]
                     + jnp.sum(z_new[:, None, :] < z_c[:, :, None],
                               axis=-1))
            pc = pos_c[..., None] == jnp.arange(Sf)[None, None, :]
            hprec = jax.lax.Precision.HIGHEST
            # In bf16 compute mode the scatter runs in bf16 (one MXU pass;
            # one-hot single-term sums are exact in bf16, and the pair-vjp
            # kernel rounds gx to bf16 for its matmuls anyway). In f32
            # mode it runs as a 6-pass HIGHEST f32 matmul (exact).
            sdt = (jnp.bfloat16 if jnp.dtype(cdt) == jnp.bfloat16
                   else jnp.float32)

            def scatter_c(x_c):
                """One-hot MXU scatter (R*Sc, C) -> (R*Sf, C): single-term
                sums, so values are exact in the matmul dtype. Kept a bare
                batched matmul (no fused operand masking) so XLA lowers it
                to an MXU convolution, not a VPU multiply-add fusion."""
                xc = x_c.reshape(R, Sc, -1).astype(sdt)
                add = jnp.einsum('rcs,rcj->rsj', pc.astype(sdt), xc,
                                 precision=hprec,
                                 preferred_element_type=jnp.float32)
                return add.astype(sdt).reshape(R * Sf, -1)

            gx_add = scatter_c(gx_c).astype(gx_f.dtype)
        dG = None
        if use_grid:
            if merge:
                # the addend rides the slab kernel's second input stream;
                # no channel masking needed — the kernel reads cell
                # geometry from the fine rows alone
                gse_add = scatter_c(gse_c).astype(gse_f.dtype)
                dG = grid_dg_slab_packed(grid.shape,
                                         gse_f.reshape(R, Sf, -1), cdt,
                                         packed2=gse_add.reshape(R, Sf, -1))
            else:
                dG = (grid_dg_slab_packed(grid.shape,
                                          gse_c.reshape(R, Sc, -1), cdt)
                      + grid_dg_slab_packed(grid.shape,
                                            gse_f.reshape(R, Sf, -1),
                                            cdt))
        if pair_fold:
            # pair dW partials accumulated inside BOTH level kernels
            pg = [a + b for a, b in zip(pg_c, pg_f)]
            it = iter(pg)
            wt_g, wo_g = _unpack_trunk_grads(wspec, wt,
                                             params["warp"]["out"], it)
            ht_g, ho_g = _unpack_trunk_grads(hspec, ht,
                                             params["hyper"]["out"], it)
        elif merge:
            if _PAIR_RAYS:
                wt_g, wo_g, ht_g, ho_g = pair_bwd(gx_f, (ro8, rd8, z_f, Sf),
                                                  g2=gx_add)
            else:
                _, wt_g, wo_g, ht_g, ho_g = deform_pair_vjp(
                    wspec, hspec, pts_f, wt, params["warp"]["out"], ht,
                    params["hyper"]["out"], gx_f, warp_pe, 3, amb,
                    need_gx=False, g2=gx_add)
        else:
            if _PAIR_RAYS:
                wt_g1, wo_g1, ht_g1, ho_g1 = pair_bwd(
                    gx_c, (ro8, rd8, z_c, Sc))
                wt_g2, wo_g2, ht_g2, ho_g2 = pair_bwd(
                    gx_f, (ro8, rd8, z_f, Sf))
            else:
                _, wt_g1, wo_g1, ht_g1, ho_g1 = deform_pair_vjp(
                    wspec, hspec, pts_c, wt, params["warp"]["out"], ht,
                    params["hyper"]["out"], gx_c, warp_pe, 3, amb,
                    need_gx=False)
                _, wt_g2, wo_g2, ht_g2, ho_g2 = deform_pair_vjp(
                    wspec, hspec, pts_f, wt, params["warp"]["out"], ht,
                    params["hyper"]["out"], gx_f, warp_pe, 3, amb,
                    need_gx=False)
            add = lambda a, b: jax.tree_util.tree_map(jnp.add, a, b)
            wt_g, wo_g = add(wt_g1, wt_g2), add(wo_g1, wo_g2)
            ht_g, ho_g = add(ht_g1, ht_g2), add(ho_g1, ho_g2)
    warp_tg, dcond_w = _unfold_cond_grads(params["warp"]["trunk"], wt_g,
                                          cond_pair, wp[2], wp[1], pe_dim)
    hyper_tg, dcond_h = _unfold_cond_grads(params["hyper"]["trunk"], ht_g,
                                           cond_pair, hp[2], hp[1], pe_dim)
    dcond_pair = dcond_w + dcond_h

    # --- loss (value; the kernels baked its derivative in) ---------------
    loss = _level_loss(rgb_c, tgt, lw) + _level_loss(rgb_f, tgt, lw)
    if bg_sup > 0.0:
        bgerr = jnp.sum(jnp.square(bg[:, :3] - tgt[:, :3]), axis=-1)
        loss = loss + bg_sup * jnp.sum(w_f[:, -1] * bgerr)

    # --- cotangent assembly ----------------------------------------------
    d_model = dict(jax.tree_util.tree_map(jnp.zeros_like, params))
    d_model["coarse"] = grads_c
    d_model["fine"] = grads_f
    d_model["warp"] = {"trunk": warp_tg, "out": wo_g}
    d_model["hyper"] = {"trunk": hyper_tg, "out": ho_g}
    if use_grid:
        d_model["spatial_embeddings"] = dG

    d_driving = jnp.zeros_like(driving)
    d_pose = jnp.zeros_like(pose_enc)
    d_latent = jnp.zeros_like(latent) if latent is not None else None

    pair_sizes = ([driving.shape[0]] if spec.warp.include_driving else []) \
        + [pose_enc.shape[0]]
    parts = _split_sizes(dcond_pair, pair_sizes)
    i = 0
    if spec.warp.include_driving:
        d_driving = d_driving + parts[i].astype(d_driving.dtype)
        i += 1
    d_pose = d_pose + parts[i].astype(d_pose.dtype)

    for nerf_spec, dcond in ((spec.coarse, dcond_c), (spec.fine, dcond_f)):
        sizes = []
        has_lat = latent is not None and nerf_spec.latent_code_dim > 0
        if has_lat:
            sizes.append(latent.shape[0])
        if nerf_spec.include_driving:
            sizes.append(driving.shape[0])
        if nerf_spec.use_pose:
            sizes.append(pose_enc.shape[0])
        parts = _split_sizes(dcond, sizes)
        i = 0
        if has_lat:
            d_latent = d_latent + parts[i].astype(d_latent.dtype)
            i += 1
        if nerf_spec.include_driving:
            d_driving = d_driving + parts[i].astype(d_driving.dtype)
            i += 1
        if nerf_spec.use_pose:
            d_pose = d_pose + parts[i].astype(d_pose.dtype)

    d_bg = None
    if bg is not None:
        d_bg = (gbg_c + gbg_f).astype(bg.dtype)

    out = (loss, rgb_c[:, :15], rgb_f[:, :15], w_f)
    in_zeros = jax.tree_util.tree_map(jnp.zeros_like, (ro, rd, tgt, lw))
    residuals = (d_model, d_driving, d_pose, d_latent, d_bg, in_zeros, key)
    return out, residuals


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def stage1_fused(spec: ModelSpec, fcfg: FusedCfg, params, driving, pose_enc,
                 latent, ro, rd, tgt, lw, bg, key):
    """Both render levels + Stage-I loss with gradients computed in the
    forward. Args: params = the model param dict; driving = computed
    driving vector (AudioNet output / expression); pose_enc (36,);
    latent (L,)|None; ro/rd (R,3) rays; tgt (R,15) [target rgb | seg mask];
    lw (R,2) per-ray loss weights (ray_loss_weights); bg (R,15)|None
    background prior rays; key = PRNG key for z perturb/importance/noise.

    Returns (loss, rgb_coarse (R,15), rgb_fine (R,15), weights_fine
    (R, Sc+Sn)). ONLY the loss output may be consumed differentiably —
    the call site must stop_gradient the other three (their cotangents are
    ignored by the backward; see module docstring)."""
    out, _ = _stage1_fused_fwd(spec, fcfg, params, driving, pose_enc,
                               latent, ro, rd, tgt, lw, bg, key)
    return out


def _stage1_fused_bwd(spec, fcfg, residuals, cts):
    (d_model, d_driving, d_pose, d_latent, d_bg, in_zeros, key) = residuals
    ct = cts[0]      # scalar loss cotangent; rgb/weights cts are zero by
                     # the call-site stop_gradient contract
    scale = lambda t: jax.tree_util.tree_map(lambda g: ct * g, t)
    d_ro, d_rd, d_tgt, d_lw = in_zeros
    d_key = (np.zeros(key.shape, dtype=jax.dtypes.float0)
             if not jnp.issubdtype(key.dtype, jnp.floating)
             else jnp.zeros(key.shape, key.dtype))
    return (scale(d_model), ct * d_driving, ct * d_pose,
            scale(d_latent), d_ro, d_rd, d_tgt, d_lw, scale(d_bg), d_key)


stage1_fused.defvjp(lambda spec, fcfg, *a: _stage1_fused_fwd(spec, fcfg, *a),
                    _stage1_fused_bwd)
