"""Fused Pallas kernels vs the pure-jnp oracle (interpret mode on CPU).

On TPU the same comparisons run compiled (see .claude/skills/verify); the
kernels auto-select interpret mode off-TPU (ops/pallas/field_mlp._interpret).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sahs_tpu.config import Config
from sahs_tpu.models import fields
from sahs_tpu.models.nerface import ModelSpec, init_model_params
from sahs_tpu.ops.encoding import positional_encoding
from sahs_tpu.ops.grid import _grid_sample_3d_impl, grid_sample_3d
from sahs_tpu.ops.pallas.field_mlp import (deform_mlp_apply_fused,
                                           nerf_mlp_apply_fused)


@pytest.fixture(scope="module")
def setup():
    cfg = Config()
    spec = ModelSpec.from_config(cfg)
    params = init_model_params(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(0)
    P = 300
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (P, 3)).astype(np.float32))
    pe_x = positional_encoding(pts, 10)
    driving = jnp.asarray(rng.randn(76).astype(np.float32) * 0.1)
    pose_enc = jnp.asarray(rng.randn(36).astype(np.float32))
    cond = jnp.concatenate([driving, pose_enc])
    return spec, params, rng, pe_x, driving, pose_enc, cond


def test_fused_warp_matches_oracle(setup):
    spec, params, rng, pe_x, driving, pose_enc, cond = setup
    oracle = fields.warp_field_apply(params["warp"], spec.warp, pe_x,
                                     driving, pose_enc)
    fused = deform_mlp_apply_fused(params["warp"], 6, 128, 4, pe_x, cond, 3,
                                   out_act="tanh", compute_dtype="float32")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               atol=1e-5)


def test_fused_hyper_matches_oracle(setup):
    spec, params, rng, pe_x, driving, pose_enc, cond = setup
    oracle = fields.hyper_sheet_apply(params["hyper"], spec.hyper, pe_x,
                                      driving, pose_enc)
    fused = deform_mlp_apply_fused(params["hyper"], 6, 64, 4, pe_x, cond, 2,
                                   out_act="linear", compute_dtype="float32")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               atol=1e-5)


def test_fused_nerf_matches_oracle(setup):
    spec, params, rng, pe_x, driving, pose_enc, cond = setup
    P = pe_x.shape[0]
    pe_amb = positional_encoding(
        jnp.asarray(rng.uniform(-1, 1, (P, 2)).astype(np.float32)), 4)
    pts_embed = jnp.concatenate([pe_x, pe_amb], -1)
    dirs_embed = positional_encoding(
        jnp.asarray(rng.randn(P, 3).astype(np.float32)), 4)
    se = jnp.asarray(rng.randn(P, 32).astype(np.float32) * 0.1)
    extra = jnp.concatenate([dirs_embed, se], -1)
    oracle = fields.nerf_mlp_apply(params["coarse"], spec.coarse, pts_embed,
                                   dirs_embed, pose=pose_enc,
                                   spatial_embedding=se)
    fused = nerf_mlp_apply_fused(params["coarse"], 8, 3, pts_embed, extra,
                                 pose_enc, compute_dtype="float32")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               atol=2e-5)


def test_fused_warp_grads_match_finite_diff(setup):
    spec, params, rng, pe_x, driving, pose_enc, cond = setup
    v = jnp.asarray(rng.randn(pe_x.shape[0], 3).astype(np.float32))

    def loss(p):
        y = deform_mlp_apply_fused(p, 6, 128, 4, pe_x, cond, 3,
                                   out_act="tanh", compute_dtype="float32")
        return jnp.sum(y * v)

    g = jax.grad(loss)(params["warp"])
    eps = 1e-2
    for li, key, idx in [(0, "b", (5,)), (5, "w", (10, 20))]:
        def mod(d):
            t = jax.tree.map(lambda x: x, params["warp"])
            t["trunk"][li][key] = t["trunk"][li][key].at[idx].add(d)
            return t
        fd = (float(loss(mod(eps))) - float(loss(mod(-eps)))) / (2 * eps)
        an = float(g["trunk"][li][key][idx])
        assert abs(fd - an) < max(2e-2, 0.05 * abs(fd)), (li, key, fd, an)


def test_fused_nerf_grads_match_oracle_grads(setup):
    spec, params, rng, pe_x, driving, pose_enc, cond = setup
    P = pe_x.shape[0]
    pe_amb = positional_encoding(
        jnp.asarray(rng.uniform(-1, 1, (P, 2)).astype(np.float32)), 4)
    pts_embed = jnp.concatenate([pe_x, pe_amb], -1)
    dirs_embed = positional_encoding(
        jnp.asarray(rng.randn(P, 3).astype(np.float32)), 4)
    se = jnp.asarray(rng.randn(P, 32).astype(np.float32) * 0.1)
    extra = jnp.concatenate([dirs_embed, se], -1)
    v = jnp.asarray(rng.randn(P, 16).astype(np.float32))

    def loss_oracle(p):
        y = fields.nerf_mlp_apply(p, spec.coarse, pts_embed, dirs_embed,
                                  pose=pose_enc, spatial_embedding=se)
        return jnp.sum(y * v)

    def loss_fused(p):
        y = nerf_mlp_apply_fused(p, 8, 3, pts_embed, extra, pose_enc,
                                 compute_dtype="float32")
        return jnp.sum(y * v)

    go = jax.grad(loss_oracle)(params["coarse"])
    gf = jax.grad(loss_fused)(params["coarse"])
    for a, b in zip(jax.tree.leaves(go), jax.tree.leaves(gf)):
        scale = float(jnp.abs(a).max()) + 1e-6
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4 * max(scale, 1.0))


def test_grid_custom_vjp_matches_autodiff():
    rng = np.random.RandomState(0)
    G = jnp.asarray(rng.randn(8, 5, 6, 7).astype(np.float32))
    c = jnp.asarray((rng.rand(200, 3).astype(np.float32) * 2.6 - 1.3))
    d_new = jax.grad(lambda g: jnp.sum(jnp.sin(grid_sample_3d(g, c))))(G)
    d_ref = jax.grad(lambda g: jnp.sum(jnp.sin(_grid_sample_3d_impl(g, c))))(G)
    np.testing.assert_allclose(np.asarray(d_new), np.asarray(d_ref), atol=1e-4)
    dc_new = jax.grad(lambda cc: jnp.sum(jnp.sin(grid_sample_3d(G, cc))))(c)
    dc_ref = jax.grad(lambda cc: jnp.sum(jnp.sin(_grid_sample_3d_impl(G, cc))))(c)
    np.testing.assert_allclose(np.asarray(dc_new), np.asarray(dc_ref), atol=1e-4)


def test_pipeline_pallas_path_matches_oracle(setup):
    """Full render_rays with use_pallas vs the oracle path."""
    from sahs_tpu.render.pipeline import RenderSettings, render_rays
    spec, params, rng, pe_x, driving, pose_enc, cond = setup
    R = 16
    ro = np.zeros((R, 3), np.float32)
    rd = (rng.randn(R, 3) * 0.05 + np.array([0, 0, -1.0])).astype(np.float32)
    audio = rng.randn(16, 29).astype(np.float32)
    Rm = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    pose = np.concatenate([Rm, np.array([[0], [0], [0.6]], np.float32)], 1)
    bg = rng.rand(R, 15).astype(np.float32)
    base = dict(num_coarse=8, num_fine=8, perturb=False,
                radiance_field_noise_std=0.0)
    s_oracle = RenderSettings(**base, use_pallas=False)
    s_pallas = RenderSettings(**base, use_pallas=True, compute_dtype="float32")
    out_o = render_rays(params, setup[0], s_oracle, jnp.asarray(ro),
                        jnp.asarray(rd), 0.48, 1.08, jnp.asarray(audio),
                        jnp.asarray(pose), background_prior=jnp.asarray(bg))
    out_p = render_rays(params, setup[0], s_pallas, jnp.asarray(ro),
                        jnp.asarray(rd), 0.48, 1.08, jnp.asarray(audio),
                        jnp.asarray(pose), background_prior=jnp.asarray(bg))
    np.testing.assert_allclose(np.asarray(out_p.rgb_fine),
                               np.asarray(out_o.rgb_fine), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.disp_fine),
                               np.asarray(out_o.disp_fine), rtol=1e-3)


@pytest.mark.slow
def test_pipeline_pallas_grads_match_oracle(setup):
    """Full render_rays gradients (params incl. audnet/warp/hyper/grid/nerf
    and the background prior) with the fused MLP+composite level kernel vs
    the oracle path. Loss touches rgb coarse+fine AND the fine weights so
    the kernel's g_w cotangent path is exercised."""
    from sahs_tpu.render.pipeline import RenderSettings, render_rays
    spec, params, _shared_rng, pe_x, driving, pose_enc, cond = setup
    # Private RNG: the fixture's RandomState is stateful/shared, which made
    # the test's inputs depend on which tests ran before it (and its
    # cliff-sensitivity tolerance order-dependent).
    rng = np.random.RandomState(42)
    # At raw init every sigma_raw < 0, so with a background prior ALL param
    # grads are exactly 0 and the comparison is vacuous; shift the
    # sigma-head bias to a live operating point (relu active on a realistic
    # fraction of samples).
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    for lvl in ("coarse", "fine"):
        params[lvl] = dict(params[lvl])
        params[lvl]["fc_alpha"] = {
            "w": params[lvl]["fc_alpha"]["w"],
            "b": params[lvl]["fc_alpha"]["b"] + 0.5}
    R = 8
    ro = np.zeros((R, 3), np.float32)
    rd = (rng.randn(R, 3) * 0.05 + np.array([0, 0, -1.0])).astype(np.float32)
    audio = rng.randn(16, 29).astype(np.float32)
    Rm = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    pose = np.concatenate([Rm, np.array([[0], [0], [0.6]], np.float32)], 1)
    bg = jnp.asarray(rng.rand(R, 15).astype(np.float32))
    v_c = jnp.asarray(rng.randn(R, 15).astype(np.float32))
    v_f = jnp.asarray(rng.randn(R, 15).astype(np.float32))
    v_w = jnp.asarray(rng.randn(R).astype(np.float32))
    base = dict(num_coarse=8, num_fine=8, perturb=False,
                radiance_field_noise_std=0.0)
    s_oracle = RenderSettings(**base, use_pallas=False)
    s_pallas = RenderSettings(**base, use_pallas=True,
                              compute_dtype="float32")

    def loss(p, b, settings):
        out = render_rays(p, spec, settings, jnp.asarray(ro),
                          jnp.asarray(rd), 0.48, 1.08, jnp.asarray(audio),
                          jnp.asarray(pose), background_prior=b)
        return (jnp.vdot(out.rgb_coarse, v_c) + jnp.vdot(out.rgb_fine, v_f)
                + jnp.vdot(out.weights[:, -1], v_w))

    go, gbo = jax.grad(lambda p, b: loss(p, b, s_oracle),
                       argnums=(0, 1))(params, bg)
    gp, gbp = jax.grad(lambda p, b: loss(p, b, s_pallas),
                       argnums=(0, 1))(params, bg)
    g_norm = float(jnp.sqrt(sum(jnp.vdot(l, l)
                                for l in jax.tree_util.tree_leaves(go))))
    assert g_norm > 1e-2, "oracle grads ~0 — comparison would be vacuous"
    paths = jax.tree_util.tree_leaves_with_path(go)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(gp))
    for path, a in paths:
        b = np.asarray(flat_p[path], np.float64)
        a = np.asarray(a, np.float64)
        # Per-leaf L2 bound, not pointwise max: individual samples sitting
        # on relu/trilerp-knot cliffs land on different sides under
        # different-but-valid f32 fusion orders, flipping single O(1e-3)
        # grad contributions (the oracle itself moves this much under a
        # 1e-6 input perturbation).
        na = np.linalg.norm(a)
        # floor the denominator at 1% of the global grad norm so leaves
        # with negligible gradient cannot dominate the relative metric
        err = np.linalg.norm(b - a) / max(na, 0.01 * g_norm)
        assert err < 5e-2, (jax.tree_util.keystr(path), err, na)
    np.testing.assert_allclose(np.asarray(gbp), np.asarray(gbo), atol=5e-4)


def test_deform_pair_matches_separate_kernels(setup):
    """Merged warp+hyper kernel == the two single-net fused kernels,
    fwd and grads (params, points, conditioning)."""
    from sahs_tpu.ops.pallas.field_mlp import (PESpec, _rup,
                                               deform_pair_apply_fused)
    from sahs_tpu.ops.encoding import encoded_dim
    spec, params, _, pe_x, driving, pose_enc, cond = setup
    rng = np.random.RandomState(7)
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (300, 3)).astype(np.float32))
    pe_spec = PESpec(groups=((0, 3, 10, True, True),), in_width=8,
                     out_width=_rup(encoded_dim(3, 10, True)))
    wp = (spec.warp.num_layers, spec.warp.hidden_size,
          spec.warp.skip_connect_every, 3, "tanh")
    hp = (spec.hyper.num_layers, spec.hyper.hidden_size,
          spec.hyper.skip_connect_every, spec.hyper.ambient_coord_dim,
          "linear")

    def pair(pw, ph, x, c):
        packed = deform_pair_apply_fused(pw, ph, wp, hp, x, c,
                                         compute_dtype="float32",
                                         pe_spec=pe_spec)
        return packed[:, :3] - x, packed[:, 3:3 + hp[3]]

    def sep(pw, ph, x, c):
        dx = deform_mlp_apply_fused(pw, wp[0], wp[1], wp[2], x, c, 3,
                                    out_act="tanh", compute_dtype="float32",
                                    pe_spec=pe_spec)
        amb = deform_mlp_apply_fused(ph, hp[0], hp[1], hp[2], x, c, hp[3],
                                     out_act="linear",
                                     compute_dtype="float32",
                                     pe_spec=pe_spec)
        return dx, amb

    dx_p, amb_p = pair(params["warp"], params["hyper"], pts, cond)
    dx_s, amb_s = sep(params["warp"], params["hyper"], pts, cond)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_s),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(amb_p), np.asarray(amb_s),
                               atol=1e-6, rtol=1e-5)

    cot = (jnp.asarray(rng.randn(300, 3).astype(np.float32)),
           jnp.asarray(rng.randn(300, hp[3]).astype(np.float32)))

    def loss(fn, pw, ph, x, c):
        dx, amb = fn(pw, ph, x, c)
        return jnp.vdot(dx, cot[0]) + jnp.vdot(amb, cot[1])

    gp = jax.grad(lambda *a: loss(pair, *a), argnums=(0, 1, 2, 3))(
        params["warp"], params["hyper"], pts, cond)
    gs = jax.grad(lambda *a: loss(sep, *a), argnums=(0, 1, 2, 3))(
        params["warp"], params["hyper"], pts, cond)
    # the pair kernel sums the two PE cotangents BEFORE the shared PE
    # backward; the separate path adds after — f32 reassociation only
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3)


def test_nerf_rayd_matches_per_point_kernel(setup):
    """Per-ray-dir-PE NeRF kernel == the per-point fused kernel, fwd and
    grads (params, points, se, cond); dirs cotangent is intentionally zero
    in the rayd variant (never needed: camera data)."""
    from sahs_tpu.ops.encoding import encoded_dim
    from sahs_tpu.ops.pallas.field_mlp import (PESpec, _rup,
                                               nerf_mlp_apply_rayd)
    spec, params, _, _, driving, pose_enc, cond = setup
    rng = np.random.RandomState(11)
    R, S = 25, 16
    P = R * S
    pts5 = jnp.asarray(
        np.concatenate([rng.uniform(-0.3, 0.3, (P, 3)),
                        rng.uniform(-0.5, 0.5, (P, 2))], 1).astype(np.float32))
    dirs_ray = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    dirs_flat = jnp.broadcast_to(dirs_ray[:, None, :], (R, S, 3)).reshape(-1, 3)
    se = jnp.asarray(rng.randn(P, 32).astype(np.float32))
    nerf_cond = pose_enc

    pts_pe = PESpec(groups=((0, 3, 10, True, True), (3, 2, 4, True, True)),
                    in_width=8, out_width=_rup(63 + 18))
    extra_pe = PESpec(groups=((0, 3, 4, True, True), (3, 32, 0, True, True)),
                      in_width=40, out_width=_rup(27 + 32))
    dir_pe = PESpec(groups=((0, 3, 4, True, True),), in_width=8,
                    out_width=_rup(27))

    def rayd(p, x, s, c):
        return nerf_mlp_apply_rayd(p, 8, 3, x, dirs_ray, s, S, c,
                                   compute_dtype="float32",
                                   pe_spec=pts_pe, dir_pe_spec=dir_pe)

    def ppoint(p, x, s, c):
        extra = jnp.concatenate([dirs_flat, s], axis=-1)
        return nerf_mlp_apply_fused(p, 8, 3, x, extra, c,
                                    compute_dtype="float32",
                                    pe_spec=pts_pe, extra_pe_spec=extra_pe)

    y_r = rayd(params["fine"], pts5, se, nerf_cond)
    y_p = ppoint(params["fine"], pts5, se, nerf_cond)
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_p),
                               atol=2e-5, rtol=1e-4)

    cot = jnp.asarray(rng.randn(P, 16).astype(np.float32))
    g_r = jax.grad(lambda *a: jnp.vdot(rayd(*a), cot),
                   argnums=(0, 1, 2, 3))(params["fine"], pts5, se, nerf_cond)
    g_p = jax.grad(lambda *a: jnp.vdot(ppoint(*a), cot),
                   argnums=(0, 1, 2, 3))(params["fine"], pts5, se, nerf_cond)
    for a, b in zip(jax.tree_util.tree_leaves(g_r),
                    jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3)


def test_grid_bwd_pallas_kernel_matches_autodiff():
    """Fused Pallas grid backward (production 32ch x 32^3 shape) vs
    autodiff of the 8-gather oracle, both cotangents, f32 + bf16."""
    from sahs_tpu.ops.grid import _grid_sample_3d_impl, grid_sample_3d
    from sahs_tpu.ops.pallas.grid_bwd import grid_bwd_kernel_ok

    rng = np.random.RandomState(0)
    G = jnp.asarray(rng.randn(32, 32, 32, 32).astype(np.float32) * 0.1)
    P = 1500   # not a tile multiple: exercises padding
    c = jnp.asarray(rng.rand(P, 3).astype(np.float32) * 2.4 - 1.2)
    cot = jnp.asarray(rng.randn(P, 32).astype(np.float32))
    assert grid_bwd_kernel_ok(G.shape, P)

    def loss(fn, g_, c_):
        return jnp.vdot(fn(g_, c_), cot)

    dg_ref, dc_ref = jax.grad(
        lambda g_, c_: loss(_grid_sample_3d_impl, g_, c_),
        argnums=(0, 1))(G, c)

    dg, dc = jax.grad(
        lambda g_, c_: loss(
            lambda a, b: grid_sample_3d(a, b, compute_dtype="float32"),
            g_, c_), argnums=(0, 1))(G, c)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(dg_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dc), np.asarray(dc_ref), atol=1e-4)

    dg16, dc16 = jax.grad(
        lambda g_, c_: loss(
            lambda a, b: grid_sample_3d(a, b, compute_dtype="bfloat16"),
            g_, c_), argnums=(0, 1))(G, c)
    sg = float(jnp.abs(dg_ref).max())
    sc = float(jnp.abs(dc_ref).max())
    np.testing.assert_allclose(np.asarray(dg16), np.asarray(dg_ref),
                               atol=2e-2 * sg)
    np.testing.assert_allclose(np.asarray(dc16), np.asarray(dc_ref),
                               atol=2e-2 * sc)


def test_grid_bwd_pallas_kernel_wide_coords():
    """Packed (P, 128) coordinate blocks: cotangent zero outside col 0-2."""
    from sahs_tpu.ops.grid import _grid_sample_3d_impl, grid_sample_3d

    rng = np.random.RandomState(1)
    G = jnp.asarray(rng.randn(32, 32, 32, 32).astype(np.float32) * 0.1)
    P = 256
    cw = jnp.asarray(
        np.concatenate([rng.rand(P, 3) * 2 - 1, rng.randn(P, 125)],
                       axis=1).astype(np.float32))
    dc = jax.grad(lambda c_: jnp.sum(
        jnp.sin(grid_sample_3d(G, c_, compute_dtype="float32"))))(cw)
    dc_ref = jax.grad(lambda c3: jnp.sum(
        jnp.sin(_grid_sample_3d_impl(G, c3))))(cw[:, :3])
    np.testing.assert_allclose(np.asarray(dc[:, :3]), np.asarray(dc_ref),
                               atol=1e-4)
    assert float(jnp.abs(dc[:, 3:]).max()) == 0.0


@pytest.mark.slow
def test_pipeline_reuse_path_matches_oracle(setup):
    """The deformation-reuse path (use_pallas, fuse_composite=False: coarse
    front half shared with the fine level, fine raw permuted into z order)
    vs the oracle, forward AND grads."""
    from sahs_tpu.render.pipeline import RenderSettings, render_rays
    spec, params, _shared_rng, pe_x, driving, pose_enc, cond = setup
    params = jax.tree_util.tree_map(lambda x: x, params)
    for lvl in ("coarse", "fine"):
        params[lvl] = dict(params[lvl])
        params[lvl]["fc_alpha"] = {
            "w": params[lvl]["fc_alpha"]["w"],
            "b": params[lvl]["fc_alpha"]["b"] + 0.5}
    rng = np.random.RandomState(7)
    R = 8
    ro = np.zeros((R, 3), np.float32)
    rd = (rng.randn(R, 3) * 0.05 + np.array([0, 0, -1.0])).astype(np.float32)
    audio = rng.randn(16, 29).astype(np.float32)
    Rm = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    pose = np.concatenate([Rm, np.array([[0], [0], [0.6]], np.float32)], 1)
    bg = jnp.asarray(rng.rand(R, 15).astype(np.float32))
    v_f = jnp.asarray(rng.randn(R, 15).astype(np.float32))
    base = dict(num_coarse=8, num_fine=8, perturb=False,
                radiance_field_noise_std=0.0)
    s_oracle = RenderSettings(**base, use_pallas=False)
    s_reuse = RenderSettings(**base, use_pallas=True,
                             compute_dtype="float32", fuse_composite=False)

    def run(settings, p):
        return render_rays(p, spec, settings, jnp.asarray(ro),
                           jnp.asarray(rd), 0.48, 1.08, jnp.asarray(audio),
                           jnp.asarray(pose), background_prior=bg)

    out_o = run(s_oracle, params)
    out_r = run(s_reuse, params)
    np.testing.assert_allclose(np.asarray(out_r.rgb_fine),
                               np.asarray(out_o.rgb_fine), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_r.weights),
                               np.asarray(out_o.weights), atol=1e-4)

    # Gradients: the strong property is reuse == recompute with the SAME
    # kernels (measured bitwise-identical forward; grads to ~1e-5) — an
    # oracle grad comparison at the fine level is chaos-limited (z_samples
    # depend on coarse weights; PE/trilerp amplification) and already
    # covered by test_pipeline_pallas_grads_match_oracle.
    from sahs_tpu.models import nerface as nerface_mod

    def run_recompute(p):
        fns = nerface_mod.make_render_fns(
            p, spec, jnp.asarray(audio), jnp.asarray(pose),
            use_pallas=True, compute_dtype="float32")
        return render_rays(p, spec, s_reuse, jnp.asarray(ro),
                           jnp.asarray(rd), 0.48, 1.08, jnp.asarray(audio),
                           jnp.asarray(pose), background_prior=bg,
                           field_fn=fns.field_fn)

    np.testing.assert_array_equal(np.asarray(run_recompute(params).rgb_fine),
                                  np.asarray(out_r.rgb_fine))
    gr = jax.grad(lambda p: jnp.vdot(run(s_reuse, p).rgb_fine, v_f))(params)
    gc = jax.grad(lambda p: jnp.vdot(run_recompute(p).rgb_fine, v_f))(params)
    g_norm = float(jnp.sqrt(sum(jnp.vdot(l, l)
                                for l in jax.tree_util.tree_leaves(gr))))
    assert g_norm > 1e-2
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gc),
                            jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_grid_dg_slab_matches_autodiff():
    """z-slab-predicated dGrid kernel vs autodiff of the 8-gather oracle —
    random order AND sample-major order, f32 + bf16, padding rows."""
    from sahs_tpu.ops.grid import _grid_sample_3d_impl
    from sahs_tpu.ops.pallas.grid_bwd import grid_dg_slab

    rng = np.random.RandomState(3)
    G = jnp.asarray(rng.randn(32, 32, 32, 32).astype(np.float32) * 0.1)
    P = 1500   # non-multiple of tile: exercises the padding rows
    c = jnp.asarray(rng.rand(P, 3).astype(np.float32) * 2.4 - 1.2)
    cot = jnp.asarray(rng.randn(P, 32).astype(np.float32))

    dg_ref = jax.grad(lambda g_: jnp.vdot(
        _grid_sample_3d_impl(g_, c), cot))(G)

    dg = grid_dg_slab(G.shape, c, cot, compute_dtype="float32")
    np.testing.assert_allclose(np.asarray(dg), np.asarray(dg_ref), atol=1e-4)

    dg16 = grid_dg_slab(G.shape, c, cot, compute_dtype="bfloat16")
    sg = float(jnp.abs(dg_ref).max())
    np.testing.assert_allclose(np.asarray(dg16), np.asarray(dg_ref),
                               atol=2e-2 * sg)

    # depth-sorted (sample-major-like) order: same result
    order = jnp.argsort(c[:, 2])
    dg_sorted = grid_dg_slab(G.shape, c[order], cot[order],
                             compute_dtype="float32")
    np.testing.assert_allclose(np.asarray(dg_sorted), np.asarray(dg_ref),
                               atol=1e-4)


def test_pallas_latent_code_path_matches_oracle():
    """Latent codes ride the Pallas fast path: folded into effective biases
    like driving/pose (reference trunk input [pe, latent, driving, pose],
    models.py:275,294). Forward + gradient parity incl. d(latent)."""
    from sahs_tpu.models.nerface import (apply_field, make_render_fns)

    cfg = Config()
    cfg.models.mask.latent_code_dim = 32
    spec = ModelSpec.from_config(cfg)
    params = init_model_params(jax.random.PRNGKey(3), spec)
    rng = np.random.RandomState(5)
    S, R = 8, 16
    P = R * S
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (P, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    audio = jnp.asarray(rng.randn(16, 29).astype(np.float32))
    pose = jnp.asarray(np.concatenate(
        [np.linalg.qr(rng.randn(3, 3))[0],
         np.array([[0], [0], [0.6]])], 1).astype(np.float32))
    latent = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)

    def pallas_out(lat):
        fns = make_render_fns(params, spec, audio, pose, latent_code=lat,
                              use_pallas=True, compute_dtype="float32")
        return fns.field_fn("fine", pts, dirs, S)

    def oracle_out(lat):
        dirs_flat = jnp.broadcast_to(
            dirs[:, None, :], (R, S, 3)).reshape(-1, 3)
        return apply_field(params, spec, "fine", pts, dirs_flat, audio,
                           pose, latent_code=lat)

    np.testing.assert_allclose(np.asarray(pallas_out(latent)),
                               np.asarray(oracle_out(latent)),
                               atol=2e-4, rtol=1e-3)
    dl_p = jax.grad(lambda l: jnp.sum(jnp.sin(pallas_out(l))))(latent)
    dl_o = jax.grad(lambda l: jnp.sum(jnp.sin(oracle_out(l))))(latent)
    np.testing.assert_allclose(np.asarray(dl_p), np.asarray(dl_o),
                               atol=2e-4, rtol=1e-3)


def test_pe_broadcast_variant_matches_dot(setup, monkeypatch):
    """The SAHS_PE_BCAST ablation path (VPU broadcast-FMA PE) must stay
    numerically equivalent to the default split-dot PE (it is f32-exact;
    kept as a measured-slower-on-v5e ablation switch)."""
    from sahs_tpu.ops.pallas import field_mlp as fm
    spec, params, rng, pe_x, driving, pose_enc, cond = setup
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (256, 3)).astype(np.float32))
    warp_pe = fm.PESpec(groups=((0, 3, 10, True, True),), in_width=8,
                        out_width=fm._rup(63))

    def run():
        y = fm.deform_mlp_apply_fused(
            params["warp"], 6, 128, 4, pts, cond, 3, out_act="tanh",
            compute_dtype="float32", pe_spec=warp_pe)
        g = jax.grad(lambda p: jnp.sum(jnp.sin(fm.deform_mlp_apply_fused(
            p, 6, 128, 4, pts, cond, 3, out_act="tanh",
            compute_dtype="float32", pe_spec=warp_pe))))(params["warp"])
        return y, g

    y_dot, g_dot = run()
    monkeypatch.setattr(fm, "_PE_BCAST", True)
    y_bc, g_bc = run()
    # both paths are f32-accurate but associate the angle sum differently;
    # sin at 2^9 frequencies amplifies the last-bit difference ~500x
    np.testing.assert_allclose(np.asarray(y_bc), np.asarray(y_dot),
                               atol=5e-4, rtol=5e-3)
    for a, b in zip(jax.tree_util.tree_leaves(g_dot),
                    jax.tree_util.tree_leaves(g_bc)):
        sc = max(float(np.abs(np.asarray(a)).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-3 * sc)


@pytest.mark.slow
def test_pair2_matches_unpaired(setup, monkeypatch):
    """The two-points-per-row hyper chain (blockdiag weights, _PAIR2) must
    match the unpaired chain bitwise-modulo-reassociation: the same
    products accumulate in f32 plus exact zero terms from the
    off-diagonal blocks. Covers fwd AND the vjp's dW fold."""
    from sahs_tpu.ops.pallas import field_mlp as fm
    from sahs_tpu.ops.encoding import encoded_dim
    spec, params, _, pe_x, driving, pose_enc, cond = setup
    rng = np.random.RandomState(11)
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (256, 3)).astype(np.float32))
    pe_spec = fm.PESpec(groups=((0, 3, 10, True, True),), in_width=8,
                        out_width=fm._rup(encoded_dim(3, 10, True)))
    wp = (spec.warp.num_layers, spec.warp.hidden_size,
          spec.warp.skip_connect_every, 3, "tanh")
    hp = (spec.hyper.num_layers, spec.hyper.hidden_size,
          spec.hyper.skip_connect_every, spec.hyper.ambient_coord_dim,
          "linear")

    def run():
        def loss(ph):
            packed = fm.deform_pair_apply_fused(
                params["warp"], ph, wp, hp, pts, cond,
                compute_dtype="float32", pe_spec=pe_spec)
            return jnp.sum(jnp.sin(packed[:, :3 + hp[3]]))
        val, g = jax.value_and_grad(loss)(params["hyper"])
        return val, g

    monkeypatch.setattr(fm, "_PAIR2", True)
    v2, g2 = run()
    monkeypatch.setattr(fm, "_PAIR2", False)
    v1, g1 = run()
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-6)
    for (p, a), b in zip(jax.tree_util.tree_flatten_with_path(g2)[0],
                         jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(p))


@pytest.mark.slow
def test_grid_dg_slab_3d_blocks_match_flat():
    """The ray-major (R, S, 64) 3-D-BlockSpec slab path must equal the
    sample-major flat path (same per-point contributions, different tile
    order)."""
    from sahs_tpu.ops.pallas.grid_bwd import grid_dg_slab_packed
    from sahs_tpu.ops.pallas.field_grid import _sample_major
    R, S, C = 128, 8, 32
    gs = (C, 32, 32, 32)
    rng = np.random.RandomState(3)
    pk = jnp.asarray(rng.randn(R * S, 64).astype(np.float32) * 0.3)
    pk = pk.at[:, 9 + C:].set(0)
    flat = grid_dg_slab_packed(gs, _sample_major(pk, R, S), "float32")
    threed = grid_dg_slab_packed(gs, pk.reshape(R, S, 64), "float32")
    np.testing.assert_allclose(np.asarray(threed), np.asarray(flat),
                               rtol=1e-5, atol=1e-6)
