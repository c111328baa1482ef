"""Equivalence of the fully-fused Stage-I gradient path (train/fused.py)
against jax.grad over render_rays (the default path) on identical
state/batch/RNG: same loss, same metrics, same gradients.

The fused path computes the loss cotangents INSIDE the level kernels and
the pair/grid backward over the coarse∪fine union points — exactness of
those closed-form cotangents and of the union recombination is what these
tests certify. Run in float32 (kernels in interpret mode on CPU) so the
only expected differences are fp reassociation."""
import dataclasses

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from sahs_tpu.config import Config
from sahs_tpu.data.synthetic import SyntheticFaceDataset
from sahs_tpu.models.nerface import ModelSpec
from sahs_tpu.train.stage1 import (TrainSettings, init_train_state,
                                   train_step)


def tiny_cfg(**runtime):
    cfg = Config()
    cfg.nerf.train.num_random_rays = 48
    cfg.nerf.train.num_coarse = 8
    cfg.nerf.train.num_fine = 8
    cfg.runtime.use_pallas = True          # interpret mode on CPU
    cfg.runtime.compute_dtype = "float32"
    for k, v in runtime.items():
        setattr(cfg.runtime, k, v)
    return cfg


def get_batch(cfg, H=32, W=32):
    ds = SyntheticFaceDataset(kind="audio", num_frames=1, H=H, W=W,
                              near=cfg.dataset.near, far=cfg.dataset.far)
    item = ds[0]
    b = {k: jnp.asarray(v) for k, v in item.items() if k != "fname"}
    b["background"] = jnp.asarray(ds.background())
    return b


def run_step(cfg, fused: bool, state, batch):
    ts = dataclasses.replace(TrainSettings.from_config(cfg),
                             fused_grads=fused)
    spec = ModelSpec.from_config(cfg)
    # SGD(1.0) makes (params_before - params_after) == the raw gradient —
    # adam's sqrt-normalization would amplify fp noise near zero.
    opt = optax.sgd(1.0)
    state = state._replace(opt_state=opt.init(state.params))
    st2, metrics = jax.jit(
        lambda s, b, k: train_step(s, b, k, spec, ts, opt)
    )(state, batch, jax.random.PRNGKey(7))
    grads = jax.tree_util.tree_map(lambda a, b_: a - b_,
                                   state.params, st2.params)
    return metrics, grads, st2


def assert_tree_close(ga, gb, rtol, atol):
    flat_a, tree_a = jax.tree_util.tree_flatten(ga)
    flat_b, tree_b = jax.tree_util.tree_flatten(gb)
    assert tree_a == tree_b
    paths = jax.tree_util.tree_flatten_with_path(ga)[0]
    for (path, a), b in zip(paths, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
            err_msg=f"leaf {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize(
    "supervised_bg",
    [False, pytest.param(True, marks=pytest.mark.slow)])
def test_fused_grads_match_autodiff(supervised_bg):
    cfg = tiny_cfg(train_background=supervised_bg,
                   supervised_train_background=supervised_bg,
                   fixed_background=not supervised_bg)
    spec = ModelSpec.from_config(cfg)
    ts = TrainSettings.from_config(cfg)
    from sahs_tpu.train.fused import stage1_fused_eligible
    assert stage1_fused_eligible(spec, ts.render)
    batch = get_batch(cfg)
    state = init_train_state(jax.random.PRNGKey(0), spec, ts,
                             background=(jnp.asarray(batch["background"])
                                         if supervised_bg else None))
    # live sigma operating point (see test_pallas grads test): at raw init
    # every sigma_raw < 0 and most grads vanish
    params = dict(state.params)
    model = dict(params["model"])
    for lvl in ("coarse", "fine"):
        model[lvl] = dict(model[lvl])
        model[lvl]["fc_alpha"] = {
            "w": model[lvl]["fc_alpha"]["w"],
            "b": model[lvl]["fc_alpha"]["b"] + 0.5}
    params["model"] = model
    state = state._replace(params=params)

    m_ref, g_ref, st_ref = run_step(cfg, False, state, batch)
    m_fused, g_fused, st_fused = run_step(cfg, True, state, batch)

    # loss / metrics identical up to reassociation
    for k in ("loss", "coarse_l2", "fine_l2", "coarse_ce", "fine_ce",
              "bg_loss", "psnr"):
        np.testing.assert_allclose(float(m_fused[k]), float(m_ref[k]),
                                   rtol=2e-4, atol=1e-6, err_msg=k)
    # dynamic sampling probabilities identical
    np.testing.assert_allclose(np.asarray(st_fused.sample_prob),
                               np.asarray(st_ref.sample_prob),
                               rtol=1e-4, atol=1e-6)
    # gradients: the union-pair recombination and in-kernel cotangents
    # reassociate sums, so compare with a scale-aware tolerance
    assert_tree_close(g_fused, g_ref, rtol=5e-3, atol=5e-5)


@pytest.mark.slow
def test_fused_noise_and_perturb_rng_matches():
    """With perturb + sigma noise ON, the fused path must consume the
    SAME PRNG stream as render_rays (split(key, 4) in the same order) —
    otherwise z values/noise differ and the paths diverge."""
    cfg = tiny_cfg()
    spec = ModelSpec.from_config(cfg)
    ts = TrainSettings.from_config(cfg)
    assert ts.render.perturb and ts.render.radiance_field_noise_std > 0
    batch = get_batch(cfg)
    state = init_train_state(jax.random.PRNGKey(0), spec, ts)
    m_ref, g_ref, _ = run_step(cfg, False, state, batch)
    m_fused, g_fused, _ = run_step(cfg, True, state, batch)
    np.testing.assert_allclose(float(m_fused["loss"]), float(m_ref["loss"]),
                               rtol=2e-4)
    assert_tree_close(g_fused, g_ref, rtol=5e-3, atol=5e-5)


@pytest.mark.slow
def test_fused_bf16_finite_and_close():
    """bf16 smoke: fused step runs, loss finite and near the f32 value."""
    cfg32 = tiny_cfg()
    cfg16 = tiny_cfg(compute_dtype="bfloat16")
    spec = ModelSpec.from_config(cfg32)
    ts = TrainSettings.from_config(cfg32)
    batch = get_batch(cfg32)
    state = init_train_state(jax.random.PRNGKey(0), spec, ts)
    m32, _, _ = run_step(cfg32, True, state, batch)
    m16, _, _ = run_step(cfg16, True, state, batch)
    assert np.isfinite(float(m16["loss"]))
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]),
                               rtol=5e-2)


@pytest.mark.slow
def test_fused_latent_codes_match_autodiff():
    """Latent codes ride the fused path as conditioning: the level cond
    gains the per-frame code, dcond slices must route back to the
    latent_codes table (plus the norm regularizer on top)."""
    cfg = tiny_cfg(train_latent_codes=True, disable_latent_codes=False,
                   regularize_latent_codes=True)
    cfg.models.mask.latent_code_dim = 32
    spec = ModelSpec.from_config(cfg)
    assert spec.coarse.latent_code_dim == 32
    ts = TrainSettings.from_config(cfg)
    batch = get_batch(cfg)
    state = init_train_state(jax.random.PRNGKey(0), spec, ts,
                             num_latent_frames=2)
    assert "latent_codes" in state.params
    # nonzero codes so the cond path carries real signal
    params = dict(state.params)
    params["latent_codes"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(5), params["latent_codes"].shape)
    state = state._replace(params=params)

    m_ref, g_ref, _ = run_step(cfg, False, state, batch)
    m_fused, g_fused, _ = run_step(cfg, True, state, batch)
    np.testing.assert_allclose(float(m_fused["loss"]), float(m_ref["loss"]),
                               rtol=2e-4)
    # the latent table must receive identical (nonzero) gradients
    gl_ref = np.asarray(g_ref["latent_codes"])
    gl_fused = np.asarray(g_fused["latent_codes"])
    assert np.abs(gl_ref).max() > 0
    np.testing.assert_allclose(gl_fused, gl_ref, rtol=5e-3, atol=5e-5)
    assert_tree_close(g_fused, g_ref, rtol=5e-3, atol=5e-5)


@pytest.mark.slow
def test_fused_no_background_matches_autodiff():
    """bg=None (dataset without a background image): the fused kernels drop
    the prior-substitution row and the g_bg output entirely."""
    cfg = tiny_cfg(fixed_background=False, train_background=False)
    spec = ModelSpec.from_config(cfg)
    ts = TrainSettings.from_config(cfg)
    batch = get_batch(cfg)
    batch = {k: v for k, v in batch.items() if k != "background"}
    state = init_train_state(jax.random.PRNGKey(0), spec, ts)
    m_ref, g_ref, _ = run_step(cfg, False, state, batch)
    m_fused, g_fused, _ = run_step(cfg, True, state, batch)
    np.testing.assert_allclose(float(m_fused["loss"]), float(m_ref["loss"]),
                               rtol=2e-4)
    assert_tree_close(g_fused, g_ref, rtol=5e-3, atol=5e-5)


@pytest.mark.slow
def test_fused_expression_model_matches_autodiff():
    """NeRFaceModel (3DMM expression driving, identity compute_driving):
    the 76-d expression vector enters the pair/level conditioning
    directly instead of through AudioNet."""
    from sahs_tpu.config import reference_expression_config
    cfg = reference_expression_config()
    cfg.nerf.train.num_random_rays = 48
    cfg.nerf.train.num_coarse = 8
    cfg.nerf.train.num_fine = 8
    cfg.runtime.use_pallas = True
    cfg.runtime.compute_dtype = "float32"
    spec = ModelSpec.from_config(cfg)
    ts = TrainSettings.from_config(cfg)
    from sahs_tpu.train.fused import stage1_fused_eligible
    assert stage1_fused_eligible(spec, ts.render)
    ds = SyntheticFaceDataset(kind="expression", num_frames=1, H=32, W=32,
                              near=cfg.dataset.near, far=cfg.dataset.far)
    item = ds[0]
    batch = {k: jnp.asarray(v) for k, v in item.items() if k != "fname"}
    batch["background"] = jnp.asarray(ds.background())
    state = init_train_state(jax.random.PRNGKey(0), spec, ts)
    m_ref, g_ref, _ = run_step(cfg, False, state, batch)
    m_fused, g_fused, _ = run_step(cfg, True, state, batch)
    np.testing.assert_allclose(float(m_fused["loss"]), float(m_ref["loss"]),
                               rtol=2e-4)
    assert_tree_close(g_fused, g_ref, rtol=5e-3, atol=5e-5)


@pytest.mark.slow
def test_merged_backward_matches_split():
    """The coarse-in-fine cotangent merge (ONE pair-vjp + ONE slab over
    the sorted fine points, coarse cotangents scattered to their sorted
    slots) must match the per-level split backward exactly up to fp
    reassociation — the sorted fine set contains every coarse point
    bit-identically and both backwards are linear in the cotangent."""
    import sahs_tpu.train.fused as fused_mod
    cfg = tiny_cfg()
    spec = ModelSpec.from_config(cfg)
    ts = TrainSettings.from_config(cfg)
    from sahs_tpu.train.fused import stage1_fused_eligible
    assert stage1_fused_eligible(spec, ts.render)
    batch = get_batch(cfg)
    state = init_train_state(jax.random.PRNGKey(0), spec, ts)
    orig = fused_mod._BWD_SPLIT
    try:
        fused_mod._BWD_SPLIT = False
        m_merge, g_merge, _ = run_step(cfg, True, state, batch)
        fused_mod._BWD_SPLIT = True
        m_split, g_split, _ = run_step(cfg, True, state, batch)
    finally:
        fused_mod._BWD_SPLIT = orig
    np.testing.assert_allclose(float(m_merge["loss"]),
                               float(m_split["loss"]), rtol=1e-6)
    assert_tree_close(g_merge, g_split, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("flag", ["_PAIR_RAYS", "_PAIR_FOLD", "_UNION",
                                  "_PTS_KERNEL"])
def test_ablation_paths_match_default(flag, monkeypatch):
    """Every env-gated ablation variant of the fused path (recorded
    measured-negatives kept for re-ablation) must stay gradient-exact
    against the shipped default — they share kernels whose interfaces
    keep evolving, and a silently-broken ablation is dead code."""
    import sahs_tpu.train.fused as fused_mod
    cfg = tiny_cfg()
    spec = ModelSpec.from_config(cfg)
    ts = TrainSettings.from_config(cfg)
    from sahs_tpu.train.fused import stage1_fused_eligible
    assert stage1_fused_eligible(spec, ts.render)
    batch = get_batch(cfg)
    state = init_train_state(jax.random.PRNGKey(0), spec, ts)
    m_def, g_def, _ = run_step(cfg, True, state, batch)
    monkeypatch.setattr(fused_mod, flag, True)
    m_var, g_var, _ = run_step(cfg, True, state, batch)
    np.testing.assert_allclose(float(m_var["loss"]), float(m_def["loss"]),
                               rtol=1e-5)
    assert_tree_close(g_var, g_def, rtol=2e-4, atol=2e-6)
