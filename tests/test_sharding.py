"""Multi-device sharding on the 8-way virtual CPU mesh (SURVEY.md §4.4):
sharded train step must agree with the single-device step, and the graft
dryrun path must compile + run."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sahs_tpu.config import Config
from sahs_tpu.models.nerface import ModelSpec
from sahs_tpu.parallel.mesh import (make_mesh, make_sharded_train_step,
                                    ray_sharding, replicate)
from sahs_tpu.train.stage1 import (TrainSettings, init_train_state,
                                   make_train_step)


def tiny_setup():
    cfg = Config()
    cfg.nerf.train.num_random_rays = 64
    cfg.nerf.train.num_coarse = 8
    cfg.nerf.train.num_fine = 8
    # Keep the sigma noise ON (same key on both paths -> same noise) so the
    # comparison exercises real nonzero gradients.
    spec = ModelSpec.from_config(cfg)
    ts = TrainSettings.from_config(cfg)
    rng = np.random.RandomState(0)
    H = W = 16
    Rm = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    batch = {
        "image": jnp.asarray(rng.rand(H, W, 3).astype(np.float32)),
        "mask": jnp.asarray(np.eye(12, dtype=np.float32)[
            rng.randint(0, 12, size=(H, W))]),
        "pose": jnp.asarray(np.concatenate(
            [Rm, np.array([[0], [0], [0.6]], np.float32)], 1)),
        "intrinsics": jnp.asarray([20.0, 20.0, 0.5, 0.5]),
        "driving": jnp.asarray(rng.randn(16, 29).astype(np.float32)),
        "background": jnp.asarray(np.concatenate(
            [rng.rand(H, W, 3).astype(np.float32),
             np.ones((H, W, 1), np.float32),
             np.zeros((H, W, 11), np.float32)], -1)),
        "frame_idx": jnp.asarray(0, jnp.int32),
    }
    return cfg, spec, ts, batch


def test_eight_virtual_devices_present():
    assert jax.device_count() >= 8


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    cfg, spec, ts, batch = tiny_setup()
    key = jax.random.PRNGKey(7)

    state1 = init_train_state(jax.random.PRNGKey(0), spec, ts)
    single = make_train_step(spec, ts, donate=False)
    s1, m1 = single(state1, batch, key)

    mesh = make_mesh(num_devices=8)
    with mesh:
        state2 = replicate(mesh, init_train_state(jax.random.PRNGKey(0), spec, ts))
        sharded = make_sharded_train_step(spec, ts, mesh, donate=False)
        s2, m2 = sharded(state2, replicate(mesh, batch), key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4)
    w1 = np.asarray(s1.params["model"]["coarse"]["trunk"][0]["w"])
    w2 = np.asarray(s2.params["model"]["coarse"]["trunk"][0]["w"])
    np.testing.assert_allclose(w1, w2, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1.sample_prob),
                               np.asarray(s2.sample_prob), rtol=2e-4)


@pytest.mark.smoke
def test_graft_dryrun_multichip():
    import importlib.util
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec_mod = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.smoke
def test_graft_entry_compiles():
    import importlib.util
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec_mod = importlib.util.spec_from_file_location("graft_entry2", path)
    mod = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_sharded_eval_render_matches_single_device():
    """make_eval_renderer(mesh=...) — the data-parallel eval path wired
    into evaluate_dataset — must reproduce the single-device render."""
    from sahs_tpu.evaluation import make_eval_renderer
    from sahs_tpu.render.pipeline import RenderSettings
    from sahs_tpu.models.nerface import init_model_params
    cfg, spec, ts, batch = tiny_setup()
    H = W = 16
    settings = RenderSettings(num_coarse=8, num_fine=8, perturb=False,
                              radiance_field_noise_std=0.0,
                              chunksize=64, use_pallas=True,
                              compute_dtype="float32")
    params = {"model": init_model_params(jax.random.PRNGKey(0), spec)}
    near, far = float(cfg.dataset.near), float(cfg.dataset.far)
    key = jax.random.PRNGKey(3)
    bg = batch["background"]

    single = make_eval_renderer(spec, settings, H, W, near, far)
    out1 = single(params["model"], batch["intrinsics"], batch["pose"],
                  batch["driving"], bg, key)

    mesh = make_mesh(num_devices=8)
    sharded = make_eval_renderer(spec, settings, H, W, near, far, mesh=mesh)
    out2 = sharded(params["model"], batch["intrinsics"], batch["pose"],
                   batch["driving"], bg, key)

    for k in ("rgb_fine", "rgb_coarse", "disp_fine", "acc_fine"):
        np.testing.assert_allclose(np.asarray(out1[k]), np.asarray(out2[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
