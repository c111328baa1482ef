"""Commit-gating smoke tier (<60 s with tests/test_sharding.py's two smoke
tests): the field evaluators in BOTH modes (oracle + Pallas-interpret) for
BOTH model kinds, the fused-composite level path, and a jitted render step.
Run via tools/smoke.sh before every commit."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sahs_tpu.config import Config
from sahs_tpu.models import nerface
from sahs_tpu.models.nerface import ModelSpec, init_model_params

pytestmark = pytest.mark.smoke


def _spec_params(kind):
    cfg = Config()
    if kind == "NeRFaceModel":
        cfg.models.mask.type = "NeRFaceModel"
        cfg.dataset.type = "expression"
    spec = ModelSpec.from_config(cfg)
    params = init_model_params(jax.random.PRNGKey(0), spec)
    return cfg, spec, params


def _inputs(spec, R=4, S=32):
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(R * S, 3).astype(np.float32) * 0.2)
    dirs = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    driving = (jnp.asarray(rng.randn(16, 29).astype(np.float32))
               if spec.is_audio
               else jnp.asarray(rng.randn(76).astype(np.float32)))
    Rm = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    pose = jnp.asarray(np.concatenate(
        [Rm, np.array([[0], [0], [0.6]], np.float32)], 1))
    return pts, dirs, driving, pose


@pytest.mark.parametrize("kind", ["AudioFaceModel", "NeRFaceModel"])
@pytest.mark.parametrize("use_pallas", [False, True])
def test_field_fn_both_modes_both_kinds(kind, use_pallas):
    """The exact regression surface of the round-2 snapshot bug
    (make_field_fn's Pallas closure): both closures must trace, run, and
    agree with apply_field's oracle to kernel tolerance."""
    cfg, spec, params = _spec_params(kind)
    R, S = 4, 32
    pts, dirs, driving, pose = _inputs(spec, R, S)

    field_fn = nerface.make_field_fn(params, spec, driving, pose,
                                     use_pallas=use_pallas,
                                     compute_dtype="float32")
    out = jax.jit(lambda p: field_fn("fine", p, dirs, S))(pts)
    assert out.shape == (R * S, 16)
    assert bool(jnp.all(jnp.isfinite(out)))

    dirs_flat = jnp.broadcast_to(dirs[:, None, :], (R, S, 3)).reshape(-1, 3)
    oracle = nerface.apply_field(params, spec, "fine", pts, dirs_flat,
                                 driving, pose)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               atol=2e-3, rtol=2e-2)


def test_level_fn_fused_composite_runs():
    """level_fn (fused MLP + in-kernel compositing) traces, runs, and its
    weights/rgb are finite with correct shapes."""
    cfg, spec, params = _spec_params("AudioFaceModel")
    R, S = 4, 64
    assert nerface.level_kernel_compatible(S)
    pts, dirs, driving, pose = _inputs(spec, R, S)
    rng = np.random.RandomState(1)
    z = jnp.asarray(np.sort(rng.rand(R, S).astype(np.float32) + 0.5, -1))
    bg = jnp.asarray(rng.rand(R, 15).astype(np.float32))

    fns = nerface.make_render_fns(params, spec, driving, pose,
                                  use_pallas=True, compute_dtype="float32")
    level_fn = fns.level_fn
    assert level_fn is not None
    rgb, weights = jax.jit(
        lambda p, zz: level_fn("fine", p, dirs, S, zz, bg, None))(pts, z)
    assert rgb.shape == (R, 16) and weights.shape == (R, S)
    assert bool(jnp.all(jnp.isfinite(rgb)))
    assert bool(jnp.all(jnp.isfinite(weights)))


def test_render_rays_grad_smoke():
    """One jitted value_and_grad through the full two-level pipeline on the
    Pallas path — the program the trainer runs."""
    from sahs_tpu.render.pipeline import RenderSettings, render_rays

    cfg, spec, params = _spec_params("AudioFaceModel")
    settings = RenderSettings(num_coarse=8, num_fine=8, perturb=True,
                              radiance_field_noise_std=0.1, use_pallas=True)
    pts, dirs, driving, pose = _inputs(spec)
    rng = np.random.RandomState(2)
    R = 8
    ro = jnp.zeros((R, 3))
    rd = jnp.asarray(rng.randn(R, 3).astype(np.float32) * 0.05
                     + np.array([0, 0, -1.0], np.float32))
    bg = jnp.asarray(rng.rand(R, 15).astype(np.float32))

    def loss(p):
        out = render_rays(p, spec, settings, ro, rd, 0.48, 1.08, driving,
                          pose, key=jax.random.PRNGKey(0),
                          background_prior=bg)
        return jnp.mean((out.rgb_fine - 0.5) ** 2)

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    assert bool(jnp.isfinite(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
