"""Stage-II optional loss terms (GAN + perceptual) and the scanned batch
loop: gates wire in the Discriminator/VGG the reference defines but never
uses (_init_spade.py:375-451); defaults stay MSE-only."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sahs_tpu.models import vgg
from sahs_tpu.train.stage2 import (Stage2Settings, init_stage2_state,
                                   make_scan_step, make_train_step)


def _settings(**kw):
    base = dict(lr_G=2e-4, beta1=0.0, beta2=0.999, epochs=2, epochs_decay=2,
                steps_per_epoch=4, audio=False)
    base.update(kw)
    return Stage2Settings(**base)


def _data(seed=0, n=1, hw=32):
    rng = np.random.RandomState(seed)
    i_src = jnp.asarray(rng.rand(1, hw, hw, 3), jnp.float32)
    raw = jnp.asarray(rng.rand(n, 1, hw, hw, 3), jnp.float32)
    tgt = jnp.asarray(rng.rand(n, 1, hw, hw, 3), jnp.float32)
    return i_src, raw, tgt


def test_default_is_mse_only():
    s = _settings()
    state = init_stage2_state(jax.random.PRNGKey(0), s)
    assert state.d_params == {} and state.d_opt_state == ()
    i_src, raw, tgt = _data()
    step = make_train_step(s, donate=False)
    _, m = step(state, i_src, raw[0], tgt[0])
    assert set(m) == {"loss", "psnr", "mse"}
    assert float(m["loss"]) == pytest.approx(float(m["mse"]))


@pytest.mark.slow
def test_gan_step_updates_both_and_decreases():
    s = _settings(use_gan=True, gan_weight=0.05, gan_feat_weight=1.0,
                  lr_D=2e-4)
    state = init_stage2_state(jax.random.PRNGKey(0), s)
    assert state.d_params != {}
    # PatchGAN needs >=64 px: 4 stride-2 convs then a 4x4 valid conv
    i_src, raw, tgt = _data(hw=64)
    step = make_train_step(s, donate=False)
    losses = []
    for _ in range(6):
        state, m = step(state, i_src, raw[0], tgt[0])
        losses.append(float(m["mse"]))
    assert "d_loss" in m and "g_adv" in m and "gan_feat" in m
    assert losses[-1] < losses[0]            # G learns under the GAN terms
    # D params actually moved
    d0 = init_stage2_state(jax.random.PRNGKey(0), s).d_params
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), d0, state.d_params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0.0


def test_perceptual_term_included():
    s = _settings(use_perceptual=True, perceptual_weight=1.0)
    vp = vgg.vgg19_features_init(jax.random.PRNGKey(7))
    state = init_stage2_state(jax.random.PRNGKey(0), s)
    i_src, raw, tgt = _data()
    step = make_train_step(s, donate=False, vgg_params=vp)
    _, m = step(state, i_src, raw[0], tgt[0])
    assert "perceptual" in m
    assert float(m["loss"]) > float(m["mse"])


@pytest.mark.slow
def test_scan_step_matches_sequential_steps():
    s = _settings()
    i_src, raws, tgts = _data(n=3, hw=16)
    st_seq = init_stage2_state(jax.random.PRNGKey(0), s)
    step = make_train_step(s, donate=False)
    seq_losses = []
    for i in range(3):
        st_seq, m = step(st_seq, i_src, raws[i], tgts[i])
        seq_losses.append(float(m["loss"]))

    st_scan = init_stage2_state(jax.random.PRNGKey(0), s)
    scan = make_scan_step(s, donate=False)
    st_scan, ms = scan(st_scan, i_src, raws, tgts)
    # scanned vs eager programs reassociate conv reductions differently;
    # equality is up to f32 rounding, not bitwise
    np.testing.assert_allclose(np.asarray(ms["loss"]), seq_losses,
                               rtol=1e-4, atol=1e-5)
    # Adam's m/sqrt(v) normalizer amplifies f32 rounding differences in the
    # grads, so params only agree to ~2*lr*steps scale (1.2e-3), not to grad
    # precision — the loss-trace check above is the real equivalence.
    for a, b in zip(jax.tree_util.tree_leaves(st_seq.params),
                    jax.tree_util.tree_leaves(st_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1.3e-3)
