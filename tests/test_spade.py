"""Stage-II SPADE: primitive parity vs torch + generator smoke tests."""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sahs_tpu.models import spade


def _np(x):
    return np.asarray(x)


def _torch_conv_to_ours(conv):
    # torch OIHW -> ours HWIO
    return {"w": conv.weight.detach().numpy().transpose(2, 3, 1, 0).copy(),
            "b": conv.bias.detach().numpy().copy()}


def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(
        np.asarray(x_nhwc).transpose(0, 3, 1, 2)))


def _nhwc(x_nchw):
    return x_nchw.detach().numpy().transpose(0, 2, 3, 1)


def test_conv2d_matches_torch():
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(5, 7, 3, padding=1)
    x = np.random.RandomState(0).randn(2, 9, 11, 5).astype(np.float32)
    ours = spade.conv2d(jax.tree.map(jnp.asarray, _torch_conv_to_ours(conv)),
                        jnp.asarray(x))
    ref = _nhwc(conv(_nchw(x)))
    np.testing.assert_allclose(_np(ours), ref, atol=1e-5)


def test_conv2d_stride2_matches_torch():
    torch.manual_seed(1)
    conv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=1)
    x = np.random.RandomState(1).randn(1, 8, 8, 4).astype(np.float32)
    ours = spade.conv2d(jax.tree.map(jnp.asarray, _torch_conv_to_ours(conv)),
                        jnp.asarray(x), stride=2)
    ref = _nhwc(conv(_nchw(x)))
    np.testing.assert_allclose(_np(ours), ref, atol=1e-5)


def test_conv_transpose_matches_torch():
    torch.manual_seed(2)
    conv = torch.nn.ConvTranspose2d(4, 4, 3, stride=2, padding=1,
                                    output_padding=1)
    x = np.random.RandomState(2).randn(1, 6, 6, 4).astype(np.float32)
    # torch ConvTranspose weight is (in, out, H, W)
    p = {"w": conv.weight.detach().numpy().transpose(2, 3, 1, 0).copy(),
         "b": conv.bias.detach().numpy().copy()}
    ours = spade.conv2d_transpose(jax.tree.map(jnp.asarray, p), jnp.asarray(x))
    ref = _nhwc(conv(_nchw(x)))
    assert ours.shape == ref.shape == (1, 12, 12, 4)
    np.testing.assert_allclose(_np(ours), ref, atol=1e-5)


def test_instance_norm_matches_torch():
    x = np.random.RandomState(3).randn(2, 8, 8, 5).astype(np.float32)
    ours = spade.instance_norm(jnp.asarray(x))
    ref = _nhwc(torch.nn.InstanceNorm2d(5)(_nchw(x)))
    np.testing.assert_allclose(_np(ours), ref, atol=1e-5)


def test_avg_pool_and_upsample():
    x = np.random.RandomState(4).randn(1, 8, 8, 3).astype(np.float32)
    ours = spade.avg_pool2(jnp.asarray(x))
    ref = _nhwc(F.avg_pool2d(_nchw(x), 2, 2))
    np.testing.assert_allclose(_np(ours), ref, atol=1e-6)
    ours_up = spade.upsample_nearest2(jnp.asarray(x))
    ref_up = _nhwc(F.interpolate(_nchw(x), scale_factor=2, mode="nearest"))
    np.testing.assert_allclose(_np(ours_up), ref_up, atol=1e-6)


def test_resize_nearest_matches_torch():
    x = np.random.RandomState(5).randn(1, 10, 14, 3).astype(np.float32)
    for oh, ow in [(5, 7), (20, 28), (10, 14), (3, 9)]:
        ours = spade.resize_nearest(jnp.asarray(x), oh, ow)
        ref = _nhwc(F.interpolate(_nchw(x), size=(oh, ow), mode="nearest"))
        np.testing.assert_allclose(_np(ours), ref, atol=1e-6)


def test_batch_norm_train_matches_torch():
    torch.manual_seed(6)
    bn = torch.nn.BatchNorm2d(5)
    bn.train()
    x = np.random.RandomState(6).randn(2, 6, 6, 5).astype(np.float32)
    p = {"gamma": jnp.asarray(bn.weight.detach().numpy()),
         "beta": jnp.asarray(bn.bias.detach().numpy())}
    buf = {"mean": jnp.zeros(5), "var": jnp.ones(5)}
    ours, new_buf = spade.batch_norm(p, buf, jnp.asarray(x), train=True)
    ref = _nhwc(bn(_nchw(x)))
    np.testing.assert_allclose(_np(ours), ref, atol=1e-4)
    np.testing.assert_allclose(_np(new_buf["mean"]),
                               bn.running_mean.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(_np(new_buf["var"]),
                               bn.running_var.detach().numpy(), atol=1e-4)


def test_spectral_norm_sigma():
    """After normalization the top singular value is ~1."""
    key = jax.random.PRNGKey(0)
    p = spade.conv_init(key, 8, 8)
    buf = spade.spectral_norm_init(key, p["w"].shape)
    # run a few power iterations to converge u
    for _ in range(20):
        c, buf = spade.spectral_norm(p, buf, train=True)
    w = np.asarray(c["w"]).reshape(-1, 8)
    sigma = np.linalg.svd(w, compute_uv=False)[0]
    np.testing.assert_allclose(sigma, 1.0, rtol=1e-3)


def test_generator_forward_and_train_step():
    from sahs_tpu.train.stage2 import (Stage2Settings, init_stage2_state,
                                       make_train_step)
    s = Stage2Settings(lr_G=1e-4, beta1=0.0, beta2=0.999, epochs=2,
                       epochs_decay=2, steps_per_epoch=4, audio=True)
    state = init_stage2_state(jax.random.PRNGKey(0), s)
    rng = np.random.RandomState(0)
    H = W = 64
    i_src = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    i_raw = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    tgt = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    aud = jnp.asarray(rng.randn(16, 29).astype(np.float32))
    step = make_train_step(s, donate=False)
    state2, m = step(state, i_src, i_raw, tgt, aud)
    assert np.isfinite(float(m["loss"]))
    state3, m2 = step(state2, i_src, i_raw, tgt, aud)
    assert float(m2["loss"]) < float(m["loss"]) * 1.5  # sane update
