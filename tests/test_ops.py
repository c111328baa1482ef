"""Unit + torch-oracle parity tests for the pure ops layer."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import torch_ref as tr
from sahs_tpu.ops import encoding, grid, losses, rays, rendering, sampling


def to_np(x):
    return np.asarray(x)


class TestEncoding:
    @pytest.mark.parametrize("num_fns,include,log", [
        (10, True, True), (4, True, True), (3, False, True), (15, True, True),
        (6, True, False), (0, True, True),
    ])
    def test_matches_torch(self, num_fns, include, log):
        x = np.random.RandomState(0).randn(17, 3).astype(np.float32)
        ours = encoding.positional_encoding(jnp.asarray(x), num_fns, include, log)
        ref = tr.positional_encoding(torch.from_numpy(x), num_fns, include, log)
        np.testing.assert_allclose(to_np(ours), ref.numpy(), atol=2e-6)

    def test_encoded_dim(self):
        assert encoding.encoded_dim(3, 10, True) == 63
        assert encoding.encoded_dim(3, 4, True) == 27
        assert encoding.encoded_dim(2, 4, True) == 18
        assert encoding.encoded_dim(6, 3, False) == 36


class TestRays:
    def test_ray_bundle_matches_torch(self):
        H, W = 11, 13
        intr = np.array([120.0, 110.0, 0.5, 0.45], np.float32)
        rng = np.random.RandomState(1)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
        c2w[:3, 3] = rng.randn(3)
        ro, rd = rays.get_ray_bundle(H, W, jnp.asarray(intr), jnp.asarray(c2w))
        tro, trd = tr.get_ray_bundle(H, W, torch.from_numpy(intr),
                                     torch.from_numpy(c2w))
        np.testing.assert_allclose(to_np(ro), tro.numpy(), atol=1e-5)
        np.testing.assert_allclose(to_np(rd), trd.numpy(), atol=1e-5)

    def test_pose_to_euler_trans(self):
        rng = np.random.RandomState(2)
        R = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
        pose = np.concatenate([R, rng.randn(3, 1).astype(np.float32)], axis=1)
        ours = rays.pose_to_euler_trans(jnp.asarray(pose)[None])
        ref = tr.pose_to_euler_trans(torch.from_numpy(pose)[None])
        np.testing.assert_allclose(to_np(ours), ref.numpy(), atol=1e-5)

    def test_so3_exponential_map(self):
        v = np.array([[0.0, 0.0, np.pi / 2]], np.float32)
        R = to_np(rays.so3_exponential_map(jnp.asarray(v)))[0]
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-5)

    def test_ndc_rays_runs(self):
        ro = jnp.array([[0.0, 0.0, -1.0]])
        rd = jnp.array([[0.1, 0.1, -1.0]])
        o, d = rays.ndc_rays(10, 10, 5.0, 1.0, ro, rd)
        assert o.shape == (1, 3) and d.shape == (1, 3)


class TestSampling:
    def test_coarse_z_linspace(self):
        near = jnp.full((4,), 2.0)
        far = jnp.full((4,), 6.0)
        z = sampling.coarse_z_vals(near, far, 5, perturb=False)
        np.testing.assert_allclose(to_np(z[0]), [2, 3, 4, 5, 6], atol=1e-6)

    def test_coarse_z_lindisp(self):
        near = jnp.full((1,), 2.0)
        far = jnp.full((1,), 6.0)
        z = to_np(sampling.coarse_z_vals(near, far, 3, lindisp=True))
        np.testing.assert_allclose(z[0], [2.0, 3.0, 6.0], atol=1e-5)

    def test_stratified_bounds(self):
        near = jnp.full((8,), 1.0)
        far = jnp.full((8,), 2.0)
        z = to_np(sampling.coarse_z_vals(near, far, 16, perturb=True,
                                         key=jax.random.PRNGKey(0)))
        assert (z >= 1.0 - 1e-6).all() and (z <= 2.0 + 1e-6).all()
        assert (np.diff(z, axis=-1) > -1e-6).all()  # sorted within each ray

    def test_sample_pdf_det_matches_torch(self):
        rng = np.random.RandomState(3)
        bins = np.sort(rng.rand(6, 15).astype(np.float32), axis=-1)
        w = rng.rand(6, 14).astype(np.float32)
        ours = sampling.sample_pdf(jnp.asarray(bins), jnp.asarray(w), 9, det=True)
        ref = tr.sample_pdf(torch.from_numpy(bins), torch.from_numpy(w), 9, det=True)
        np.testing.assert_allclose(to_np(ours), ref.numpy(), atol=1e-5)

    def test_sample_pdf_same_u_matches_torch(self):
        rng = np.random.RandomState(4)
        bins = np.sort(rng.rand(5, 10).astype(np.float32), axis=-1)
        w = rng.rand(5, 9).astype(np.float32)
        u = rng.rand(5, 7).astype(np.float32)
        # Inject identical uniforms into both implementations.
        ref = tr.sample_pdf(torch.from_numpy(bins), torch.from_numpy(w), 7,
                            u=torch.from_numpy(u))
        weights = jnp.asarray(w) + 1e-5
        pdf = weights / jnp.sum(weights, -1, keepdims=True)
        cdf = jnp.concatenate([jnp.zeros((5, 1)), jnp.cumsum(pdf, -1)], -1)
        inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(
            cdf, jnp.asarray(u))
        ref_inds = torch.searchsorted(
            torch.from_numpy(to_np(cdf)), torch.from_numpy(u), right=True)
        np.testing.assert_array_equal(to_np(inds), ref_inds.numpy())
        below = jnp.maximum(0, inds - 1)
        above = jnp.minimum(cdf.shape[-1] - 1, inds)
        cb = jnp.take_along_axis(cdf, below, -1)
        ca = jnp.take_along_axis(cdf, above, -1)
        bb = jnp.take_along_axis(jnp.asarray(bins),
                                 jnp.minimum(below, bins.shape[-1] - 1), -1)
        ba = jnp.take_along_axis(jnp.asarray(bins),
                                 jnp.minimum(above, bins.shape[-1] - 1), -1)
        denom = jnp.where(ca - cb < 1e-5, 1.0, ca - cb)
        ours = bb + (jnp.asarray(u) - cb) / denom * (ba - bb)
        np.testing.assert_allclose(to_np(ours), ref.numpy(), atol=1e-5)

    def test_sample_pdf_det_monotone(self):
        rng = np.random.RandomState(5)
        bins = np.sort(rng.rand(3, 63).astype(np.float32), axis=-1)
        w = rng.rand(3, 62).astype(np.float32)
        s = to_np(sampling.sample_pdf(jnp.asarray(bins), jnp.asarray(w), 64, det=True))
        assert (np.diff(s, axis=-1) >= -1e-6).all()

    def test_weighted_ray_indices_without_replacement(self):
        probs = jnp.asarray(np.full((100,), 0.01, np.float32))
        idx = sampling.weighted_ray_indices(jax.random.PRNGKey(0), probs, 50)
        assert len(set(to_np(idx).tolist())) == 50

    def test_weighted_ray_indices_respects_zeros(self):
        p = np.zeros((64,), np.float32)
        p[:8] = 1 / 8
        idx = to_np(sampling.weighted_ray_indices(jax.random.PRNGKey(1),
                                                  jnp.asarray(p), 8))
        assert set(idx.tolist()) == set(range(8))

    def test_semantic_ray_probs(self):
        mask = np.zeros((2, 2, 12), np.float32)
        mask[0, 0, 1] = 1
        mask[1, 1, 7] = 1
        sp = np.ones(12, np.float32)
        sp[7] = 3.0
        probs = to_np(sampling.semantic_ray_probs(jnp.asarray(sp), jnp.asarray(mask)))
        np.testing.assert_allclose(probs[0, 0], 0.25, atol=1e-6)
        np.testing.assert_allclose(probs[1, 1], 0.75, atol=1e-6)


class TestRendering:
    def _random_inputs(self, R=7, S=9, C=16, bg=True, seed=0):
        rng = np.random.RandomState(seed)
        rf = rng.randn(R, S, C).astype(np.float32)
        z = np.sort(rng.rand(R, S).astype(np.float32) * 2 + 0.5, axis=-1)
        rd = rng.randn(R, 3).astype(np.float32)
        bgp = rng.rand(R, C - 1).astype(np.float32) if bg else None
        return rf, z, rd, bgp

    @pytest.mark.parametrize("bg,white", [(True, False), (False, False), (False, True)])
    def test_matches_torch(self, bg, white):
        rf, z, rd, bgp = self._random_inputs(bg=bg)
        if bg:
            rf[:, -1, :-1] = bgp  # pipeline writes the prior into last sample
        ours = rendering.volume_render_radiance_field(
            jnp.asarray(rf), jnp.asarray(z), jnp.asarray(rd),
            white_background=white,
            background_prior=jnp.asarray(bgp) if bg else None)
        ref = tr.volume_render(torch.from_numpy(rf), torch.from_numpy(z),
                               torch.from_numpy(rd), white_bg=white,
                               bg_prior=torch.from_numpy(bgp) if bg else None)
        for a, b in zip(ours, ref):
            np.testing.assert_allclose(to_np(a), b.numpy(), atol=2e-5)

    def test_weights_sum_equals_acc(self):
        rf, z, rd, _ = self._random_inputs(bg=False)
        out = rendering.volume_render_radiance_field(
            jnp.asarray(rf), jnp.asarray(z), jnp.asarray(rd))
        np.testing.assert_allclose(to_np(out.weights.sum(-1)), to_np(out.acc),
                                   atol=1e-6)

    def test_cumprod_exclusive(self):
        x = jnp.asarray([[2.0, 3.0, 4.0]])
        np.testing.assert_allclose(to_np(rendering.cumprod_exclusive(x)),
                                   [[1.0, 2.0, 6.0]])


class TestGrid:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_torch_grid_sample(self, seed):
        rng = np.random.RandomState(seed)
        g = rng.randn(8, 5, 6, 7).astype(np.float32)
        # include out-of-range coords to exercise zeros padding
        c = (rng.rand(200, 3).astype(np.float32) * 2.6 - 1.3)
        ours = grid.grid_sample_3d(jnp.asarray(g), jnp.asarray(c))
        ref = tr.grid_sample3d(torch.from_numpy(g), torch.from_numpy(c))
        np.testing.assert_allclose(to_np(ours), ref.numpy(), atol=1e-5)

    def test_gradients_flow(self):
        g = jnp.ones((4, 3, 3, 3))
        c = jnp.zeros((5, 3))
        grads = jax.grad(lambda gg: grid.grid_sample_3d(gg, c).sum())(g)
        assert float(jnp.abs(grads).sum()) > 0


class TestLosses:
    def test_mask_mse(self):
        rng = np.random.RandomState(0)
        mask = (rng.rand(50, 12) > 0.7).astype(np.float32)
        pred = rng.rand(50, 3).astype(np.float32)
        tgt = rng.rand(50, 3).astype(np.float32)
        w = np.ones(12, np.float32); w[7:9] = 2
        un, masked, weighted = losses.mask_mse_loss(
            jnp.asarray(mask), jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(w))
        # torch-style oracle
        diff = ((pred - tgt) ** 2).sum(-1, keepdims=True)
        counts = np.maximum((mask != 0).sum(0), 1)
        np.testing.assert_allclose(float(un), diff.mean(), rtol=1e-5)
        np.testing.assert_allclose(to_np(masked), (diff * mask).sum(0) / counts,
                                   rtol=1e-4)
        np.testing.assert_allclose(to_np(weighted), w * (diff * mask).sum(0) / counts,
                                   rtol=1e-4)

    def test_mask_ce_zero_class_guard(self):
        mask = np.zeros((10, 12), np.float32)
        mask[:, 3] = 1
        probs = np.full((10, 12), 1 / 12, np.float32)
        un, masked, _ = losses.mask_cross_entropy_loss(
            jnp.asarray(mask), jnp.asarray(probs), jnp.asarray(mask))
        assert np.isfinite(to_np(masked)).all()
        np.testing.assert_allclose(float(masked[3]), -np.log(1 / 12 + 1e-10),
                                   rtol=1e-4)
        assert float(masked[0]) == 0.0

    def test_mse2psnr(self):
        assert losses.mse2psnr(1.0) == 0.0
        assert losses.mse2psnr(0.0) == pytest.approx(50.0)
