"""Eval-side features added in round 3: latent codes at eval, frontalize
pose override, and the train-side high-density .ply dump
(reference eval_stage_rays.py:316-323,415-416,450-452;
nerf_helpers.py:499-543)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sahs_tpu.config import Config
from sahs_tpu.evaluation import (dump_rays, evaluate_dataset,
                                 select_eval_latent_code)
from sahs_tpu.models.nerface import ModelSpec, init_model_params


def _tiny_cfg(latent_dim=0):
    cfg = Config()
    cfg.nerf.validation.num_coarse = 4
    cfg.nerf.validation.num_fine = 4
    cfg.nerf.validation.chunksize = 4096
    cfg.runtime.use_pallas = False
    if latent_dim:
        cfg.models.mask.latent_code_dim = latent_dim
    return cfg


class _FakeDataset:
    """Two frames: identical driving, different poses."""

    H = W = 8

    def __init__(self, kind="audio"):
        rng = np.random.RandomState(0)
        self.driving = rng.randn(16, 29).astype(np.float32)
        Rm0 = np.eye(3, dtype=np.float32)
        Rm1 = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
        self.poses = [
            np.concatenate([Rm0, np.array([[0], [0], [0.6]], np.float32)], 1),
            np.concatenate([Rm1, np.array([[0], [0], [0.7]], np.float32)], 1),
        ]
        self.img = rng.rand(self.H, self.W, 3).astype(np.float32)

    def __len__(self):
        return 2

    def __getitem__(self, i):
        return {
            "image": self.img,
            "pose": self.poses[i],
            "intrinsics": np.array([10.0, 10.0, 0.5, 0.5], np.float32),
            "driving": self.driving,
            "fname": f"{i}.png",
        }


def test_select_eval_latent_code_index_map():
    codes = np.arange(20, dtype=np.float32).reshape(5, 4)
    # reference rule: idx_map[10, 1]; short maps clamp to the last row
    idx_map = np.zeros((11, 2), np.int64)
    idx_map[10, 1] = 3
    got = select_eval_latent_code(codes, idx_map)
    np.testing.assert_allclose(np.asarray(got), codes[3])
    # no map -> code 0
    np.testing.assert_allclose(np.asarray(select_eval_latent_code(codes)),
                               codes[0])
    # out-of-range mapped index -> code 0
    idx_map[10, 1] = 99
    np.testing.assert_allclose(
        np.asarray(select_eval_latent_code(codes, idx_map)), codes[0])
    assert select_eval_latent_code(None) is None


def test_dump_rays_ply(tmp_path):
    rng = np.random.RandomState(0)
    R, S = 32, 8
    pts = rng.randn(R, S, 3).astype(np.float32)
    rf = rng.rand(R, S, 16).astype(np.float32)
    rf[..., 3] = -10.0
    rf[:16, :, 3] = 40.0          # sigmoid(relu(40)) > threshold
    path = str(tmp_path / "rays.ply")
    n = dump_rays(pts, rf, path, stride=1)
    assert n == (16 * S) // 10
    lines = open(path).read().splitlines()
    assert lines[0] == "ply"
    assert f"element vertex {n}" in lines[2]
    body = lines[lines.index("end_header") + 1:]
    assert len(body) == n
    x, y, z, r, g, b = body[0].split()
    assert 0 <= int(r) <= 255


@pytest.mark.parametrize("latent", [False, True])
def test_evaluate_dataset_latent_and_frontalize(tmp_path, latent):
    cfg = _tiny_cfg(latent_dim=32 if latent else 0)
    spec = ModelSpec.from_config(cfg)
    params = init_model_params(jax.random.PRNGKey(0), spec)
    # untrained renders are near-constant; scale the init so pose/latent
    # changes survive uint8 quantization
    params = jax.tree.map(lambda x: x * 3.0, params)
    ds = _FakeDataset()
    codes = (np.asarray(jax.random.normal(jax.random.PRNGKey(1), (4, 32)))
             if latent else None)

    out1 = str(tmp_path / ("lat" if latent else "nolat"))
    evaluate_dataset(cfg, spec, params, ds, out1, deterministic=True,
                     save_normals=False, latent_codes=codes)
    import imageio.v2 as imageio
    img0 = imageio.imread(out1 + "/0.png")
    img1 = imageio.imread(out1 + "/1.png")
    assert img0.shape == (8, 8, 3)
    # different poses -> different renders
    assert np.any(img0 != img1)

    if latent:
        # the latent code must actually change the render
        out2 = str(tmp_path / "lat2")
        evaluate_dataset(cfg, spec, params, ds, out2, deterministic=True,
                         save_normals=False, latent_codes=codes * 100.0)
        img0b = imageio.imread(out2 + "/0.png")
        assert np.any(img0 != img0b)

    # frontalize: every frame rendered from frame 0's pose -> identical
    # images (driving is identical across the fake frames)
    out3 = str(tmp_path / "front")
    evaluate_dataset(cfg, spec, params, ds, out3, deterministic=True,
                     save_normals=False, latent_codes=codes, frontalize=True)
    f0 = imageio.imread(out3 + "/0.png")
    f1 = imageio.imread(out3 + "/1.png")
    np.testing.assert_array_equal(f0, f1)
    np.testing.assert_array_equal(f0, img0)
