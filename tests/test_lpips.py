"""Vendored LPIPS(alex): architecture parity vs a torch oracle built from
the SAME (random) weights, importer roundtrip, and the perceptual-loss
guard (reference nerf/metrics.py:95-107 / _init_spade.py:415-451)."""
import numpy as np
import pytest

from sahs_tpu.lpips import (_CONVS, load_lpips_params, lpips_distance,
                            random_params)


def torch_lpips_oracle(params, x, y):
    """Reference computation with torch convs (same math as lpips.LPIPS)."""
    import torch
    import torch.nn.functional as F
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(im):
        h = (torch.from_numpy(im).permute(2, 0, 1)[None] * 2 - 1 - shift) \
            / scale
        taps = []
        for i, (_, _, k, s, p) in enumerate(_CONVS):
            h = F.conv2d(h, torch.from_numpy(params["convs"][i]["w"]),
                         torch.from_numpy(params["convs"][i]["b"]),
                         stride=s, padding=p)
            h = F.relu(h)
            taps.append(h)
            if i in (0, 1):
                h = F.max_pool2d(h, 3, stride=2)
        return taps

    with torch.no_grad():
        tx, ty = feats(x), feats(y)
        d = 0.0
        for l, (ax, ay) in enumerate(zip(tx, ty)):
            nx = ax / torch.sqrt((ax * ax).sum(1, keepdim=True) + 1e-10)
            ny = ay / torch.sqrt((ay * ay).sum(1, keepdim=True) + 1e-10)
            lin = torch.from_numpy(params["lins"][l]).view(1, -1, 1, 1)
            d = d + ((nx - ny) ** 2 * lin).sum(1).mean()
        return float(d)


def test_lpips_matches_torch_oracle():
    params = random_params(0)
    rng = np.random.RandomState(1)
    x = rng.rand(64, 64, 3).astype(np.float32)
    y = np.clip(x + rng.randn(64, 64, 3).astype(np.float32) * 0.05, 0, 1)
    ours = lpips_distance(params, x, y)
    oracle = torch_lpips_oracle(params, x, y)
    np.testing.assert_allclose(ours, oracle, rtol=2e-4, atol=1e-5)
    assert ours > 0
    np.testing.assert_allclose(lpips_distance(params, x, x), 0.0, atol=1e-9)


def test_lpips_importer_roundtrip(tmp_path):
    """A torch state_dict in lpips-package naming imports correctly."""
    import torch
    params = random_params(2)
    sd = {}
    conv_ids = [0, 3, 6, 8, 10]
    slices = [1, 1, 2, 3, 4]   # lpips net.slice<j> grouping (unused by import)
    for li, ci in enumerate(conv_ids):
        sd[f"net.slice{slices[li]}.{ci}.weight"] = \
            torch.from_numpy(params["convs"][li]["w"])
        sd[f"net.slice{slices[li]}.{ci}.bias"] = \
            torch.from_numpy(params["convs"][li]["b"])
        sd[f"lin{li}.model.1.weight"] = \
            torch.from_numpy(params["lins"][li][None, :, None, None])
    path = str(tmp_path / "lpips.pth")
    torch.save(sd, path)
    loaded = load_lpips_params(path)
    assert loaded is not None
    for li in range(5):
        np.testing.assert_array_equal(loaded["convs"][li]["w"],
                                      params["convs"][li]["w"])
        np.testing.assert_array_equal(loaded["lins"][li], params["lins"][li])
    assert load_lpips_params(str(tmp_path / "missing.pth")) is None
    assert load_lpips_params("") is None


def test_perceptual_loss_guard():
    """use_perceptual without pretrained weights must refuse, not silently
    random-init (a random-VGG 'perceptual' loss is noise)."""
    from sahs_tpu.train.stage2 import load_vgg_params
    with pytest.raises(ValueError):
        load_vgg_params("")
    # explicit opt-in still works for architecture-only runs
    params = load_vgg_params("", allow_random=True)
    assert params is not None
