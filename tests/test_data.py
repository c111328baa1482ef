"""Data layer: synthetic fixture, on-disk loader roundtrip, seg codecs."""
import numpy as np
import pytest

from sahs_tpu.config import Config, reference_expression_config
from sahs_tpu.data import (AudioDataset, NerfaceDataset, SyntheticFaceDataset,
                           write_synthetic_dataset)
from sahs_tpu.utils import seg


class TestSegCodecs:
    def test_color_label_roundtrip(self):
        rng = np.random.RandomState(0)
        labels = rng.randint(0, 12, size=(16, 16))
        colors = seg.PALETTE[labels]
        onehot = seg.color2label(colors)
        assert onehot.shape == (16, 16, 12)
        np.testing.assert_array_equal(onehot.argmax(-1), labels)

    def test_unknown_color_is_zero(self):
        img = np.full((4, 4, 3), 17, np.int32)
        onehot = seg.color2label(img)
        assert onehot.sum() == 0

    def test_shrink(self):
        soft = np.random.RandomState(0).rand(8, 8, 12)
        sh = seg.shrink(soft)
        np.testing.assert_array_equal(sh.argmax(-1), soft.argmax(-1))
        assert set(np.unique(sh)) <= {0, 1}

    def test_label2color_bgr_parity(self):
        onehot = np.zeros((1, 1, 12))
        onehot[0, 0, 1] = 1  # face = RGB(204,0,0); reference emits reversed
        c = seg.label2color(onehot)
        np.testing.assert_allclose(c[0, 0], [0, 0, 204 / 255.0], atol=1e-6)


class TestSynthetic:
    def test_item_schema(self):
        ds = SyntheticFaceDataset("audio", num_frames=3, H=32, W=32)
        item = ds[0]
        assert item["image"].shape == (32, 32, 3)
        assert item["mask"].shape == (32, 32, 12)
        assert item["pose"].shape == (3, 4)
        assert item["driving"].shape == (16, 29)
        assert ds.background().shape == (32, 32, 15)
        np.testing.assert_allclose(item["mask"].sum(-1), 1.0)

    def test_expression_kind(self):
        ds = SyntheticFaceDataset("expression", num_frames=2, H=16, W=16)
        assert ds[0]["driving"].shape == (76,)


@pytest.mark.parametrize("kind", ["audio", "expression"])
def test_disk_roundtrip(tmp_path, kind):
    """write_synthetic_dataset produces the reference on-disk layout and the
    real loaders read it back with intact poses/masks/driving."""
    basedir = str(tmp_path / kind)
    write_synthetic_dataset(basedir, kind=kind, num_frames=3, H=32, W=32)
    if kind == "audio":
        cfg = Config()
    else:
        cfg = reference_expression_config()
    cfg.dataset.basedir = basedir
    cfg.dataset.type = kind
    ds = (AudioDataset("train", cfg) if kind == "audio"
          else NerfaceDataset("train", cfg))
    assert len(ds) == 3
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["mask"].shape == (32, 32, 12)
    # parse maps survive the BGR-on-disk convention: every pixel is one-hot
    np.testing.assert_allclose(item["mask"].sum(-1), 1.0)
    assert item["mask"][:, :, 1:].sum() > 0  # non-background classes present
    assert item["pose"].shape == (3, 4)
    if kind == "audio":
        assert item["driving"].shape == (16, 29)
    else:
        assert item["driving"].shape == (76,)
    bg = ds.background()
    assert bg is not None and bg.shape == (32, 32, 15)
    np.testing.assert_allclose(bg[..., 3], 1.0)  # bg-class one-hot channel


def test_white_background_rgba_composite(tmp_path):
    """white_background composites RGBA frames onto white at decode — the
    reference loader's INTENDED semantics (nerface_dataloader.py:175-176;
    its own path never sees alpha, see common.imread_rgb_white)."""
    import cv2
    import numpy as np
    from sahs_tpu.data.common import imread_rgb, imread_rgb_white

    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[..., 2] = 200          # red plane (BGR on disk: idx 2 = R)
    rgba[..., 3] = 128          # half-transparent
    p = str(tmp_path / "a.png")
    cv2.imwrite(p, rgba)

    plain = imread_rgb(p)
    white = imread_rgb_white(p)
    a = 128 / 255.0
    # composited red channel: R*a + (1-a)*255
    np.testing.assert_allclose(white[..., 0].astype(float),
                               round(200 * a + (1 - a) * 255), atol=1)
    # green/blue pick up the white fill
    np.testing.assert_allclose(white[..., 1].astype(float),
                               round((1 - a) * 255), atol=1)
    # the plain reader drops alpha entirely
    assert plain[..., 0].max() == 200 and plain[..., 1].max() == 0

    # no-alpha files: both readers agree
    rgb = np.random.RandomState(0).randint(0, 255, (8, 8, 3), np.uint8)
    p2 = str(tmp_path / "b.png")
    cv2.imwrite(p2, rgb)
    np.testing.assert_array_equal(imread_rgb(p2), imread_rgb_white(p2))
