"""Shared host-side data utilities.

TPU-first input pipeline: the reference decodes JPEG+PNG per training
iteration on the host (reference nerf-pytorch/nerf/audio_dataloader.py:171-188)
which would starve a TPU step loop; here frames are decoded ONCE into compact
uint8 caches (images) and uint8 label maps (parse masks), and expanded to
float / one-hot on device as part of the jitted step.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..utils.seg import NUM_CLASSES, PALETTE


def imread_rgb(path: str) -> np.ndarray:
    """uint8 RGB image."""
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def imread_rgb_white(path: str) -> np.ndarray:
    """uint8 RGB image with any alpha channel composited onto WHITE:
    rgb*a + (1-a) — the white_background loader semantics the reference
    INTENDS (nerface_dataloader.py:175-176). The reference's own path is
    latently broken: it reads with cv2.imread(...) (no IMREAD_UNCHANGED),
    which never yields an alpha plane, so its `img[..., -1:]` is actually
    the blue channel. Per the SURVEY §3.1-⚠ rule we implement the intended
    semantics behind the same flag (and fall back to plain RGB when the
    file has no alpha)."""
    import cv2
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3 and img.shape[2] == 4:
        a = img[..., 3:4].astype(np.float32) / 255.0
        rgb = cv2.cvtColor(img[..., :3], cv2.COLOR_BGR2RGB).astype(np.float32)
        return np.clip(rgb * a + (1.0 - a) * 255.0, 0, 255).astype(np.uint8)
    if img.ndim == 2:
        return cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def resize_area(img: np.ndarray, h: int, w: int) -> np.ndarray:
    import cv2
    if img.shape[0] == h and img.shape[1] == w:
        return img
    return cv2.resize(img, dsize=(w, h), interpolation=cv2.INTER_AREA)


def read_parse_map(path: str, h: int, w: int) -> np.ndarray:
    """Disk parse map -> (H, W) uint8 class labels.

    Parity note: the reference reads parse maps with cv2 (BGR) and matches
    them against an RGB palette (nerface_dataloader.py:180-183 +
    utils.py:27-66) — i.e. the PNGs on disk store palette colors in BGR
    order. We therefore match the *BGR-read* pixels against the RGB palette,
    identical to the reference."""
    import cv2
    bgr = cv2.imread(path, cv2.IMREAD_COLOR)
    if bgr is None:
        raise FileNotFoundError(path)
    from ..native import palette_to_labels as native_codec
    labels = native_codec(bgr)  # C++ fast path; None if lib unavailable
    if labels is None:
        flat = bgr.reshape(-1, 3).astype(np.int32)
        eq = (flat[:, None, :] == PALETTE[None, :, :]).all(axis=-1)
        labels = np.where(eq.any(axis=-1), eq.argmax(axis=-1), 0).astype(np.uint8)
        labels = labels.reshape(bgr.shape[:2])
    if labels.shape != (h, w):
        labels = cv2.resize(labels, dsize=(w, h),
                            interpolation=cv2.INTER_NEAREST)
    return labels


def labels_to_onehot(labels: np.ndarray) -> np.ndarray:
    return np.eye(NUM_CLASSES, dtype=np.float32)[labels]


def gaussian_blur(img: np.ndarray, kernel_size: int = 11,
                  sigma: float = 11.0) -> np.ndarray:
    """Depthwise gaussian blur for the optional blurred-background init
    (reference GaussianSmoothing, nerf-pytorch/nerf/train_utils.py:409-473 +
    train_stage_rays_auto.py:147-152)."""
    import cv2
    return cv2.GaussianBlur(img, (kernel_size, kernel_size), sigma)


def average_background(images: np.ndarray, blur: bool = False) -> np.ndarray:
    """Trainable-background initialization: mean over training frames,
    optionally blurred (reference train_stage_rays_auto.py:143-157)."""
    avg = np.mean(images, axis=0).astype(np.float32)
    if blur:
        avg = gaussian_blur(avg)
    h, w = avg.shape[:2]
    return np.concatenate([avg[..., :3], np.ones((h, w, 1), np.float32),
                           np.zeros((h, w, 11), np.float32)], axis=-1)


def load_background(basedir: str, dataset_type: str, h: int, w: int
                    ) -> Optional[np.ndarray]:
    """Fixed background image padded to 15 channels: rgb(3) + bg-class
    one-hot(1) + zeros(11) (reference train_stage_rays_auto.py:159-174).
    expression datasets: bg/00050.png; audio datasets: bc.jpg."""
    if dataset_type.lower() == "expression":
        path = os.path.join(basedir, "bg", "00050.png")
    else:
        path = os.path.join(basedir, "bc.jpg")
    if not os.path.exists(path):
        return None
    img = imread_rgb(path)
    # PIL.thumbnail in the reference preserves aspect; datasets are square so
    # a plain resize is equivalent.
    img = resize_area(img, h, w).astype(np.float32) / 255.0
    pad = np.concatenate(
        [img[..., :3], np.ones((h, w, 1), np.float32),
         np.zeros((h, w, 11), np.float32)], axis=-1)
    return pad


class FrameCache:
    """Decode-once in-RAM store: uint8 images + uint8 label maps."""

    def __init__(self, n: int, h: int, w: int, with_seg: bool):
        self.images = np.zeros((n, h, w, 3), np.uint8)
        self.labels = np.zeros((n, h, w), np.uint8) if with_seg else None
        self.loaded = np.zeros((n,), bool)

    def ensure(self, idx: int, img_path: str, seg_path: Optional[str],
               h: int, w: int, white_background: bool = False):
        if self.loaded[idx]:
            return
        reader = imread_rgb_white if white_background else imread_rgb
        img = resize_area(reader(img_path), h, w)
        self.images[idx] = img
        if self.labels is not None and seg_path is not None:
            self.labels[idx] = read_parse_map(seg_path, h, w)
        self.loaded[idx] = True

    def frame(self, idx: int) -> Dict[str, np.ndarray]:
        out = {"image": self.images[idx].astype(np.float32) / 255.0}
        if self.labels is not None:
            out["mask"] = labels_to_onehot(self.labels[idx])
        return out
