"""Vendored LPIPS(alex) — architecture + torch-weight importer, no
``lpips``/torchvision dependency.

The reference computes LPIPS with the ``lpips`` package (reference
nerf-pytorch/nerf/metrics.py:95-107,160: ``lpips.LPIPS(net='alex')``). That
package needs downloaded pretrained weights; this offline environment has
neither. This module vendors the exact computation so that users with a
local weight file get reference-identical numbers:

  d(x, y) = sum_l mean_hw( lin_l · (nx_l - ny_l)^2 )

where nx_l / ny_l are channel-unit-normalized AlexNet conv activations
(taps after each of the 5 ReLUs) of the inputs scaled to [-1, 1] and
channel-standardized, and lin_l are the LPIPS-learned nonnegative 1x1
weights.

Weights: ``load_lpips_params(path)`` accepts either a full ``lpips.LPIPS``
state_dict (net.slice*.<i>.weight + lin*.model.1.weight) or a torchvision
``alexnet`` state_dict (features.<i>.weight; lin weights then default to
1/C, which is NOT reference-parity — a warning is printed). Point
``SAHS_LPIPS_WEIGHTS`` at a .pth to enable the metrics CLI column.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

# AlexNet feature-extractor conv layout: (out_ch, in_ch, kernel, stride, pad),
# with a 3x3/2 maxpool after taps 1 and 2.
_CONVS = [(64, 3, 11, 4, 2), (192, 64, 5, 1, 2), (384, 192, 3, 1, 1),
          (256, 384, 3, 1, 1), (256, 256, 3, 1, 1)]
_POOL_AFTER = {0, 1}        # maxpool (k3, s2) after these taps
# LPIPS input scaling layer (lpips/lpips.py ScalingLayer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv2d(x, w, b, stride: int, pad: int):
    import jax.numpy as jnp
    from jax import lax
    out = lax.conv_general_dilated(
        x, jnp.asarray(w), window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + jnp.asarray(b)[None, :, None, None]


def _maxpool(x, k: int = 3, s: int = 2):
    from jax import lax
    return lax.reduce_window(x, -np.inf, lax.max, (1, 1, k, k), (1, 1, s, s),
                             "VALID")


def alex_features(params: Dict, x) -> List:
    """x (N, 3, H, W) in [-1, 1] -> list of 5 tap activations (post-ReLU)."""
    import jax.numpy as jnp
    h = (x - jnp.asarray(_SHIFT)[None, :, None, None]) \
        / jnp.asarray(_SCALE)[None, :, None, None]
    taps = []
    for i, (_, _, k, s, p) in enumerate(_CONVS):
        h = _conv2d(h, params["convs"][i]["w"], params["convs"][i]["b"], s, p)
        h = jnp.maximum(h, 0.0)
        taps.append(h)
        if i in _POOL_AFTER:
            h = _maxpool(h)
    return taps


def lpips_distance(params: Dict, x, y) -> float:
    """LPIPS(alex) between x and y, each (H, W, 3) in [0, 1]."""
    import jax.numpy as jnp

    def prep(im):
        im = jnp.asarray(im, jnp.float32) * 2.0 - 1.0
        return im.transpose(2, 0, 1)[None]

    tx = alex_features(params, prep(x))
    ty = alex_features(params, prep(y))
    d = 0.0
    for l, (ax, ay) in enumerate(zip(tx, ty)):
        nx = ax / jnp.sqrt(jnp.sum(ax * ax, axis=1, keepdims=True) + 1e-10)
        ny = ay / jnp.sqrt(jnp.sum(ay * ay, axis=1, keepdims=True) + 1e-10)
        diff2 = (nx - ny) ** 2
        lin = jnp.asarray(params["lins"][l])[None, :, None, None]
        d = d + jnp.mean(jnp.sum(diff2 * lin, axis=1))
    return float(d)


def load_lpips_params(path: str) -> Optional[Dict]:
    """Load conv + lin weights from a torch .pth file. Accepts a full
    ``lpips.LPIPS`` state_dict, or a torchvision ``alexnet`` state_dict
    (lin weights default to uniform 1/C — architecture-only mode)."""
    if not path or not os.path.exists(path):
        return None
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    def find(*suffixes) -> Dict[str, np.ndarray]:
        out = {}
        for k, v in sd.items():
            for sfx in suffixes:
                if k.endswith(sfx):
                    out[sfx] = v
        return out

    convs = []
    # conv weights appear as net.slice<j>.<i>.weight (lpips) or
    # features.<i>.weight (torchvision); both index convs 0,3,6,8,10.
    conv_ids = [0, 3, 6, 8, 10]
    for li, ci in enumerate(conv_ids):
        got = find(f".{ci}.weight", f".{ci}.bias")
        w = got.get(f".{ci}.weight")
        b = got.get(f".{ci}.bias")
        if w is None or w.shape[0] != _CONVS[li][0]:
            return None
        convs.append({"w": w, "b": b})
    lins = []
    for l in range(5):
        key = [k for k in sd if f"lin{l}" in k and k.endswith("weight")]
        if key:
            lins.append(np.maximum(sd[key[0]][:, :, 0, 0][0], 0.0))
        else:
            C = _CONVS[l][0]
            lins.append(np.full((C,), 1.0 / C, np.float32))
    uniform = not any(f"lin{l}" in k for l in range(5) for k in sd)
    if uniform:
        print("lpips: no lin weights in checkpoint — using uniform 1/C "
              "(NOT reference-parity)")
    # "uniform_lins" propagates into the metrics.txt label so
    # architecture-only numbers are never mistaken for real LPIPS
    return {"convs": convs, "lins": lins, "uniform_lins": uniform}


def random_params(seed: int = 0) -> Dict:
    """Random-init params (tests / architecture validation only)."""
    rng = np.random.RandomState(seed)
    convs = [{"w": (rng.randn(o, i, k, k) * (1.0 / np.sqrt(i * k * k)))
              .astype(np.float32),
              "b": rng.randn(o).astype(np.float32) * 0.1}
             for (o, i, k, _, _) in _CONVS]
    lins = [np.abs(rng.randn(o).astype(np.float32)) for (o, _, _, _, _)
            in _CONVS]
    return {"convs": convs, "lins": lins}
