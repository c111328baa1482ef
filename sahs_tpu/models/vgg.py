"""VGG19 feature slices for the Stage-II perceptual loss.

Architectural parity with the reference's frozen VGG wrapper
(nerf-pytorch/nerf/_init_spade.py:415-451, duplicated in
discrimination.py): torchvision vgg19's ``features`` stack cut into five
slices ending at relu1_1, relu2_1, relu3_1, relu4_1 and relu5_1, with the
SPADE perceptual weights [1/32, 1/16, 1/8, 1/4, 1].

The reference loads ImageNet-pretrained weights via
``models.vgg19(pretrained=True)``; this environment has no network and no
torchvision, so:
  - ``vgg19_features_init`` builds the same architecture with torch-default
    random init (useful as a fixed random-projection perceptual metric and
    for shape/structure tests), and
  - ``import_torch_vgg_features`` converts a torchvision
    ``vgg19().features.state_dict()`` (or a full-model state_dict with the
    ``features.`` prefix) into this module's pytree, so real pretrained
    weights drop in when available.

All convs are 3x3 pad 1; pooling is 2x2 max. Input is NHWC in [0, 1]
(matching the Stage-II pipeline); ``normalize_input`` reproduces the
reference's normalization (x + 0.5 then ImageNet mean/std — the reference
assumed [-0.5, 0.5] inputs, _init_spade.py:440-444).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# torchvision vgg19 ``features`` conv plan, grouped into the reference's
# 5 slices (indices into the torch Sequential shown per conv for the
# importer): slice k ends at relu{k}_1.
# Each entry: list of ("conv", torch_idx, cin, cout) and "pool" markers.
VGG19_SLICES: Sequence[Sequence] = (
    (("conv", 0, 3, 64),),                                        # relu1_1
    (("conv", 2, 64, 64), "pool", ("conv", 5, 64, 128)),          # relu2_1
    (("conv", 7, 128, 128), "pool", ("conv", 10, 128, 256)),      # relu3_1
    (("conv", 12, 256, 256), ("conv", 14, 256, 256),
     ("conv", 16, 256, 256), "pool", ("conv", 19, 256, 512)),     # relu4_1
    (("conv", 21, 512, 512), ("conv", 23, 512, 512),
     ("conv", 25, 512, 512), "pool", ("conv", 28, 512, 512)),     # relu5_1
)

SLICE_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def _conv_init(key, cin, cout):
    """torch Conv2d default init (kaiming-uniform a=sqrt(5) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) bound for both w and b)."""
    fan_in = cin * 9
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    kw, kb = jax.random.split(key)
    return {"w": jax.random.uniform(kw, (3, 3, cin, cout), jnp.float32,
                                    -bound, bound),
            "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)}


def vgg19_features_init(key: jax.Array) -> Params:
    """Random-init VGG19 feature slices: {"slices": [[conv, ...], ...]}."""
    params: Params = {"slices": []}
    for sl in VGG19_SLICES:
        convs = []
        for item in sl:
            if item == "pool":
                continue
            _, _, cin, cout = item
            key, sub = jax.random.split(key)
            convs.append(_conv_init(sub, cin, cout))
        params["slices"].append(convs)
    return params


def import_torch_vgg_features(state_dict: Dict[str, Any]) -> Params:
    """torchvision ``vgg19().features`` state_dict -> pytree.

    Accepts keys ``{i}.weight`` / ``{i}.bias`` or ``features.{i}.weight``.
    torch conv weights are OIHW; ours are HWIO."""
    import numpy as np

    def get(i, leaf):
        for k in (f"{i}.{leaf}", f"features.{i}.{leaf}"):
            if k in state_dict:
                v = state_dict[k]
                return np.asarray(v.detach().cpu().numpy()
                                  if hasattr(v, "detach") else v)
        raise KeyError(f"vgg19 features index {i} ({leaf}) not found")

    params: Params = {"slices": []}
    for sl in VGG19_SLICES:
        convs = []
        for item in sl:
            if item == "pool":
                continue
            _, idx, cin, cout = item
            w = get(idx, "weight")          # (cout, cin, 3, 3)
            b = get(idx, "bias")
            assert w.shape == (cout, cin, 3, 3), (idx, w.shape)
            convs.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                          "b": jnp.asarray(b)})
        params["slices"].append(convs)
    return params


def _conv3(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def _maxpool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


def vgg19_slice_features(params: Params, x: jnp.ndarray,
                         normalize_input: bool = True) -> List[jnp.ndarray]:
    """x: (N, H, W, 3) -> [h_relu1_1, ..., h_relu5_1]
    (reference _init_spade.py:437-451)."""
    if normalize_input:
        x = x + 0.5
        mean = jnp.asarray(_IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(_IMAGENET_STD, x.dtype)
        x = (x - mean) / std
    feats = []
    for sl, convs in zip(VGG19_SLICES, params["slices"]):
        ci = 0
        for item in sl:
            if item == "pool":
                x = _maxpool2(x)
            else:
                x = jax.nn.relu(_conv3(convs[ci], x))
                ci += 1
        feats.append(x)
    return feats


def perceptual_loss(params: Params, fake: jnp.ndarray, real: jnp.ndarray,
                    normalize_input: bool = True) -> jnp.ndarray:
    """SPADE-style weighted L1 over the five VGG slices; ``real`` features
    are stop-gradiented (the VGG itself is frozen: params are never in the
    optimized pytree)."""
    ff = vgg19_slice_features(params, fake, normalize_input)
    fr = vgg19_slice_features(params, jax.lax.stop_gradient(real),
                              normalize_input)
    loss = jnp.zeros((), fake.dtype)
    for w, a, b in zip(SLICE_WEIGHTS, ff, fr):
        loss = loss + w * jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
    return loss
