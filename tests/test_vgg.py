"""VGG19 perceptual slices: structure + torch parity (random weights — no
pretrained weights exist offline; the importer is exercised with a randomly
initialized torch replica of torchvision vgg19's `features` stack)."""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from sahs_tpu.models import vgg


def _torch_vgg19_features():
    """Randomly-initialized replica of torchvision vgg19().features
    (cfg 'E': 64,64,M,128,128,M,256x4,M,512x4,M,512x4,M) — only the first 30
    modules matter for the reference's slices (_init_spade.py:419-434)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers = []
    cin = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            cin = v
    return nn.Sequential(*layers)


class _TorchVGGSlices(nn.Module):
    """Clean-room equivalent of the reference VGG wrapper
    (_init_spade.py:415-451) around a given `features` stack."""

    def __init__(self, features):
        super().__init__()
        bounds = [0, 2, 7, 12, 21, 30]
        self.slices = nn.ModuleList(
            [nn.Sequential(*[features[i] for i in range(lo, hi)])
             for lo, hi in zip(bounds[:-1], bounds[1:])])

    def forward(self, x, normalize_input=True):
        if normalize_input:
            x = x + 0.5
            mean = torch.tensor([0.485, 0.456, 0.406])
            std = torch.tensor([0.229, 0.224, 0.225])
            x = (x - mean[None, :, None, None]) / std[None, :, None, None]
        outs = []
        for sl in self.slices:
            x = sl(x)
            outs.append(x)
        return outs


@pytest.fixture(scope="module")
def torch_feats():
    torch.manual_seed(0)
    return _torch_vgg19_features()


def test_import_and_slice_parity(torch_feats):
    params = vgg.import_torch_vgg_features(torch_feats.state_dict())
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    ours = vgg.vgg19_slice_features(params, jnp.asarray(x))
    ref = _TorchVGGSlices(torch_feats)(
        torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(ours) == len(ref) == 5
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(
            np.asarray(o), r.detach().numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3)


def test_random_init_shapes():
    params = vgg.vgg19_features_init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 32, 32, 3))
    feats = vgg.vgg19_slice_features(params, x)
    assert [f.shape[-1] for f in feats] == [64, 128, 256, 512, 512]
    # spatial: relu1_1 full res; one pool before each later slice end
    assert [f.shape[1] for f in feats] == [32, 16, 8, 4, 2]


def test_perceptual_loss_zero_for_identical():
    params = vgg.vgg19_features_init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3),
                    jnp.float32)
    assert float(vgg.perceptual_loss(params, x, x)) == 0.0
    y = x + 0.05
    assert float(vgg.perceptual_loss(params, y, x)) > 0.0


def test_perceptual_loss_grad_flows_only_to_fake():
    params = vgg.vgg19_features_init(jax.random.PRNGKey(2))
    x = jnp.asarray(np.random.RandomState(2).rand(1, 16, 16, 3), jnp.float32)
    y = x * 0.5

    g = jax.grad(lambda f: vgg.perceptual_loss(params, f, x))(y)
    assert float(jnp.max(jnp.abs(g))) > 0.0
