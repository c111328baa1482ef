"""Stage-I train step: smoke + behaviour tests on the synthetic fixture."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sahs_tpu.config import Config
from sahs_tpu.data.synthetic import SyntheticFaceDataset
from sahs_tpu.models.nerface import ModelSpec
from sahs_tpu.train.stage1 import (TrainSettings, init_train_state,
                                   make_train_step)


def tiny_cfg(kind="audio"):
    cfg = Config()
    cfg.dataset.type = kind
    if kind == "expression":
        from sahs_tpu.config import reference_expression_config
        cfg = reference_expression_config()
    cfg.nerf.train.num_random_rays = 64
    cfg.nerf.train.num_coarse = 8
    cfg.nerf.train.num_fine = 8
    return cfg


def make_batch(ds, background, i=0):
    item = ds[i]
    b = {k: jnp.asarray(v) for k, v in item.items() if k != "fname"}
    b["background"] = jnp.asarray(background)
    return b


@pytest.mark.parametrize("kind", ["audio", "expression"])
def test_train_step_runs_and_updates(kind):
    cfg = tiny_cfg(kind)
    spec = ModelSpec.from_config(cfg)
    ts = TrainSettings.from_config(cfg)
    ds = SyntheticFaceDataset(kind=kind, num_frames=2, H=32, W=32,
                              near=cfg.dataset.near, far=cfg.dataset.far)
    state = init_train_state(jax.random.PRNGKey(0), spec, ts)
    step = make_train_step(spec, ts, donate=False)
    batch = make_batch(ds, ds.background())
    w_before = np.asarray(state.params["model"]["coarse"]["trunk"][0]["w"]).copy()
    prob_before = np.asarray(state.sample_prob).copy()

    state2, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert int(state2.step) == 1
    w_after = np.asarray(state2.params["model"]["coarse"]["trunk"][0]["w"])
    assert np.abs(w_after - w_before).max() > 0  # params moved
    # dynamic sampling updated and normalized
    prob_after = np.asarray(state2.sample_prob)
    assert not np.allclose(prob_after, prob_before)
    np.testing.assert_allclose(prob_after.sum(), 1.0, rtol=1e-5)
    assert (prob_after >= 0).all()


def test_loss_decreases_over_steps():
    cfg = tiny_cfg("audio")
    spec = ModelSpec.from_config(cfg)
    ts = TrainSettings.from_config(cfg)
    ds = SyntheticFaceDataset(kind="audio", num_frames=1, H=32, W=32,
                              near=cfg.dataset.near, far=cfg.dataset.far)
    state = init_train_state(jax.random.PRNGKey(0), spec, ts)
    step = make_train_step(spec, ts, donate=True)
    batch = make_batch(ds, ds.background())
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        key, k = jax.random.split(key)
        state, m = step(state, batch, k)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_checkpoint_roundtrip(tmp_path):
    from sahs_tpu.utils import checkpoint as ckpt_lib
    cfg = tiny_cfg("audio")
    spec = ModelSpec.from_config(cfg)
    ts = TrainSettings.from_config(cfg)
    state = init_train_state(jax.random.PRNGKey(0), spec, ts)
    path = str(tmp_path / "test.ckpt")
    ckpt_lib.save_checkpoint(path, state,
                             extras={"pose_c": np.eye(3, 4, dtype=np.float32)})
    state2, extras = ckpt_lib.restore_train_state(path, state)
    assert int(state2.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert "pose_c" in extras


def test_torch_checkpoint_import():
    """A reference-layout torch state_dict maps onto our pytree and produces
    identical outputs to the torch oracle (weight-transport correctness)."""
    import torch
    import torch_ref as tr
    from sahs_tpu.utils.checkpoint import import_torch_state_dict

    torch.manual_seed(0)
    cfg = tiny_cfg("audio")
    spec = ModelSpec.from_config(cfg)
    # Build a reference-shaped state dict using the oracle modules.
    warp = tr.TorchWarpField(in_dim=63 + 76 + 36)
    hyper = tr.TorchHyperSheet(in_dim=63 + 76 + 36, out_dim=2)
    coarse = tr.TorchNeRFMLP(trunk_in=117)
    fine = tr.TorchNeRFMLP(trunk_in=117)
    audnet = tr.TorchAudioNet()
    sd = {}
    for i, l in enumerate(warp.trunk.layers):
        sd[f"warp_field_mlp.layers_xyz.{i}.weight"] = l.weight
        sd[f"warp_field_mlp.layers_xyz.{i}.bias"] = l.bias
    sd["warp_field_mlp.fc_final.weight"] = warp.out.weight
    sd["warp_field_mlp.fc_final.bias"] = warp.out.bias
    for i, l in enumerate(hyper.trunk.layers):
        sd[f"hyper_sheep_mlp.layers_ambient.{i}.weight"] = l.weight
        sd[f"hyper_sheep_mlp.layers_ambient.{i}.bias"] = l.bias
    sd["hyper_sheep_mlp.fc_ambient.weight"] = hyper.out.weight
    sd["hyper_sheep_mlp.fc_ambient.bias"] = hyper.out.bias
    for name, net in (("coarse", coarse), ("fine", fine)):
        for i, l in enumerate(net.trunk.layers):
            sd[f"nerf_mlps.{name}.layers_xyz.{i}.weight"] = l.weight
            sd[f"nerf_mlps.{name}.layers_xyz.{i}.bias"] = l.bias
        for i, l in enumerate(net.dir_layers):
            sd[f"nerf_mlps.{name}.layers_dir.{i}.weight"] = l.weight
            sd[f"nerf_mlps.{name}.layers_dir.{i}.bias"] = l.bias
        for i, l in enumerate(net.seg_layers):
            sd[f"nerf_mlps.{name}.layers_seg.{i}.weight"] = l.weight
            sd[f"nerf_mlps.{name}.layers_seg.{i}.bias"] = l.bias
        for head in ("fc_feat", "fc_alpha", "fc_rgb", "fc_seg"):
            sd[f"nerf_mlps.{name}.{head}.weight"] = getattr(net, head).weight
            sd[f"nerf_mlps.{name}.{head}.bias"] = getattr(net, head).bias
    convs = [c for c in audnet.conv if isinstance(c, torch.nn.Conv1d)]
    for i, idx in enumerate((0, 2, 4, 6)):
        sd[f"audNet_head.encoder_conv.{idx}.weight"] = convs[i].weight
        sd[f"audNet_head.encoder_conv.{idx}.bias"] = convs[i].bias
    fcs = [l for l in audnet.fc if isinstance(l, torch.nn.Linear)]
    sd["audNet_head.encoder_fc1.0.weight"] = fcs[0].weight
    sd["audNet_head.encoder_fc1.0.bias"] = fcs[0].bias
    sd["audNet_head.encoder_fc1.2.weight"] = fcs[1].weight
    sd["audNet_head.encoder_fc1.2.bias"] = fcs[1].bias
    sd["spatial_embeddings"] = torch.randn(1, 32, 32, 32, 32) * 0.01

    params = import_torch_state_dict(sd, spec)
    # Spot-check: audio driving parity through imported weights.
    from sahs_tpu.models.fields import audio_net_apply
    audio = np.random.RandomState(0).randn(16, 29).astype(np.float32)
    ours = audio_net_apply(params["audnet"], jnp.asarray(audio))
    ref = audnet(torch.from_numpy(audio)[None])
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(),
                               atol=2e-5)
    assert params["spatial_embeddings"].shape == (32, 32, 32, 32)
