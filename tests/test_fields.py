"""Parity of field networks vs torch oracle modules with copied weights."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

import torch_ref as tr
from sahs_tpu.models import fields
from sahs_tpu.ops.encoding import positional_encoding


def test_warp_field_parity():
    torch.manual_seed(0)
    P, pe_dim = 33, 63
    m = tr.TorchWarpField(in_dim=pe_dim + 76 + 36)
    params = tr.warp_np(m)
    spec = fields.WarpSpec(num_layers=6, hidden_size=128, skip_connect_every=4,
                           pe_xyz_dim=pe_dim, include_driving=True,
                           include_pose_input=False)
    rng = np.random.RandomState(0)
    pe_x = rng.randn(P, pe_dim).astype(np.float32)
    driving = rng.randn(76).astype(np.float32)
    pose = rng.randn(36).astype(np.float32)
    ours = fields.warp_field_apply(jax.tree.map(jnp.asarray, params), spec,
                                   jnp.asarray(pe_x), jnp.asarray(driving),
                                   jnp.asarray(pose))
    ref = m(torch.from_numpy(pe_x), torch.from_numpy(driving)[None],
            torch.from_numpy(pose)[None])
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(), atol=2e-5)


def test_hyper_sheet_parity():
    torch.manual_seed(1)
    P, pe_dim = 21, 63
    m = tr.TorchHyperSheet(in_dim=pe_dim + 76 + 36, out_dim=2)
    params = tr.hyper_np(m)
    spec = fields.HyperSpec(num_layers=6, hidden_size=64, skip_connect_every=4,
                            pe_xyz_dim=pe_dim, include_driving=True,
                            ambient_coord_dim=2)
    rng = np.random.RandomState(1)
    pe_x = rng.randn(P, pe_dim).astype(np.float32)
    driving = rng.randn(76).astype(np.float32)
    pose = rng.randn(36).astype(np.float32)
    ours = fields.hyper_sheet_apply(jax.tree.map(jnp.asarray, params), spec,
                                    jnp.asarray(pe_x), jnp.asarray(driving),
                                    jnp.asarray(pose))
    ref = m(torch.from_numpy(pe_x), torch.from_numpy(driving)[None],
            torch.from_numpy(pose)[None])
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(), atol=2e-5)


def test_nerf_mlp_parity_audio_layout():
    """person_2 audio layout: trunk in 117 (63 xyz + 18 ambient + 36 pose),
    dir in 315 (256 + 27 + 32 spatial embedding)."""
    torch.manual_seed(2)
    P = 17
    m = tr.TorchNeRFMLP(trunk_in=117, use_pose=True, include_driving=False)
    params = tr.nerf_np(m)
    # skip at 3: the reference never passes the config's skip_connect_every
    # to NeRFMLP, so its constructor default 3 wins (modules.py:176)
    spec = fields.NeRFSpec(num_layers=8, hidden_size=256, skip_connect_every=3,
                           pe_xyz_dim=63, pe_dir_dim=27, ambient_pe_dim=18,
                           use_viewdirs=True, use_pose=True,
                           include_pose_input=False,
                           use_spatial_embeddings=True, include_driving=False,
                           latent_code_dim=0)
    assert spec.trunk_input_dim == 117 and spec.dir_input_dim == 315
    rng = np.random.RandomState(2)
    pts_embed = rng.randn(P, 81).astype(np.float32)  # 63 + 18
    dirs_embed = rng.randn(P, 27).astype(np.float32)
    pose = rng.randn(36).astype(np.float32)
    se = rng.randn(P, 32).astype(np.float32)
    ours = fields.nerf_mlp_apply(jax.tree.map(jnp.asarray, params), spec,
                                 jnp.asarray(pts_embed), jnp.asarray(dirs_embed),
                                 pose=jnp.asarray(pose),
                                 spatial_embedding=jnp.asarray(se))
    ref = m(torch.from_numpy(pts_embed), torch.from_numpy(dirs_embed),
            pose=torch.from_numpy(pose)[None],
            spatial_embedding=torch.from_numpy(se))
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(), atol=3e-5)
    assert ours.shape == (P, 16)


def test_audio_net_parity():
    torch.manual_seed(3)
    m = tr.TorchAudioNet()
    params = tr.audionet_np(m)
    rng = np.random.RandomState(3)
    audio = rng.randn(16, 29).astype(np.float32)
    ours = fields.audio_net_apply(jax.tree.map(jnp.asarray, params),
                                  jnp.asarray(audio))
    ref = m(torch.from_numpy(audio)[None])
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(), atol=2e-5)
    assert ours.shape == (76,)


def test_torch_default_init_bounds():
    """Our init distribution matches torch.nn.Linear defaults: both weight
    and bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    p = fields.linear_init(jax.random.PRNGKey(0), 256, 128)
    bound = 1.0 / np.sqrt(256)
    w = np.asarray(p["w"])
    assert w.min() >= -bound and w.max() <= bound
    assert w.std() > bound * 0.4  # roughly uniform, not collapsed
