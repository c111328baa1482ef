"""Golden end-to-end parity: full Stage-I render vs a torch oracle of the
reference pipeline (det mode: perturb=False, noise=0), plus gradient parity
of the train loss — BASELINE.json configs #1/#2/#4 at debug scale."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import torch_ref as tr
from sahs_tpu.config import Config, reference_expression_config
from sahs_tpu.models.nerface import ModelSpec
from sahs_tpu.render.pipeline import RenderSettings, render_rays
from sahs_tpu.ops.encoding import positional_encoding


def build_torch_audio_model(seed=0):
    torch.manual_seed(seed)
    warp = tr.TorchWarpField(in_dim=63 + 76 + 36)
    hyper = tr.TorchHyperSheet(in_dim=63 + 76 + 36, out_dim=2)
    coarse = tr.TorchNeRFMLP(trunk_in=117)
    fine = tr.TorchNeRFMLP(trunk_in=117)
    audnet = tr.TorchAudioNet()
    grid = torch.randn(32, 32, 32, 32) * 0.01
    params = {
        "warp": tr.warp_np(warp), "hyper": tr.hyper_np(hyper),
        "coarse": tr.nerf_np(coarse), "fine": tr.nerf_np(fine),
        "audnet": tr.audionet_np(audnet),
        "spatial_embeddings": grid.numpy().copy(),
    }
    return (warp, hyper, coarse, fine, audnet, grid), params


def torch_field(nets, grid, level, pts, dirs, audio, pose34):
    """Torch oracle of the reference per-point pipeline
    (models.py:514-528)."""
    warp, hyper, coarse, fine, audnet = nets
    driving = audnet(audio[None])[None]
    pose6 = tr.pose_to_euler_trans(pose34[None])
    pose_enc = tr.positional_encoding(pose6, 3, include_input=False)
    pe_x = tr.positional_encoding(pts, 10)
    dx = warp(pe_x, driving, pose_enc)
    warped = pts + dx
    amb = hyper(pe_x, driving, pose_enc)
    se = tr.grid_sample3d(grid, warped)
    pts_embed = torch.cat([tr.positional_encoding(warped, 10),
                           tr.positional_encoding(amb, 4)], dim=-1)
    dirs_embed = tr.positional_encoding(dirs, 4)
    net = coarse if level == "coarse" else fine
    return net(pts_embed, dirs_embed, pose=pose_enc, spatial_embedding=se)


def torch_render_pipeline(nets, grid, ro, rd, near, far, audio, pose34, bg,
                          num_coarse=8, num_fine=8):
    """Torch oracle of predict_and_render_radiance in det mode
    (train_utils.py:72-206)."""
    R = ro.shape[0]
    t = torch.linspace(0, 1, num_coarse)
    z = near * (1 - t) + far * t
    z = z.expand(R, num_coarse).contiguous()
    pts = ro[:, None] + rd[:, None] * z[..., None]
    raw = torch_field(nets, grid, "coarse", pts.reshape(-1, 3),
                      rd[:, None].expand(R, num_coarse, 3).reshape(-1, 3),
                      audio, pose34).reshape(R, num_coarse, 16)
    raw = raw.clone()
    raw[:, -1, :-1] = bg
    rgb_c, disp_c, acc_c, w, _ = tr.volume_render(raw, z, rd, bg_prior=bg)
    zm = 0.5 * (z[..., 1:] + z[..., :-1])
    zs = tr.sample_pdf(zm, w[..., 1:-1], num_fine, det=True).detach()
    zf, _ = torch.sort(torch.cat((z, zs), -1), -1)
    S = zf.shape[-1]
    pts = ro[:, None] + rd[:, None] * zf[..., None]
    raw = torch_field(nets, grid, "fine", pts.reshape(-1, 3),
                      rd[:, None].expand(R, S, 3).reshape(-1, 3),
                      audio, pose34).reshape(R, S, 16)
    raw = raw.clone()
    raw[:, -1, :-1] = bg
    rgb_f, disp_f, acc_f, wf, depth_f = tr.volume_render(raw, zf, rd, bg_prior=bg)
    return rgb_c, rgb_f, disp_f, wf, depth_f


@pytest.fixture(scope="module")
def audio_setup():
    nets_grid, params_np = build_torch_audio_model()
    cfg = Config()
    spec = ModelSpec.from_config(cfg)
    params = jax.tree.map(jnp.asarray, params_np)
    rng = np.random.RandomState(0)
    R = 16
    ro = np.zeros((R, 3), np.float32)
    rd = (rng.randn(R, 3) * 0.05 + np.array([0, 0, -1.0])).astype(np.float32)
    audio = rng.randn(16, 29).astype(np.float32)
    Rm = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    pose = np.concatenate([Rm, np.array([[0], [0], [0.6]], np.float32)], 1)
    bg = rng.rand(R, 15).astype(np.float32)
    return nets_grid, params, spec, ro, rd, audio, pose, bg


def test_full_render_parity_audio(audio_setup):
    nets_grid, params, spec, ro, rd, audio, pose, bg = audio_setup
    nets, grid = nets_grid[:5], nets_grid[5]
    settings = RenderSettings(num_coarse=8, num_fine=8, perturb=False,
                              radiance_field_noise_std=0.0)
    render = jax.jit(lambda p: render_rays(
        p, spec, settings, jnp.asarray(ro), jnp.asarray(rd), 0.48, 1.08,
        jnp.asarray(audio), jnp.asarray(pose),
        background_prior=jnp.asarray(bg)))
    ours = render(params)
    with torch.no_grad():
        rgb_c, rgb_f, disp_f, wf, depth_f = torch_render_pipeline(
            nets, grid, torch.from_numpy(ro), torch.from_numpy(rd),
            0.48, 1.08, torch.from_numpy(audio), torch.from_numpy(pose),
            torch.from_numpy(bg))
    np.testing.assert_allclose(np.asarray(ours.rgb_coarse), rgb_c.numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.rgb_fine), rgb_f.numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.disp_fine), disp_f.numpy(),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ours.weights), wf.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.depth_fine), depth_f.numpy(),
                               rtol=1e-3)


def test_gradient_parity_audio(audio_setup):
    """Input-gradient parity: d(mean rgb_fine)/d(grid + a warp layer) matches
    torch autograd through the full pipeline."""
    nets_grid, params, spec, ro, rd, audio, pose, bg = audio_setup
    nets, grid = nets_grid[:5], nets_grid[5]
    settings = RenderSettings(num_coarse=6, num_fine=6, perturb=False,
                              radiance_field_noise_std=0.0)

    def loss_fn(p):
        out = render_rays(p, spec, settings, jnp.asarray(ro), jnp.asarray(rd),
                          0.48, 1.08, jnp.asarray(audio), jnp.asarray(pose),
                          background_prior=jnp.asarray(bg))
        return jnp.mean(out.rgb_fine)

    grads = jax.jit(jax.grad(loss_fn))(params)

    grid_t = grid.clone().requires_grad_(True)
    w0 = nets[0].trunk.layers[0].weight
    rgb_c, rgb_f, *_ = torch_render_pipeline(
        nets, grid_t, torch.from_numpy(ro), torch.from_numpy(rd), 0.48, 1.08,
        torch.from_numpy(audio), torch.from_numpy(pose), torch.from_numpy(bg),
        num_coarse=6, num_fine=6)
    loss = rgb_f.mean()
    loss.backward()
    np.testing.assert_allclose(np.asarray(grads["spatial_embeddings"]),
                               grid_t.grad.numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(grads["warp"]["trunk"][0]["w"]),
                               w0.grad.numpy().T, atol=2e-6)


def test_render_expression_path_runs():
    """NeRFaceModel (expression) config compiles and renders finite values."""
    cfg = reference_expression_config()
    spec = ModelSpec.from_config(cfg)
    assert not spec.is_audio
    assert spec.coarse.trunk_input_dim == 199  # 93 + 30 + 76
    from sahs_tpu.models.nerface import init_model_params
    params = init_model_params(jax.random.PRNGKey(0), spec)
    R = 8
    rng = np.random.RandomState(0)
    ro = np.zeros((R, 3), np.float32)
    rd = (rng.randn(R, 3) * 0.05 + np.array([0, 0, -1.0])).astype(np.float32)
    expr = rng.randn(76).astype(np.float32) * 0.1
    pose = np.concatenate([np.eye(3, dtype=np.float32),
                           np.array([[0], [0], [0.5]], np.float32)], 1)
    settings = RenderSettings(num_coarse=6, num_fine=6, perturb=False,
                              radiance_field_noise_std=0.0)
    out = jax.jit(lambda p: render_rays(
        p, spec, settings, jnp.asarray(ro), jnp.asarray(rd), 0.2, 0.8,
        jnp.asarray(expr), jnp.asarray(pose)))(params)
    assert out.rgb_fine.shape == (R, 15)
    assert bool(jnp.isfinite(out.rgb_fine).all())
