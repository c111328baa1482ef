"""Clean-room PyTorch oracle for parity tests.

A compact, independent re-implementation of the reference math (documented
in SURVEY.md §2/§3) used ONLY as a test oracle — the production path is the
JAX/Pallas code in sahs_tpu/. Runs on CPU.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def positional_encoding(x, num_fns, include_input=True, log_sampling=True):
    enc = [x] if include_input else []
    if log_sampling:
        freqs = 2.0 ** torch.linspace(0.0, num_fns - 1, num_fns, dtype=x.dtype)
    else:
        freqs = torch.linspace(1.0, 2.0 ** (num_fns - 1), num_fns, dtype=x.dtype)
    for f in freqs:
        enc.append(torch.sin(x * f))
        enc.append(torch.cos(x * f))
    return enc[0] if len(enc) == 1 else torch.cat(enc, dim=-1)


def get_ray_bundle(H, W, intr, c2w):
    ii, jj = torch.meshgrid(torch.arange(W, dtype=c2w.dtype),
                            torch.arange(H, dtype=c2w.dtype), indexing="ij")
    ii, jj = ii.t(), jj.t()
    dirs = torch.stack([(ii - W * intr[2]) / intr[0],
                        -(jj - H * intr[3]) / intr[1],
                        -torch.ones_like(ii)], dim=-1)
    rd = torch.sum(dirs[..., None, :] * c2w[:3, :3], dim=-1)
    ro = c2w[:3, -1].expand(rd.shape)
    return ro, rd


def rot_to_euler(R):
    e = torch.zeros((R.shape[0], 3))
    e[:, 2] = torch.atan2(R[:, 0, 0], -R[:, 0, 1])
    e[:, 1] = torch.asin(-R[:, 0, 2])
    e[:, 0] = torch.atan2(R[:, 2, 2], R[:, 1, 2])
    return e


def pose_to_euler_trans(poses):
    return torch.cat((rot_to_euler(poses), poses[:, :3, 3]), dim=1)


def cumprod_exclusive(t):
    cp = torch.cumprod(t, -1)
    cp = torch.roll(cp, 1, -1)
    cp[..., 0] = 1.0
    return cp


def volume_render(rf, z, rd, noise_std=0.0, white_bg=False, bg_prior=None):
    one_e10 = torch.tensor([1e10], dtype=rd.dtype)
    dists = torch.cat((z[..., 1:] - z[..., :-1],
                       one_e10.expand(z[..., :1].shape)), dim=-1)
    dists = dists * rd[..., None, :].norm(p=2, dim=-1)
    if bg_prior is not None:
        rgb = torch.sigmoid(rf[:, :-1, :3])
        if bg_prior.shape[1] > 4:
            seg = torch.softmax(rf[:, :-1, 3:-1], dim=-1)
            rgb = torch.cat((rgb, seg), dim=-1)
        rgb = torch.cat((rgb, rf[:, -1, :-1].unsqueeze(1)), dim=1)
    else:
        rgb = torch.sigmoid(rf[..., :-1])
    noise = 0.0
    if noise_std > 0:
        noise = torch.randn(rf[..., -1].shape) * noise_std
    sigma = F.relu(rf[..., -1] + noise)
    eps = torch.zeros_like(sigma)
    eps[:, -1] = 1e-6
    sigma = sigma + eps  # out-of-place equivalent of the reference's
    # `sigma[:,-1] += 1e-6` (in-place breaks this oracle's autograd)
    alpha = 1.0 - torch.exp(-sigma * dists)
    weights = alpha * cumprod_exclusive(1.0 - alpha + 1e-10)
    rgb_map = (weights[..., None] * rgb).sum(dim=-2)
    depth = (weights * z).sum(dim=-1)
    acc = weights.sum(dim=-1)
    disp = 1.0 / torch.max(1e-10 * torch.ones_like(depth), depth / acc)
    if white_bg:
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return rgb_map, disp, acc, weights, depth


def sample_pdf(bins, weights, n, det=False, u=None):
    weights = weights + 1e-5
    pdf = weights / torch.sum(weights, dim=-1, keepdim=True)
    cdf = torch.cumsum(pdf, dim=-1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], dim=-1)
    if u is None:
        if det:
            u = torch.linspace(0.0, 1.0, steps=n, dtype=weights.dtype)
            u = u.expand(list(cdf.shape[:-1]) + [n])
        else:
            u = torch.rand(list(cdf.shape[:-1]) + [n], dtype=weights.dtype)
    u = u.contiguous()
    inds = torch.searchsorted(cdf.detach(), u, right=True)
    below = torch.max(torch.zeros_like(inds - 1), inds - 1)
    above = torch.min((cdf.shape[-1] - 1) * torch.ones_like(inds), inds)
    inds_g = torch.stack((below, above), dim=-1)
    shape = (inds_g.shape[0], inds_g.shape[1], cdf.shape[-1])
    cdf_g = torch.gather(cdf.unsqueeze(1).expand(shape), 2, inds_g)
    bins_g = torch.gather(bins.unsqueeze(1).expand(shape), 2, inds_g)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[..., 0]) / denom
    return bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])


class SkipMLP(torch.nn.Module):
    """Trunk with a skip re-concat at layer `skip_every`."""

    def __init__(self, in_dim, hidden, n_layers, skip_every):
        super().__init__()
        self.skip_every = skip_every
        self.layers = torch.nn.ModuleList([torch.nn.Linear(in_dim, hidden)])
        for i in range(1, n_layers):
            d = in_dim + hidden if i == skip_every else hidden
            self.layers.append(torch.nn.Linear(d, hidden))

    def forward(self, x0, act):
        x = x0
        for i, l in enumerate(self.layers):
            x = l(torch.cat((x, x0), -1)) if i == self.skip_every else l(x)
            x = act(x)
        return x


class TorchWarpField(torch.nn.Module):
    def __init__(self, in_dim, hidden=128, n_layers=6, skip=4):
        super().__init__()
        self.trunk = SkipMLP(in_dim, hidden, n_layers, skip)
        self.out = torch.nn.Linear(hidden, 3)

    def forward(self, pe_x, driving, pose):
        x0 = torch.cat((pe_x, driving.expand(pe_x.shape[0], -1),
                        pose.expand(pe_x.shape[0], -1)), dim=-1)
        return torch.tanh(self.out(self.trunk(x0, F.relu)))


class TorchHyperSheet(torch.nn.Module):
    def __init__(self, in_dim, hidden=64, n_layers=6, skip=4, out_dim=2):
        super().__init__()
        self.trunk = SkipMLP(in_dim, hidden, n_layers, skip)
        self.out = torch.nn.Linear(hidden, out_dim)

    def forward(self, pe_x, driving, pose):
        x0 = torch.cat((pe_x, driving.expand(pe_x.shape[0], -1),
                        pose.expand(pe_x.shape[0], -1)), dim=-1)
        return self.out(self.trunk(x0, F.relu))


class TorchNeRFMLP(torch.nn.Module):
    # skip defaults to 3: the reference never passes skip_connect_every to
    # NeRFMLP, so its constructor default 3 always wins (reference
    # models.py:258-297, modules.py:176; verified by
    # tools/parity_vs_reference.py against the actual reference code).
    def __init__(self, trunk_in, hidden=256, n_layers=8, skip=3,
                 dir_extra=27 + 32, use_pose=True, include_driving=False):
        super().__init__()
        self.use_pose = use_pose
        self.include_driving = include_driving
        self.trunk = SkipMLP(trunk_in, hidden, n_layers, skip)
        self.fc_feat = torch.nn.Linear(hidden, hidden)
        self.fc_alpha = torch.nn.Linear(hidden, 1)
        rh = hidden // 2
        self.dir_layers = torch.nn.ModuleList(
            [torch.nn.Linear(hidden + dir_extra, rh)]
            + [torch.nn.Linear(rh, rh) for _ in range(3)])
        self.fc_rgb = torch.nn.Linear(rh, 3)
        self.seg_layers = torch.nn.ModuleList(
            [torch.nn.Linear(hidden, rh)]
            + [torch.nn.Linear(rh, rh) for _ in range(3)])
        self.fc_seg = torch.nn.Linear(rh, 12)

    def forward(self, pts_embed, dirs_embed, driving=None, pose=None,
                spatial_embedding=None):
        act = torch.nn.LeakyReLU(0.01)
        x0 = pts_embed
        if self.include_driving:
            x0 = torch.cat((x0, driving.expand(x0.shape[0], -1)), dim=-1)
        if self.use_pose:
            x0 = torch.cat((x0, pose.expand(x0.shape[0], -1)), dim=-1)
        h = self.trunk(x0, act)
        feat = self.fc_feat(h)
        alpha = self.fc_alpha(feat)
        din = [feat, dirs_embed]
        if spatial_embedding is not None:
            din.append(spatial_embedding)
        x = torch.cat(din, dim=-1)
        for l in self.dir_layers:
            x = act(l(x))
        rgb = self.fc_rgb(x)
        x = feat
        for l in self.seg_layers:
            x = act(l(x))
        seg = self.fc_seg(x)
        return torch.cat((rgb, seg, alpha), dim=-1)


class TorchAudioNet(torch.nn.Module):
    def __init__(self, dim_aud=76):
        super().__init__()
        act = lambda: torch.nn.LeakyReLU(0.02, True)
        self.conv = torch.nn.Sequential(
            torch.nn.Conv1d(29, 32, 3, 2, 1), act(),
            torch.nn.Conv1d(32, 32, 3, 2, 1), act(),
            torch.nn.Conv1d(32, 64, 3, 2, 1), act(),
            torch.nn.Conv1d(64, 64, 3, 2, 1), act())
        self.fc = torch.nn.Sequential(
            torch.nn.Linear(64, 64), act(), torch.nn.Linear(64, dim_aud))

    def forward(self, x):  # (B, 16, 29)
        x = x.permute(0, 2, 1)
        x = self.conv(x).squeeze(-1)
        return self.fc(x).squeeze()


def grid_sample3d(grid, coords):
    """grid (C,D,H,W), coords (P,3) xyz in [-1,1] -> (P,C); torch semantics
    align_corners=True, zeros padding."""
    g = grid.unsqueeze(0)
    c = coords.reshape(1, 1, 1, -1, 3)
    out = F.grid_sample(g, c, mode="bilinear", padding_mode="zeros",
                        align_corners=True)
    return out.reshape(grid.shape[0], -1).T


# ---------------------------------------------------------------------------
# Weight copy helpers: torch module -> sahs_tpu param pytree
# ---------------------------------------------------------------------------

def lin_np(l):
    return {"w": l.weight.detach().numpy().T.copy(),
            "b": l.bias.detach().numpy().copy()}


def skip_mlp_np(m: SkipMLP):
    return [lin_np(l) for l in m.layers]


def warp_np(m: TorchWarpField):
    return {"trunk": skip_mlp_np(m.trunk), "out": lin_np(m.out)}


def hyper_np(m: TorchHyperSheet):
    return {"trunk": skip_mlp_np(m.trunk), "out": lin_np(m.out)}


def nerf_np(m: TorchNeRFMLP):
    return {
        "trunk": skip_mlp_np(m.trunk),
        "fc_feat": lin_np(m.fc_feat),
        "fc_alpha": lin_np(m.fc_alpha),
        "dir": [lin_np(l) for l in m.dir_layers],
        "fc_rgb": lin_np(m.fc_rgb),
        "seg": [lin_np(l) for l in m.seg_layers],
        "fc_seg": lin_np(m.fc_seg),
    }


def conv1d_np(c):
    # torch (out, in, k) -> ours (k, in, out)
    return {"w": c.weight.detach().numpy().transpose(2, 1, 0).copy(),
            "b": c.bias.detach().numpy().copy()}


def audionet_np(m: TorchAudioNet):
    convs = [conv1d_np(c) for c in m.conv if isinstance(c, torch.nn.Conv1d)]
    fcs = [l for l in m.fc if isinstance(l, torch.nn.Linear)]
    return {"convs": convs, "fc1": lin_np(fcs[0]), "fc2": lin_np(fcs[1])}
