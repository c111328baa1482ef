"""Golden parity vs the ACTUAL reference implementation.

Runs /root/reference/nerf-pytorch's own `run_one_iter_of_nerf`
(train_utils.py:209, torch CPU) and our deterministic render on the same
synthetic frame with IDENTICAL weights (ours exported to a torch state_dict
via utils/checkpoint.export_torch_state_dict), then compares:
  - full-frame RGB / seg / disparity maps          (forward parity)
  - gradients of a fixed scalar loss w.r.t. the spatial-embedding grid,
    warp layer-0 weights and NeRF trunk layer-0 weights  (gradient parity)

This closes the circular-oracle gap flagged in VERDICT round 1 (all other
parity tests compare against tests/torch_ref.py, our own re-derivation).

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS= python tools/parity_vs_reference.py
Also wired as a pytest in tests/test_reference_parity.py.
"""
from __future__ import annotations

import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/nerf-pytorch"
sys.path.insert(0, REPO)

H = W = 32


def _stub_pytorch3d():
    """The reference imports pytorch3d for one dead code path
    (nerf_helpers.py:4,287); stub it so the package imports on this image."""
    if "pytorch3d" in sys.modules:
        return
    p3d = types.ModuleType("pytorch3d")
    tr = types.ModuleType("pytorch3d.transforms")

    def _unavailable(*a, **k):
        raise NotImplementedError("pytorch3d stub (dead reference path)")

    tr.so3_exponential_map = _unavailable
    p3d.transforms = tr
    sys.modules["pytorch3d"] = p3d
    sys.modules["pytorch3d.transforms"] = tr


def load_reference():
    _stub_pytorch3d()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import nerf as ref_nerf  # noqa
    return ref_nerf


def build_case(seed: int = 0):
    """-> dict with everything both sides need (numpy)."""
    import numpy as np
    from sahs_tpu.config import load_config
    from sahs_tpu.data.synthetic import SyntheticFaceDataset
    from sahs_tpu.models.nerface import ModelSpec, init_model_params
    import jax

    cfg = load_config(os.path.join(REF, "config/audio/person_2_auto.yml"))
    # determinism contract (SURVEY §7.3#2): parity at perturb=False, noise=0
    cfg.nerf.validation.perturb = False
    cfg.nerf.validation.radiance_field_noise_std = 0.0
    cfg.runtime.use_pallas = False
    cfg.runtime.compute_dtype = "float32"

    spec = ModelSpec.from_config(cfg)
    params = init_model_params(jax.random.PRNGKey(seed), spec)

    ds = SyntheticFaceDataset(kind="audio", num_frames=2, H=H, W=W, seed=seed,
                              near=cfg.dataset.near, far=cfg.dataset.far)
    item = ds[0]
    case = {
        "cfg": cfg,
        "spec": spec,
        "params": params,
        "image": np.asarray(item["image"], np.float32),
        "mask": np.asarray(item["mask"], np.float32),
        "pose": np.asarray(item["pose"], np.float32),
        "intrinsics": np.asarray(item["intrinsics"], np.float32),
        "driving": np.asarray(item["driving"], np.float32),
        "background": np.asarray(ds.background(), np.float32),
    }
    return case


def run_reference(case):
    """Reference eval path (eval_stage_rays.py:454-475 semantics) + grads."""
    import numpy as np
    import torch

    ref_nerf = load_reference()
    from nerf.cfgnode import CfgNode
    import yaml

    with open(os.path.join(REF, "config/audio/person_2_auto.yml")) as fp:
        rcfg = CfgNode(yaml.safe_load(fp))
    rcfg.nerf.validation.perturb = False
    rcfg.nerf.validation.radiance_field_noise_std = 0.0

    from sahs_tpu.utils.checkpoint import export_torch_state_dict
    sd = {k: torch.from_numpy(v) for k, v in
          export_torch_state_dict(case["params"], case["spec"]).items()}

    import nerf.models as ref_models
    model = getattr(ref_models, rcfg.models.mask.type)(rcfg)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, f"exporter produced unknown keys: {unexpected}"
    assert not missing, f"exporter missed keys: {missing}"
    model = model.float()

    pose = torch.from_numpy(case["pose"])
    intr = torch.from_numpy(case["intrinsics"])
    driving = torch.from_numpy(case["driving"])
    mask = torch.from_numpy(case["mask"]).view(-1, case["mask"].shape[-1])
    background = torch.from_numpy(case["background"]).view(-1, 15)

    ro, rd = ref_nerf.get_ray_bundle(H, W, intr, pose)

    def render():
        return ref_nerf.run_one_iter_of_nerf(
            H, W, intr, model, ro, rd, rcfg, mode="validation",
            driving=driving, pose=pose, pose_c=pose,
            background_prior=background, latent_code=None, inHead=mask)

    with torch.no_grad():
        rgb_c, disp_c, acc_c, rgb_f, disp_f, acc_f, weights, depth_f = render()

    # gradient parity: fixed pseudo-random cotangent on the fine rgb map.
    # The reference's in-place `sigma_a[:,-1] += 1e-6`
    # (volume_rendering_utils.py:57) backprops fine on its pinned
    # torch 1.9 (ReLU backward there saves the INPUT) but errors on modern
    # torch (saves the output, whose version the in-place add bumps).
    # Substitute a value- and gradient-identical relu for the backward run.
    rng = np.random.RandomState(7)
    cot = torch.from_numpy(rng.randn(*rgb_f.shape).astype(np.float32))
    cot_c = torch.from_numpy(rng.randn(*rgb_c.shape).astype(np.float32))
    model.zero_grad()
    orig_relu = torch.nn.functional.relu
    torch.nn.functional.relu = (
        lambda x, inplace=False: torch.where(x > 0, x, torch.zeros_like(x)))
    try:
        outs = render()
        # fine + coarse terms: the coarse trunk only receives gradient
        # through its own rgb map (sample_pdf is detached, train_utils:164)
        loss = (outs[3] * cot).sum() + (outs[0] * cot_c).sum()
        loss.backward()
    finally:
        torch.nn.functional.relu = orig_relu
    grads = {
        "spatial_embeddings": model.spatial_embeddings.grad[0].numpy().copy(),
        "warp_l0_w": model.warp_field_mlp.layers_xyz[0].weight.grad
                     .numpy().T.copy(),
        "nerf_l0_w": model.nerf_mlps["coarse"].layers_xyz[0].weight.grad
                     .numpy().T.copy(),
    }
    return {
        "rgb_fine": rgb_f.detach().numpy(),
        "rgb_coarse": rgb_c.detach().numpy(),
        "disp_fine": disp_f.detach().numpy(),
        "cot": cot.numpy(),
        "cot_c": cot_c.numpy(),
        "grads": grads,
    }


def run_ours(case, cot, cot_c):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_default_matmul_precision", "float32")
    from sahs_tpu.models.nerface import ModelSpec  # noqa
    from sahs_tpu.render.pipeline import RenderSettings, render_image

    cfg, spec = case["cfg"], case["spec"]
    settings = RenderSettings.from_config(cfg, "validation")
    params = case["params"]

    def render(p):
        return render_image(p, spec, settings, H, W,
                            jnp.asarray(case["intrinsics"]),
                            jnp.asarray(case["pose"]),
                            float(cfg.dataset.near), float(cfg.dataset.far),
                            jnp.asarray(case["driving"]),
                            key=None,
                            background=jnp.asarray(case["background"]),
                            chunksize=H * W)  # no padding to the cfg chunk

    out = jax.jit(render)(params)

    def loss_fn(p):
        out = render(p)
        return (jnp.sum(out["rgb_fine"] * jnp.asarray(cot))
                + jnp.sum(out["rgb_coarse"] * jnp.asarray(cot_c)))

    grads = jax.jit(jax.grad(loss_fn))(params)
    return {
        "rgb_fine": np.asarray(out["rgb_fine"]),
        "rgb_coarse": np.asarray(out["rgb_coarse"]),
        "disp_fine": np.asarray(out["disp_fine"]),
        "grads": {
            "spatial_embeddings": np.asarray(grads["spatial_embeddings"]),
            "warp_l0_w": np.asarray(grads["warp"]["trunk"][0]["w"]),
            "nerf_l0_w": np.asarray(grads["coarse"]["trunk"][0]["w"]),
        },
    }


def compare(ref, ours, atol_img=1e-4, rtol_grad=2e-3):
    import numpy as np
    report = {}
    ok = True
    for k in ("rgb_fine", "rgb_coarse", "disp_fine"):
        d = float(np.max(np.abs(ref[k] - ours[k])))
        report[k] = d
        ok &= d <= atol_img
    for k, g_ref in ref["grads"].items():
        g_ours = ours["grads"][k]
        scale = float(np.max(np.abs(g_ref)) + 1e-12)
        d = float(np.max(np.abs(g_ref - g_ours)) / scale)
        report["grad/" + k] = d
        ok &= d <= rtol_grad
    return ok, report


def main():
    case = build_case()
    ref = run_reference(case)
    ours = run_ours(case, ref["cot"], ref["cot_c"])
    ok, report = compare(ref, ours)
    for k, v in report.items():
        print(f"{k:28s} max diff {v:.3e}")
    print("PARITY OK" if ok else "PARITY FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
