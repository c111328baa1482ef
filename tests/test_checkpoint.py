"""Checkpoint format v2 (pickle-free npz) + importer layout tests."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sahs_tpu.utils import checkpoint as ckpt_lib


def test_sections_roundtrip(tmp_path):
    tree = {"a": [{"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                   "b": np.zeros(3, np.float32)}],
            "nested": {"x": np.ones((4,), np.float32)}}
    bufs = {"u": np.full((5,), 2.0, np.float32)}
    path = str(tmp_path / "c.ckpt")
    ckpt_lib.save_sections(path, {"params": tree, "bufs": bufs},
                           scalars={"epoch": 3, "step": 17})
    assert ckpt_lib.is_native_checkpoint(path)
    sections, scalars = ckpt_lib.restore_sections(path)
    assert scalars == {"epoch": 3, "step": 17}
    np.testing.assert_array_equal(sections["params"]["a"][0]["w"],
                                  tree["a"][0]["w"])
    assert isinstance(sections["params"]["a"], list)
    np.testing.assert_array_equal(sections["bufs"]["u"], bufs["u"])


def test_bf16_leaves_roundtrip(tmp_path):
    tree = {"w": jnp.asarray(np.linspace(-2, 2, 8), jnp.bfloat16)}
    path = str(tmp_path / "b.ckpt")
    ckpt_lib.save_sections(path, {"params": tree})
    sections, _ = ckpt_lib.restore_sections(path)
    got = sections["params"]["w"]
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(tree["w"], np.float32))


def test_corrupt_file_raises_clear_error(tmp_path):
    path = str(tmp_path / "junk.ckpt")
    with open(path, "wb") as fp:
        fp.write(b"\x80\x04 this is not a checkpoint")
    assert not ckpt_lib.is_native_checkpoint(path)
    with pytest.raises(ckpt_lib.CheckpointError):
        ckpt_lib.load_checkpoint(path)


def test_structure_mismatch_raises(tmp_path):
    path = str(tmp_path / "c.ckpt")
    ckpt_lib.save_sections(path, {"opt": {"m": np.zeros(3, np.float32)}})
    with pytest.raises(ckpt_lib.CheckpointError):
        ckpt_lib.restore_sections(
            path, templates={"opt": {"m": np.zeros(3), "extra": np.zeros(2)}})


def test_conv_transpose_importer_matches_torch():
    """Validates _convT2d_t's kernel layout against torch ConvTranspose2d
    (the layer used by SPADE up-blocks, reference _init_spade.py:256-257)."""
    torch = pytest.importorskip("torch")
    from sahs_tpu.models.spade import conv2d_transpose

    torch.manual_seed(1)
    m = torch.nn.ConvTranspose2d(6, 4, kernel_size=3, stride=2, padding=1,
                                 output_padding=1)
    sd = {"t.weight": m.weight.detach().numpy(),
          "t.bias": m.bias.detach().numpy()}
    p = jax.tree.map(jnp.asarray, ckpt_lib._convT2d_t(sd, "t"))
    x = np.random.RandomState(0).randn(1, 8, 8, 6).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x).permute(0, 3, 1, 2))
    ours = conv2d_transpose(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_stage1_export_import_roundtrip():
    """export_torch_state_dict is the exact inverse of
    import_torch_state_dict."""
    from sahs_tpu.config import Config
    from sahs_tpu.models.nerface import ModelSpec, init_model_params

    cfg = Config()
    spec = ModelSpec.from_config(cfg)
    params = init_model_params(jax.random.PRNGKey(0), spec)
    sd = ckpt_lib.export_torch_state_dict(params, spec)
    back = ckpt_lib.import_torch_state_dict(sd, spec)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
