"""Checkpointing: native save/resume + one-way PyTorch importer.

Native format: a single pickle file of numpy-ified pytrees with the same
logical schema as the reference's torch.save dict (reference
nerf-pytorch/train_stage_rays_auto.py:698-721):
  {iter, model/optimizer state, loss, background, latent_codes, pose_c,
   sample_prob} plus eval-side extras {height, width, focal_length}
(reference eval_stage_rays.py:305-327).

The torch importer maps a released reference ``.ckpt`` state_dict onto our
parameter pytree for parity evaluation (SURVEY.md §5.4). It uses torch only
to deserialize (CPU wheels are fine); the mapping itself is pure numpy.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state, extras: Optional[Dict[str, Any]] = None):
    """state: TrainState (train/stage1.py). extras: e.g. background, pose_c,
    height/width/focal."""
    payload = {
        "iter": int(state.step),
        "params": _to_numpy_tree(state.params),
        "opt_state": _to_numpy_tree(state.opt_state),
        "sample_prob": np.asarray(state.sample_prob),
    }
    if extras:
        payload.update(_to_numpy_tree(extras))
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as fp:
        pickle.dump(payload, fp, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as fp:
        return pickle.load(fp)


def restore_train_state(path: str, state):
    """Restore a TrainState-shaped pytree from a native checkpoint; returns
    (new_state, extras_dict)."""
    ckpt = load_checkpoint(path)
    from ..train.stage1 import TrainState
    as_jnp = lambda t: jax.tree.map(jnp.asarray, t)
    new_state = TrainState(
        step=jnp.asarray(ckpt["iter"], jnp.int32),
        params=as_jnp(ckpt["params"]),
        opt_state=as_jnp(ckpt["opt_state"]),
        sample_prob=jnp.asarray(ckpt["sample_prob"]),
    )
    extras = {k: v for k, v in ckpt.items()
              if k not in ("iter", "params", "opt_state", "sample_prob")}
    return new_state, extras


# ---------------------------------------------------------------------------
# PyTorch -> pytree importer
# ---------------------------------------------------------------------------

def _lin(sd, prefix):
    return {"w": np.asarray(sd[prefix + ".weight"]).T.copy(),
            "b": np.asarray(sd[prefix + ".bias"]).copy()}


def _trunk(sd, prefix, n_layers):
    return [_lin(sd, f"{prefix}.{i}") for i in range(n_layers)]


def _nerf_mlp(sd, prefix, n_layers):
    return {
        "trunk": _trunk(sd, prefix + ".layers_xyz", n_layers),
        "fc_feat": _lin(sd, prefix + ".fc_feat"),
        "fc_alpha": _lin(sd, prefix + ".fc_alpha"),
        "dir": _trunk(sd, prefix + ".layers_dir", 4),
        "fc_rgb": _lin(sd, prefix + ".fc_rgb"),
        "seg": _trunk(sd, prefix + ".layers_seg", 4),
        "fc_seg": _lin(sd, prefix + ".fc_seg"),
    }


def _conv1d(sd, prefix):
    # torch Conv1d weight (out, in, k) -> ours (k, in, out)
    return {"w": np.asarray(sd[prefix + ".weight"]).transpose(2, 1, 0).copy(),
            "b": np.asarray(sd[prefix + ".bias"]).copy()}


def import_torch_state_dict(sd: Dict[str, Any], spec) -> Dict[str, Any]:
    """Map a reference model_state_dict (torch tensors or numpy arrays) onto
    our model param pytree. ``spec``: ModelSpec. Key layout follows the
    reference module tree (models.py:189-528, modules.py:43-462)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    params: Dict[str, Any] = {}
    if spec.use_warp:
        params["warp"] = {
            "trunk": _trunk(sd, "warp_field_mlp.layers_xyz", spec.warp.num_layers),
            "out": _lin(sd, "warp_field_mlp.fc_final"),
        }
    if spec.use_ambient:
        params["hyper"] = {
            "trunk": _trunk(sd, "hyper_sheep_mlp.layers_ambient",
                            spec.hyper.num_layers),
            "out": _lin(sd, "hyper_sheep_mlp.fc_ambient"),
        }
    params["coarse"] = _nerf_mlp(sd, "nerf_mlps.coarse", spec.coarse.num_layers)
    if spec.fine is not None:
        params["fine"] = _nerf_mlp(sd, "nerf_mlps.fine", spec.fine.num_layers)
    if spec.use_spatial_embeddings:
        # torch (1, C, D, H, W) -> (C, D, H, W)
        params["spatial_embeddings"] = np.asarray(sd["spatial_embeddings"])[0]
    if spec.is_audio:
        params["audnet"] = {
            "convs": [_conv1d(sd, f"audNet_head.encoder_conv.{i}")
                      for i in (0, 2, 4, 6)],
            "fc1": _lin(sd, "audNet_head.encoder_fc1.0"),
            "fc2": _lin(sd, "audNet_head.encoder_fc1.2"),
        }
    return jax.tree.map(jnp.asarray, params)


def import_torch_checkpoint(path: str, spec) -> Dict[str, Any]:
    """Load a reference torch checkpoint file and return
    {model_params, background, latent_codes, sample_prob, pose_c, ...}."""
    import torch  # CPU-only deserialization
    ckpt = torch.load(path, map_location="cpu")
    out: Dict[str, Any] = {
        "model": import_torch_state_dict(ckpt["model_state_dict"], spec),
        "iter": ckpt.get("iter"),
    }
    for k in ("background", "latent_codes", "sample_prob", "pose_c"):
        v = ckpt.get(k)
        if v is not None:
            out[k] = jnp.asarray(v.detach().cpu().numpy()
                                 if hasattr(v, "detach") else v)
    for k in ("height", "width", "focal_length"):
        if k in ckpt:
            out[k] = ckpt[k]
    return out
