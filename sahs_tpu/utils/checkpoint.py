"""Checkpointing: native save/resume + one-way PyTorch importer.

Native format (version 2): a ``.npz`` archive of flattened pytree leaves —
no pickle anywhere, so loading an untrusted file cannot execute code. Layout:
  __schema__            JSON header {format, version, scalars, bf16 keys}
  params|<tree path>    one entry per parameter leaf
  opt|<tree path>       one entry per optimizer-state leaf
  sample_prob, background, pose_c, ...   top-level arrays
Logical schema matches the reference's torch.save dict (reference
nerf-pytorch/train_stage_rays_auto.py:698-721): {iter, model/optimizer
state, background, latent_codes, pose_c, sample_prob} plus eval-side extras
{height, width, focal_length} (reference eval_stage_rays.py:305-327).

The torch importers map released reference ``.ckpt`` files onto our
parameter pytrees for parity evaluation (SURVEY.md §5.4). They use torch
only to deserialize (CPU wheels are fine); the mapping itself is pure numpy.
"""
from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

CKPT_FORMAT = "sahs-ckpt"
CKPT_VERSION = 2
_SCHEMA_KEY = "__schema__"


class CheckpointError(RuntimeError):
    pass


def _keystr(path) -> str:
    """Stable string form of a tree path: dict keys and sequence indices
    joined by '/'."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _flatten_section(prefix: str, tree, out: Dict[str, np.ndarray],
                     bf16_keys: list):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = f"{prefix}|{_keystr(path)}" if path else prefix
        arr = np.asarray(leaf)
        if arr.dtype == jnp.bfloat16:
            bf16_keys.append(key)
            arr = arr.view(np.uint16)
        out[key] = arr


def save_checkpoint(path: str, state, extras: Optional[Dict[str, Any]] = None):
    """state: TrainState (train/stage1.py). extras: e.g. background, pose_c,
    height/width/focal. Atomic write (tmp + rename)."""
    entries: Dict[str, np.ndarray] = {}
    bf16: list = []
    _flatten_section("params", state.params, entries, bf16)
    _flatten_section("opt", state.opt_state, entries, bf16)
    entries["sample_prob"] = np.asarray(state.sample_prob)
    scalars: Dict[str, Any] = {"iter": int(state.step)}
    for k, v in (extras or {}).items():
        arr = np.asarray(v)
        if arr.ndim == 0 and arr.dtype.kind in "ifb":
            scalars[k] = arr.item()
        else:
            if arr.dtype == jnp.bfloat16:
                bf16.append(k)
                arr = arr.view(np.uint16)
            entries[k] = arr
    schema = {"format": CKPT_FORMAT, "version": CKPT_VERSION,
              "scalars": scalars, "bf16_keys": bf16}
    entries[_SCHEMA_KEY] = np.frombuffer(
        json.dumps(schema).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as fp:
        np.savez(fp, **entries)
    os.replace(tmp, path)


def is_native_checkpoint(path: str) -> bool:
    """True iff ``path`` is a version-2 native checkpoint (zip archive
    containing the schema entry) — distinguishes ours from torch.save zips
    without deserializing anything."""
    try:
        with zipfile.ZipFile(path) as zf:
            return _SCHEMA_KEY + ".npy" in zf.namelist()
    except (zipfile.BadZipFile, OSError):
        return False


def load_checkpoint(path: str):
    """-> (flat entries {key: np.ndarray}, schema dict). Raises
    CheckpointError with a clear message on format problems (never silently
    misparses; no pickle is ever executed)."""
    try:
        npz = np.load(path, allow_pickle=False)
    except Exception as e:
        raise CheckpointError(
            f"{path}: not a native checkpoint archive ({e})") from e
    if _SCHEMA_KEY not in npz.files:
        raise CheckpointError(
            f"{path}: missing {_SCHEMA_KEY} — not a {CKPT_FORMAT} file")
    schema = json.loads(bytes(npz[_SCHEMA_KEY]).decode())
    if schema.get("format") != CKPT_FORMAT:
        raise CheckpointError(f"{path}: format {schema.get('format')!r}, "
                              f"expected {CKPT_FORMAT!r}")
    if schema.get("version", 0) > CKPT_VERSION:
        raise CheckpointError(
            f"{path}: checkpoint version {schema['version']} is newer than "
            f"this build supports ({CKPT_VERSION})")
    bf16 = set(schema.get("bf16_keys", ()))
    entries = {}
    for k in npz.files:
        if k == _SCHEMA_KEY:
            continue
        arr = npz[k]
        if k in bf16:
            arr = arr.view(jnp.bfloat16)
        entries[k] = arr
    return entries, schema


def _restore_section(prefix: str, template, entries, path: str):
    """Fill a template pytree's leaves from flat entries; structure must
    match exactly (explicit error otherwise)."""
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for p, leaf in paths_and_leaves:
        key = f"{prefix}|{_keystr(p)}" if p else prefix
        if key not in entries:
            raise CheckpointError(
                f"{path}: missing entry {key!r} — checkpoint does not match "
                f"the current model/optimizer structure")
        new_leaves.append(jnp.asarray(entries[key]))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def unflatten_params(entries: Dict[str, np.ndarray],
                     prefix: str = "params") -> Dict[str, Any]:
    """Rebuild the nested params dict/list tree from flat path keys (params
    trees contain only dicts, lists, and arrays, so paths determine the
    structure; integer components become list indices)."""
    root: Dict[str, Any] = {}
    pre = prefix + "|"
    for key in sorted(k for k in entries if k.startswith(pre)):
        parts = key[len(pre):].split("/")
        node = root
        for i, part in enumerate(parts[:-1]):
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(entries[key])

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return listify(root)


def save_sections(path: str, sections: Dict[str, Any],
                  scalars: Optional[Dict[str, Any]] = None):
    """Generic native checkpoint: each named section is an arbitrary pytree
    flattened under ``<name>|<path>``; scalars go into the schema header.
    Used by the Stage-II trainer (params/bufs/opt) and any future state."""
    entries: Dict[str, np.ndarray] = {}
    bf16: list = []
    for name, tree in sections.items():
        _flatten_section(name, tree, entries, bf16)
    schema = {"format": CKPT_FORMAT, "version": CKPT_VERSION,
              "scalars": dict(scalars or {}), "bf16_keys": bf16}
    entries[_SCHEMA_KEY] = np.frombuffer(
        json.dumps(schema).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as fp:
        np.savez(fp, **entries)
    os.replace(tmp, path)


def restore_sections(path: str, templates: Optional[Dict[str, Any]] = None):
    """-> (sections dict, scalars dict). Sections named in ``templates`` are
    restored into that pytree structure (required for namedtuple-bearing
    trees like optimizer state); all other sections are rebuilt from their
    path keys as nested dict/list trees."""
    entries, schema = load_checkpoint(path)
    names = {k.split("|", 1)[0] for k in entries if "|" in k}
    out: Dict[str, Any] = {}
    for name in names:
        if templates and name in templates:
            out[name] = _restore_section(name, templates[name], entries, path)
        else:
            out[name] = unflatten_params(entries, prefix=name)
    for k, v in entries.items():
        if "|" not in k:
            out[k] = jnp.asarray(v)
    return out, schema.get("scalars", {})


def restore_train_state(path: str, template_state):
    """Restore a TrainState from a native checkpoint, using
    ``template_state`` (a freshly-initialized TrainState with the same
    config) for the optimizer-state structure. Returns (state, extras)."""
    entries, schema = load_checkpoint(path)
    from ..train.stage1 import TrainState
    params = _restore_section("params", template_state.params, entries, path)
    opt_state = _restore_section("opt", template_state.opt_state, entries, path)
    new_state = TrainState(
        step=jnp.asarray(schema["scalars"]["iter"], jnp.int32),
        params=params,
        opt_state=opt_state,
        sample_prob=jnp.asarray(entries["sample_prob"]),
    )
    reserved = {"sample_prob"}
    extras = {k: jnp.asarray(v) for k, v in entries.items()
              if "|" not in k and k not in reserved}
    extras.update({k: v for k, v in schema["scalars"].items() if k != "iter"})
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


def export_torch_state_dict(params: Dict[str, Any], spec) -> Dict[str, np.ndarray]:
    """Inverse of import_torch_state_dict: map our model param pytree onto
    the reference module names (numpy arrays, torch layout). Used by the
    golden-parity harness to run the actual reference code with identical
    weights (reference models.py:189-528, modules.py:43-462)."""
    sd: Dict[str, np.ndarray] = {}

    def lin(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["w"]).T.copy()
        sd[prefix + ".bias"] = np.asarray(p["b"]).copy()

    def trunk(prefix, layers):
        for i, p in enumerate(layers):
            lin(f"{prefix}.{i}", p)

    def nerf_mlp(prefix, p):
        trunk(prefix + ".layers_xyz", p["trunk"])
        lin(prefix + ".fc_feat", p["fc_feat"])
        lin(prefix + ".fc_alpha", p["fc_alpha"])
        trunk(prefix + ".layers_dir", p["dir"])
        lin(prefix + ".fc_rgb", p["fc_rgb"])
        trunk(prefix + ".layers_seg", p["seg"])
        lin(prefix + ".fc_seg", p["fc_seg"])

    if spec.use_warp:
        trunk("warp_field_mlp.layers_xyz", params["warp"]["trunk"])
        lin("warp_field_mlp.fc_final", params["warp"]["out"])
    if spec.use_ambient:
        trunk("hyper_sheep_mlp.layers_ambient", params["hyper"]["trunk"])
        lin("hyper_sheep_mlp.fc_ambient", params["hyper"]["out"])
    nerf_mlp("nerf_mlps.coarse", params["coarse"])
    if spec.fine is not None and "fine" in params:
        nerf_mlp("nerf_mlps.fine", params["fine"])
    if spec.use_spatial_embeddings:
        sd["spatial_embeddings"] = np.asarray(
            params["spatial_embeddings"])[None].copy()
    if spec.is_audio:
        a = params["audnet"]
        for slot, cp in zip((0, 2, 4, 6), a["convs"]):
            # ours (k, in, out) -> torch Conv1d (out, in, k)
            sd[f"audNet_head.encoder_conv.{slot}.weight"] = \
                np.asarray(cp["w"]).transpose(2, 1, 0).copy()
            sd[f"audNet_head.encoder_conv.{slot}.bias"] = \
                np.asarray(cp["b"]).copy()
        lin("audNet_head.encoder_fc1.0", a["fc1"])
        lin("audNet_head.encoder_fc1.2", a["fc2"])
    return sd


# ---------------------------------------------------------------------------
# Stage-II (SPADE Generator) torch importer
# ---------------------------------------------------------------------------

def _conv2d_t(sd, prefix):
    """torch Conv2d (O, I, kh, kw) -> ours HWIO."""
    return {"w": np.asarray(sd[prefix + ".weight"]).transpose(2, 3, 1, 0).copy(),
            "b": np.asarray(sd[prefix + ".bias"]).copy()}


def _convT2d_t(sd, prefix):
    """torch ConvTranspose2d (I, O, kh, kw) -> kernel layout for our
    lax.conv_transpose(..., transpose_kernel=True) HWIO path."""
    return {"w": np.asarray(sd[prefix + ".weight"]).transpose(2, 3, 1, 0).copy(),
            "b": np.asarray(sd[prefix + ".bias"]).copy()}


def _bn_t(sd, prefix):
    p = {"gamma": np.asarray(sd[prefix + ".weight"]).copy(),
         "beta": np.asarray(sd[prefix + ".bias"]).copy()}
    b = {"mean": np.asarray(sd[prefix + ".running_mean"]).copy(),
         "var": np.asarray(sd[prefix + ".running_var"]).copy()}
    return p, b


def _sn_conv_t(sd, prefix):
    """Spectral-normalized conv: torch stores weight_orig/weight_u/weight_v.
    Both u and v are imported so eval reproduces torch's sigma exactly
    (sigma = u . (W v) with the stored vectors)."""
    w_orig = np.asarray(sd[prefix + ".weight_orig"])   # (O, I, kh, kw)
    O, I, kh, kw = w_orig.shape
    p = {"w": w_orig.transpose(2, 3, 1, 0).copy(),
         "b": np.asarray(sd[prefix + ".bias"]).copy()}
    # torch flattens the fan-in axis as (I, kh, kw); ours is (kh, kw, I)
    v = np.asarray(sd[prefix + ".weight_v"]).reshape(I, kh, kw)
    b = {"u": np.asarray(sd[prefix + ".weight_u"]).copy(),
         "v": v.transpose(1, 2, 0).reshape(-1).copy()}
    return p, b


def _resblock_t(sd, prefix, downsample):
    p = {"initial": _conv2d_t(sd, prefix + ".initial.0")}
    p["bn1"], bn1 = _bn_t(sd, prefix + ".initial.1")
    bufs = {"bn1": bn1}
    if downsample:
        p["down_id"] = _conv2d_t(sd, prefix + ".downsample_layer")
        p["down_res"] = _conv2d_t(sd, prefix + ".residual_downsample")
    else:
        p["residual"] = _conv2d_t(sd, prefix + ".residual.0")
        p["bn2"], bn2 = _bn_t(sd, prefix + ".residual.1")
        bufs["bn2"] = bn2
    return p, bufs


def _spade_layer_t(sd, prefix):
    return {"shared": _conv2d_t(sd, prefix + ".mlp_shared.0"),
            "gamma": _conv2d_t(sd, prefix + ".conv_gamma"),
            "beta": _conv2d_t(sd, prefix + ".conv_beta")}


def _spade_block_t(sd, prefix, downsample, upsample):
    p = {"spade1": _spade_layer_t(sd, prefix + ".spade1"),
         "spade2": _spade_layer_t(sd, prefix + ".spade2"),
         "spade_s": _spade_layer_t(sd, prefix + ".spade_s")}
    bufs = {}
    p["conv1"], bufs["conv1"] = _sn_conv_t(sd, prefix + ".conv1")
    p["conv2"], bufs["conv2"] = _sn_conv_t(sd, prefix + ".conv2")
    p["conv_s"], bufs["conv_s"] = _sn_conv_t(sd, prefix + ".conv_s")
    if downsample:
        p["down_id"] = _conv2d_t(sd, prefix + ".residual_downsample")
    if upsample:
        p["up_id"] = _convT2d_t(sd, prefix + ".residual_upsample")
    return p, bufs


def import_torch_generator_state_dict(sd: Dict[str, Any], audio: bool):
    """Map a reference Stage-II Generator(_audio) state_dict onto our
    (params, bufs) pytrees (reference nerf-pytorch/nerf/_init_spade.py:
    IdEncoder :185-203, RefineNetwork :284-312, Generator :315-325,
    Generator_audio :359-373)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach")
              else np.asarray(v)) for k, v in sd.items()}
    params: Dict[str, Any] = {}
    bufs: Dict[str, Any] = {}

    idp: Dict[str, Any] = {"stem": _conv2d_t(sd, "idencoder.layer1.0")}
    idb: Dict[str, Any] = {}
    for name, layer, down in (("l2", "layer2", False),
                              ("l3", "layer3", True),
                              ("l4", "layer4", True)):
        idp[name], idb[name] = _resblock_t(sd, f"idencoder.{layer}", down)
    params["idenc"], bufs["idenc"] = idp, idb

    # RefineNetwork layer2..7 <-> blocks[0..5]; (down, up) per _REFINE_LAYERS
    flags = [(True, False), (True, False), (False, False),
             (False, True), (False, True), (False, True)]
    rp: Dict[str, Any] = {"stem": _conv2d_t(sd, "refine_network.layer1.0"),
                          "blocks": []}
    rb: Dict[str, Any] = {"blocks": []}
    for i, (down, up) in enumerate(flags):
        bp, bb = _spade_block_t(sd, f"refine_network.layer{i + 2}", down, up)
        rp["blocks"].append(bp)
        rb["blocks"].append(bb)
    rp["head"] = _conv2d_t(sd, "refine_network.layer8")
    params["refine"], bufs["refine"] = rp, rb

    if audio:
        params["audnet"] = {
            "convs": [_conv1d(sd, f"AudioNet.encoder_conv.{i}")
                      for i in (0, 2, 4, 6)],
            "fc1": _lin(sd, "AudioNet.encoder_fc1.0"),
            "fc2": _lin(sd, "AudioNet.encoder_fc1.2"),
        }
    to_j = lambda t: jax.tree.map(jnp.asarray, t)
    return to_j(params), to_j(bufs)


def import_torch_generator_checkpoint(path: str, audio: bool):
    """Load a reference Stage-II ``.ckpt`` (torch.save dict with
    model_state_dict, reference train_get_texture_photo_audio.py:235-253)."""
    import torch  # CPU-only deserialization
    ckpt = torch.load(path, map_location="cpu")
    params, bufs = import_torch_generator_state_dict(
        ckpt["model_state_dict"], audio)
    return {"params": params, "bufs": bufs, "iter": ckpt.get("iter")}


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
