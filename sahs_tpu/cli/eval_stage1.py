"""Stage-I evaluation CLI.

Equivalent of reference nerf-pytorch/eval_stage_rays.py:
  python -m sahs_tpu.cli.eval_stage1 --config cfg.yml --checkpoint ckpt \
      --savedir out/ [--save-disparity-image] [--save-error-image]
Accepts both native checkpoints and reference torch checkpoints
(auto-detected by extension / content).
"""
from __future__ import annotations

import argparse
import os

import jax.numpy as jnp

from ..config import load_config
from ..evaluation import evaluate_dataset
from ..models.nerface import ModelSpec
from ..utils import checkpoint as ckpt_lib
from .train_stage1 import build_dataset


def load_any_checkpoint(path: str, spec):
    """Native checkpoints are detected by their schema header; anything else
    is handed to the torch importer. A corrupt native file raises a clear
    CheckpointError instead of silently falling through."""
    if ckpt_lib.is_native_checkpoint(path):
        entries, schema = ckpt_lib.load_checkpoint(path)
        params = ckpt_lib.unflatten_params(entries)
        extras = {k: jnp.asarray(v) for k, v in entries.items()
                  if "|" not in k}
        # trained-alongside param groups (train/stage1.py TrainState.params)
        for k in ("background", "latent_codes"):
            if k in params and k not in extras:
                extras[k] = jnp.asarray(params[k])
        extras.update(schema.get("scalars", {}))
        return params["model"], extras
    imported = ckpt_lib.import_torch_checkpoint(path, spec)
    return imported["model"], imported


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--checkpoint", type=str, required=True)
    ap.add_argument("--savedir", type=str, required=True)
    ap.add_argument("--save-disparity-image", action="store_true")
    ap.add_argument("--save-error-image", action="store_true")
    ap.add_argument("--save-mesh", action="store_true")
    ap.add_argument("--no-normals", action="store_true")
    ap.add_argument("--deterministic", action="store_true",
                    help="perturb=False, noise=0 (parity mode)")
    ap.add_argument("--frontalize", action="store_true",
                    help="render every frame from frame 0's pose "
                         "(reference eval_stage_rays.py:376,415-416)")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--limit", type=int, default=1500)
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    spec = ModelSpec.from_config(cfg)
    model_params, extras = load_any_checkpoint(args.checkpoint, spec)

    val_data = build_dataset(cfg, "val", args.synthetic)
    background = extras.get("background")
    if background is None:
        bg = val_data.background()
        background = jnp.asarray(bg) if bg is not None else None

    # Latent codes restored from the checkpoint are threaded into every
    # render via the dataset's index map (reference
    # eval_stage_rays.py:316-323,450-452).
    latent_codes = extras.get("latent_codes")
    index_map = None
    if latent_codes is not None:
        map_path = os.path.join(str(cfg.dataset.basedir), "index_map.npy")
        if os.path.exists(map_path):
            import numpy as np
            index_map = np.load(map_path)

    os.makedirs(args.savedir, exist_ok=True)
    evaluate_dataset(cfg, spec, model_params, val_data, args.savedir,
                     background=background,
                     save_disparity=args.save_disparity_image,
                     save_error=args.save_error_image,
                     save_mesh=args.save_mesh,
                     save_normals=not args.no_normals,
                     limit=args.limit,
                     deterministic=args.deterministic,
                     latent_codes=latent_codes,
                     latent_index_map=index_map,
                     frontalize=args.frontalize or None)


if __name__ == "__main__":
    main()
