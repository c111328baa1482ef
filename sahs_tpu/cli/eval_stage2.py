"""Stage-II evaluation CLI.

Equivalent of reference nerf-pytorch/eval_get_texture_photo_{3dmm,audio}.py:
load checkpoint -> per-frame G(identity, render[, aud]) -> clip -> PNG.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from ..config import load_config
from ..data.audio import AudioDataset
from ..data.texture import identity_photo, spade_output_dataset
from ..evaluation import cast_to_image
from ..train.stage2 import Stage2Settings, make_infer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--checkpoint", type=str, required=True)
    ap.add_argument("--savedir", type=str, required=True)
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args(argv)

    import imageio.v2 as imageio

    cfg = load_config(args.config)
    audio_mode = cfg.dataset.type.lower() == "audio"
    out_val = spade_output_dataset("val", cfg)
    n = min(len(out_val), cfg.texture_refine.test_num or len(out_val))
    if args.limit:
        n = min(n, args.limit)
    auds = AudioDataset("val", cfg).get_all_auds() if audio_mode else None

    from ..utils import checkpoint as ckpt_lib
    if ckpt_lib.is_native_checkpoint(args.checkpoint):
        sections, _ = ckpt_lib.restore_sections(args.checkpoint)
        params, bufs = sections["params"], sections["bufs"]
    else:  # released reference torch Generator checkpoint
        imported = ckpt_lib.import_torch_generator_checkpoint(
            args.checkpoint, audio=audio_mode)
        params, bufs = imported["params"], imported["bufs"]
    params = jax.tree.map(jnp.asarray, params)
    bufs = jax.tree.map(jnp.asarray, bufs)

    s = Stage2Settings.from_config(cfg, steps_per_epoch=1)
    infer_fn = make_infer(s)
    i_src = jnp.asarray(identity_photo(cfg))[None]

    os.makedirs(args.savedir, exist_ok=True)
    for i in range(n):
        raw = jnp.asarray(out_val[i])[None]
        if audio_mode:
            fake = infer_fn(params, bufs, i_src, raw,
                            jnp.asarray(auds[min(i, len(auds) - 1)]))
            name = os.path.basename(out_val.paths[i])
        else:
            fake = infer_fn(params, bufs, i_src, raw)
            name = f"f_{i:04d}.png"
        imageio.imwrite(os.path.join(args.savedir, name),
                        cast_to_image(fake[0]))
    print(f"wrote {n} refined frames to {args.savedir}")


if __name__ == "__main__":
    main()
