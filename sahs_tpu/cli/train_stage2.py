"""Stage-II training CLI (SPADE texture refinement).

Equivalent of reference nerf-pytorch/train_get_texture_photo{,_audio}.py:
  python -m sahs_tpu.cli.train_stage2 --config cfg.yml [--savedir out/]
The audio/3DMM variant is selected by cfg.dataset.type. Unlike the
reference's one-python-call-per-image loop (train_get_texture_photo_audio
.py:170-195), frames are stacked in chunks of cfg.texture_refine.scan_frames
and scanned inside one device program.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..config import load_config
from ..data.audio import AudioDataset
from ..data.texture import identity_photo, spade_gt_dataset, spade_output_dataset
from ..train.stage2 import (Stage2Settings, init_stage2_state, load_vgg_params,
                            make_infer, make_scan_step)
from ..utils.logging import MetricLogger


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--load-checkpoint", type=str, default="")
    ap.add_argument("--max-epochs", type=int, default=0)
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    audio_mode = cfg.dataset.type.lower() == "audio"

    gt_train = spade_gt_dataset("train", cfg)
    gt_val = spade_gt_dataset("val", cfg)
    out_train = spade_output_dataset("train", cfg)
    out_val = spade_output_dataset("val", cfg)
    n_train = min(len(gt_train), len(out_train), cfg.texture_refine.train_num
                  or len(out_train))
    n_val = min(len(gt_val), len(out_val), cfg.texture_refine.val_num
                or len(out_val))
    auds = None
    if audio_mode:
        auds = AudioDataset("train", cfg).get_all_auds()

    s = Stage2Settings.from_config(cfg, steps_per_epoch=n_train)
    key = jax.random.PRNGKey(cfg.experiment.randomseed)
    vgg_params = (load_vgg_params(cfg.texture_refine.vgg_weights, key)
                  if s.use_perceptual else None)
    state = init_stage2_state(key, s)

    i_src = jnp.asarray(identity_photo(cfg))[None]
    scan_fn = make_scan_step(s, vgg_params=vgg_params)
    infer_fn = make_infer(s)
    K = max(1, s.scan_frames)

    logdir = os.path.join(cfg.experiment.logdir, cfg.experiment.id + "_stage2")
    logger = MetricLogger(logdir)

    from ..utils import checkpoint as ckpt_lib
    if args.load_checkpoint and os.path.exists(args.load_checkpoint):
        templates = {"opt": state.opt_state}
        if s.use_gan:
            templates["d_opt"] = state.d_opt_state
        sections, scalars = ckpt_lib.restore_sections(
            args.load_checkpoint, templates=templates)
        state = state._replace(params=sections["params"],
                               bufs=sections["bufs"],
                               opt_state=sections["opt"],
                               step=jnp.asarray(scalars.get("step", 0),
                                                jnp.int32))
        if s.use_gan and "d_params" in sections:
            state = state._replace(d_params=sections["d_params"],
                                   d_bufs=sections["d_bufs"],
                                   d_opt_state=sections["d_opt"])
        print(f"resumed stage-2 from {args.load_checkpoint}")

    def stack_chunk(lo, hi):
        """Stack frames [lo, hi) (wrapping indices clipped) into scan inputs;
        the last partial chunk wraps to keep the shape static (the repeated
        frames' extra updates match the reference's shuffle-free epoch up to
        step order)."""
        idxs = [min(i, n_train - 1) for i in range(lo, hi)]
        raws = jnp.asarray(np.stack([np.asarray(out_train[i])[None]
                                     for i in idxs]))
        tgts = jnp.asarray(np.stack([np.asarray(gt_train[i])[None]
                                     for i in idxs]))
        if audio_mode:
            a = jnp.asarray(np.stack(
                [np.asarray(auds[min(i, len(auds) - 1)]) for i in idxs]))
            return raws, tgts, a
        return raws, tgts

    total_epochs = args.max_epochs or (s.epochs + s.epochs_decay)
    for epoch in range(total_epochs):
        for lo in range(0, n_train, K):
            chunk = stack_chunk(lo, lo + K)
            state, m = scan_fn(state, i_src, *chunk)
            if (lo // K) % max(1, cfg.texture_refine.log_iters // K) == 0:
                mm = jax.device_get(jax.tree_util.tree_map(lambda x: x[-1], m))
                print(f"[S2] epoch {epoch} it {lo} loss {mm['loss']:.6f} "
                      f"psnr {mm['psnr']:.2f}")
                logger.scalars(int(state.step),
                               {f"stage2/{k}": float(v)
                                for k, v in mm.items()})
        if epoch % 2 == 0:
            psnrs = []
            for i in range(min(n_val, 8)):
                raw = jnp.asarray(out_val[i])[None]
                tgt = jnp.asarray(gt_val[i])[None]
                if audio_mode:
                    fake = infer_fn(state.params, state.bufs, i_src, raw,
                                    jnp.asarray(auds[min(i, len(auds) - 1)]))
                else:
                    fake = infer_fn(state.params, state.bufs, i_src, raw)
                mse = float(jnp.mean(jnp.square(fake - tgt)))
                psnrs.append(-10 * np.log10(max(mse, 1e-10)))
            print(f"[S2 VAL] epoch {epoch} PSNR {np.mean(psnrs):.3f}")
            logger.scalars(int(state.step), {"stage2/val_psnr": float(np.mean(psnrs))})
            sections = {"params": state.params, "bufs": state.bufs,
                        "opt": state.opt_state}
            if s.use_gan:
                sections.update(d_params=state.d_params, d_bufs=state.d_bufs,
                                d_opt=state.d_opt_state)
            ckpt_lib.save_sections(
                os.path.join(logdir, f"checkpoint_ep{epoch:04d}.ckpt"),
                sections, scalars={"epoch": epoch, "step": int(state.step)})
    logger.close()


if __name__ == "__main__":
    main()
