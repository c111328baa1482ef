"""Stage-I training CLI.

Equivalent of reference nerf-pytorch/train_stage_rays_auto.py:
  python -m sahs_tpu.cli.train_stage1 --config cfg.yml [--load-checkpoint ckpt]

Differences by design (TPU-first):
  - the whole step (weighted ray selection -> render -> loss -> adam) is one
    jitted program; frames are staged on device up-front;
  - randomness is jax.random (seeded from cfg.experiment.randomseed);
  - checkpoints are the pickle-free npz schema (utils/checkpoint.py) and can
    also be bootstrapped from a reference torch checkpoint via
    --import-torch-checkpoint.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..config import load_config
from ..data import AudioDataset, NerfaceDataset, SyntheticFaceDataset
from ..models.nerface import ModelSpec
from ..train.stage1 import (TrainSettings, TrainState, init_train_state,
                            make_optimizer, make_train_step)
from ..utils import checkpoint as ckpt_lib
from ..utils.logging import MetricLogger


def build_dataset(cfg, mode, synthetic=False):
    if synthetic:
        return SyntheticFaceDataset(
            kind=cfg.dataset.type, num_frames=8,
            H=64, W=64, near=cfg.dataset.near, far=cfg.dataset.far)
    if cfg.dataset.type.lower() == "audio":
        return AudioDataset(mode, cfg,
                            testskip=cfg.dataset.testskip if mode != "train" else 1)
    return NerfaceDataset(mode, cfg)


def device_batch(item, background):
    b = {k: jnp.asarray(v) for k, v in item.items() if k != "fname"}
    if background is not None:
        b["background"] = background
    return b


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--load-checkpoint", type=str, default="")
    ap.add_argument("--import-torch-checkpoint", type=str, default="")
    ap.add_argument("--synthetic", action="store_true",
                    help="use the procedural fixture dataset")
    ap.add_argument("--max-iters", type=int, default=0,
                    help="override cfg.experiment.train_iters")
    ap.add_argument("--steps-per-launch", type=int, default=1,
                    help=">1 fuses K steps into one device program "
                         "(lax.scan), amortizing dispatch latency")
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    spec = ModelSpec.from_config(cfg)
    ts = TrainSettings.from_config(cfg)
    np.random.seed(cfg.experiment.randomseed)
    key = jax.random.PRNGKey(cfg.experiment.randomseed)

    train_data = build_dataset(cfg, "train", args.synthetic)
    val_data = build_dataset(cfg, "val", args.synthetic)
    print(f"dataset: {len(train_data)} train / {len(val_data)} val frames, "
          f"{train_data.H}x{train_data.W}")

    background = None
    if ts.train_background and not ts.fixed_background:
        # Trainable-background initialization: mean over the training frames,
        # optionally gaussian-blurred (reference train_stage_rays_auto.py:
        # 143-157; fixed_background=True overwrites this with the GT file in
        # the reference, mirrored by the elif below).
        from ..data.common import average_background
        acc = None
        for j in range(len(train_data)):
            img = np.asarray(train_data[j]["image"], np.float32)
            acc = img.copy() if acc is None else acc + img
        background = jnp.asarray(average_background(
            acc[None] / len(train_data), blur=cfg.runtime.blur_background))
    elif ts.fixed_background or ts.train_background:
        bg = train_data.background()
        background = jnp.asarray(bg) if bg is not None else None

    key, init_key = jax.random.split(key)
    state = init_train_state(init_key, spec, ts, background=background,
                             num_latent_frames=len(train_data))

    pose_c = jnp.asarray(train_data[0]["pose"])  # canonical pose = frame 0

    if args.import_torch_checkpoint:
        imported = ckpt_lib.import_torch_checkpoint(
            args.import_torch_checkpoint, spec)
        params = dict(state.params)
        params["model"] = imported["model"]
        state = state._replace(params=params)
        if "sample_prob" in imported:
            state = state._replace(sample_prob=imported["sample_prob"])
        if "background" in imported:
            background = imported["background"]
    if args.load_checkpoint and os.path.exists(args.load_checkpoint):
        state, extras = ckpt_lib.restore_train_state(args.load_checkpoint, state)
        if extras.get("background") is not None:
            background = jnp.asarray(extras["background"])
        if extras.get("pose_c") is not None:
            pose_c = jnp.asarray(extras["pose_c"])
        print(f"resumed from {args.load_checkpoint} at iter {int(state.step)}")

    logdir = os.path.join(cfg.experiment.logdir, cfg.experiment.id)
    logger = MetricLogger(logdir)
    with open(os.path.join(logdir, "config.yml"), "w") as fp:
        fp.write(cfg.dump())

    # Multi-host: each process loads only its frame shard (SURVEY §2.5.4);
    # the scan batch's step axis is sharded over hosts and every step's
    # frame is broadcast to all devices inside the scan by XLA.
    pc, pi = jax.process_count(), jax.process_index()
    K = max(1, args.steps_per_launch)
    frame_sharding = None
    sharded_frames = None
    if pc > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec
        from ..data.sharded import HostShardedFrames
        if K % pc:
            K = pc * max(1, K // pc)
            print(f"steps-per-launch rounded to {K} (multiple of "
                  f"process_count={pc})")
        sharded_frames = HostShardedFrames(train_data, pi, pc)
        mesh = Mesh(np.array(jax.devices()), axis_names=("frames",))
        frame_sharding = NamedSharding(mesh, PartitionSpec("frames"))
    if K > 1:
        from ..train.stage1 import make_multi_train_step, stack_batches
        multi_fn = make_multi_train_step(spec, ts,
                                         donate=cfg.runtime.donate_state)
    step_fn = make_train_step(spec, ts, donate=cfg.runtime.donate_state)
    n_iters = args.max_iters or cfg.experiment.train_iters
    start_iter = int(state.step)

    def crossed(prev, cur, every):
        return every > 0 and (prev // every) != (cur // every)

    t_report = time.time()
    rays_done = 0
    i = start_iter
    while i < n_iters:
        i_prev = i
        if K > 1 and i + K <= n_iters:
            if sharded_frames is not None:
                from ..data.sharded import (assemble_sharded_batches,
                                            blocked_frame_schedule)
                sched = blocked_frame_schedule(
                    cfg.experiment.randomseed + i, len(train_data), K, pc)
                batches = assemble_sharded_batches(
                    sharded_frames, sched,
                    background=(np.asarray(background)
                                if background is not None else None),
                    sharding=frame_sharding)
            else:
                frame_ids = np.random.choice(len(train_data), size=K)
                items = [train_data[j] for j in frame_ids]
                batches = stack_batches(items, background)
            key, step_key = jax.random.split(key)
            state, ms = multi_fn(state, batches, step_key)
            metrics = jax.tree.map(lambda x: x[-1], ms)
            rays_done += ts.num_random_rays * K
            i += K
        else:
            img_i = np.random.choice(len(train_data))
            batch = device_batch(train_data[img_i], background)
            key, step_key = jax.random.split(key)
            state, metrics = step_fn(state, batch, step_key)
            rays_done += ts.num_random_rays
            i += 1

        if crossed(i_prev, i, cfg.experiment.print_every) or i >= n_iters:
            m = jax.device_get(metrics)
            dt = time.time() - t_report
            rps = rays_done / max(dt, 1e-9)
            print(f"[TRAIN] Iter: {i} Loss: {m['loss']:.6f} "
                  f"PSNR_RGB: {m['psnr']:.3f} BG Loss: {m['bg_loss']:.6f} "
                  f"rays/s: {rps:,.0f}")
            logger.scalars(i, {"train/loss": m["loss"],
                               "train/psnr": m["psnr"],
                               "train/coarse_l2": m["coarse_l2"],
                               "train/fine_l2": m["fine_l2"],
                               "train/coarse_ce": m["coarse_ce"],
                               "train/fine_ce": m["fine_ce"],
                               "perf/rays_per_s": rps})
            t_report = time.time()
            rays_done = 0

        if crossed(i_prev, i, cfg.experiment.validate_every) and i > 0:
            bg_val = (state.params.get("background", None)
                      if ts.train_background else background)
            _validate(cfg, spec, state, val_data, bg_val, logger, i, key)

        if (crossed(i_prev, i, cfg.experiment.save_every) and i > 0) \
                or i >= n_iters:
            path = os.path.join(logdir, f"checkpoint{i:07d}.ckpt")
            # trainable background: the initial buffer was donated into the
            # train state on step 1 — save the live trained one instead
            bg_save = (state.params.get("background", None)
                       if ts.train_background else background)
            ckpt_lib.save_checkpoint(path, state, extras={
                "background": bg_save, "pose_c": pose_c,
                "height": train_data.H, "width": train_data.W,
                "focal_length": train_data.intrinsics,
            })
            print(f"saved {path}")
    logger.close()


def _validate(cfg, spec, state, val_data, background, logger, step, key):
    """Full-val-set validation pass with logged images, mirroring the
    reference's in-training loop (train_stage_rays_auto.py:577-694: full
    val set, TB scalars + rgb/seg/disp validation images). Frame count is
    capped by cfg.runtime.validate_frames (0 = whole set)."""
    from ..evaluation import make_eval_renderer
    from ..render.pipeline import RenderSettings
    from ..ops.losses import img2mse, mse2psnr
    from ..utils.seg import label2color

    settings = RenderSettings.from_config(cfg, "validation")
    renderer = make_eval_renderer(spec, settings, val_data.H, val_data.W,
                                  float(cfg.dataset.near), float(cfg.dataset.far))
    n = len(val_data)
    if cfg.runtime.validate_frames:
        n = min(n, cfg.runtime.validate_frames)
    n_img = min(n, cfg.runtime.validate_image_frames)
    psnrs, coarse_psnrs = [], []
    for i in range(n):
        item = val_data[i]
        key, sub = jax.random.split(key)
        out = renderer(state.params["model"], jnp.asarray(item["intrinsics"]),
                       jnp.asarray(item["pose"]), jnp.asarray(item["driving"]),
                       background, sub)
        rgb = out["rgb_fine"] if out["rgb_fine"] is not None else out["rgb_coarse"]
        mse = float(img2mse(rgb[..., :3], jnp.asarray(item["image"])))
        psnrs.append(mse2psnr(mse))
        coarse_psnrs.append(mse2psnr(float(img2mse(
            out["rgb_coarse"][..., :3], jnp.asarray(item["image"])))))
        if i < n_img:
            sfx = f"_{i}" if n_img > 1 else ""
            logger.image(step, f"val/rgb{sfx}", np.asarray(rgb[..., :3]))
            logger.image(step, f"val/rgb_coarse{sfx}",
                         np.asarray(out["rgb_coarse"][..., :3]))
            logger.image(step, f"val/target{sfx}", np.asarray(item["image"]))
            if rgb.shape[-1] > 3:
                logger.image(step, f"val/seg{sfx}",
                             label2color(np.asarray(rgb[..., 3:15])))
            disp = out["disp_fine"] if out["disp_fine"] is not None \
                else out["disp_coarse"]
            if disp is not None:
                d = np.asarray(disp)
                d = (d - d.min()) / max(d.max() - d.min(), 1e-8)
                logger.image(step, f"val/disparity{sfx}", d[..., None])
    logger.scalars(step, {"val/psnr": float(np.mean(psnrs)),
                          "val/psnr_coarse": float(np.mean(coarse_psnrs))})
    print(f"[VAL] Iter: {step} PSNR: {np.mean(psnrs):.3f} "
          f"({n} frames)")


if __name__ == "__main__":
    main()
