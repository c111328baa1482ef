"""In-graph ablation profiler for the Stage-I train step.

Each variant is K repetitions of a step fused into ONE device program via
lax.scan (per-launch dispatch and host RTT amortized away), timed with a
host-fetch barrier. Prints ms/step per variant.

Usage: python tools/profile_step.py [variant ...]
Variants: full fwd sel render_grad nogrid nodeform
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sahs_tpu.config import Config
from sahs_tpu.data.synthetic import SyntheticFaceDataset
from sahs_tpu.models.nerface import ModelSpec
from sahs_tpu.ops.rays import get_rays_at
from sahs_tpu.ops.sampling import (gather_rays, semantic_ray_probs,
                                   weighted_ray_indices)
from sahs_tpu.render.pipeline import render_rays
from sahs_tpu.train.stage1 import (TrainSettings, init_train_state,
                                   make_optimizer, train_step)

K = 20


def make_cfg(**runtime_overrides):
    cfg = Config()
    cfg.runtime.use_pallas = jax.default_backend() == "tpu"
    cfg.runtime.compute_dtype = "bfloat16"
    for k, v in runtime_overrides.items():
        setattr(cfg.runtime, k, v)
    return cfg


def get_batch(cfg):
    ds = SyntheticFaceDataset(kind="audio", num_frames=1, H=512, W=512,
                              near=cfg.dataset.near, far=cfg.dataset.far)
    item = ds[0]
    b = {k: jnp.asarray(v) for k, v in item.items() if k != "fname"}
    b["background"] = jnp.asarray(ds.background())
    return b


def time_scan(name, body, carry0, batch):
    """body(carry, key) -> carry; scanned K times inside one jit."""
    def prog(carry, batch, key0):
        def step(c, i):
            k = jax.random.fold_in(key0, i)
            return body(c, batch, k), ()
        carry, _ = jax.lax.scan(step, carry, jnp.arange(K))
        return carry

    fn = jax.jit(prog)
    out = fn(carry0, batch, jax.random.PRNGKey(0))
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)  # compile + run

    # RTT of a pure fetch
    t0 = time.time()
    np.asarray(leaf)
    rtt = time.time() - t0

    times = []
    for r in range(3):
        t0 = time.time()
        out = fn(carry0, batch, jax.random.PRNGKey(r))
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append((time.time() - t0 - rtt) / K * 1000)
    print(f"{name:14s} {min(times):8.2f} ms/step   (runs: "
          + ", ".join(f"{t:.2f}" for t in times) + f"; rtt {rtt*1e3:.1f} ms)")
    return min(times)


def main():
    variants = sys.argv[1:] or ["full", "fwd", "sel", "render_grad"]
    cfg = make_cfg()
    spec = ModelSpec.from_config(cfg)
    ts = TrainSettings.from_config(cfg)
    optimizer = make_optimizer(ts)
    batch = get_batch(cfg)
    state = init_train_state(jax.random.PRNGKey(0), spec, ts)

    H, W = 512, 512

    if "full" in variants:
        def body(st, b, k):
            st, _ = train_step(st, b, k, spec, ts, optimizer)
            return st
        time_scan("full", body, state, batch)

    if "full_fuse" in variants:
        cfg_f = make_cfg(fuse_composite=True)
        ts_f = TrainSettings.from_config(cfg_f)

        def body_f(st, b, k):
            st, _ = train_step(st, b, k, spec, ts_f, optimizer)
            return st
        time_scan("full_fuse", body_f, state, batch)

    if "full_unfused_grads" in variants:
        cfg_u = make_cfg(fused_grads=False)
        ts_u = TrainSettings.from_config(cfg_u)

        def body_u(st, b, k):
            st, _ = train_step(st, b, k, spec, ts_u, optimizer)
            return st
        time_scan("full_unfused_grads", body_u, state, batch)

    if "full_nofuse" in variants:
        cfg_nf = make_cfg(fuse_composite=False)
        ts_nf = TrainSettings.from_config(cfg_nf)

        def body_nf(st, b, k):
            st, _ = train_step(st, b, k, spec, ts_nf, optimizer)
            return st
        time_scan("full_nofuse", body_nf, state, batch)

    if "fwd" in variants:
        # forward-only: selection + render + loss, no grad/optimizer
        from sahs_tpu.train.stage1 import _stage1_losses, class_weights
        cw = class_weights(ts)

        def body(acc, b, k):
            k_sel, k_render = jax.random.split(k)
            probs = semantic_ray_probs(state.sample_prob, b["mask"])
            idx = weighted_ray_indices(k_sel, probs.reshape(-1),
                                       ts.num_random_rays)
            ro, rd = get_rays_at(idx, H, W, b["intrinsics"], b["pose"])
            target_s, mask_s = gather_rays(idx, b["image"], b["mask"])
            bg_rays = gather_rays(idx, b["background"])[0]
            res = render_rays(state.params["model"], spec, ts.render, ro, rd,
                              ts.near, ts.far, b["driving"], b["pose"],
                              key=k_render, background_prior=bg_rays)
            c_total, *_ = _stage1_losses(ts, res.rgb_coarse, mask_s, target_s, cw)
            f_total, *_ = _stage1_losses(ts, res.rgb_fine, mask_s, target_s, cw)
            return acc + c_total + f_total
        time_scan("fwd", body, jnp.zeros(()), batch)

    if "sel" in variants:
        # selection + gathers only
        def body(acc, b, k):
            probs = semantic_ray_probs(state.sample_prob, b["mask"])
            idx = weighted_ray_indices(k, probs.reshape(-1),
                                       ts.num_random_rays)
            ro, rd = get_rays_at(idx, H, W, b["intrinsics"], b["pose"])
            target_s, mask_s = gather_rays(idx, b["image"], b["mask"])
            bg_rays = gather_rays(idx, b["background"])[0]
            return (acc + jnp.sum(ro) + jnp.sum(rd) + jnp.sum(target_s)
                    + jnp.sum(mask_s) + jnp.sum(bg_rays))
        time_scan("sel", body, jnp.zeros(()), batch)

    if "render_grad" in variants:
        # fixed rays; grad of mean(rgb) through the full render; adam update.
        rng = np.random.RandomState(0)
        idx0 = jnp.asarray(rng.choice(H * W, ts.num_random_rays, replace=False))
        ro0, rd0 = get_rays_at(idx0, H, W, batch["intrinsics"], batch["pose"])
        bg0 = gather_rays(idx0, batch["background"])[0]

        def body(st, b, k):
            def loss_fn(params):
                res = render_rays(params["model"], spec, ts.render, ro0, rd0,
                                  ts.near, ts.far, b["driving"], b["pose"],
                                  key=k, background_prior=bg0)
                return jnp.mean(jnp.square(res.rgb_fine)) + \
                    jnp.mean(jnp.square(res.rgb_coarse))
            grads = jax.grad(loss_fn)(st.params)
            import optax
            updates, opt_state = optimizer.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            return st._replace(params=new_params, opt_state=opt_state)
        time_scan("render_grad", body, state, batch)

    if "nogrid" in variants:
        cfg2 = make_cfg()
        cfg2.models.coarse.use_spatial_embeddings = False
        spec2 = ModelSpec.from_config(cfg2)
        ts2 = TrainSettings.from_config(cfg2)
        opt2 = make_optimizer(ts2)
        state2 = init_train_state(jax.random.PRNGKey(0), spec2, ts2)

        def body(st, b, k):
            st, _ = train_step(st, b, k, spec2, ts2, opt2)
            return st
        time_scan("nogrid", body, state2, batch)

    if "nodeform" in variants:
        cfg3 = make_cfg()
        cfg3.models.warp.use_warp = False
        cfg3.models.hyper.use_ambient = False
        spec3 = ModelSpec.from_config(cfg3)
        ts3 = TrainSettings.from_config(cfg3)
        opt3 = make_optimizer(ts3)
        state3 = init_train_state(jax.random.PRNGKey(0), spec3, ts3)

        def body(st, b, k):
            st, _ = train_step(st, b, k, spec3, ts3, opt3)
            return st
        time_scan("nodeform", body, state3, batch)


if __name__ == "__main__":
    main()
