"""Scaling benchmark harness: rays/s vs device count (SURVEY.md §5.8,
BASELINE target: >=85% scaling efficiency at 1 chip / 1 host / N hosts).

On hardware with one chip this measures the single-chip number; on a CPU
host it validates the sharded program at 1..8 virtual devices (numbers are
for shape only, not absolute throughput). Multi-host runs reuse the same
entry after jax.distributed.initialize (parallel/mesh.py).

Usage: python -m sahs_tpu.parallel.scaling [--rays 2048] [--devices 1 2 4 8]
"""
from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.nerface import ModelSpec
from ..train.stage1 import TrainSettings, init_train_state
from .mesh import make_mesh, make_sharded_train_step, replicate


def _batch(H=256, W=256, seed=0):
    rng = np.random.RandomState(seed)
    Rm = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    return {
        "image": jnp.asarray(rng.rand(H, W, 3).astype(np.float32)),
        "mask": jnp.asarray(np.eye(12, dtype=np.float32)[
            rng.randint(0, 12, size=(H, W))]),
        "pose": jnp.asarray(np.concatenate(
            [Rm, np.array([[0], [0], [0.6]], np.float32)], 1)),
        "intrinsics": jnp.asarray([300.0, 300.0, 0.5, 0.5]),
        "driving": jnp.asarray(rng.randn(16, 29).astype(np.float32)),
        "background": jnp.asarray(np.concatenate(
            [rng.rand(H, W, 3).astype(np.float32),
             np.ones((H, W, 1), np.float32),
             np.zeros((H, W, 11), np.float32)], -1)),
        "frame_idx": jnp.asarray(0, jnp.int32),
    }


def measure(num_devices: int, num_rays: int, iters: int = 30) -> float:
    cfg = Config()
    cfg.nerf.train.num_random_rays = num_rays
    spec = ModelSpec.from_config(cfg)
    ts = TrainSettings.from_config(cfg)
    mesh = make_mesh(num_devices=num_devices)
    batch = _batch()
    key = jax.random.PRNGKey(0)
    with mesh:
        state = replicate(mesh, init_train_state(key, spec, ts))
        step = make_sharded_train_step(spec, ts, mesh, donate=True)
        dev_batch = replicate(mesh, batch)
        state, m = step(state, dev_batch, key)
        _ = float(m["loss"])
        t0 = time.time()
        _ = float(m["loss"])
        rtt = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            key, k = jax.random.split(key)
            state, m = step(state, dev_batch, k)
        _ = float(m["loss"])
        dt = max(time.time() - t0 - rtt, 1e-9)
    return num_rays * iters / dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2048)
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args(argv)
    counts = args.devices or sorted({1, jax.device_count()})
    base = None
    for n in counts:
        rps = measure(n, args.rays, args.iters)
        if base is None:
            base = rps / n
        eff = rps / (n * base)
        print(f"devices={n}: {rps:,.0f} rays/s  scaling_eff={eff:.2%}")


if __name__ == "__main__":
    main()
