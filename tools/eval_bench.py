"""Eval-side throughput: full-frame render timing (VERDICT r2 #6).

The reference prints per-image wall time during eval
(eval_stage_rays.py:493,554) but records nothing. This measures our
jit-compiled full-image renderer (512x512, 64+64 samples, chunked) on the
current backend and prints seconds/frame + rays/s.

Usage: python tools/eval_bench.py [n_frames]
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
from sahs_tpu.evaluation import make_eval_renderer
from sahs_tpu.models.nerface import ModelSpec, init_model_params
from sahs_tpu.render.pipeline import RenderSettings

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
H = W = 512


def main():
    cfg = Config()
    cfg.runtime.use_pallas = jax.default_backend() == "tpu"
    cfg.runtime.compute_dtype = "bfloat16"
    spec = ModelSpec.from_config(cfg)
    params = init_model_params(jax.random.PRNGKey(0), spec)
    settings = RenderSettings.from_config(cfg, "validation")

    ds = SyntheticFaceDataset(kind="audio", num_frames=N, H=H, W=W,
                              near=cfg.dataset.near, far=cfg.dataset.far)
    bg = jnp.asarray(ds.background())
    chunk = int(os.environ.get("SAHS_EVAL_CHUNK", "0")) or None
    # mirror make_eval_renderer's TPU clamp for the printed label
    eff_chunk = chunk or (min(settings.chunksize, 32768)
                          if (settings.use_pallas
                              and jax.default_backend() == "tpu")
                          else settings.chunksize)
    renderer = make_eval_renderer(spec, settings, H, W,
                                  float(cfg.dataset.near),
                                  float(cfg.dataset.far),
                                  chunksize=chunk)
    key = jax.random.PRNGKey(0)

    def run(i, k):
        item = ds[i % N]
        out = renderer(params, jnp.asarray(item["intrinsics"]),
                       jnp.asarray(item["pose"]),
                       jnp.asarray(item["driving"]), bg, k)
        return float(np.asarray(out["rgb_fine"]).mean())  # fetch barrier

    key, k = jax.random.split(key)
    run(0, k)                                   # compile
    t0 = time.time()
    run(0, k)
    rtt_plus_one = time.time() - t0             # includes one real render

    times = []
    for i in range(N):
        key, k = jax.random.split(key)
        t0 = time.time()
        run(i, k)
        times.append(time.time() - t0)
    per_frame = min(times)
    rays = H * W
    print(f"frames: {N}  s/frame (best): {per_frame:.3f}  "
          f"mean: {sum(times)/len(times):.3f}  "
          f"eval rays/s: {rays / per_frame:,.0f}  "
          f"({settings.num_coarse}+{settings.num_fine} samples, "
          f"chunks of {eff_chunk})")


if __name__ == "__main__":
    main()
