"""Device-trace budget of the Stage-I train step: runs the K-step scan
under jax.profiler.trace and aggregates per-kernel device time from the
captured xplane protobuf (tensorflow is only imported for the proto).

Usage: python tools/trace_step.py [variant]   (default: full)
Prints ms/step per fused-kernel name, largest first.
"""
from __future__ import annotations

import glob
import gzip
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def capture(fn, args, outdir="/tmp/sahs_trace"):
    os.system(f"rm -rf {outdir}")
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])   # compile
    with jax.profiler.trace(outdir):
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    return outdir


def device_op_totals(outdir):
    """-> {op_name: total_us} from the chrome-trace dump (device pids)."""
    import json
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace.json.gz under {outdir}"
    totals = defaultdict(float)
    for p in paths:
        with gzip.open(p, "rt") as fh:
            data = json.load(fh)
        evs = data.get("traceEvents", data if isinstance(data, list) else [])
        # device pids: process_name metadata containing TPU/device
        dev_pids = set()
        for ev in evs:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                nm = ev.get("args", {}).get("name", "").lower()
                if ("tpu" in nm or "device" in nm or "axon" in nm) \
                        and "host" not in nm:
                    dev_pids.add(ev.get("pid"))
        for ev in evs:
            if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
                continue
            totals[ev.get("name", "?")] += float(ev.get("dur", 0.0))
    return dict(totals)


def main():
    from profile_step import make_cfg, get_batch, K
    from sahs_tpu.models.nerface import ModelSpec
    from sahs_tpu.train.stage1 import (TrainSettings, init_train_state,
                                       make_optimizer, train_step)

    cfg = make_cfg()
    spec = ModelSpec.from_config(cfg)
    ts = TrainSettings.from_config(cfg)
    optimizer = make_optimizer(ts)
    batch = get_batch(cfg)
    state = init_train_state(jax.random.PRNGKey(0), spec, ts)

    def prog(carry, batch, key0):
        def step(c, i):
            k = jax.random.fold_in(key0, i)
            c2, _ = train_step(c, batch, k, spec, ts, optimizer)
            return c2, ()
        carry, _ = jax.lax.scan(step, carry, jnp.arange(K))
        return carry

    outdir = capture(prog, (state, batch, jax.random.PRNGKey(0)))
    totals = device_op_totals(outdir)
    items = sorted(totals.items(), key=lambda kv: -kv[1])
    tot = sum(totals.values())
    print(f"total device time: {tot / K / 1000:.2f} ms/step over {K} steps")
    for nm, us in items[:40]:
        if us / K < 5:       # < 5 us/step: noise
            break
        print(f"{us / K / 1000:8.3f} ms/step  {nm[:110]}")


if __name__ == "__main__":
    main()
