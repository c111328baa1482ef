"""Experiments gating the round-4 single-kernel field design.

1. chain: bare matmul-chain kernel at the trunk's shapes — the achievable
   Mosaic MFU floor (data-dependent across scan iters; no loop hoisting).
2. dg: tpu.dynamic_gather (take_along_axis, idx.shape == operand.shape)
   cost on one (TILE, 128) block — the primitive for a chunked in-VMEM
   table gather.
3. chunk: full chunked gather: (32768, C) table VMEM-resident, 32 chunked
   sublane dynamic_gathers + select — the candidate in-kernel trilinear
   grid-sample gather.
4. xla_gather: today's XLA row-gather cost for reference.

Usage: python tools/exp_gather.py [exp ...]
"""
from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 30
P = 262144
TILE = 1024


def timeit(name, fn, *args):
    """fn(*args, eps) with eps a data-dependent scalar — defeats hoisting."""
    prog = jax.jit(lambda a: jax.lax.scan(
        lambda c, _: (fn(*a, jnp.tanh(c) * 1e-6), ()),
        jnp.zeros(()), jnp.arange(K))[0])
    out = prog(args)
    np.asarray(out)
    times = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(prog(args))
        times.append((time.time() - t0) / K * 1000)
    print(f"{name:28s} {min(times):7.3f} ms", flush=True)
    return min(times)


def make_chain(n_layers, H):
    def kernel(x_ref, w_ref, o_ref):
        h = x_ref[:]
        w = w_ref[:]
        for _ in range(n_layers):
            h = jnp.maximum(
                jnp.dot(h, w, preferred_element_type=jnp.float32),
                0.0).astype(jnp.bfloat16)
        o_ref[:] = jnp.sum(h.astype(jnp.float32), axis=-1, keepdims=True)

    def run(x, w, eps):
        out = pl.pallas_call(
            kernel,
            grid=(P // TILE,),
            in_specs=[pl.BlockSpec((TILE, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((H, H), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, 1), jnp.float32),
        )(x + eps.astype(x.dtype), w)
        return jnp.sum(out)
    return run


def make_dg(L, dt, n_gathers):
    """n_gathers sublane dynamic_gathers on one (TILE, L) block."""
    def kernel(x_ref, idx_ref, o_ref):
        h = x_ref[:]
        idx = idx_ref[:]
        acc = jnp.zeros((TILE, L), jnp.float32)
        for _ in range(n_gathers):
            g = jnp.take_along_axis(h, idx, axis=0)
            acc = acc + g.astype(jnp.float32)
            idx = (idx + 7) % TILE
        o_ref[:] = jnp.sum(acc, axis=-1, keepdims=True)

    def run(x, idx, eps):
        out = pl.pallas_call(
            kernel,
            grid=(P // TILE,),
            in_specs=[pl.BlockSpec((TILE, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((TILE, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, 1), jnp.float32),
        )(x + eps.astype(x.dtype), idx)
        return jnp.sum(out)
    return run


def make_chunk(N, L, dt):
    """Chunked big-table gather: out[i] = tab[row[i]] via N//TILE chunked
    sublane gathers + where-select. tab (N, L) VMEM-resident across tiles."""
    n_chunks = N // TILE

    def kernel(tab_ref, idx_ref, o_ref):
        idx = idx_ref[:]                       # (TILE, L) broadcast rows
        local = idx % TILE
        chunk = idx // TILE
        acc = jnp.zeros((TILE, L), jnp.float32)
        for c in range(n_chunks):
            g = jnp.take_along_axis(tab_ref[c], local, axis=0)
            acc = jnp.where(chunk == c, g.astype(jnp.float32), acc)
        o_ref[:] = jnp.sum(acc, axis=-1, keepdims=True)

    def run(tab, idx, eps):
        out = pl.pallas_call(
            kernel,
            grid=(P // TILE,),
            in_specs=[pl.BlockSpec((n_chunks, TILE, L), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((TILE, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(tab + eps.astype(tab.dtype), idx)
        return jnp.sum(out)
    return run


def main():
    exps = sys.argv[1:] or ["chain", "dg", "chunk", "xla_gather"]
    rng = np.random.RandomState(0)
    print("backend:", jax.default_backend(), flush=True)

    if "chain" in exps:
        for n_layers, H in [(8, 256), (16, 256), (8, 512)]:
            x = jnp.asarray(rng.randn(P, H), jnp.bfloat16)
            w = jnp.asarray(rng.randn(H, H) * 0.05, jnp.bfloat16)
            ms = timeit(f"chain {n_layers}x{H}", make_chain(n_layers, H), x, w)
            flops = 2 * P * H * H * n_layers
            print(f"    -> {flops / (ms * 1e-3) / 1e12:.1f} TF/s", flush=True)

    if "dg" in exps:
        for L, dt, ng in [(128, jnp.float32, 1), (128, jnp.float32, 8),
                          (128, jnp.bfloat16, 8), (256, jnp.float32, 8)]:
            x = jnp.asarray(rng.randn(P, L), dt)
            idx = jnp.asarray(rng.randint(0, TILE, (P, L)), jnp.int32)
            try:
                timeit(f"dg L={L} x{ng} {jnp.dtype(dt).name}",
                       make_dg(L, dt, ng), x, idx)
            except Exception as e:
                print(f"dg L={L} x{ng}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    if "chunk" in exps:
        for N, L, dt in [(32768, 128, jnp.float32), (32768, 128, jnp.bfloat16),
                         (32768, 256, jnp.bfloat16)]:
            tab = jnp.asarray(rng.randn(N // TILE, TILE, L), dt)
            idx = jnp.asarray(
                rng.randint(0, N, (P, 1)).repeat(L, 1), jnp.int32)
            try:
                timeit(f"chunk N={N} L={L} {jnp.dtype(dt).name}",
                       make_chunk(N, L, dt), tab, idx)
            except Exception as e:
                print(f"chunk N={N} L={L}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    if "xla_gather" in exps:
        for N, L, dt in [(35937, 256, jnp.bfloat16), (35937, 256, jnp.float32)]:
            tab = jnp.asarray(rng.randn(N, L), dt)
            idx = jnp.asarray(rng.randint(0, N, (P,)), jnp.int32)
            timeit(f"xla_gather N={N} L={L} {jnp.dtype(dt).name}",
                   lambda tab, idx, eps: jnp.sum(
                       jnp.take(tab + eps.astype(tab.dtype), idx, axis=0)
                       .astype(jnp.float32)),
                   tab, idx)


if __name__ == "__main__":
    main()
