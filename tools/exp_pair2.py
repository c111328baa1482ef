"""One-off: can the 64-wide hyper chain run 2 points/row on the MXU?

A (T,64)@(64,64) matmul lights only a 64x64 quadrant of the MXU and still
pays T row-passes — the 6-layer hyper chain therefore costs as much as the
128-wide warp chain. Packing TWO points per row turns each layer into a
(T/2,128)@blockdiag(W,W)(128,128) matmul: half the row-passes, 2x MXU
utilization. The open question is the cost of the (T,128)->(T/2,256)
relayout of the shared PE block inside a Mosaic kernel.

Variants (262144 points, bf16, 6 layers, tile 1024):
  narrow   : 6 x (1024,64)@(64,64)             (today's hyper chain)
  paired   : 6 x (512,128)@(128,128) blockdiag (input pre-paired)
  reshape  : same but input arrives (1024,128) and is re-laid out
             in-kernel via x.reshape / strided-slice concat
"""
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

P = 262144
TILE = 1024
L = 6
K = 30


def timeit(name, fn, *args):
    f = jax.jit(fn)
    np.asarray(jax.tree_util.tree_leaves(f(*args))[0])
    times = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(jax.tree_util.tree_leaves(f(*args))[0])
        times.append((time.time() - t0) / K * 1000)
    print(f"{name:10s} {min(times):7.3f} ms  ({P} pts, {L} layers)")


def scan_wrap(one):
    def prog(x, ws):
        def step(c, _):
            return one(c * 0.999, ws), ()
        c, _ = jax.lax.scan(step, x, jnp.arange(K))
        return c
    return prog


def narrow_call(x, ws):
    def kernel(x_ref, *refs):
        w_refs, o_ref = refs[:L], refs[L]
        h = x_ref[:][:, :64]
        for i in range(L):
            h = jnp.tanh(jnp.dot(h, w_refs[i][:],
                                 preferred_element_type=jnp.float32)
                         ).astype(jnp.bfloat16)
        o_ref[:] = jnp.pad(h, ((0, 0), (0, 64)))

    return pl.pallas_call(
        kernel,
        grid=(P // TILE,),
        in_specs=[pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((64, 64), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)] * L,
        out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 128), jnp.bfloat16),
    )(x, *ws)


def paired_call(x2, ws2):
    def kernel(x_ref, *refs):
        w_refs, o_ref = refs[:L], refs[L]
        h = x_ref[:]
        for i in range(L):
            h = jnp.tanh(jnp.dot(h, w_refs[i][:],
                                 preferred_element_type=jnp.float32)
                         ).astype(jnp.bfloat16)
        o_ref[:] = h

    return pl.pallas_call(
        kernel,
        grid=(P // TILE,),
        in_specs=[pl.BlockSpec((TILE // 2, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((128, 128), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)] * L,
        out_specs=pl.BlockSpec((TILE // 2, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P // 2, 128), jnp.bfloat16),
    )(x2, *ws2)


def reshape_call(x, ws2, mode):
    def kernel(x_ref, *refs):
        w_refs, o_ref = refs[:L], refs[L]
        xx = x_ref[:]
        if mode == "reshape":
            h = xx.reshape(TILE // 2, 256)[:, :128]
            h = jnp.concatenate([h[:, :64], xx.reshape(
                TILE // 2, 256)[:, 128:192]], axis=1)
        else:   # strided
            h = jnp.concatenate([xx[0::2, :64], xx[1::2, :64]], axis=1)
        for i in range(L):
            h = jnp.tanh(jnp.dot(h, w_refs[i][:],
                                 preferred_element_type=jnp.float32)
                         ).astype(jnp.bfloat16)
        o_ref[:] = jnp.pad(h, ((0, 0), (0, 0)))

    return pl.pallas_call(
        kernel,
        grid=(P // TILE,),
        in_specs=[pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((128, 128), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)] * L,
        out_specs=pl.BlockSpec((TILE // 2, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P // 2, 128), jnp.bfloat16),
    )(x, *ws2)


def scalar_scan(call, half_in):
    """Scan K kernel invocations, carrying only a scalar (the tunnel fetch
    must stay tiny); the kernel input is perturbed by the carry to defeat
    CSE."""
    def prog(x, ws):
        def step(c, _):
            out = call(x + c.astype(x.dtype), ws)
            return jnp.sum(out.astype(jnp.float32)) * 1e-12, ()
        c, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(K))
        return c
    return prog


def main():
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (P, 128)) * 0.1).astype(jnp.bfloat16)
    x2 = x[:P // 2]
    ws = [(jax.random.normal(jax.random.fold_in(key, i), (64, 64)) * 0.3
           ).astype(jnp.bfloat16) for i in range(L)]
    ws2 = [jnp.zeros((128, 128), jnp.bfloat16)
           .at[:64, :64].set(w).at[64:, 64:].set(w) for w in ws]

    timeit("narrow", scalar_scan(narrow_call, False), x, ws)
    timeit("paired", scalar_scan(paired_call, True), x2, ws2)
    for mode in ("reshape", "strided"):
        try:
            timeit(mode, scalar_scan(
                lambda xx, w, m=mode: reshape_call(xx, w, m), False), x, ws2)
        except Exception as e:
            print(f"{mode:10s} FAILED: {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
