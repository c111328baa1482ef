"""One-off: cost of scattering coarse cotangents into sorted-fine slots.

The union-backward merge (train/fused.py) needs, per step:
  gx_tot  (R*Sf, 8)  f32  = gx_f  + scatter(gx_c  at inv[:, :Sc])
  gse_tot (R*Sf, 64) bf16 = gse_f + scatter(gse_c at inv[:, :Sc])
Candidates measured here (R=2048, Sc=64, Sf=128):
  onehot : addend = einsum(P_c, x_c) with P_c[r,i,j] = [perm[r,i]==j]
           (single-term sums -> exact values regardless of matmul dtype)
  gather : addend[i] = perm[i]<Sc ? x_c[perm[i]] : 0 (take_along_axis)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

R, Sc, Sf = 2048, 64, 128
K = 50


def time_fn(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time(); np.asarray(jax.tree_util.tree_leaves(f(*args))[0])
    rtt = 0.0
    times = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(jax.tree_util.tree_leaves(f(*args))[0])
        times.append((time.time() - t0 - rtt) / K * 1000)
    print(f"{name:24s} {min(times):7.3f} ms")


def scan(body):
    def prog(carry, *xs):
        def step(c, _):
            return body(c, *xs), ()
        c, _ = jax.lax.scan(step, carry, jnp.arange(K))
        return c
    return prog


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    z_cat = jax.random.uniform(ks[0], (R, Sf))
    gx_c = jax.random.normal(ks[1], (R * Sc, 8), jnp.float32)
    gse_c = jax.random.normal(ks[2], (R * Sc, 64)).astype(jnp.bfloat16)
    gx_f = jax.random.normal(ks[3], (R * Sf, 8), jnp.float32)
    gse_f = jax.random.normal(ks[4], (R * Sf, 64)).astype(jnp.bfloat16)

    def onehot(carry, z_cat, gx_c, gse_c, gx_f, gse_f):
        z = z_cat + carry
        perm = jnp.argsort(z, axis=-1)
        z_f = jnp.take_along_axis(z, perm, axis=-1)
        pc = (perm[:, :, None] == jnp.arange(Sc)[None, None, :])
        addx = jnp.einsum('ric,rcj->rij', pc.astype(jnp.float32),
                          gx_c.reshape(R, Sc, 8))
        gxt = gx_f + addx.reshape(R * Sf, 8)
        adds = jnp.einsum('ric,rcj->rij', pc.astype(jnp.bfloat16),
                          gse_c.reshape(R, Sc, 64))
        gst = gse_f + adds.reshape(R * Sf, 64)
        return carry + jnp.sum(z_f) + jnp.sum(gxt) + jnp.sum(gst).astype(
            jnp.float32) * 0

    def gather(carry, z_cat, gx_c, gse_c, gx_f, gse_f):
        z = z_cat + carry
        perm = jnp.argsort(z, axis=-1)
        z_f = jnp.take_along_axis(z, perm, axis=-1)
        is_c = (perm < Sc)[..., None]
        idx = jnp.minimum(perm, Sc - 1)[..., None]
        addx = jnp.take_along_axis(gx_c.reshape(R, Sc, 8), idx, axis=1)
        gxt = gx_f + jnp.where(is_c, addx, 0.0).reshape(R * Sf, 8)
        adds = jnp.take_along_axis(gse_c.reshape(R, Sc, 64), idx, axis=1)
        gst = gse_f + jnp.where(is_c, adds, 0).reshape(R * Sf, 64)
        return carry + jnp.sum(z_f) + jnp.sum(gxt) + jnp.sum(gst).astype(
            jnp.float32) * 0

    def sort_only(carry, z_cat, *_):
        z = z_cat + carry
        perm = jnp.argsort(z, axis=-1)
        z_f = jnp.take_along_axis(z, perm, axis=-1)
        return carry + jnp.sum(z_f)

    def sort_base(carry, z_cat, *_):
        z = z_cat + carry
        return carry + jnp.sum(jnp.sort(z, axis=-1))

    a = (z_cat, gx_c, gse_c, gx_f, gse_f)
    time_fn("sort (today)", scan(sort_base), jnp.zeros(()), *a)
    time_fn("argsort+take", scan(sort_only), jnp.zeros(()), *a)
    time_fn("scatter onehot-mm", scan(onehot), jnp.zeros(()), *a)
    time_fn("scatter gather", scan(gather), jnp.zeros(()), *a)

    # exactness of the one-hot path vs the gather path
    perm = jnp.argsort(z_cat, axis=-1)
    pc = (perm[:, :, None] == jnp.arange(Sc)[None, None, :])
    a1 = jnp.einsum('ric,rcj->rij', pc.astype(jnp.float32),
                    gx_c.reshape(R, Sc, 8))
    is_c = (perm < Sc)[..., None]
    idx = jnp.minimum(perm, Sc - 1)[..., None]
    a2 = jnp.where(is_c, jnp.take_along_axis(gx_c.reshape(R, Sc, 8), idx,
                                             axis=1), 0.0)
    print("onehot==gather exact:", bool(jnp.all(a1 == a2)))


if __name__ == "__main__":
    main()
