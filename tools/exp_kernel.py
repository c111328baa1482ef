"""One-off kernel experiments to bisect where Pallas time goes.

Usage: python tools/exp_kernel.py [exp ...]
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
from sahs_tpu.models.nerface import ModelSpec, init_model_params
from sahs_tpu.ops.encoding import encoded_dim, get_embedding_function
from sahs_tpu.ops.pallas.field_mlp import (PESpec, _rup,
                                           deform_mlp_apply_fused,
                                           nerf_mlp_apply_fused)

K = 30
P = 262144


def timeit(name, fn, *args):
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
    print(f"{name:24s} {min(times):7.2f} ms")


def main():
    exps = sys.argv[1:] or ["warp_pe_in", "warp_pe_out", "warp_xla",
                            "nerf_pe_in", "nerf_xla"]
    cfg = Config()
    cfg.runtime.use_pallas = True
    spec = ModelSpec.from_config(cfg)
    params = init_model_params(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (P, 3)).astype(np.float32))
    cond = jnp.asarray(rng.randn(112).astype(np.float32))
    warp_pe = PESpec(groups=((0, 3, 10, True, True),), in_width=8,
                     out_width=_rup(encoded_dim(3, 10, True)))
    pe_fn = get_embedding_function(10, True, True)
    pe_x = pe_fn(pts)  # (P, 63)

    if "warp_pe_in" in exps:
        timeit("warp in-kernel PE", lambda p, eps: jnp.sum(
            deform_mlp_apply_fused(p, 6, 128, 4, pts + eps, cond, 3,
                                   out_act="tanh", pe_spec=warp_pe)),
               params["warp"])
    if "warp_pe_out" in exps:
        timeit("warp precomputed PE", lambda p, eps: jnp.sum(
            deform_mlp_apply_fused(p, 6, 128, 4, pe_x + eps, cond, 3,
                                   out_act="tanh", pe_spec=None)),
               params["warp"])
    if "warp_xla" in exps:
        from sahs_tpu.models.fields import warp_field_apply

        def xla_warp(p, eps):
            pe = pe_fn(pts + eps)
            return jnp.sum(warp_field_apply(p, spec.warp, pe, cond[:76],
                                            cond[76:]))
        timeit("warp pure-XLA f32", xla_warp, params["warp"])

    dirs = jnp.asarray(rng.randn(P, 3).astype(np.float32))
    se = jnp.asarray(rng.randn(P, 32).astype(np.float32))
    amb = jnp.asarray(rng.randn(P, 2).astype(np.float32))
    pts5 = jnp.concatenate([pts, amb], axis=-1)
    extra_raw = jnp.concatenate([dirs, se], axis=-1)
    pts_pe = PESpec(groups=((0, 3, 10, True, True), (3, 2, 4, True, True)),
                    in_width=128, out_width=_rup(63 + 18))
    extra_pe = PESpec(groups=((0, 3, 4, True, True), (3, 32, 0, True, True)),
                      in_width=128, out_width=_rup(27 + 32))

    if "nerf_pe_in" in exps:
        timeit("nerf in-kernel PE", lambda p, eps: jnp.sum(
            nerf_mlp_apply_fused(p, 8, 4, pts5 + eps, extra_raw, cond[76:],
                                 pe_spec=pts_pe, extra_pe_spec=extra_pe)),
               params["fine"])
    if "nerf_bwd" in exps:
        vcot = jnp.asarray(rng.randn(P, 16).astype(np.float32))
        f = jax.grad(lambda p, eps: jnp.vdot(
            nerf_mlp_apply_fused(p, 8, 4, pts5 + eps, extra_raw, cond[76:],
                                 pe_spec=pts_pe, extra_pe_spec=extra_pe),
            vcot), argnums=(0,))
        timeit("nerf fwd+bwd", lambda p, eps: sum(
            jnp.sum(x) for x in jax.tree.leaves(f(p, eps))), params["fine"])
    if "rayd_fwd" in exps or "rayd_bwd" in exps:
        from sahs_tpu.ops.pallas.field_mlp import nerf_mlp_apply_rayd
        S = 128
        dirs_ray = dirs[::S]
        dir_pe = PESpec(groups=((0, 3, 4, True, True),), in_width=8,
                        out_width=_rup(27))
        pts_pe8 = PESpec(groups=((0, 3, 10, True, True), (3, 2, 4, True, True)),
                         in_width=8, out_width=_rup(63 + 18))

        def rayd(p, x):
            return nerf_mlp_apply_rayd(p, 8, 3, x, dirs_ray, se, S, cond[76:],
                                       pe_spec=pts_pe8, dir_pe_spec=dir_pe)
        if "rayd_fwd" in exps:
            timeit("rayd fwd", lambda p, eps: jnp.sum(rayd(p, pts5 + eps)),
                   params["fine"])
        if "rayd_bwd" in exps:
            vcot = jnp.asarray(rng.randn(P, 16).astype(np.float32))
            f = jax.grad(lambda p, x: jnp.vdot(rayd(p, x), vcot),
                         argnums=(0, 1))
            timeit("rayd fwd+bwd", lambda p, eps: sum(
                jnp.sum(x) for x in jax.tree.leaves(f(p, pts5 + eps))),
                params["fine"])

    if "warp_bwd" in exps:
        wc = jnp.asarray(rng.randn(P, 3).astype(np.float32))
        f = jax.grad(lambda p, eps: jnp.vdot(
            deform_mlp_apply_fused(p, 6, 128, 4, pts + eps, cond, 3,
                                   out_act="tanh", pe_spec=warp_pe), wc),
            argnums=(0,))
        timeit("warp fwd+bwd", lambda p, eps: sum(
            jnp.sum(x) for x in jax.tree.leaves(f(p, eps))), params["warp"])


if __name__ == "__main__":
    main()
