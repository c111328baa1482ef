"""Micro-benchmarks of the hot ops at trainer point counts.

Each case is K in-graph repetitions via lax.scan (dispatch amortized);
prints ms per invocation. Usage: python tools/micro_bench.py [case ...]
Cases: grid_fwd grid_dg grid_dc grid_full warp_fwd warp_bwd hyper_bwd
       nerf_fwd nerf_bwd
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
from sahs_tpu.models.nerface import ModelSpec, init_model_params, make_field_fn
from sahs_tpu.ops.grid import grid_sample_3d

K = 30
P = 262144            # fine-level point count (2048 rays x 128 samples)


def timeit(name, fn, *args):
    # The scan carry feeds back as a tiny input perturbation (keeps the
    # iterations data-dependent so XLA can't collapse them); tanh-squash and
    # scale it so inputs stay in a realistic range across iterations.
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
    print(f"{name:12s} {min(times):7.2f} ms")


def main():
    cases = sys.argv[1:] or ["grid_fwd", "grid_dg", "grid_dc", "grid_full",
                             "warp_fwd", "warp_bwd", "hyper_bwd",
                             "nerf_fwd", "nerf_bwd", "field_fwd", "field_bwd"]
    cfg = Config()
    cfg.runtime.use_pallas = jax.default_backend() == "tpu"
    spec = ModelSpec.from_config(cfg)
    params = init_model_params(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (P, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.randn(P, 3).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    audio = jnp.asarray(rng.randn(16, 29).astype(np.float32))
    pose = jnp.asarray(np.concatenate(
        [np.linalg.qr(rng.randn(3, 3))[0],
         np.array([[0], [0], [0.6]])], 1).astype(np.float32))
    G = params.get("spatial_embeddings",
                   jnp.asarray(rng.randn(32, 32, 32, 32).astype(np.float32)))
    gcot = jnp.asarray(rng.randn(P, 32).astype(np.float32))

    if "grid_fwd" in cases:
        timeit("grid_fwd", lambda g, c, eps: jnp.sum(
            grid_sample_3d(g, c + eps, "bfloat16")), G, pts)
    if "grid_dg" in cases:
        f = jax.grad(lambda g, c: jnp.vdot(
            grid_sample_3d(g, c, "bfloat16"), gcot), argnums=0)
        timeit("grid_dg", lambda g, c, eps: jnp.sum(f(g + eps, c)), G, pts)
    if "grid_dc" in cases:
        f = jax.grad(lambda g, c: jnp.vdot(
            grid_sample_3d(g, c, "bfloat16"), gcot), argnums=1)
        timeit("grid_dc", lambda g, c, eps: jnp.sum(f(g, c + eps)), G, pts)
    if "grid_full" in cases:
        f = jax.grad(lambda g, c: jnp.vdot(
            grid_sample_3d(g, c, "bfloat16"), gcot), argnums=(0, 1))
        timeit("grid_full", lambda g, c, eps: sum(
            jnp.sum(x) for x in f(g + eps, c)), G, pts)
    if "grid_dg_slab" in cases:
        from sahs_tpu.ops.pallas.grid_bwd import grid_dg_slab
        # realistic geometry: one camera, rays over a small FOV, points at
        # 128 depths — reordered SAMPLE-major so tiles are depth-coherent
        R, S = P // 128, 128
        o = np.array([0.0, 0.0, 0.9], np.float32)
        d = np.stack([rng.uniform(-0.25, 0.25, R),
                      rng.uniform(-0.25, 0.25, R),
                      -np.ones(R)], -1).astype(np.float32)
        t = np.linspace(0.3, 1.7, S).astype(np.float32)
        pts_ray = o + d[:, None, :] * t[None, :, None]   # (R, S, 3)
        pts_sm = jnp.asarray(np.transpose(pts_ray, (1, 0, 2)).reshape(-1, 3))
        pts_rm = jnp.asarray(pts_ray.reshape(-1, 3))
        timeit("dg_slab smaj", lambda c, g, eps: jnp.sum(
            grid_dg_slab((32, 32, 32, 32), c + eps, g, "bfloat16")),
            pts_sm, gcot)
        timeit("dg_slab rmaj", lambda c, g, eps: jnp.sum(
            grid_dg_slab((32, 32, 32, 32), c + eps, g, "bfloat16")),
            pts_rm, gcot)
        timeit("dg_slab rand", lambda c, g, eps: jnp.sum(
            grid_dg_slab((32, 32, 32, 32), c + eps, g, "bfloat16")),
            pts, gcot)

    S = 128  # fine-level samples per ray
    dirs_ray = dirs[::S]

    def field(level, p, mp=None):
        ff = make_field_fn(mp if mp is not None else params, spec, audio,
                           pose, use_pallas=cfg.runtime.use_pallas)
        return ff(level, p, dirs_ray, S)

    vcot = jnp.asarray(rng.randn(P, 16).astype(np.float32))
    if "field_fwd" in cases:
        timeit("field_fwd", lambda p, eps: jnp.sum(
            field("fine", p + eps)), pts)
    if "field_bwd" in cases:
        f = jax.grad(lambda mp, p: jnp.vdot(field("fine", p, mp), vcot),
                     argnums=(0, 1))
        timeit("field_bwd", lambda p, eps: sum(
            jnp.sum(x) for x in jax.tree.leaves(f(params, p + eps))), pts)

    # Fully-fused level (pair -> gather -> NeRF+interp+composite) ablation:
    # ray-structured z-sorted points (the fused train path's geometry).
    if "level_fwd" in cases or "level_bwd" in cases:
        from sahs_tpu.models.nerface import make_render_fns
        R = P // S
        z = jnp.sort(jnp.asarray(
            rng.uniform(0.3, 1.7, (R, S)).astype(np.float32)), axis=-1)
        o = jnp.broadcast_to(
            jnp.asarray(np.array([0.0, 0.0, 0.9], np.float32)), (R, 3))
        d = jnp.asarray(np.stack(
            [rng.uniform(-0.25, 0.25, R), rng.uniform(-0.25, 0.25, R),
             -np.ones(R)], -1).astype(np.float32))
        bg = jnp.asarray(rng.rand(R, 15).astype(np.float32))
        rcot = jnp.asarray(rng.randn(R, 16).astype(np.float32))
        wcot = jnp.asarray(rng.randn(R, S).astype(np.float32))

        def level(mp, zz):
            fns = make_render_fns(mp, spec, audio, pose, use_pallas=True,
                                  compute_dtype="bfloat16")
            pts_l = (o[:, None, :] + d[:, None, :] * zz[..., None]
                     ).reshape(-1, 3)
            return fns.level_fn("fine", pts_l, d, S, zz, bg, None)

        if "level_fwd" in cases:
            timeit("level_fwd", lambda mp, eps: sum(
                jnp.sum(x) for x in level(mp, z + eps)), params)
        if "level_bwd" in cases:
            def _loss(mp, zz):
                rgb_map, weights = level(mp, zz)   # ONE evaluation
                return jnp.vdot(rgb_map, rcot) + jnp.vdot(weights, wcot)
            f = jax.grad(_loss)
            timeit("level_bwd", lambda mp, eps: sum(
                jnp.sum(x) for x in jax.tree.leaves(f(mp, z + eps))), params)

    from sahs_tpu.ops.pallas.field_mlp import (PESpec, _rup,
                                               deform_mlp_apply_fused)
    from sahs_tpu.ops.encoding import encoded_dim
    warp_pe = PESpec(groups=((0, 3, 10, True, True),), in_width=8,
                     out_width=_rup(encoded_dim(3, 10, True)))
    cond = jnp.asarray(rng.randn(112).astype(np.float32))

    def warp(p, x):
        return deform_mlp_apply_fused(p, 6, 128, 4, x, cond, 3,
                                      out_act="tanh", pe_spec=warp_pe)

    if "warp_fwd" in cases:
        timeit("warp_fwd", lambda p, eps: jnp.sum(warp(params["warp"],
                                                       p + eps)), pts)
    if "warp_bwd" in cases:
        wc = jnp.asarray(rng.randn(P, 3).astype(np.float32))
        f = jax.grad(lambda wp, p: jnp.vdot(warp(wp, p), wc), argnums=(0, 1))
        timeit("warp_bwd", lambda p, eps: sum(
            jnp.sum(x) for x in jax.tree.leaves(f(params["warp"], p + eps))),
            pts)
    if "pair_fwd" in cases or "pair_bwd" in cases:
        from sahs_tpu.ops.pallas.field_mlp import deform_pair_apply_fused
        wp = (6, 128, 4, 3, "tanh")
        hp = (6, 64, 4, 2, "linear")

        def pair(pw, ph, x):
            return deform_pair_apply_fused(pw, ph, wp, hp, x, cond,
                                           compute_dtype="bfloat16",
                                           pe_spec=warp_pe)
        if "pair_fwd" in cases:
            timeit("pair_fwd", lambda pw, ph, eps: jnp.sum(
                pair(pw, ph, pts + eps)), params["warp"], params["hyper"])
        if "pair_bwd" in cases:
            pc = jnp.asarray(rng.randn(P, 128).astype(np.float32))
            f = jax.grad(lambda pw, ph, p: jnp.vdot(pair(pw, ph, p), pc),
                         argnums=(0, 1, 2))
            timeit("pair_bwd", lambda pw, ph, eps: sum(
                jnp.sum(x) for x in jax.tree.leaves(
                    f(pw, ph, pts + eps))),
                params["warp"], params["hyper"])

    if "hyper_bwd" in cases:
        def hyper(p, x):
            return deform_mlp_apply_fused(p, 6, 64, 4, x, cond, 2,
                                          out_act="linear", pe_spec=warp_pe)
        hc = jnp.asarray(rng.randn(P, 2).astype(np.float32))
        f = jax.grad(lambda hp, p: jnp.vdot(hyper(hp, p), hc), argnums=(0, 1))
        timeit("hyper_bwd", lambda p, eps: sum(
            jnp.sum(x) for x in jax.tree.leaves(f(params["hyper"], p + eps))),
            pts)


if __name__ == "__main__":
    main()
