"""A/B experiment: fused fwd+grad train-level kernel vs the fwd-kernel +
recompute-bwd-kernel pair, at flagship fine-level shapes (2048 rays x 128
samples = 262144 points, grid-coupled, bf16).

Usage: python tools/exp_train_kernel.py [case ...]
Cases: old_level new_level pair_fwd pair_bwd
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
from sahs_tpu.models.nerface import (ModelSpec, build_pe_specs,
                                     init_model_params)

R = int(os.environ.get("EXP_R", "2048"))
S = int(os.environ.get("EXP_S", "128"))
P = R * S
K = 20


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
    print(f"{name:16s} {min(times):7.2f} ms")


def main():
    cases = sys.argv[1:] or ["old_level", "new_level", "pair_fwd",
                             "pair_bwd"]
    cfg = Config()
    spec = ModelSpec.from_config(cfg)
    params = init_model_params(jax.random.PRNGKey(0), spec)
    warp_pe, pts_pe, dir_pe = build_pe_specs(spec)
    rng = np.random.RandomState(0)
    cdt = "bfloat16"
    amb = spec.hyper.ambient_coord_dim
    packed = np.zeros((P, 128), np.float32)
    packed[:, :3] = rng.uniform(-0.4, 0.4, (P, 3))
    packed[:, 3:3 + amb] = rng.uniform(-0.3, 0.3, (P, amb))
    packed = jnp.asarray(packed)
    dirs = jnp.asarray(rng.randn(R, 3).astype(np.float32) * 0.05
                       + np.array([0, 0, -1.0], np.float32))
    z = jnp.asarray(np.sort(rng.uniform(0.48, 1.08, (R, S))
                            .astype(np.float32), axis=-1))
    bg = jnp.asarray(rng.rand(R, 15).astype(np.float32))
    noise = jnp.asarray(rng.randn(R, S).astype(np.float32) * 0.1)
    tgt = jnp.asarray(np.concatenate(
        [rng.rand(R, 3), np.eye(12, dtype=np.float32)[
            rng.randint(0, 12, size=R)]], -1).astype(np.float32))
    lw = jnp.asarray(np.full((R, 2), 1.0 / R, np.float32))
    grgb = jnp.asarray(rng.randn(R, 16).astype(np.float32) / R)
    gw = jnp.asarray(np.zeros((R, S), np.float32))
    grid = params["spatial_embeddings"]
    cond = jnp.asarray(rng.randn(36).astype(np.float32))
    nspec = spec.fine if S > 64 else spec.coarse
    lvl_params = params["fine"] if S > 64 else params["coarse"]

    if "old_level" in cases:
        from sahs_tpu.ops.pallas.field_grid import nerf_render_level_grid

        def lvl(p, g, pts, b, c):
            rgb, w = nerf_render_level_grid(
                p, g, nspec.num_layers, nspec.skip_connect_every, pts, dirs,
                S, z, b, noise, c, compute_dtype=cdt, pe_spec=pts_pe,
                dir_pe_spec=dir_pe)
            return jnp.vdot(rgb, grgb) + jnp.vdot(w, gw)

        f = jax.value_and_grad(lvl, argnums=(0, 1, 2, 3, 4))

        def run(eps):
            v, grads = f(lvl_params, grid, packed + eps, bg, cond)
            return v + sum(jnp.sum(jnp.abs(l))
                           for l in jax.tree_util.tree_leaves(grads))
        timeit("old_level", lambda eps: run(eps))

    if "new_level" in cases:
        from sahs_tpu.ops.pallas.field_grid import (_sample_major,
                                                    gather_corners)
        from sahs_tpu.ops.pallas.grid_bwd import grid_dg_slab
        from sahs_tpu.ops.pallas.level_train import level_train_apply

        def run2(eps):
            pts = packed + eps
            corners = gather_corners(grid, pts, cdt)
            rgb, w, gx, gse, gbg, grads, dcond = level_train_apply(
                lvl_params, nspec.num_layers, nspec.skip_connect_every,
                pts, dirs, corners, S, z, bg, noise, cond, tgt, lw, cdt,
                pts_pe, dir_pe, grid_dims=grid.shape[1:], bg_sup=0.0)
            dG = grid_dg_slab(grid.shape, _sample_major(pts[:, :3], R, S),
                              _sample_major(gse, R, S), cdt)
            return (jnp.vdot(rgb, grgb) + jnp.sum(jnp.abs(gx))
                    + jnp.sum(jnp.abs(dG)) + jnp.sum(jnp.abs(gbg))
                    + sum(jnp.sum(jnp.abs(l))
                          for l in jax.tree_util.tree_leaves(grads)))
        timeit("new_level", run2)

    if "new_level_noslab" in cases:
        from sahs_tpu.ops.pallas.field_grid import gather_corners
        from sahs_tpu.ops.pallas.level_train import level_train_apply

        def run2b(eps):
            pts = packed + eps
            corners = gather_corners(grid, pts, cdt)
            rgb, w, gx, gse, gbg, grads, dcond = level_train_apply(
                lvl_params, nspec.num_layers, nspec.skip_connect_every,
                pts, dirs, corners, S, z, bg, noise, cond, tgt, lw, cdt,
                pts_pe, dir_pe, grid_dims=grid.shape[1:], bg_sup=0.0)
            return (jnp.vdot(rgb, grgb) + jnp.sum(jnp.abs(gx))
                    + jnp.sum(jnp.abs(gse)) + jnp.sum(jnp.abs(gbg))
                    + sum(jnp.sum(jnp.abs(l))
                          for l in jax.tree_util.tree_leaves(grads)))
        timeit("new_level_noslab", run2b)

    if "pair_fwd" in cases or "pair_bwd" in cases:
        from sahs_tpu.ops.pallas.field_mlp import (_pair_specs,
                                                   deform_pair_forward,
                                                   deform_pair_vjp,
                                                   fold_conditioning,
                                                   fold_skip_conditioning)
        wp = (spec.warp.num_layers, spec.warp.hidden_size,
              spec.warp.skip_connect_every, 3, "tanh")
        hp = (spec.hyper.num_layers, spec.hyper.hidden_size,
              spec.hyper.skip_connect_every, amb, "linear")
        pe_dim = warp_pe.raw_out
        wspec, hspec = _pair_specs(wp, hp, pe_dim, cdt)
        cond_p = jnp.asarray(rng.randn(112).astype(np.float32))
        wt = fold_conditioning(params["warp"]["trunk"], cond_p, pe_dim)
        wt = fold_skip_conditioning(wp[1], wt, wp[2], cond_p, pe_dim)
        ht = fold_conditioning(params["hyper"]["trunk"], cond_p, pe_dim)
        ht = fold_skip_conditioning(hp[1], ht, hp[2], cond_p, pe_dim)
        for n in (131072, 262144, 393216):
            pts3 = jnp.asarray(rng.uniform(-0.4, 0.4, (n, 3))
                               .astype(np.float32))
            if "pair_fwd" in cases:
                timeit(f"pair_fwd_{n//1024}k",
                       lambda eps, p3=pts3: jnp.sum(deform_pair_forward(
                           wspec, hspec, p3 + eps, wt, params["warp"]["out"],
                           ht, params["hyper"]["out"], warp_pe, 3, amb)))
            if "pair_bwd" in cases and n > 131072:
                gxc = jnp.asarray(rng.randn(n, 128).astype(np.float32)
                                  / 1000)

                def runp(eps, p3=pts3, g=gxc):
                    _, wtg, wog, htg, hog = deform_pair_vjp(
                        wspec, hspec, p3 + eps, wt, params["warp"]["out"],
                        ht, params["hyper"]["out"], g, warp_pe, 3, amb,
                        need_gx=False)
                    return sum(jnp.sum(jnp.abs(l)) for l in
                               jax.tree_util.tree_leaves(
                                   (wtg, wog, htg, hog)))
                timeit(f"pair_bwd_{n//1024}k", runp)


if __name__ == "__main__":
    main()
