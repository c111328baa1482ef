"""Component-level decomposition of the CURRENT render path (r3 HEAD).

Times each piece of render_rays at trainer shapes (2048 rays, 64+64):
  front    front_half (pair kernel + grid sample) on 131k pts
  nerf_c   rayd NeRF kernel, coarse (131k pts, S=64)
  nerf_f   rayd NeRF kernel, fine   (262k pts, S=128)
  comp     volume_render_radiance_field on (2048,128,16)
  pdf      sample_pdf (importance draw)
  render   full render_rays fwd
Each with _g suffix = fwd + full grads (params and/or inputs).

Usage: python tools/profile_render.py [case ...]
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
from sahs_tpu.models import nerface
from sahs_tpu.models.nerface import ModelSpec, init_model_params
from sahs_tpu.ops.rendering import volume_render_radiance_field
from sahs_tpu.ops.sampling import sample_pdf
from sahs_tpu.render.pipeline import RenderSettings, render_rays

K = 20
R = 2048
SC, SF = 64, 128


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
    print(f"{name:12s} {min(times):7.2f} ms")


def tsum(t):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(t))


def main():
    cases = sys.argv[1:] or ["front", "front_g", "nerf_c", "nerf_c_g",
                             "nerf_f", "nerf_f_g", "comp", "comp_g",
                             "pdf", "render", "render_g"]
    cfg = Config()
    cfg.runtime.use_pallas = jax.default_backend() == "tpu"
    cfg.runtime.compute_dtype = "bfloat16"
    spec = ModelSpec.from_config(cfg)
    params = init_model_params(jax.random.PRNGKey(0), spec)
    settings = RenderSettings.from_config(cfg, "train")

    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(16, 29), jnp.float32)
    pose = jnp.asarray(np.eye(3, 4), jnp.float32)
    ro = jnp.asarray(rng.randn(R, 3) * 0.1, jnp.float32)
    rd = jnp.asarray(rng.randn(R, 3), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    bg = jnp.asarray(rng.rand(R, 15), jnp.float32)
    z128 = jnp.broadcast_to(jnp.linspace(0.2, 0.8, SF), (R, SF))
    pts_c = jnp.asarray(rng.randn(R * SC, 3) * 0.3, jnp.float32)
    pts_f = jnp.asarray(rng.randn(R * SF, 3) * 0.3, jnp.float32)
    raw = jnp.asarray(rng.randn(R, SF, 16) * 0.5, jnp.float32)

    def fns(p):
        return nerface.make_render_fns(p, spec, audio, pose,
                                       use_pallas=settings.use_pallas,
                                       compute_dtype=settings.compute_dtype)

    if "pair" in cases or "pair_g" in cases:
        from sahs_tpu.ops.pallas.field_mlp import deform_pair_apply_fused
        from sahs_tpu.ops.encoding import encoded_dim
        from sahs_tpu.ops.pallas.field_mlp import PESpec, _rup
        warp_pe = PESpec(
            groups=((0, 3, spec.warp_num_encoding_fn_xyz, True, True),),
            in_width=8,
            out_width=_rup(encoded_dim(3, spec.warp_num_encoding_fn_xyz, True)))
        cond = jnp.asarray(rng.randn(70), jnp.float32)

        def pair(p, x, eps):
            return tsum(deform_pair_apply_fused(
                p["warp"], p["hyper"],
                (spec.warp.num_layers, spec.warp.hidden_size,
                 spec.warp.skip_connect_every, 3, "tanh"),
                (spec.hyper.num_layers, spec.hyper.hidden_size,
                 spec.hyper.skip_connect_every,
                 spec.hyper.ambient_coord_dim, "linear"),
                x + eps, cond, compute_dtype=settings.compute_dtype,
                pe_spec=warp_pe))
        if "pair" in cases:
            timeit("pair", pair, params, pts_c)
        if "pair_g" in cases:
            timeit("pair_g",
                   lambda p, x, eps: tsum(jax.grad(pair, argnums=(0, 1))(p, x + eps, 0.0)),
                   params, pts_c)

    if "grid" in cases or "grid_g" in cases:
        from sahs_tpu.ops.grid import grid_sample_3d
        coords = jnp.asarray(rng.rand(R * SC, 3) * 1.6 - 0.8, jnp.float32)

        def gs(g, c, eps):
            return tsum(grid_sample_3d(g, c + eps,
                                       compute_dtype=settings.compute_dtype))
        if "grid" in cases:
            timeit("grid", gs, params["spatial_embeddings"], coords)
        if "grid_g" in cases:
            timeit("grid_g",
                   lambda g, c, eps: tsum(jax.grad(gs, argnums=(0, 1))(g, c + eps, 0.0)),
                   params["spatial_embeddings"], coords)

    if "front" in cases:
        timeit("front", lambda p, x, eps: tsum(fns(p).front_fn(x + eps)),
               params, pts_c)
    if "front_g" in cases:
        def f(p, x, eps):
            return tsum(fns(p).front_fn(x + eps))
        timeit("front_g", lambda p, x, eps: tsum(jax.grad(f, argnums=(0, 1))(p, x + eps, 0.0)),
               params, pts_c)

    def nerf_level(p, x, eps, S):
        r = fns(p)
        fh = r.front_fn(x + eps)
        return r.nerf_fn("fine" if S == SF else "coarse", fh, rd, S)

    if "nerf_c" in cases:
        def f(p, x, eps):
            r = fns(p)
            fh = jax.lax.stop_gradient(r.front_fn(x))
            return tsum(r.nerf_fn("coarse", fh, rd, SC)) + eps
        timeit("nerf_c", f, params, pts_c)
    if "nerf_c_g" in cases:
        def f(p, x, eps):
            r = fns(p)
            fh = jax.lax.stop_gradient(r.front_fn(x))
            fh = (fh[0] + eps, None if fh[1] is None else fh[1] + eps)
            return tsum(r.nerf_fn("coarse", fh, rd, SC))
        timeit("nerf_c_g", lambda p, x, eps: tsum(jax.grad(f, argnums=(0, 2))(p, x, eps)),
               params, pts_c)
    if "nerf_f" in cases:
        def f(p, x, eps):
            r = fns(p)
            fh = jax.lax.stop_gradient(r.front_fn(x))
            return tsum(r.nerf_fn("fine", fh, rd, SF)) + eps
        timeit("nerf_f", f, params, pts_f)
    if "nerf_f_g" in cases:
        def f(p, x, eps):
            r = fns(p)
            fh = jax.lax.stop_gradient(r.front_fn(x))
            fh = (fh[0] + eps, None if fh[1] is None else fh[1] + eps)
            return tsum(r.nerf_fn("fine", fh, rd, SF))
        timeit("nerf_f_g", lambda p, x, eps: tsum(jax.grad(f, argnums=(0, 2))(p, x, eps)),
               params, pts_f)

    if "comp" in cases:
        def f(raw_, eps):
            out = volume_render_radiance_field(
                raw_ + eps, z128, rd,
                radiance_field_noise_std=0.0,
                white_background=False, background_prior=bg, noise_key=None)
            return tsum((out.rgb, out.disp, out.acc, out.weights))
        timeit("comp", f, raw)
    if "comp_g" in cases:
        def f(raw_, eps):
            out = volume_render_radiance_field(
                raw_ + eps, z128, rd,
                radiance_field_noise_std=0.0,
                white_background=False, background_prior=bg, noise_key=None)
            return tsum((out.rgb, out.disp, out.acc, out.weights))
        timeit("comp_g", lambda raw_, eps: tsum(jax.grad(f)(raw_ + eps, 0.0)), raw)

    if "pdf" in cases:
        w = jnp.abs(jnp.asarray(rng.rand(R, SC - 2), jnp.float32))
        zmid = jnp.broadcast_to(jnp.linspace(0.2, 0.8, SC - 1), (R, SC - 1))
        def f(w_, eps):
            return jnp.sum(sample_pdf(zmid, w_ + eps, 64, det=False,
                                      key=jax.random.PRNGKey(0)))
        timeit("pdf", f, w)

    if "render" in cases or "render_g" in cases:
        def loss(p, eps):
            res = render_rays(p["model"], spec, settings, ro + eps, rd,
                              0.2, 0.8, audio, pose,
                              key=jax.random.PRNGKey(0), background_prior=bg)
            return (jnp.mean(jnp.square(res.rgb_fine))
                    + jnp.mean(jnp.square(res.rgb_coarse)))
        pp = {"model": params}
        if "render" in cases:
            timeit("render", lambda p, eps: loss(p, eps), pp)
        if "render_g" in cases:
            timeit("render_g", lambda p, eps: tsum(jax.grad(loss)(p, eps)), pp)


if __name__ == "__main__":
    main()
