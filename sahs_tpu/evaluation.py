"""Stage-I evaluation: full-frame rendering + derived outputs.

Parity targets in the reference (nerf-pytorch/eval_stage_rays.py):
  - torch_normal_map          :116-151  (finite-difference normals from the
                                         disparity map, cleaned by the
                                         last-sample weight map)
  - unproject_torch / save_pc :42-71    (depth -> world point cloud .obj)
  - cast_to_image/disparity, error images, per-image timing, output naming
    (f_%04d.png for expression, source fname for audio)  :480-553
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .config import Config
from .models.nerface import ModelSpec
from .render.pipeline import RenderSettings, render_image
from .utils.seg import label2color


def normal_map(disp: np.ndarray, intrinsics: np.ndarray,
               weight_map: Optional[np.ndarray] = None, clean: bool = True,
               central_difference: bool = False) -> np.ndarray:
    """Disparity/depth map -> uint8 normal map; math parity with reference
    eval_stage_rays.py:116-151 (cross products of forward differences of the
    unprojected point map; weight-mask cleanup at threshold 0.22)."""
    disp = np.asarray(disp, np.float32)
    Wd, Hd = disp.shape
    cx = intrinsics[2] * Wd
    cy = intrinsics[3] * Hd
    fx, fy = intrinsics[0], intrinsics[1]
    ii = np.broadcast_to(np.arange(Wd, dtype=np.float32)[None, :], disp.shape)
    jj = np.broadcast_to(np.arange(Hd, dtype=np.float32)[:, None], disp.shape)
    points = np.stack([((ii - cx) * disp) / fx,
                       -((jj - cy) * disp) / fy,
                       disp], axis=-1)
    d = 2 if central_difference else 1
    dx = points[d:, :, :] - points[:-d, :, :]
    dy = points[:, d:, :] - points[:, :-d, :]
    normals = np.cross(dy[:-d, :, :], dx[:, :-d, :])
    norm = np.sqrt(np.sum(normals * normals, axis=2, keepdims=True))
    normals = normals / np.maximum(norm, 1e-12)
    normals = normals * 0.5 + 0.5
    if clean and weight_map is not None:
        m = np.asarray(weight_map, np.float32)[..., None]
        m = m[:-d, :-d]
        normals = np.where(m > 0.22, 1.0, normals)
        normals = (1 - m) * normals + m
    return (normals * 255).astype(np.uint8)


def unproject_depth(depth: np.ndarray, intrinsics: np.ndarray,
                    pose: Optional[np.ndarray] = None) -> np.ndarray:
    """Depth map -> (N, 3/4) point cloud; world coords when pose given
    (reference eval_stage_rays.py:42-56)."""
    H, W = depth.shape
    u = np.broadcast_to(np.arange(W, dtype=np.float32)[None, :], depth.shape)
    v = np.broadcast_to(np.arange(H, dtype=np.float32)[:, None], depth.shape)
    x = (u - intrinsics[2]) * depth / intrinsics[0]
    y = (v - intrinsics[3]) * depth / intrinsics[1]
    pts = np.stack([x, y, depth], axis=-1).reshape(-1, 3)
    if pose is not None:
        p4 = np.eye(4, dtype=np.float32)
        p4[:3, :4] = pose[:3, :4]
        hom = np.concatenate([pts, np.ones((pts.shape[0], 1), np.float32)], 1)
        pts = (np.linalg.inv(p4) @ hom.T).T
    return pts


def save_point_cloud(pts: np.ndarray, path: str) -> None:
    with open(path, "w") as fp:
        fp.write("\n".join(f"v {p[0]} {p[1]} {p[2]}" for p in pts))


def dump_rays(points: np.ndarray, radiance_field: np.ndarray,
              path: str = "rays_small.ply", threshold: float = 0.9999996,
              stride: int = 100) -> int:
    """Train-side debug dump of high-density sample points as a colored
    ascii .ply (reference nerf_helpers.py:499-543 `dump_rays`): selection is
    sigmoid(relu(sigma)) > threshold over the raw field, then the reference's
    subsample (first total//10 indices, every ``stride``-th written).
    points (R, S, 3); radiance_field (R, S, C>=4) with sigma at channel 3.
    Returns the number of vertices written."""
    points = np.asarray(points, np.float32)
    rf = np.asarray(radiance_field, np.float32)
    sig = 1.0 / (1.0 + np.exp(-np.maximum(rf[..., 3], 0.0)))
    ray_idx, depth_idx = np.where(sig > threshold)
    total = int(ray_idx.shape[0] // 10)
    keep = np.arange(0, total, stride)
    ray_idx, depth_idx = ray_idx[keep], depth_idx[keep]
    xyz = points[ray_idx, depth_idx]
    rgb = np.clip(rf[ray_idx, depth_idx, :3] * 255, 0, 255).astype(np.int32)
    with open(path, "w") as fid:
        fid.write("ply\nformat ascii 1.0\n"
                  f"element vertex {len(keep)}\n"
                  "property float x\nproperty float y\nproperty float z\n"
                  "property uchar red\nproperty uchar green\n"
                  "property uchar blue\nend_header\n")
        for p, c in zip(xyz, rgb):
            fid.write(f"{p[0]:f} {p[1]:f} {p[2]:f} {c[0]}  {c[1]} {c[2]}\n")
    return len(keep)


def cast_to_image(img: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype(np.uint8)


def cast_to_disparity_image(disp: np.ndarray) -> np.ndarray:
    d = np.asarray(disp, np.float32)
    d = d / max(float(d.max()), 1e-10)
    return (np.clip(d, 0, 1) * 255).astype(np.uint8)


def error_image(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    """Per-pixel L2 error heat image as uint8 (reference uses a matplotlib
    figure; we emit the raw heat map directly)."""
    err = np.sqrt(np.sum((np.asarray(gt, np.float32)
                          - np.asarray(pred, np.float32)[..., :3]) ** 2, -1))
    err = err / max(float(err.max()), 1e-10)
    return (err * 255).astype(np.uint8)


def make_eval_renderer(spec: ModelSpec, settings: RenderSettings,
                       H: int, W: int, near: float, far: float,
                       chunksize: Optional[int] = None,
                       with_latent: bool = False,
                       mesh=None):
    """One jit-compiled full-image renderer. With ``with_latent`` the
    renderer takes a (32,) latent code restored from the checkpoint
    (reference eval_stage_rays.py:315-318,450-452).

    mesh: optional jax.sharding.Mesh — the ray workload of every chunk is
    then sharded over the mesh's ray axis (data-parallel eval: params
    replicated, each device renders its ray shard, per-ray outputs gather
    by the output sharding; SURVEY §2.5.4). evaluate_dataset passes one
    automatically when more than one device is visible."""
    ray_constraint = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        from .parallel.mesh import RAY_AXIS
        ray_constraint = NamedSharding(mesh, PartitionSpec(None, RAY_AXIS))
    # The reference configs' chunksize (131072 rays) was tuned for the
    # torch renderer's memory profile; on the Pallas path a chunk holds
    # (chunk * samples) packed 128-lane point blocks and 131072-ray chunks
    # exceed one chip's HBM (~25 GB needed). 32768 measured fastest of
    # {8k, 16k, 32k} on v5e (tools/eval_bench.py; BENCH_NOTES r5) and
    # stays well inside HBM, so TPU eval clamps to it.
    if chunksize is None and settings.use_pallas \
            and jax.default_backend() == "tpu":
        chunksize = min(settings.chunksize, 32768)

    if with_latent:
        def _render_l(params, intrinsics, pose, driving, background, key,
                      latent_code):
            return render_image(params, spec, settings, H, W, intrinsics,
                                pose, near, far, driving, key=key,
                                background=background, chunksize=chunksize,
                                latent_code=latent_code,
                                ray_constraint=ray_constraint)
        return jax.jit(_render_l)

    def _render(params, intrinsics, pose, driving, background, key):
        return render_image(params, spec, settings, H, W, intrinsics, pose,
                            near, far, driving, key=key,
                            background=background, chunksize=chunksize,
                            ray_constraint=ray_constraint)

    return jax.jit(_render)


def select_eval_latent_code(latent_codes, index_map=None,
                            fixed_row: int = 10):
    """Reference latent-code-at-eval semantics (eval_stage_rays.py:316-323,
    443-452): the checkpoint's per-train-frame latent codes are indexed
    through the dataset's ``index_map.npy`` at the HARDCODED row 10
    ("USE THIS if not ablating!") — ONE fixed code is used for every eval
    frame. Without an index map we fall back to code 0."""
    if latent_codes is None:
        return None
    codes = np.asarray(latent_codes)
    idx = 0
    if index_map is not None:
        index_map = np.asarray(index_map).astype(int)
        row = min(fixed_row, index_map.shape[0] - 1)
        mapped = int(index_map[row, 1])
        if 0 <= mapped < codes.shape[0]:
            idx = mapped
    return jnp.asarray(codes[idx])


def evaluate_dataset(cfg: Config, spec: ModelSpec, model_params, dataset,
                     savedir: str, background=None,
                     save_disparity: bool = False, save_error: bool = False,
                     save_normals: bool = True, save_mesh: bool = False,
                     limit: int = 1500, seed: int = 0,
                     deterministic: bool = False,
                     latent_codes=None, latent_index_map=None,
                     frontalize: Optional[bool] = None):
    """Reference eval loop parity (eval_stage_rays.py:355-556): renders every
    frame, saves rgb / colorized seg / normals (+ optional disparity, error,
    point cloud), prints running avg time per image.

    latent_codes: checkpoint-restored (num_train_frames, D) codes; a single
    fixed code is selected via ``select_eval_latent_code`` and fed to every
    render (eval_stage_rays.py:450-452). frontalize (default
    cfg.runtime.frontalize): render every frame from frame 0's pose
    (eval_stage_rays.py:415-416)."""
    import imageio.v2 as imageio

    settings = RenderSettings.from_config(cfg, "validation")
    if deterministic:
        settings = RenderSettings(
            num_coarse=settings.num_coarse, num_fine=settings.num_fine,
            perturb=False, lindisp=settings.lindisp,
            radiance_field_noise_std=0.0,
            white_background=settings.white_background,
            chunksize=settings.chunksize)
    os.makedirs(savedir, exist_ok=True)
    for sub in ("masks", "normals") + (("disparity",) if save_disparity else ()) \
            + (("error",) if save_error else ()) + (("mesh",) if save_mesh else ()):
        os.makedirs(os.path.join(savedir, sub), exist_ok=True)

    H, W = dataset.H, dataset.W
    latent_code = select_eval_latent_code(latent_codes, latent_index_map)
    # Multi-device: render each frame data-parallel over a ray mesh
    # (params replicated, ray chunks sharded; SURVEY §2.5.4).
    mesh = None
    if jax.device_count() > 1:
        from .parallel.mesh import make_mesh
        mesh = make_mesh()
    renderer = make_eval_renderer(spec, settings, H, W,
                                  float(cfg.dataset.near),
                                  float(cfg.dataset.far),
                                  with_latent=latent_code is not None,
                                  mesh=mesh)
    if frontalize is None:
        frontalize = bool(getattr(cfg.runtime, "frontalize", False))
    key = jax.random.PRNGKey(seed)
    bg = jnp.asarray(background) if background is not None else None
    times = []
    is_expression = cfg.dataset.type.lower() == "expression"
    n = min(len(dataset), limit)
    frontal_pose = jnp.asarray(dataset[0]["pose"]) if frontalize else None
    for i in range(n):
        item = dataset[i]
        t0 = time.time()
        key, sub_key = jax.random.split(key)
        pose = frontal_pose if frontalize else jnp.asarray(item["pose"])
        args = (model_params, jnp.asarray(item["intrinsics"]), pose,
                jnp.asarray(item["driving"]), bg, sub_key)
        if latent_code is not None:
            args = args + (latent_code,)
        out = renderer(*args)
        rgb = np.asarray(out["rgb_fine"] if out["rgb_fine"] is not None
                         else out["rgb_coarse"])
        disp = np.asarray(out["disp_fine"] if out["disp_fine"] is not None
                          else out["disp_coarse"])
        # per-pixel weight of the last (background) sample for normal cleanup
        wmap = np.asarray(out["weights"][:, -1]).reshape(H, W)
        times.append(time.time() - t0)

        fname = (f"f_{i:04d}.png" if is_expression
                 else os.path.basename(item.get("fname", f"{i}.jpg")))
        stem = os.path.splitext(fname)[0]
        imageio.imwrite(os.path.join(savedir, fname), cast_to_image(rgb[..., :3]))
        if rgb.shape[-1] > 3:
            seg_rgb = label2color(rgb[..., 3:])
            imageio.imwrite(os.path.join(savedir, "masks", stem + ".png"),
                            cast_to_image(seg_rgb))
        if save_normals:
            nm = normal_map(disp, item["intrinsics"], wmap, clean=True)
            imageio.imwrite(os.path.join(savedir, "normals", stem + ".png"), nm)
        if save_disparity:
            imageio.imwrite(os.path.join(savedir, "disparity", stem + ".png"),
                            cast_to_disparity_image(disp))
        if save_error:
            imageio.imwrite(os.path.join(savedir, "error", stem + ".png"),
                            error_image(item["image"], rgb))
        if save_mesh and out["depth_fine"] is not None:
            pts = unproject_depth(np.asarray(out["depth_fine"]),
                                  item["intrinsics"])
            save_point_cloud(pts, os.path.join(savedir, "mesh", stem + ".obj"))
        print(f"Avg time per image: {sum(times) / (i + 1):.3f}s")
    return times
