"""Device mesh, sharding specs and multi-host initialization.

The reference is strictly single-process/single-GPU (SURVEY.md §2.5); all
parallelism here is new, TPU-native design:

  - a 1-D mesh with a single data axis over RAYS — the only batch axis in
    this workload. Samples stay device-local because compositing is a
    per-ray exclusive-cumprod scan. A 2-D (hosts x chips) mesh is
    deliberately NOT built: with pure DP-over-rays there is exactly one
    collective (the gradient all-reduce), and XLA already schedules it
    hierarchically (ICI within a host, DCN across) from the 1-D mesh —
    a second mesh axis would add nothing to partition over.
  - Parameters are replicated; XLA inserts the gradient all-reduce over ICI
    (DCN across hosts) from the sharding annotations — no hand-written
    collectives in the training path.
  - TP/PP/EP are deliberately NOT used: the field MLPs are ~3 MB, far below
    one chip's HBM/VMEM; documented in SURVEY.md §2.5.3.

Multi-host: call ``initialize_distributed()`` once per process before any
device access; each host feeds its own frame shard (data/ loaders are
host-local).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (no-op on a single host)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              num_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over all (or the first ``num_devices``) devices with a single
    ray-parallel axis."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), axis_names=(RAY_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (rays) across the mesh."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rays(mesh: Mesh, *arrays):
    """Device_put ray-major arrays with dim-0 sharding (pads are the caller's
    responsibility — ray counts are multiples of large powers of two in every
    config)."""
    sh = ray_sharding(mesh)
    out = [jax.device_put(a, sh) if a is not None else None for a in arrays]
    return out[0] if len(out) == 1 else tuple(out)


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def make_sharded_train_step(spec, ts, mesh: Mesh, donate: bool = True):
    """Jitted train step with explicit sharding constraints: the per-frame
    batch is replicated (a frame is small), ray gather + render shard over
    the ray axis via an internal with_sharding_constraint, parameters and
    optimizer state are replicated, and XLA all-reduces gradients over ICI.
    """
    from ..train import stage1

    optimizer = stage1.make_optimizer(ts)
    rep = replicated(mesh)
    rs = ray_sharding(mesh)

    def step(state, batch, key):
        return stage1.train_step(state, batch, key, spec, ts, optimizer,
                                 ray_constraint=rs)

    in_shardings = (rep, rep, rep)
    out_shardings = (rep, rep)
    return jax.jit(step, in_shardings=in_shardings,
                   out_shardings=out_shardings,
                   donate_argnums=(0,) if donate else ())


# Multi-device EVAL lives in evaluation.make_eval_renderer(mesh=...): the
# chunked full-image renderer takes a ray-sharding constraint so each
# device renders its ray shard of every chunk (an unchunked whole-bundle
# sharded renderer would materialize 33M samples at once).
