"""Per-host frame sharding for multi-host training (SURVEY.md §2.5.4).

The reference is single-process (SURVEY §2.5); this layer is new TPU-native
design. The training semantics stay EXACTLY the reference's — every step
still draws its 2048 rays from ONE globally-agreed frame — but each host
only loads/decodes its own shard of frames:

  - frame ownership is round-robin: host h owns frames {i : i % H == h};
  - the per-step frame schedule is derived from a shared seed, so every
    process computes the identical sequence without communication;
  - the multi-step scan batch (leaves (K, ...)) is assembled with
    ``jax.make_array_from_process_local_data`` sharded along the step/frame
    axis — each host provides exactly the slots whose frames it owns, and
    XLA broadcasts each step's frame to all devices inside the scan (one
    frame ≈ 30 MB over DCN per step, overlapped with compute).

On a single process everything degrades to plain stacking, and the same
code paths are exercised by the 2-process-style CPU tests
(tests/test_multihost_data.py).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np


def shard_indices(n_frames: int, process_index: int,
                  process_count: int) -> List[int]:
    """Round-robin frame ownership: host h owns {i : i % H == h}."""
    if not (0 <= process_index < process_count):
        raise ValueError(f"process_index {process_index} out of range "
                         f"[0, {process_count})")
    return list(range(process_index, n_frames, process_count))


class HostShardedFrames:
    """Lazily decodes ONLY the frames this process owns.

    Wraps any indexable dataset (NerfaceDataset / AudioDataset /
    SyntheticFaceDataset). Access by GLOBAL frame index; touching a frame
    another host owns raises (it would silently break the "each host loads
    its shard" contract)."""

    def __init__(self, dataset, process_index: int = 0,
                 process_count: int = 1):
        self.dataset = dataset
        self.process_index = process_index
        self.process_count = process_count
        self.owned = set(shard_indices(len(dataset), process_index,
                                       process_count))
        self._cache: Dict[int, Any] = {}
        self.decode_count = 0  # observability / tests

    def __len__(self):
        return len(self.dataset)

    def get(self, global_idx: int):
        if global_idx not in self.owned:
            raise KeyError(
                f"frame {global_idx} is owned by host "
                f"{global_idx % self.process_count}, not host "
                f"{self.process_index}")
        if global_idx not in self._cache:
            self._cache[global_idx] = self.dataset[global_idx]
            self.decode_count += 1
        return self._cache[global_idx]


def frame_schedule(seed: int, n_frames: int, num_steps: int) -> np.ndarray:
    """Deterministic per-step frame indices, identical on every process
    (the multi-host equivalent of the reference's host-side
    ``np.random.choice(len(dataset))``, train_stage_rays_auto.py:327)."""
    rng = np.random.RandomState(seed)
    return rng.randint(0, n_frames, size=(num_steps,)).astype(np.int64)


def blocked_frame_schedule(seed: int, n_frames: int, num_steps: int,
                           process_count: int) -> np.ndarray:
    """Multi-host schedule for one scan chunk of ``num_steps`` steps: slot t
    is filled from the shard of host h = t * H // num_steps (contiguous
    blocks, because a NamedSharding partitions the step axis into contiguous
    blocks — round-robin slot ownership is not expressible). Every process
    computes the identical schedule from the shared seed.

    Divergence from the reference (documented): the reference draws each
    step's frame i.i.d. uniform over ALL frames; this draws i.i.d. uniform
    within each host's round-robin shard, block-interleaved per chunk — the
    same marginal frame coverage, different step order."""
    if num_steps % process_count:
        raise ValueError(f"num_steps {num_steps} must be a multiple of "
                         f"process_count {process_count}")
    rng = np.random.RandomState(seed)
    per = num_steps // process_count
    out = np.empty((num_steps,), np.int64)
    for h in range(process_count):
        shard = np.asarray(shard_indices(n_frames, h, process_count))
        out[h * per:(h + 1) * per] = shard[rng.randint(0, len(shard),
                                                       size=(per,))]
    return out


def owned_slots(schedule: Sequence[int], process_index: int,
                process_count: int) -> List[int]:
    """Slot positions this host fills in a blocked schedule: the h-th
    contiguous block."""
    per = len(schedule) // process_count
    return list(range(process_index * per, (process_index + 1) * per))


def assemble_sharded_batches(frames: HostShardedFrames,
                             schedule: Sequence[int],
                             background: Optional[np.ndarray] = None,
                             sharding=None):
    """Build the stacked (K, ...) batch pytree for make_multi_train_step.

    Single-process (sharding=None): plain numpy stacking of every step's
    frame. Multi-process: ``sharding`` must shard axis 0 (the step axis)
    such that each step's slot lands on the devices of the host owning that
    step's frame — this host fills ONLY its owned slots and the global
    array is assembled via jax.make_array_from_process_local_data.
    """
    import jax
    import jax.numpy as jnp

    K = len(schedule)
    if sharding is None:
        items = [frames.get(int(f)) if int(f) in frames.owned
                 else frames.dataset[int(f)] for f in schedule]
        keys = [k for k in items[0] if k != "fname"]
        out = {k: jnp.asarray(np.stack([np.asarray(it[k]) for it in items]))
               for k in keys}
        if background is not None:
            out["background"] = jnp.broadcast_to(
                jnp.asarray(background), (K,) + background.shape)
        return out

    # Multi-process path: fill only owned slots; make_array assembles the
    # global array from each process's slice along axis 0.
    slots = owned_slots(schedule, frames.process_index, frames.process_count)
    items = {t: frames.get(int(schedule[t])) for t in slots}
    any_item = next(iter(items.values()))
    keys = [k for k in any_item if k != "fname"]
    out = {}
    for k in keys:
        local = np.stack([np.asarray(items[t][k]) for t in slots])
        out[k] = jax.make_array_from_process_local_data(
            sharding, local, (K,) + local.shape[1:])
    if background is not None:
        bg_local = np.broadcast_to(background,
                                   (len(slots),) + background.shape)
        out["background"] = jax.make_array_from_process_local_data(
            sharding, bg_local, (K,) + background.shape)
    return out
