"""Per-host frame sharding (SURVEY §2.5.4): ownership partition, seeded
schedule agreement, host-sharded batch assembly == single-host assembly,
and the frame-axis-sharded multi-step train producing the same params as
the replicated one (2-process style, simulated on 8 virtual CPU devices)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sahs_tpu.config import Config
from sahs_tpu.data.sharded import (HostShardedFrames, assemble_sharded_batches,
                                   blocked_frame_schedule, frame_schedule,
                                   owned_slots, shard_indices)
from sahs_tpu.data.synthetic import SyntheticFaceDataset


def test_shard_indices_partition():
    for H in (1, 2, 3, 4):
        all_idx = sorted(sum((shard_indices(10, h, H) for h in range(H)), []))
        assert all_idx == list(range(10))
    # disjoint
    assert not (set(shard_indices(10, 0, 3)) & set(shard_indices(10, 1, 3)))


def test_host_sharded_frames_decode_only_owned():
    ds = SyntheticFaceDataset(kind="audio", num_frames=4, H=16, W=16)
    fr0 = HostShardedFrames(ds, 0, 2)
    fr1 = HostShardedFrames(ds, 1, 2)
    assert fr0.owned == {0, 2} and fr1.owned == {1, 3}
    fr0.get(0)
    fr0.get(2)
    fr0.get(0)  # cached
    assert fr0.decode_count == 2
    with pytest.raises(KeyError):
        fr0.get(1)


def test_blocked_schedule_agreement_and_ownership():
    H, K, N = 2, 8, 5
    s_a = blocked_frame_schedule(123, N, K, H)
    s_b = blocked_frame_schedule(123, N, K, H)  # "other process"
    np.testing.assert_array_equal(s_a, s_b)
    for h in range(H):
        shard = set(shard_indices(N, h, H))
        for t in owned_slots(s_a, h, H):
            assert int(s_a[t]) in shard
    # all slots covered exactly once
    assert sorted(sum((owned_slots(s_a, h, H) for h in range(H)), [])) \
        == list(range(K))


def test_two_process_assembly_matches_single_host():
    """Union of the two hosts' locally-assembled slot blocks == the plain
    single-host stacking for the same schedule (the make_array path glues
    exactly these per-process blocks along axis 0)."""
    ds = SyntheticFaceDataset(kind="audio", num_frames=4, H=16, W=16)
    sched = blocked_frame_schedule(7, len(ds), 6, 2)
    single = assemble_sharded_batches(HostShardedFrames(ds, 0, 1), sched)

    parts = []
    for h in range(2):
        fr = HostShardedFrames(ds, h, 2)
        slots = owned_slots(sched, h, 2)
        items = [fr.get(int(sched[t])) for t in slots]
        parts.append({k: np.stack([np.asarray(it[k]) for it in items])
                      for k in items[0] if k != "fname"})
        # host decoded at most its own shard
        assert fr.decode_count <= len(fr.owned)
    for k in single:
        glued = np.concatenate([parts[0][k], parts[1][k]], axis=0)
        np.testing.assert_array_equal(np.asarray(single[k]), glued)


@pytest.mark.slow
def test_frame_sharded_multistep_matches_replicated():
    """Multi-step scan with the stacked batch sharded along the frame/step
    axis over 8 virtual devices == the same scan on replicated arrays."""
    from sahs_tpu.models.nerface import ModelSpec
    from sahs_tpu.train.stage1 import (TrainSettings, init_train_state,
                                       make_multi_train_step)

    cfg = Config()
    cfg.nerf.train.num_random_rays = 64
    cfg.nerf.train.num_coarse = 8
    cfg.nerf.train.num_fine = 8
    spec = ModelSpec.from_config(cfg)
    ts = TrainSettings.from_config(cfg)

    ds = SyntheticFaceDataset(kind="audio", num_frames=4, H=32, W=32)
    bg = np.asarray(ds.background())
    sched = blocked_frame_schedule(3, len(ds), 8, 2)
    fr = HostShardedFrames(ds, 0, 1)
    batches = assemble_sharded_batches(fr, sched, background=bg)

    key = jax.random.PRNGKey(0)
    state0 = init_train_state(key, spec, ts)
    multi = make_multi_train_step(spec, ts, donate=False)
    st_rep, m_rep = multi(state0, batches, key)

    mesh = Mesh(np.array(jax.devices()), axis_names=("frames",))
    sh = NamedSharding(mesh, P("frames"))
    sharded = {k: jax.device_put(v, sh) for k, v in batches.items()
               if v.ndim >= 1 and v.shape[0] == 8}
    st_sh, m_sh = multi(state0, sharded, key)

    np.testing.assert_allclose(np.asarray(m_rep["loss"]),
                               np.asarray(m_sh["loss"]), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st_rep.params),
                    jax.tree_util.tree_leaves(st_sh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
