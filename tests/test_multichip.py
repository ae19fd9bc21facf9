"""Multi-device sharding tests on the 8-device virtual CPU mesh.

These would FAIL on a 1-device mesh: they assert the batch is physically
split into 8 shards and that make_mesh refuses to truncate. Covers SURVEY
§2.3 distributed rows (the reference has no distributed backend at all —
this is the framework's new first-class capability).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_motion_planning_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicated,
)


def test_conftest_gives_eight_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_strict():
    with pytest.raises(ValueError):
        make_mesh(16)
    mesh = make_mesh(8)
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_train_step_shards_batch_eight_ways():
    from gnn_motion_planning_tpu.models.explorer import (
        ExplorerConfig,
        init_explorer_params,
    )
    from gnn_motion_planning_tpu.training.explorer import (
        ExplorerBatch,
        make_train_step,
    )

    cfg = ExplorerConfig(workspace_size=2, config_size=2, embed_size=16, obs_size=2)
    mesh = make_mesh(8)
    step, optimizer, mesh = make_train_step(cfg, mesh=mesh)
    params = init_explorer_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(jnp.asarray, params)
    opt_state = optimizer.init(params)

    b, n, e, m, d = 8, 16, 64, 4, 2
    rng = np.random.RandomState(0)
    frontier = np.zeros((b, n, n), bool)
    frontier[:, 0, :] = True
    ex = ExplorerBatch(
        v=rng.uniform(-1, 1, (b, n, d)).astype(np.float32),
        node_valid=np.ones((b, n), bool),
        goal=rng.uniform(-1, 1, (b, d)).astype(np.float32),
        src=rng.randint(0, n, (b, e)).astype(np.int32),
        dst=rng.randint(0, n, (b, e)).astype(np.int32),
        e_alive=np.ones((b, e), bool),
        obstacles=rng.uniform(-1, 1, (b, m, 2)).astype(np.float32),
        obs_mask=np.ones((b, m), bool),
        frontier=frontier,
        target=np.full(b, 5, np.int32),
        loop=np.full(b, 5, np.int32),
    )
    dsh = data_sharding(mesh)
    ex = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), dsh), ex)

    # batch physically split: 8 shards, one problem row each
    assert len(ex.v.sharding.device_set) == 8
    shards = ex.v.addressable_shards
    assert len(shards) == 8
    assert all(s.data.shape[0] == 1 for s in shards)

    params2, opt_state2, loss = step(params, opt_state, ex)
    assert np.isfinite(float(loss))
    # params replicated on all 8 devices after the all-reduce
    leaf = jax.tree.leaves(params2)[0]
    assert len(leaf.sharding.device_set) == 8
    assert all(
        s.data.shape == leaf.shape for s in leaf.addressable_shards
    ), "params should be fully replicated, not sharded"

    # gradient all-reduce correctness: sharded step == single-device step
    from gnn_motion_planning_tpu.training.explorer import frontier_cross_entropy

    loss_ref = frontier_cross_entropy(params, cfg, jax.tree.map(np.asarray, ex), 10)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)


def test_sharded_eval_partition_covers_all():
    from gnn_motion_planning_tpu.parallel.sharded_eval import shard_indexes

    idx = np.arange(2000, 3000)
    parts = [shard_indexes(idx, 8, i) for i in range(8)]
    assert sorted(np.concatenate(parts).tolist()) == idx.tolist()
    # disjoint
    assert sum(len(p) for p in parts) == len(idx)


@pytest.mark.slow
def test_eight_way_eval_smoke():
    """8-way problem-sharded eval on maze2easy: each virtual device's worker
    runs a disjoint index range; merged metrics must equal the unsharded run."""

    from gnn_motion_planning_tpu.api.registry import str2env
    from gnn_motion_planning_tpu.api.eval_gnn import eval_gnn
    from gnn_motion_planning_tpu.parallel.sharded_eval import shard_indexes

    env, _ = str2env("maze2easy")
    idx = np.arange(2000, 2008)
    per_shard = []
    for sid in range(8):
        part = shard_indexes(idx, 8, sid)
        r = eval_gnn("maze2easy", 1234, env, part.tolist())
        per_shard.append(r[0])
    merged_success = sum(per_shard)
    env2, _ = str2env("maze2easy")
    full = eval_gnn("maze2easy", 1234, env2, idx.tolist())
    assert merged_success == full[0]


@pytest.mark.slow
def test_lane_sharded_batched_eval_matches_unsharded():
    """User-facing multi-chip serving (VERDICT r3 #9): eval_gnn_batched with
    ``mesh=`` shards the lane axis over the 8-device mesh; metrics must be
    bit-identical to the unsharded batched run (which is itself pinned to
    scalar by test_batched_eval)."""

    from gnn_motion_planning_tpu.api.eval_gnn import eval_gnn_batched

    mesh = make_mesh(8)
    # the lane tensors really split 8 ways under this sharding
    probe = jax.device_put(jnp.zeros((8, 4)), data_sharding(mesh))
    assert len(probe.sharding.device_set) == 8

    env, _ = str2env_cached("maze2easy")
    a = eval_gnn_batched(
        "maze2easy", 1234, env, np.arange(2000, 2008), lanes=8, batch=100,
        t_max=100,
    )
    env2, _ = str2env_cached("maze2easy")
    b = eval_gnn_batched(
        "maze2easy", 1234, env2, np.arange(2000, 2008), lanes=8, batch=100,
        t_max=100, mesh=mesh,
    )
    assert a[0] == b[0]  # success count
    np.testing.assert_allclose(a[1], b[1])  # collision checks
    if a[0]:
        np.testing.assert_allclose(a[3], b[3], rtol=1e-6)  # path cost


def str2env_cached(name):
    from gnn_motion_planning_tpu.api.registry import str2env

    return str2env(name)


def test_two_process_distributed_smoke():
    """jax.distributed.initialize entry: 2 coordinated CPU processes, global
    mesh spans both, cross-process all-gather is correct (VERDICT r2 #7)."""

    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    r = subprocess.run(
        [sys.executable, str(repo / "tools" / "multiproc_smoke.py")],
        capture_output=True, text=True, timeout=240, cwd=str(repo),
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "MULTIPROC_SMOKE_OK" in r.stdout
