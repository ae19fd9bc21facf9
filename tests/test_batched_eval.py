"""Batched-lane eval must reproduce scalar eval metrics exactly."""

import pytest
import numpy as np

from gnn_motion_planning_tpu.api import str2env
from gnn_motion_planning_tpu.api.eval_gnn import eval_gnn, eval_gnn_batched


@pytest.mark.slow
def test_batched_matches_scalar():
    env, _ = str2env("maze2easy")
    a = eval_gnn("maze2easy", 1234, env, np.arange(2000, 2004), batch=100, t_max=100)
    env2, _ = str2env("maze2easy")
    b = eval_gnn_batched(
        "maze2easy", 1234, env2, np.arange(2000, 2004), lanes=4, batch=100, t_max=100
    )
    assert a[0] == b[0]  # success count
    np.testing.assert_allclose(a[1], b[1])  # collision checks
    np.testing.assert_allclose(a[7], b[7])  # explore-only checks
    if a[0]:
        np.testing.assert_allclose(a[3], b[3], rtol=1e-6)  # path cost

    # tiny chunk: every lane needs multiple compaction rounds (pause at the
    # pop budget, re-batch survivors, resume from carried state) — metrics
    # must still be bit-identical to the scalar path
    env3, _ = str2env("maze2easy")
    c = eval_gnn_batched(
        "maze2easy", 1234, env3, np.arange(2000, 2004), lanes=4, batch=100,
        t_max=100, chunk=4,
    )
    assert a[0] == c[0]
    np.testing.assert_allclose(a[1], c[1])
    np.testing.assert_allclose(a[7], c[7])
    if a[0]:
        np.testing.assert_allclose(a[3], c[3], rtol=1e-6)


def _assert_paths_equal(a, b):
    """Per-problem raw and smoothed paths must match waypoint-for-waypoint."""

    for pa, pb in zip(a[5], b[5]):
        assert len(pa) == len(pb)
        for qa, qb in zip(pa, pb):
            np.testing.assert_array_equal(np.asarray(qa), np.asarray(qb))
    for pa, pb in zip(a[6], b[6]):
        assert len(pa) == len(pb)
        for qa, qb in zip(pa, pb):
            np.testing.assert_array_equal(np.asarray(qa), np.asarray(qb))


@pytest.mark.slow
def test_batched_matches_scalar_maze3_oracle_smoothing():
    """maze3 exercises the two round-2 divergence sources: RNG-consuming
    oracle smoothing (no loadable model smoother) and scalar fallback for
    failed lanes. Per-problem streams make batched == scalar exactly."""

    from gnn_motion_planning_tpu.api.registry import str2name

    # force the ORACLE smoother (params=None) regardless of whether a
    # scratch-trained maze3 smoother checkpoint is present: this test covers
    # the RNG-consuming oracle-smoothing path specifically
    _, _, _, model_s, _ = str2name("maze3")
    model_s = model_s._replace(params=None)

    idx = np.arange(0, 6)
    env, _ = str2env("maze3")
    a = eval_gnn("maze3", 1234, env, idx, model_s=model_s, batch=100, t_max=100)
    env2, _ = str2env("maze3")
    b = eval_gnn_batched(
        "maze3", 1234, env2, idx, model_s=model_s, lanes=3, batch=100, t_max=100
    )
    assert a[0] == b[0]
    np.testing.assert_allclose(a[1], b[1])
    np.testing.assert_allclose(a[7], b[7])
    if a[0]:
        np.testing.assert_allclose(a[3], b[3], rtol=1e-6)
    _assert_paths_equal(a, b)


@pytest.mark.slow
def test_batched_lane_grouping_invariance():
    """Changing the lane grouping must not change any problem's draws or
    metrics (independent per-problem streams)."""

    idx = np.arange(2000, 2006)
    env, _ = str2env("maze2easy")
    a = eval_gnn_batched(
        "maze2easy", 1234, env, idx, lanes=2, batch=100, t_max=100
    )
    env2, _ = str2env("maze2easy")
    b = eval_gnn_batched(
        "maze2easy", 1234, env2, idx, lanes=5, batch=100, t_max=100
    )
    assert a[0] == b[0]
    np.testing.assert_allclose(a[1], b[1])
    np.testing.assert_allclose(a[7], b[7])
    _assert_paths_equal(a, b)


def test_serve_mode_plans_and_accounts():
    """Serving path (fused sampling+round) must solve easy problems and
    keep the collision-check accounting fields populated."""

    from gnn_motion_planning_tpu.api.eval_gnn import eval_gnn_serve

    env, _ = str2env("maze2easy")
    r = eval_gnn_serve("maze2easy", 1234, env, np.arange(2000, 2003), batch=100)
    assert r[0] == 3  # all solved
    assert r[1] > 0  # collision checks accounted
    assert np.isfinite(r[3])


@pytest.mark.slow
def test_serve_full_matches_two_call():
    """The fully-fused serve path (ONE device call per problem) must produce
    the same plan, smooth path, and check accounting as the 2-call
    composition it fuses: serve_round -> host backtrack -> model_smooth."""

    import jax

    from gnn_motion_planning_tpu.api.eval_gnn import (
        explore_serve,
        get_planner,
        k_scaled,
        model_smooth,
    )
    from gnn_motion_planning_tpu.api.registry import str2name
    from gnn_motion_planning_tpu.config import problem_rng
    from gnn_motion_planning_tpu.planners.gnn_explore import backtrack

    import jax.numpy as jnp

    _, model, _, model_s, _ = str2name("maze2easy")
    assert model_s.params is not None
    batch, index = 100, 2000
    key = jax.random.PRNGKey(7)

    # fused path
    env, _ = str2env("maze2easy")
    env.rng = problem_rng(1234, index)
    env.init_new_problem(index)
    c0 = env.collision_check_count
    r = explore_serve(env, model, model_s, key, batch=batch)
    assert r["success"]
    fused_checks = env.collision_check_count - c0

    # two-call replication (the pre-fusion serve composition)
    env2, _ = str2env("maze2easy")
    env2.rng = problem_rng(1234, index)
    env2.init_new_problem(index)
    planner = get_planner(env2)
    from gnn_motion_planning_tpu.envs.env_config import LIMITS

    lim = np.asarray(LIMITS[: env2.config_dim], np.float32)
    res, v, n_sample_checks, n_coll, enough = planner.serve_round(
        model.params, model.cfg, env2.device_scene(), key,
        jnp.asarray(-lim), jnp.asarray(lim),
        jnp.asarray(np.asarray(env2.init_state, np.float32)),
        jnp.asarray(np.asarray(env2.goal_state, np.float32)),
        jnp.asarray(env2.obs_tokens()[0]), jnp.asarray(env2.obs_tokens()[1]),
        batch=batch, k1=k_scaled(30, batch + 2), loop=5, oversample=4,
    )
    assert bool(enough) and bool(res.success)
    v_np = np.asarray(v)
    idx_path = backtrack(np.asarray(res.prev), int(res.success_node))
    path2 = [v_np[i] for i in idx_path]
    F = batch + 2
    free = [v_np[i] for i in range(F)]
    collided = [v_np[F + i] for i in range(int(n_coll))]
    env2.collision_check_count = 0
    smooth2 = model_smooth(model_s, free, collided, path2, env2)
    two_call_checks = (
        int(n_sample_checks) + int(res.n_checks) + env2.collision_check_count
    )

    assert fused_checks == two_call_checks
    np.testing.assert_allclose(
        np.asarray(r["path"]), np.asarray(path2), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(r["smooth_path"]), np.asarray(smooth2), atol=1e-5
    )


@pytest.mark.slow
def test_batched_matches_scalar_kuka14():
    """Arm-env lane parity (round 5): the maze tests above never exercised
    the arm envs' chunked rejection sampling, capsule oracle, or the
    model-smoother overflow path inside explore_batch. Pin a kuka14 head
    that includes a protocol failure (idx 2006, budget exhaustion) so the
    scalar-fallback leg is covered too. Full protocol shapes (batch=500,
    t_max=500) — the same settings as the registry row."""

    idx = np.arange(2000, 2008)
    env, _ = str2env("kuka14")
    a = eval_gnn("kuka14", 1234, env, idx, batch=500, t_max=500)
    env2, _ = str2env("kuka14")
    b = eval_gnn_batched(
        "kuka14", 1234, env2, idx, lanes=4, batch=500, t_max=500
    )
    assert a[0] == b[0]
    np.testing.assert_allclose(a[1], b[1])  # collision checks incl. smooth
    np.testing.assert_allclose(a[7], b[7])  # explore-only checks
    np.testing.assert_allclose(a[3], b[3], rtol=1e-6)
    _assert_paths_equal(a, b)
