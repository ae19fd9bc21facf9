"""Maze oracle parity: host wrapper and device kernels vs the reference.

The collision-check *counter* is the paper's headline metric, so these tests
assert exact count parity, not just free/collide decisions (reference counter
semantics: environment/maze_env.py:270-277).
"""

import jax
import numpy as np
import pytest

from gnn_motion_planning_tpu.config import HostRNG
from gnn_motion_planning_tpu.envs.maze import (
    MazeEnv,
    edge_free_2d,
    edge_free_3d,
    point_free_2d,
    stick_free_3d,
)


def _rand_states(rng, n, dim, margin=0.0):
    base = np.array([1.0, 1.0, 0.4])
    lim = np.tile(base, 2)[:dim] if dim > 3 else base[:dim]
    if dim == 6:
        lim = np.concatenate([base, base])
    elif dim == 4:
        lim = np.array([1.0, 1.0, 1.0, 1.0])
    return rng.uniform(-(lim - margin), lim - margin, (n, dim))


@pytest.mark.parametrize("dim", [2, 3])
def test_host_oracle_matches_reference(reference_maze_env, dim):
    ref = reference_maze_env(dim=dim)
    ours = MazeEnv(dim=dim)
    rng = np.random.RandomState(0)

    for index in [2000, 2100, 42]:
        ref.init_new_problem(index)
        ours.init_new_problem(index)
        np.testing.assert_array_equal(ref.map, ours.map)
        np.testing.assert_allclose(ref.obstacles, ours.obstacles)

        states = _rand_states(rng, 200, dim)
        for s in states:
            assert ref._state_fp(s.copy()) == ours._state_fp(s.copy()), s
        assert ref.collision_check_count == ours.collision_check_count

        edges = _rand_states(rng, 80, 2 * dim)
        for e in edges:
            a, b = e[:dim], e[dim:]
            assert ref._edge_fp(a.copy(), b.copy()) == ours._edge_fp(
                a.copy(), b.copy()
            ), (a, b)
        assert ref.collision_check_count == ours.collision_check_count


@pytest.mark.parametrize(
    "dim", [2, pytest.param(3, marks=pytest.mark.slow)]
)
def test_device_kernels_match_host(dim):
    env = MazeEnv(dim=dim)
    env.init_new_problem(2000)
    occ = np.asarray(env.map)
    rng = np.random.RandomState(1)

    state_free = point_free_2d if dim == 2 else stick_free_3d
    edge_free = edge_free_2d if dim == 2 else edge_free_3d

    states = _rand_states(rng, 100, dim)
    free_d, cnt_d = jax.vmap(lambda q: state_free(occ, q))(states)
    for i, s in enumerate(states):
        c0 = env.collision_check_count
        got = env._state_fp(s)
        assert bool(free_d[i]) == got
        assert int(cnt_d[i]) == env.collision_check_count - c0

    edges = _rand_states(rng, 60, 2 * dim)
    free_d, cnt_d = jax.vmap(lambda e: edge_free(occ, e[:dim], e[dim:]))(edges)
    for i, e in enumerate(edges):
        c0 = env.collision_check_count
        got = env._edge_fp(e[:dim], e[dim:])
        assert bool(free_d[i]) == got, e
        assert int(cnt_d[i]) == env.collision_check_count - c0, e


def test_device_edge_checks_realistic_pairs():
    """Edges between free samples (the planner's actual workload)."""

    env = MazeEnv(dim=2)
    env.init_new_problem(2015)
    env.rng = HostRNG(7)
    pts = np.array(env.sample_n_points(40))
    occ = np.asarray(env.map)
    pairs = [(i, j) for i in range(20) for j in range(20, 40)]
    a = pts[[p[0] for p in pairs]]
    b = pts[[p[1] for p in pairs]]
    free_d, cnt_d = jax.vmap(lambda x, y: edge_free_2d(occ, x, y))(a, b)
    for k in range(len(pairs)):
        c0 = env.collision_check_count
        got = env._edge_fp(a[k], b[k])
        assert bool(free_d[k]) == got
        assert int(cnt_d[k]) == env.collision_check_count - c0


@pytest.mark.parametrize("dim", [2, 3])
def test_sampling_stream_parity(reference_maze_env, dim):
    """Our chunked sampler consumes the MT19937 stream exactly like the
    reference's one-at-a-time rejection loop (maze_env.py:85-100)."""

    ref = reference_maze_env(dim=dim)
    ref.init_new_problem(2001)
    np.random.seed(1234)
    ref_free, ref_neg = ref.sample_n_points(100, need_negative=True)

    ours = MazeEnv(dim=dim)
    ours.init_new_problem(2001)
    ours.rng = HostRNG(1234)
    our_free, our_neg = ours.sample_n_points(100, need_negative=True)

    np.testing.assert_allclose(np.array(ref_free), np.array(our_free))
    np.testing.assert_allclose(np.array(ref_neg), np.array(our_neg))
    assert ref.collision_check_count == ours.collision_check_count


@pytest.mark.slow
def test_occ_scene_gather_free_parity():
    """OccScene (gather-free occupancy compare) is bit-identical to the
    grid-indexing kernels on decisions AND counts, 2D and 3D."""

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gnn_motion_planning_tpu.envs.maze import (
        MazeEnv,
        edge_free_2d,
        edge_free_3d,
        make_occ_scene,
        point_free_2d,
        stick_free_3d,
    )

    env = MazeEnv(dim=2)
    env.init_new_problem(2000)
    occ = jnp.asarray(env.map)
    scene = make_occ_scene(env.map)
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.uniform(-1, 1, (256, 2)), jnp.float32)
    b = jnp.asarray(rng.uniform(-1, 1, (256, 2)), jnp.float32)

    fg, cg = jax.vmap(lambda x, y: edge_free_2d(occ, x, y))(a, b)
    fs, cs = jax.vmap(lambda x, y: edge_free_2d(scene, x, y))(a, b)
    np.testing.assert_array_equal(np.asarray(fg), np.asarray(fs))
    np.testing.assert_array_equal(np.asarray(cg), np.asarray(cs))

    pg = jax.vmap(lambda x: point_free_2d(occ, x))(a)
    ps = jax.vmap(lambda x: point_free_2d(scene, x))(a)
    np.testing.assert_array_equal(np.asarray(pg[0]), np.asarray(ps[0]))
    np.testing.assert_array_equal(np.asarray(pg[1]), np.asarray(ps[1]))

    env3 = MazeEnv(dim=3)
    env3.init_new_problem(2000)
    occ3 = jnp.asarray(env3.map)
    scene3 = make_occ_scene(env3.map)
    q0 = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 3)), jnp.float32)
    q1 = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 3)), jnp.float32)
    sg = jax.vmap(lambda q: stick_free_3d(occ3, q))(q0)
    ss = jax.vmap(lambda q: stick_free_3d(scene3, q))(q0)
    np.testing.assert_array_equal(np.asarray(sg[0]), np.asarray(ss[0]))
    np.testing.assert_array_equal(np.asarray(sg[1]), np.asarray(ss[1]))
    eg = jax.vmap(lambda x, y: edge_free_3d(occ3, x, y))(q0, q1)
    es = jax.vmap(lambda x, y: edge_free_3d(scene3, x, y))(q0, q1)
    np.testing.assert_array_equal(np.asarray(eg[0]), np.asarray(es[0]))
    np.testing.assert_array_equal(np.asarray(eg[1]), np.asarray(es[1]))


def test_step_done_is_scalar_bool():
    """env.step's `done` must be a scalar bool — distance() returns shape
    (1,) and once leaked through in_goal_region it poisons tree-planner
    success aggregation (eval_rrt crash on inhomogeneous arrays)."""

    import numpy as np

    from gnn_motion_planning_tpu.envs.maze import MazeEnv

    env = MazeEnv(dim=2)
    env.init_new_problem(2000)
    assert env.in_goal_region(np.asarray(env.goal_state)) in (True, False)
    _, _, _, done = env.step(
        np.asarray(env.init_state), new_state=np.asarray(env.goal_state)
    )
    assert isinstance(done, (bool, np.bool_)) and np.ndim(done) == 0


def test_occ_lookup_variants_agree():
    """All three gather-free occupancy lookups (legacy cells compare,
    row bitmasks, round-5 packed flat bitmap) agree bit-for-bit inside
    the valid state box, on full-coverage cell centers + random grids
    (flat-word bit-31 boundaries included via dense random occupancy)."""

    import jax.numpy as jnp
    import numpy as np

    import gnn_motion_planning_tpu.envs.maze as maze

    rng = np.random.RandomState(0)
    grid = np.stack(
        np.meshgrid(np.linspace(-1, 1, 61), np.linspace(-1, 1, 61)), -1
    ).reshape(-1, 2)
    for density in (0.1, 0.5, 0.95):
        occ = (rng.rand(15, 15) < density).astype(np.float64)
        scene = maze.make_occ_scene(occ)
        xs = np.concatenate(
            [rng.uniform(-1, 1, (2048, 2)), grid]
        ).astype(np.float32)
        r = np.asarray(maze._occ_at_rows(scene, jnp.asarray(xs)))
        f = np.asarray(maze._occ_at_flat(scene, jnp.asarray(xs)))
        c = np.asarray(maze._occ_at_cells(scene, jnp.asarray(xs)))
        g = np.asarray(maze._occ_at(occ, jnp.asarray(xs)))
        np.testing.assert_array_equal(r, f)
        np.testing.assert_array_equal(c, f)
        np.testing.assert_array_equal(g, f)
