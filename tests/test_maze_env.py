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


@pytest.mark.parametrize("dim", [2, 3])
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
