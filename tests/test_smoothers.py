"""Oracle smoothers: feasibility preserved, cost non-increasing."""

import numpy as np
import pytest

from gnn_motion_planning_tpu.api import explore, str2env, str2name
from gnn_motion_planning_tpu.config import set_random_seed
from gnn_motion_planning_tpu.planners.oracle_smoother import (
    interpolate_path,
    joint_smoother,
    joint_smoother_ratio,
    path_cost,
    prune_path,
    random_path_smoother,
)


@pytest.fixture(scope="module")
def maze_path():
    env, _ = str2env("maze2easy")
    _, model, _, model_s, _ = str2name("maze2easy")
    env.rng = set_random_seed(3)
    for index in range(2001, 2010):
        env.init_new_problem(index)
        result = explore(env, model, model_s, smooth=False, batch=200, t_max=200)
        if result != [] and len(result[0]) > 2:
            path = result[0]
            return env, [tuple(np.asarray(p, np.float64)) for p in path]
    pytest.fail("no multi-waypoint path found on any probe problem")


def _feasible(env, path):
    return all(
        env._edge_fp(np.asarray(a), np.asarray(b))
        for a, b in zip(path[:-1], path[1:])
    )


def test_random_path_smoother(maze_path):
    env, path = maze_path
    out = random_path_smoother(path, env.RRT_EPS, env, iter=50)
    assert _feasible(env, out)
    assert path_cost(out) <= path_cost(path) + 1e-9


def test_prune_path(maze_path):
    env, path = maze_path
    out = prune_path(list(path), env, iter=10)
    assert _feasible(env, out)
    assert path_cost(out) <= path_cost(path) + 1e-9


def test_joint_smoother(maze_path):
    env, path = maze_path
    out = joint_smoother(list(path), env, iter=2, random_iter=30, prune_iter=10)
    assert _feasible(env, out)
    assert path_cost(out) <= path_cost(path) + 1e-9


def test_joint_smoother_ratio_keeps_length(maze_path):
    env, path = maze_path
    out = joint_smoother_ratio(list(path), env, iter=2, random_iter=30, prune_iter=10)
    # training target keeps the waypoint count (train_smoother MSE aligns them)
    assert len(out) == len(path)
    assert path_cost(out) <= path_cost(path) + 1e-9


def test_interpolate_path(maze_path):
    env, path = maze_path
    dense = interpolate_path(env, path)
    assert len(dense) >= len(path)
    steps = [
        np.linalg.norm(np.asarray(b) - np.asarray(a))
        for a, b in zip(dense[:-1], dense[1:])
    ]
    assert max(steps) <= env.RRT_EPS + 1e-9
