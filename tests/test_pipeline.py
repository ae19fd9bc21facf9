"""End-to-end planner pipeline tests (maze2, converted reference weights)."""

import numpy as np
import pytest

from gnn_motion_planning_tpu.api import eval_gnn, explore, path_cost, str2env, str2name
from gnn_motion_planning_tpu.config import set_random_seed


@pytest.fixture(scope="module")
def maze2_models():
    _, model, _, model_s, _ = str2name("maze2easy")
    return model, model_s


def test_explore_solves_maze_problems(maze2_models):
    model, model_s = maze2_models
    env, _ = str2env("maze2easy")
    rng = set_random_seed(1234)
    env.rng = rng

    n_success = 0
    for index in range(2000, 2003):
        env.init_new_problem(index)
        result = explore(env, model, model_s, smooth=True, batch=50, t_max=300)
        if result["success"]:
            n_success += 1
            path = np.asarray(result["path"])
            # path endpoints match problem
            np.testing.assert_allclose(
                path[0], np.asarray(env.init_state, np.float32), atol=1e-6
            )
            assert env.in_goal_region(path[-1].astype(np.float64))
            # every edge collision-free
            for aa, bb in zip(path[:-1], path[1:]):
                assert env._edge_fp(aa.astype(np.float64), bb.astype(np.float64))
            # smoothing must not break feasibility and should not hurt cost
            spath = np.asarray(result["smooth_path"])
            for aa, bb in zip(spath[:-1], spath[1:]):
                assert env._edge_fp(aa.astype(np.float64), bb.astype(np.float64))
            assert path_cost(spath) <= path_cost(path) + 1e-3
        # collision accounting is wired through the env counter
        assert env.collision_check_count > 0
    assert n_success >= 2


@pytest.mark.slow
def test_eval_gnn_metrics_shape(maze2_models):
    model, model_s = maze2_models
    env, _ = str2env("maze2easy")
    out = eval_gnn(
        "maze2easy",
        1234,
        env,
        np.arange(2000, 2002),
        model,
        model_s,
        batch=50,
        t_max=200,
    )
    n_success, collision, running_time, solution_cost = out[:4]
    assert 0 <= n_success <= 2
    assert collision > 0


def test_explore_no_smooth_contract(maze2_models):
    """smooth=False returns (path, free, collided) on success and [] on
    failure (reference eval_gnn.py:235-237,276)."""

    model, model_s = maze2_models
    env, _ = str2env("maze2easy")
    rng = set_random_seed(7)
    env.rng = rng
    env.init_new_problem(2000)
    result = explore(env, model, model_s, smooth=False, batch=50, t_max=300)
    assert result == [] or (
        isinstance(result, tuple) and len(result) == 3
    )
