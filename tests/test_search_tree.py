"""SearchTree SoA store: reference insert/rewire/path semantics + planners.

The store was redesigned from the reference's list-append implementation
(reference algorithm/search_tree.py:5-113) to preallocated geometric-growth
arrays; these tests pin the behavioral contract the planners rely on.
"""

import numpy as np
import pytest


class _LineEnv:
    """Trivial 2D env: no obstacles, goal at (1, 0)."""

    RRT_EPS = 5e-2
    dim = 2

    def __init__(self):
        self.init_state = np.zeros(2)
        self.goal_state = np.array([1.0, 0.0])
        self.collision_check_count = 0

    def distance(self, a, b):
        return np.linalg.norm(np.asarray(a) - np.asarray(b), axis=-1)


def test_insert_rewire_path_semantics():
    from gnn_motion_planning_tpu.planners.search_tree import (
        SearchTree,
        insert_new_state,
        rewire_to,
        set_cost,
    )

    env = _LineEnv()
    tree = SearchTree(env, env.init_state, model=None, dim=2)
    # chain 0 -> 1 -> 2, then a shortcut 0 -> 3 near node 2
    a = insert_new_state(env, tree, np.array([0.3, 0.4]), None, 0, True, False)
    b = insert_new_state(env, tree, np.array([0.6, 0.0]), None, a, True, False)
    g = insert_new_state(env, tree, np.array([1.0, 0.0]), None, b, True, True)
    assert [a, b, g] == [1, 2, 3]
    assert len(tree.states) == 4
    assert list(tree.non_terminal_idxes) == [0, 1, 2]  # goal node is terminal
    assert tree.in_goal_region[-1]

    # reference path(): backtrack via rewired parents, costs are negative
    # partial sums from the goal
    path, costs = tree.path()
    np.testing.assert_allclose(path[0], env.init_state)
    np.testing.assert_allclose(path[-1], env.goal_state)
    assert len(path) == 4 and costs[-1] == 0.0
    want_total = -(
        np.linalg.norm([0.3, 0.4])
        + np.linalg.norm([0.3, -0.4])
        + 0.4
    )
    np.testing.assert_allclose(costs[0], want_total, rtol=1e-12)

    # rewire the goal straight to the root: path shortens to 2 nodes
    rewire_to(tree, g, 0)
    path2, costs2 = tree.path()
    assert len(path2) == 2
    np.testing.assert_allclose(costs2[0], -1.0, rtol=1e-12)

    # set_cost on the last node updates the best path length (goal node)
    set_cost(tree, -1, 1.0)
    assert tree.path_lengths[-1] == 1.0
    set_cost(tree, -1, 2.0)  # worse cost: best length unchanged
    assert tree.path_lengths[-1] == 1.0


def test_growth_beyond_initial_capacity():
    from gnn_motion_planning_tpu.planners.search_tree import (
        SearchTree,
        insert_new_state,
    )

    env = _LineEnv()
    tree = SearchTree(env, env.init_state, model=None, dim=2)
    rng = np.random.RandomState(0)
    states = rng.randn(600, 2)
    for k, s in enumerate(states):
        insert_new_state(env, tree, s, None, k, True, False)
    assert len(tree.states) == 601
    np.testing.assert_allclose(tree.states[1:], states)
    assert list(tree.parents[1:]) == list(range(600))
    # non-terminal bookkeeping grew alongside
    assert len(tree.non_terminal_idxes) == 601


def test_bandit_columns_match_reference_recurrence():
    """visits/w/w_sum updates must follow reference search_tree.py:65-113."""

    from gnn_motion_planning_tpu.planners.search_tree import (
        SearchTree,
        compute_w,
        insert_new_state,
        state_kernel,
    )

    class _Model:
        def pred_value(self, s):
            return float(np.sum(np.asarray(s)))

    env = _LineEnv()
    model = _Model()
    tree = SearchTree(env, env.init_state, model=model, dim=2)
    assert tree.visits[0] == 1
    rng = np.random.RandomState(1)
    for k in range(8):
        insert_new_state(env, tree, rng.randn(2) * 0.1, model, k % 2, True, False)

    # recompute w of every node from scratch; only nodes whose w was
    # refreshed on their last involvement are exact, but w_sum must equal
    # the sum of the stored column by construction
    np.testing.assert_allclose(tree.w_sum, np.sum(tree.w), rtol=1e-9)
    # stored parent w values reflect the tree state at their last update;
    # the most recently refreshed parent is exact vs a scratch recompute
    last_parent = 7 % 2
    np.testing.assert_allclose(
        tree.w[last_parent], compute_w(env, tree, idx=last_parent), rtol=1e-9
    )
    # kernel definition (reference :100-113)
    np.testing.assert_allclose(
        state_kernel(env, np.zeros(2), np.array([env.RRT_EPS, 0.0])),
        np.exp(-1.0),
        rtol=1e-12,
    )
    # values recorded via pred_value
    np.testing.assert_allclose(tree.state_values[0], 0.0)


def test_rrt_star_plans_on_maze2():
    """End-to-end: RRT* over the store solves an easy maze problem and the
    returned path is collision-free under the env oracle."""

    from gnn_motion_planning_tpu.api.registry import str2env
    from gnn_motion_planning_tpu.config import problem_rng
    from gnn_motion_planning_tpu.planners.tsa import RRTS_plan

    env, idx = str2env("maze2easy")
    env.rng = problem_rng(1234, int(idx[0]))
    env.init_new_problem(int(idx[0]))
    tree, success, n_samples = RRTS_plan(env, T=500, stop_when_success=True)
    assert success
    path, _ = tree.path()
    assert len(path) >= 2
    for q1, q2 in zip(path[:-1], path[1:]):
        assert env._edge_fp(np.asarray(q1), np.asarray(q2))
