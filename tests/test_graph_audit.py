"""graphs/audit.py: full-check + connectivity helpers used by triage."""

import numpy as np

from gnn_motion_planning_tpu.graphs.audit import (
    checked_free_edges,
    component_from,
    protocol_rgg_connected,
    shortest_feasible_path,
)
from gnn_motion_planning_tpu.graphs.knn import EdgeList


def test_component_and_shortest_path():
    # 0-2-1 feasible, 0-1 direct blocked, node 3 isolated
    v = np.array([[0, 0], [1, 0], [0.5, 0.5], [9, 9]], np.float32)
    a = np.array([0, 0, 2])
    b = np.array([1, 2, 1])
    ok = np.array([False, True, True])
    comp = component_from(4, a, b, ok)
    assert comp[1] and comp[2] and not comp[3]
    assert shortest_feasible_path(v, 4, a, b, ok) == [0, 2, 1]
    # fully blocked -> disconnected
    ok0 = np.zeros(3, bool)
    assert not component_from(4, a, b, ok0)[1]
    assert shortest_feasible_path(v, 4, a, b, ok0) is None


def test_protocol_rgg_connected_maze():
    """A solved maze2easy problem's protocol RGG must be connected, and
    the check must leave per-problem replay state consistent (it re-seeds
    the env itself)."""

    from gnn_motion_planning_tpu.api.registry import str2env

    env, idx = str2env("maze2easy")
    rep = protocol_rgg_connected(env, 1234, int(idx[0]))
    assert rep["connected"], rep
    assert rep["init_degree_free"] > 0 and rep["goal_degree_free"] > 0
    assert rep["edges_free"] <= rep["edges_checked"]


def test_checked_free_edges_uses_free_prefix_only():
    from gnn_motion_planning_tpu.api.registry import str2env

    env, idx = str2env("maze2easy")
    env.init_new_problem(int(idx[0]))
    v = np.array([[0.0, 0.0], [0.1, 0.0], [0.9, 0.9], [0.95, 0.9]], np.float32)
    edges = EdgeList(
        np.array([0, 2, 1], np.int32),
        np.array([1, 3, 0], np.int32),
        np.ones(3, bool),
    )
    a, b, ok = checked_free_edges(env, v, 2, edges)  # only nodes 0,1 free
    assert list(a) == [0] and list(b) == [1]
