"""BIT* planner: end-to-end solves + the owned edge-queue prune semantics.

The reference's queue filter (reference bit_star.py:320-322) self-compares
g(v)+h(v,x) < g(v) — always false — silently dropping every queued edge into
a rewired vertex. This framework implements the intended BIT* semantics:
keep (v, x) while g(v) + c_hat(v, x) < g(x). These tests pin both the
semantics and that the planner still solves problems efficiently.
"""

import numpy as np

from gnn_motion_planning_tpu.api.registry import str2env
from gnn_motion_planning_tpu.config import set_random_seed
from gnn_motion_planning_tpu.planners.bit_star import BITStar

INF = float("inf")


def test_bit_star_solves_maze():
    env, idx = str2env("maze2easy")
    env.rng = set_random_seed(1234)
    succ = 0
    checks = []
    for i in idx[:5]:
        env.init_new_problem(int(i))
        bit = BITStar(env, batch_size=50, T=1000, sampling=None)
        samples, edges, n_checks, cost, T, t = bit.plan(
            INF, refine_time_budget=0, time_budget=60
        )
        if cost != INF:
            succ += 1
            path = bit.get_best_path()
            assert np.allclose(path[0], env.init_state)
            assert np.allclose(path[-1], env.goal_state)
            # path is collision-free edge by edge
            for a, b in zip(path[:-1], path[1:]):
                assert env._edge_fp(np.asarray(a), np.asarray(b))
        checks.append(n_checks)
    assert succ >= 4, f"only {succ}/5 BIT* successes"
    assert np.mean(checks) < 20000


def test_edge_queue_prune_semantics():
    """Queued edges into a rewired vertex survive iff they can still improve
    it: g(v) + c_hat(v, x) < g(x)."""

    env, idx = str2env("maze2easy")
    env.rng = set_random_seed(1234)
    env.init_new_problem(int(idx[0]))
    bit = BITStar(env, batch_size=50, T=1000, sampling=None)
    bit.setup_planning()

    x = (0.5, 0.5)
    near = (0.45, 0.5)  # could still improve x: g + c_hat < g(x)
    far = (-0.9, -0.9)  # cannot: g + c_hat >= g(x)
    other = (0.1, 0.1)  # different target, must always survive
    bit.g_scores[x] = 1.0
    bit.g_scores[near] = 0.9
    bit.g_scores[far] = 0.9
    bit.g_scores[other] = 0.0
    # get_g_score treats parentless vertices as unreached (INF); register one
    for v in (x, near, far, other):
        bit.edges[v] = bit.start

    import heapq

    bit.edge_queue = []
    for e in [(near, x), (far, x), (near, other)]:
        heapq.heappush(bit.edge_queue, ((0.0, 0.0), e))

    # replicate the loop's prune for a rewired vertex x
    kept = [
        item
        for item in bit.edge_queue
        if item[1][1] != x
        or bit.get_g_score(item[1][0]) + bit.heuristic_cost(item[1][0], item[1][1])
        < bit.get_g_score(x)
    ]
    kept_edges = {item[1] for item in kept}
    assert (near, x) in kept_edges  # 0.9 + 0.05 < 1.0
    assert (far, x) not in kept_edges  # 0.9 + ~2 >= 1.0
    assert (near, other) in kept_edges


def test_bit_star_variants():
    """BITStarTrack records explored nodes/edges; BITStarTree plans from
    multiple roots and backtracks to whichever root won."""

    from gnn_motion_planning_tpu.planners.bit_star_variants import (
        BITStarTrack,
        BITStarTree,
    )

    env, idx = str2env("maze2easy")
    env.rng = set_random_seed(7)
    env.init_new_problem(int(idx[0]))

    track = BITStarTrack(env, batch_size=50, T=300)
    *_, cost, _, _ = track.plan(INF, refine_time_budget=0, time_budget=30)
    assert track.explored_edges, "tracking variant recorded no edges"
    assert len(track.explored_nodes) >= 2
    assert all(
        0 <= a < len(track.explored_nodes) and 0 <= b < len(track.explored_nodes)
        for a, b in track.explored_edges
    )

    env.rng = set_random_seed(7)
    env.init_new_problem(int(idx[0]))
    second = np.clip(
        np.asarray(env.goal_state) + 0.05, -0.95, 0.95
    )  # a second root near the goal makes the forest trivially solvable
    tree = BITStarTree(env, [env.init_state, second], batch_size=50, T=600)
    *_, cost, _, _ = tree.plan(INF, refine_time_budget=0, time_budget=30)
    if cost != INF:
        path = tree.get_best_path()
        roots = {tuple(r) for r in tree.starts}
        assert tuple(path[0]) in roots
        assert np.allclose(path[-1], env.goal_state)
