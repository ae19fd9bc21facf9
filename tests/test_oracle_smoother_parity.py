"""Oracle smoother: RNG-stream parity and pruning equivalence.

prune_path was restructured from the reference's tuple-dict Dijkstra
(reference smoother.py:85-126) into a dense vectorised one; these tests pin
(a) that the restructured code produces the same pruned paths and the same
collision_check_count as a direct transcription of the reference algorithm,
and (b) that the RNG draw order of the joint smoothers is exactly the
documented stream (pruning consumes no draws), so training targets are
reproducible across the rewrite.
"""

import numpy as np
import pytest


def _ref_prune_path(path, env, iter=100):
    """Direct transcription of reference smoother.py:85-126 (golden)."""

    from collections import defaultdict

    def create_graph(path, prev, nxt):
        points = path[prev : nxt + 1]
        neighbors, edge_cost = defaultdict(list), defaultdict(list)
        for p1 in points:
            for p2 in points:
                if env._edge_fp(np.asarray(p1), np.asarray(p2)):
                    neighbors[tuple(np.asarray(p1))].append(p2)
                    edge_cost[tuple(np.asarray(p1))].append(
                        float(np.linalg.norm(np.asarray(p1) - np.asarray(p2)))
                    )
        return neighbors, edge_cost

    def dijkstra(points, neighbors, edge_cost, source):
        dists = {tuple(np.asarray(p)): float("inf") for p in points}
        prevs = {}
        dists[tuple(np.asarray(source))] = 0.0
        visited = set()
        while True:
            best, best_d = None, float("inf")
            for p, dv in dists.items():
                if p not in visited and dv < best_d:
                    best, best_d = p, dv
            if best is None:
                return dists, prevs
            visited.add(best)
            for q, c in zip(neighbors.get(best, []), edge_cost.get(best, [])):
                tq = tuple(np.asarray(q))
                if best_d + c < dists.get(tq, float("inf")):
                    dists[tq] = best_d + c
                    prevs[tq] = best

    for _ in range(iter):
        try:
            len_path = len(path)
            crit_idx = []
            for index in range(len(path)):
                if index == 0 or index == len(path) - 1:
                    crit_idx.append(index)
                elif not env._edge_fp(
                    np.asarray(path[index - 1]), np.asarray(path[index + 1])
                ):
                    crit_idx.append(index)
            new_path = [path[0]]
            for prev, nxt in zip(crit_idx[:-1], crit_idx[1:]):
                neighbors, edge_cost = create_graph(path, prev, nxt)
                dists, prevs = dijkstra(
                    path[prev : nxt + 1], neighbors, edge_cost, path[prev]
                )
                partial = []
                current = tuple(np.asarray(path[nxt]))
                target = tuple(np.asarray(path[prev]))
                while current != target:
                    partial.append(current)
                    current = prevs[current]
                partial.reverse()
                new_path.extend(partial)
            path = new_path
            if len(path) == len_path:
                return path
        except Exception:
            break
    return path


@pytest.fixture(scope="module")
def maze_paths():
    """A few planner-quality raw paths on maze2easy problems."""

    from gnn_motion_planning_tpu.api.registry import str2env
    from gnn_motion_planning_tpu.config import problem_rng
    from gnn_motion_planning_tpu.planners.tsa import RRTS_plan

    env, idx = str2env("maze2easy")
    out = []
    for i in idx[:3]:
        env.rng = problem_rng(1234, int(i))
        env.init_new_problem(int(i))
        tree, success, _ = RRTS_plan(env, T=400, stop_when_success=True)
        if success:
            out.append((int(i), [np.asarray(p) for p in tree.path()[0]]))
    assert out, "no RRT* path found for the fixture problems"
    return env, out


def test_prune_path_matches_reference_transcription(maze_paths):
    from gnn_motion_planning_tpu.planners.oracle_smoother import prune_path

    env, cases = maze_paths
    for i, path in cases:
        env.init_new_problem(i)
        c0 = env.collision_check_count
        golden = _ref_prune_path([np.asarray(p) for p in path], env)
        golden_checks = env.collision_check_count - c0

        c1 = env.collision_check_count
        got = prune_path([np.asarray(p) for p in path], env)
        got_checks = env.collision_check_count - c1

        assert len(got) == len(golden)
        np.testing.assert_allclose(
            np.asarray(got, np.float64), np.asarray(golden, np.float64), atol=1e-12
        )
        assert got_checks == golden_checks


def test_prune_consumes_no_rng_and_joint_stream_is_pinned(maze_paths):
    from gnn_motion_planning_tpu.config import HostRNG
    from gnn_motion_planning_tpu.planners.oracle_smoother import (
        joint_smoother_ratio,
        prune_path,
        random_path_smoother,
    )

    env, cases = maze_paths
    i, path = cases[0]
    env.init_new_problem(i)

    # pruning must not touch the stream
    env.rng = HostRNG(99)
    before = env.rng.get_state()
    prune_path([np.asarray(p) for p in path], env)
    after = env.rng.get_state()
    assert np.array_equal(before[1], after[1]) and before[2] == after[2]

    # the joint ratio smoother consumes exactly iter*random_iter draw pairs
    # (uniform(config_dim) then randint), the documented reference order
    # (smoother.py:67-82); replaying that pattern on a twin generator must
    # land on the identical stream position
    iters, random_iter = 2, 17
    env.rng = HostRNG(1234)
    joint_smoother_ratio(
        [np.asarray(p) for p in path], env, iter=iters, random_iter=random_iter
    )
    got_state = env.rng.get_state()

    twin = HostRNG(1234)
    if len(path) > 2:
        for _ in range(iters * random_iter):
            twin.uniform(-env.RRT_EPS, env.RRT_EPS, size=env.config_dim)
            twin.randint(1, len(path) - 1)
    want_state = twin.get_state()
    assert np.array_equal(got_state[1], want_state[1])
    assert got_state[2] == want_state[2]
