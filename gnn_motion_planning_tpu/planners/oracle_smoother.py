"""Oracle path smoothers (host-side training targets and baselines).

Equivalents of the reference smoothing suite (reference: smoother.py:67-230):
random perturbation smoothing, critical-node pruning via Dijkstra
shortcutting, their joint iteration, and the ratio variant used as the
smoother-GNN training target. These run on the host against the env oracle
(they are data-generation / comparison tools, not the serving path — the
serving path is the compiled model smoother in planners/gnn_smooth.py).
"""

from __future__ import annotations

from collections import defaultdict
from copy import deepcopy

import numpy as np


def _rand(env):
    return env.rng if getattr(env, "rng", None) is not None else np.random


def path_cost(path) -> float:
    path = np.asarray(path, np.float64)
    if len(path) < 2:
        return 0.0
    return float(np.sum(np.linalg.norm(path[1:] - path[:-1], axis=-1)))


def random_path_smoother(path, eps, env, iter: int = 100):
    """Random perturbation accept-if-shorter (smoother.py:67-82)."""

    path = deepcopy(path)
    if len(path) > 2:
        rng = _rand(env)
        for _ in range(iter):
            action = rng.uniform(-eps, eps, size=env.config_dim)
            node_idx = rng.randint(1, len(path) - 1)
            prev_node = np.asarray(path[node_idx])
            new_node = path[node_idx] + action
            if (
                env._state_fp(np.asarray(new_node))
                and env._edge_fp(np.asarray(new_node), np.asarray(path[node_idx - 1]))
                and env._edge_fp(np.asarray(new_node), np.asarray(path[node_idx + 1]))
            ):
                if np.linalg.norm(path[node_idx + 1] - new_node) + np.linalg.norm(
                    path[node_idx - 1] - new_node
                ) < np.linalg.norm(path[node_idx + 1] - prev_node) + np.linalg.norm(
                    path[node_idx - 1] - prev_node
                ):
                    path[node_idx] = tuple(new_node)
    return path


def _dijkstra_points(points, neighbors, edge_cost, source):
    """Dijkstra over a small point graph keyed by tuples
    (reference algorithm/dijkstra.py:49-76 specialised to prune_path use)."""

    dists = {tuple(np.asarray(p)): float("inf") for p in points}
    prevs = {}
    src = tuple(np.asarray(source))
    dists[src] = 0.0
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
            nd = best_d + c
            if nd < dists.get(tq, float("inf")):
                dists[tq] = nd
                prevs[tq] = best
    return dists, prevs


def _create_graph(path, env, prev, nxt):
    """All-pairs visibility graph on a path window (smoother.py:85-94)."""

    points = path[prev : nxt + 1]
    neighbors = defaultdict(list)
    edge_cost = defaultdict(list)
    for p1 in points:
        for p2 in points:
            if env._edge_fp(np.asarray(p1), np.asarray(p2)):
                neighbors[tuple(np.asarray(p1))].append(p2)
                edge_cost[tuple(np.asarray(p1))].append(
                    float(np.linalg.norm(np.asarray(p1) - np.asarray(p2)))
                )
    return neighbors, edge_cost


def prune_path(path, env, iter: int = 100):
    """Critical-node Dijkstra shortcutting (smoother.py:97-126)."""

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
                neighbors, edge_cost = _create_graph(path, env, prev, nxt)
                dists, prevs = _dijkstra_points(
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


def joint_smoother(path, env, iter, random_iter: int = 100, prune_iter: int = 100):
    """Alternating random smoothing + pruning (smoother.py:129-133)."""

    for _ in range(iter):
        path = random_path_smoother(path, env.RRT_EPS, env, iter=random_iter)
        path = prune_path(path, env, iter=prune_iter)
    return path


def joint_smoother_ratio(
    path, env, iter: int = 5, random_iter: int = 100, prune_iter: int = 100
):
    """Training target: smooth then redistribute dropped waypoints along
    the pruned segments (smoother.py:136-151)."""

    for _ in range(iter):
        path = random_path_smoother(path, env.RRT_EPS, env, iter=random_iter)
        shorten = prune_path(path, env, iter=prune_iter)
        random_idx = prune_idx = 0
        while prune_idx != len(shorten):
            nxt = random_idx
            while not np.array_equal(
                np.asarray(shorten[prune_idx]), np.asarray(path[nxt])
            ):
                nxt += 1
            seg_a = np.asarray(path[random_idx])
            seg_b = np.asarray(path[nxt])
            for inter in range(random_idx + 1, nxt):
                path[inter] = tuple(
                    (seg_b - seg_a) * (inter - random_idx) / (nxt - random_idx)
                    + seg_a
                )
            prune_idx += 1
            random_idx = nxt
    return path


def interpolate_path(env, path, eps=None):
    """Densify a path at eps resolution (smoother.py:219-230)."""

    if eps is None:
        eps = env.RRT_EPS
    path = np.asarray(path)
    out = []
    for n1, n2 in zip(path[:-1], path[1:]):
        dist = np.linalg.norm(n2 - n1)
        K = int(np.ceil(dist / eps))
        for k in range(K):
            out.append(n1 + (n2 - n1) * k / K)
    out.append(path[-1])
    return out
