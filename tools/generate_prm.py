"""Generate PRM training pickles (data/pkl/*_prm_*.pkl).

Equivalent of the reference's dataset generation main (reference:
algorithm/dijkstra.py:79-108): per problem, sample 100-400 uniform
configurations, build a kNN(5) graph, eagerly collision-check every edge
(batched in one device call here), and pickle
(points, neighbors, edge_cost, edge_index, edge_free) tuples.

The reference's training pickles are not shipped; this regenerates them for
all env families. Usage: python tools/generate_prm.py <maze2|maze3|kuka7|ur5|snake7|kuka13|kuka14> [n]
"""

from __future__ import annotations

import pickle
import sys
from collections import defaultdict
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from gnn_motion_planning_tpu.config import HostRNG  # noqa: E402
from gnn_motion_planning_tpu.graphs.knn_host import knn_graph_numpy  # noqa: E402

INFINITY = float("inf")

# (output pickle, #graphs, train-problem limit): problems cycle over
# [0, train_limit) ONLY, keeping the registry eval splits (2000-3000,
# str2env) out of the training data. The trainer pairs graphs[i] with env
# problem i (reference train_explorer.py:125-128: obstacle tokens and PRM
# edge labels must describe the SAME scene), so every pickle is generated
# from the trainer env's own problem file — the reference's shipped
# dijkstra __main__ nominally reads the separate kukas_7_4000.pkl
# (dijkstra.py:84), whose scenes do NOT match the training env's
# kukas_7_3000.pkl indexes; that upstream pairing quirk is deliberately
# not reproduced.
OUT_NAMES = {
    "maze2": ("maze_prm_4000.pkl", 4000, 2000),
    "maze3": ("maze_prm_3.pkl", 3000, 2000),
    "kuka7": ("kuka_prm_4000.pkl", 4000, 2000),
    "ur5": ("ur5_prm_3000.pkl", 3000, 2000),
    "snake7": ("snake_prm_3000.pkl", 3000, 2000),
    "kuka13": ("kuka_prm_13.pkl", 3000, 2000),
    "kuka14": ("kuka_prm_14.pkl", 3000, 2000),
}


def construct_graph_batched(env, points):
    """Reference construct_graph with one fused device call for all edges."""

    edge_index = knn_graph_numpy(points, k=5, loop=True)
    a = points[edge_index[:, 0]]
    b = points[edge_index[:, 1]]
    if getattr(env, "_native", None) is not None:
        # native C++ core: the same oracle the env's own _edge_fp serves
        # (kuka.py::_edge_fp prefers _native), and ~50x faster than the
        # device kernels when this tool is pinned to the CPU backend
        free = np.zeros(len(a), bool)
        counts = np.zeros(len(a), np.int64)
        for i, (x, y) in enumerate(zip(a, b)):
            free[i], counts[i] = env._native.edge_free(x, y)
        env.collision_check_count += int(counts.sum())
    elif hasattr(env, "_batch_edge_free"):
        free, counts = env._batch_edge_free(a, b)
        env.collision_check_count += int(counts.sum())
    else:
        free = np.array(
            [env._edge_fp(x, y) for x, y in zip(a, b)], bool
        )
    cost = np.linalg.norm(b - a, axis=-1)

    edge_cost = defaultdict(list)
    neighbors = defaultdict(list)
    edge_free = []
    for i, edge in enumerate(edge_index):
        s, d = int(edge[0]), int(edge[1])
        edge_cost[d].append(float(cost[i]) if free[i] else INFINITY)
        edge_free.append(bool(free[i]))
        neighbors[d].append(s)
    return edge_cost, neighbors, edge_index, edge_free


def main(env_name: str, n_problems=None, seed: int = 1234, resume: bool = False):
    from gnn_motion_planning_tpu.api.registry import str2env

    out_name, default_n, train_limit = OUT_NAMES[env_name]
    n_problems = n_problems or default_n
    lookup = {"maze2": "maze2easy", "maze3": "maze3"}
    env, _ = str2env(lookup.get(env_name, env_name))

    data = []
    start = 0
    if resume:
        prev = REPO / "assets" / "data" / "pkl" / out_name
        if prev.exists():
            with open(prev, "rb") as f:
                data = pickle.load(f)
            start = len(data)
            print(f"resuming at graph {start}/{n_problems}", flush=True)
    # training-data streams need not be contiguous across a resume; offset
    # the seed so the continued run draws fresh graphs rather than repeats
    rng = HostRNG(seed + start)
    env.rng = rng

    n_avail = len(getattr(env, "problems", None) or env.order)
    cycle = min(train_limit, n_avail) if train_limit else n_avail

    t0 = time()
    for index in range(start, n_problems):
        env.init_new_problem(index % cycle)
        points = np.asarray(env.uniform_sample(n=int(rng.randint(100, 400))))
        edge_cost, neighbors, edge_index, edge_free = construct_graph_batched(env, points)
        # reference pickle schema (dijkstra.py:97): points first
        data.append((points, neighbors, edge_cost, edge_index, edge_free))
        if (index + 1) % 50 == 0:
            print(
                f"{index + 1}/{n_problems} "
                f"({(time() - t0) / (index + 1 - start):.2f}s/problem)",
                flush=True,
            )
            out = REPO / "assets" / "data" / "pkl" / out_name
            out.parent.mkdir(parents=True, exist_ok=True)
            with open(out, "wb") as f:
                pickle.dump(data, f)

    out = REPO / "assets" / "data" / "pkl" / out_name
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "wb") as f:
        pickle.dump(data, f)
    print(f"wrote {len(data)} graphs -> {out}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(
        args[0],
        int(args[1]) if len(args) > 1 else None,
        resume="--resume" in sys.argv,
    )
