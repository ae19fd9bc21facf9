"""Dissect kuka13's planner_miss failures: coverage or ranking?

Round-4 triage (assets/benchmarks/failures_kuka13.json) classified 3
failures as planner_miss — a capsule-valid witness exists but the GNN
pipeline fails even at 4x budget — the only confirmed "model-bound"
failures in the whole sweep. Two of them have explored_nodes=1: nothing
was expandable from init, which smells like RGG disconnection (a
sampling question), not edge ranking (a model question).

For each failed index this probe replays the protocol RNG stream, builds
the exact round-1 RGG, fully collision-checks every free-free edge with
the batched oracle, and reports:

  * init/goal component connectivity (BFS over passing edges);
  * the same with k1 doubled (same samples, denser graph) — separates
    kNN-sparsity from sample-coverage;
  * the degree of init/goal in the checked graph;
  * if connected: the shortest feasible path and, per path edge, the
    explorer's score rank among all alive edges from the same source —
    i.e. would greedy expansion have reached it.

Usage: JAX_PLATFORMS=cpu python tools/kuka13_miss_probe.py [env=kuka13]
Writes assets/benchmarks/miss_probe_<env>.json.
"""

from __future__ import annotations

import heapq
import json
import sys
from collections import deque
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _checked_graph(env, v_np, F, edges):
    """Fully oracle-check every free-free RGG edge; return (a, b, ok)."""

    src = np.asarray(edges.src)
    dst = np.asarray(edges.dst)
    alive = np.asarray(edges.alive)
    keep = alive & (src < F) & (dst < F) & (src < dst)
    a, b = src[keep], dst[keep]
    ok = np.asarray(env._batch_edge_free(v_np[a], v_np[b])[0])
    return a, b, ok


def _bfs_component(F, a, b, ok, start=0):
    adj = [[] for _ in range(F)]
    for s, t in zip(a[ok], b[ok]):
        adj[s].append(t)
        adj[t].append(s)
    seen = np.zeros(F, bool)
    seen[start] = True
    q = deque([start])
    while q:
        u = q.popleft()
        for w in adj[u]:
            if not seen[w]:
                seen[w] = True
                q.append(w)
    return seen


def _shortest_feasible(v_np, F, a, b, ok):
    adj = [[] for _ in range(F)]
    for s, t in zip(a[ok], b[ok]):
        w = float(np.linalg.norm(v_np[s].astype(np.float64) - v_np[t]))
        adj[s].append((t, w))
        adj[t].append((s, w))
    dist = np.full(F, np.inf)
    prev = np.full(F, -1, np.int64)
    dist[0] = 0
    pq = [(0.0, 0)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist[u]:
            continue
        for t, w in adj[u]:
            if d + w < dist[t]:
                dist[t] = d + w
                prev[t] = u
                heapq.heappush(pq, (d + w, t))
    if not np.isfinite(dist[1]):
        return None
    path = [1]
    while path[-1] != 0:
        path.append(int(prev[path[-1]]))
    return path[::-1]


def probe(name: str = "kuka13", seed: int = 1234, bias: str | None = None):
    import jax.numpy as jnp

    from gnn_motion_planning_tpu.api.registry import str2env, str2name
    from gnn_motion_planning_tpu.config import problem_rng
    from gnn_motion_planning_tpu.graphs.knn import build_rgg_edges, k_scaled
    from gnn_motion_planning_tpu.models.explorer import explorer_forward

    failures = json.loads(
        (REPO / "assets" / "benchmarks" / f"failures_{name}.json").read_text()
    )
    targets = [
        f["index"] for f in failures["failures"] if f["class"] == "planner_miss"
    ]
    env, _ = str2env(name)
    if bias:
        env.sampler_bias = bias  # opt-in (envs/kuka.py::_bias_draws)
    _, model, _, _, _ = str2name(name)
    d = env.config_dim

    records = []
    for index in targets:
        t0 = time()
        env.rng = problem_rng(seed, int(index))
        env.init_new_problem(int(index))
        free, collided = env.sample_n_points(500, need_negative=True)
        collided = list(collided)[: len(free)]
        F = len(free) + 2
        N = 2 * F
        v_np = np.zeros((N, d), np.float32)
        v_np[0] = np.asarray(env.init_state, np.float32)
        v_np[1] = np.asarray(env.goal_state, np.float32)
        v_np[2:F] = np.asarray(free, np.float32)
        C = len(collided)
        if C:
            v_np[F : F + C] = np.asarray(collided, np.float32)
        valid = np.arange(N) < F + C

        rec = {"index": int(index)}
        k1 = k_scaled(30, F)
        for label, kk in (("protocol_k", k1), ("double_k", 2 * k1)):
            edges = build_rgg_edges(jnp.asarray(v_np), jnp.asarray(valid), F, kk)
            a, b, ok = _checked_graph(env, v_np, F, edges)
            comp = _bfs_component(F, a, b, ok)
            deg_init = int(ok[(a == 0) | (b == 0)].sum())
            deg_goal = int(ok[(a == 1) | (b == 1)].sum())
            rec[label] = {
                "k1": int(kk),
                "edges_checked": int(len(a)),
                "edges_free": int(ok.sum()),
                "init_degree_free": deg_init,
                "goal_degree_free": deg_goal,
                "init_component_size": int(comp.sum()),
                "connected": bool(comp[1]),
            }
            if label == "protocol_k":
                proto_edges, proto_ok = (a, b), ok
                proto_graph = edges

        # ranking question only meaningful if a feasible path exists
        path = _shortest_feasible(v_np, F, *proto_edges, proto_ok)
        if path is not None:
            obstacles, obs_mask = env.obs_tokens()
            scores = np.asarray(
                explorer_forward(
                    model.params, model.cfg, jnp.asarray(v_np),
                    jnp.asarray(valid),
                    jnp.asarray(v_np[1]),
                    proto_graph.src, proto_graph.dst, proto_graph.alive,
                    jnp.asarray(obstacles), jnp.asarray(obs_mask), 5,
                )
            )
            ranks = []
            for s, t in zip(path[:-1], path[1:]):
                row = scores[s]  # [src, dst] read orientation
                alive_scores = row[np.nonzero(row)[0]]
                rank = int((alive_scores > row[t]).sum())
                ranks.append({"edge": [int(s), int(t)],
                              "score": float(row[t]),
                              "rank_in_row": rank,
                              "row_nonzero": int(len(alive_scores))})
            rec["feasible_path_len"] = len(path)
            rec["path_edge_ranks"] = ranks
        rec["wall_s"] = round(time() - t0, 1)
        records.append(rec)
        print(json.dumps(rec)[:400], flush=True)

    stem = f"miss_probe_{name}" + (f"_bias_{bias}" if bias else "")
    out = REPO / "assets" / "benchmarks" / f"{stem}.json"
    out.write_text(json.dumps(
        {"env": name, "seed": seed, "bias": bias, "targets": targets,
         "records": records}, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bias = None
    if "--bias" in sys.argv:
        bias = sys.argv[sys.argv.index("--bias") + 1]
    probe(args[0] if args else "kuka13", bias=bias)
