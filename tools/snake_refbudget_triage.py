"""Dissect snake7's reference-budget (t_max=500) failures.

The snake7 registry row needs a documented t_max=2000 override (902/1000
at the reference budget, 995/1000 at 4x). Round-4 experiments show the
gap is NOT closed by better weights (scratch explorer: 228/250, ft:
226/250) nor by the straight-pose sampler bias (229/250), so this tool
answers the remaining question: for each protocol failure, does the
exact 500-sample RGG the protocol run drew contain ANY feasible
init->goal path under the env oracle?

  graph_disconnected  no collision-free path exists in the round-1 RGG:
                      no explorer can solve it at this budget — the
                      failure is sample-coverage-bound (the documented
                      narrow-corridor density argument, BASELINE.md)
  explorer_miss       a feasible path exists in the drawn graph but the
                      GNN-guided search did not find it — model-bound

Replays the protocol RNG stream exactly (config.problem_rng, same
init_new_problem + sample_n_points draws as api/eval_gnn.explore), builds
the same RGG (graphs/knn.build_rgg_edges, reference eval_gnn.py:159-164),
fully collision-checks every free-free edge with the batched oracle, and
runs BFS over the passing edges.

Usage: JAX_PLATFORMS=cpu python tools/snake_refbudget_triage.py [n] [out]
"""

from __future__ import annotations

import json
import sys
from collections import deque
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

OUT = REPO / "assets" / "benchmarks"


def _graph_has_path(env, F, v_np, edges_np):
    """BFS init(0) -> goal(1) over fully-checked free-free RGG edges."""

    src, dst = edges_np
    both_free = (src < F) & (dst < F)
    # undirected: keep one direction, check once
    keep = both_free & (src < dst)
    a, b = src[keep], dst[keep]
    if len(a) == 0:
        return False, 0, 0
    ok = np.asarray(env._batch_edge_free(v_np[a], v_np[b])[0])
    adj = [[] for _ in range(F)]
    for s, t in zip(a[ok], b[ok]):
        adj[s].append(t)
        adj[t].append(s)
    seen = np.zeros(F, bool)
    seen[0] = True
    q = deque([0])
    while q:
        u = q.popleft()
        if u == 1:
            return True, int(len(a)), int(ok.sum())
        for w in adj[u]:
            if not seen[w]:
                seen[w] = True
                q.append(w)
    return False, int(len(a)), int(ok.sum())


def main(n=250, out_name="failures_snake7_refbudget.json", seed=1234, bias=None,
         indexes=None):
    """`indexes`: known-failed problem indexes (e.g. the `failed_indexes`
    list an eval row records). Per-problem RNG streams make each problem's
    draws independent of the rest of the sweep, so classification only
    needs the stream replay + graph check — the 1000-problem explore
    re-run is skipped."""
    import jax.numpy as jnp

    from gnn_motion_planning_tpu.api.eval_gnn import explore
    from gnn_motion_planning_tpu.api.registry import str2env, str2name
    from gnn_motion_planning_tpu.config import problem_rng, set_random_seed
    from gnn_motion_planning_tpu.graphs.knn import build_rgg_edges, k_scaled

    env, idx = str2env("snake7")
    _, model, _, model_s, _ = str2name("snake7")
    if bias:
        env.sampler_bias = bias
    set_random_seed(seed)

    records = []
    n_fail = 0
    t0 = time()
    for index in indexes if indexes is not None else idx[:n]:
        if indexes is None:
            env.rng = problem_rng(seed, int(index))
            env.init_new_problem(int(index))
            # smooth=False returns (path, free, collided) on success and []
            # on a failed final round (api/eval_gnn.py::explore)
            res = explore(env, model, model_s, smooth=False, batch=500, t_max=500)
            if res and res[0]:
                continue
        n_fail += 1

        # replay the protocol stream: same draws as the failed run's round 1
        env.rng = problem_rng(seed, int(index))
        env.init_new_problem(int(index))
        free, collided = env.sample_n_points(500, need_negative=True)
        collided = list(collided)[: len(free)]
        F = len(free) + 2
        N = 2 * F
        d = env.config_dim
        v_np = np.zeros((N, d), np.float32)
        v_np[0] = np.asarray(env.init_state, np.float32)
        v_np[1] = np.asarray(env.goal_state, np.float32)
        v_np[2:F] = np.asarray(free, np.float32)
        C = len(collided)
        if C:
            v_np[F : F + C] = np.asarray(collided, np.float32)
        valid = np.zeros(N, bool)
        valid[: F + C] = True

        el = build_rgg_edges(
            jnp.asarray(v_np), jnp.asarray(valid), n_free=F, k1=k_scaled(30, F)
        )
        alive = np.asarray(el.alive)
        src = np.asarray(el.src)[alive]
        dst = np.asarray(el.dst)[alive]
        has_path, n_edges, n_free_edges = _graph_has_path(
            env, F, v_np, (src, dst)
        )
        records.append(
            {
                "index": int(index),
                "class": "explorer_miss" if has_path else "graph_disconnected",
                "free_samples": int(F - 2),
                "free_free_edges": n_edges,
                "passing_edges": n_free_edges,
            }
        )
        print(
            f"[{time()-t0:7.1f}s] idx {index}: "
            f"{records[-1]['class']} ({n_free_edges}/{n_edges} edges pass)",
            flush=True,
        )
        # incremental checkpoint: a long full-split run that dies keeps
        # every classified failure (partial=True marks it unfinished)
        (OUT / (out_name + ".partial")).write_text(json.dumps(
            {"partial": True, "n_failures_so_far": n_fail,
             "failures": records}))

    summary = {
        "env": "snake7",
        "protocol": {"batch": 500, "t_max": 500, "k": 30, "seed": seed,
                     "sampler_bias": bias},
        "n_problems": int(n),
        "indexes_provided": indexes is not None,
        "n_failures": n_fail,
        "classes": {
            c: sum(r["class"] == c for r in records)
            for c in ("graph_disconnected", "explorer_miss")
        },
        "failures": records,
    }
    out = OUT / out_name
    out.write_text(json.dumps(summary, indent=1))
    (OUT / (out_name + ".partial")).unlink(missing_ok=True)
    print("wrote", out)
    print(json.dumps(summary["classes"]))


if __name__ == "__main__":
    # usage: triage.py <n|eval_row.json> [out_name] [bias]
    # an eval-row json (with "failed_indexes") skips the explore re-run
    arg1 = sys.argv[1] if len(sys.argv) > 1 else "250"
    indexes = None
    n = 250
    if arg1.endswith(".json"):
        row = json.loads(Path(arg1).read_text())
        indexes = row["failed_indexes"]
        n = row["n_problems"]
    else:
        n = int(arg1)
    main(
        n,
        sys.argv[2] if len(sys.argv) > 2 else "failures_snake7_refbudget.json",
        bias=sys.argv[3] if len(sys.argv) > 3 else None,
        indexes=indexes,
    )
