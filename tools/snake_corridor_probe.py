"""Probe the corridor-guided snake sampler on known ref-budget failures.

Takes the failure indexes recorded by tools/snake_refbudget_triage.py
(all `graph_disconnected` — no checkpoint can solve them under uniform
sampling at t_max=500) and re-runs the reference-budget protocol with
env.sampler_bias = "corridor". Reports, per index: does the biased
round-1 RGG contain a feasible path (oracle BFS), and does the GNN
pipeline actually solve it.

Usage: python tools/snake_corridor_probe.py [bias] [triage_json]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# the axon TPU is single-process; probes must not contend with a running
# training chain (see .claude/skills/verify/SKILL.md)
import os  # noqa: E402

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from snake_refbudget_triage import _graph_has_path  # noqa: E402


def main(bias="corridor", triage="assets/benchmarks/failures_snake7_refbudget.json"):
    import jax.numpy as jnp

    from gnn_motion_planning_tpu.api.eval_gnn import explore
    from gnn_motion_planning_tpu.api.registry import str2env, str2name
    from gnn_motion_planning_tpu.config import problem_rng, set_random_seed
    from gnn_motion_planning_tpu.graphs.knn import build_rgg_edges, k_scaled

    rec = json.loads((REPO / triage).read_text())
    indexes = [r["index"] for r in rec["failures"]]
    seed = rec["protocol"]["seed"]

    env, _ = str2env("snake7")
    _, model, _, model_s, _ = str2name("snake7")
    env.sampler_bias = bias
    set_random_seed(seed)

    n_solved = n_conn = 0
    t0 = time()
    for index in indexes:
        env.rng = problem_rng(seed, int(index))
        env.init_new_problem(int(index))
        res = explore(env, model, model_s, smooth=False, batch=500, t_max=500)
        solved = bool(res and res[0])
        checks = env.collision_check_count

        # connectivity of the biased round-1 graph under the oracle
        env.rng = problem_rng(seed, int(index))
        env.init_new_problem(int(index))
        free, collided = env.sample_n_points(500, need_negative=True)
        collided = list(collided)[: len(free)]
        F = len(free) + 2
        N = 2 * F
        v_np = np.zeros((N, env.config_dim), np.float32)
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
        has_path, n_e, n_ok = _graph_has_path(env, F, v_np, (src, dst))

        n_solved += solved
        n_conn += has_path
        print(
            f"[{time()-t0:6.1f}s] idx {index}: solved={solved} "
            f"connected={has_path} checks={checks} ({n_ok}/{n_e} edges pass)",
            flush=True,
        )

    print(
        f"bias={bias}: solved {n_solved}/{len(indexes)}, "
        f"graph connected {n_conn}/{len(indexes)}"
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
