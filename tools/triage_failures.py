"""Failure triage for the registry benchmark sweeps.

For every problem the protocol GNN sweep fails (reference success-rate
metric, eval_gnn.py:128,136), dissect WHY and classify:

  budget_exhaustion    solved by the same pipeline at 4x the sample budget
                       (t_max) — the problem is GNN-solvable, the protocol
                       budget is what's missing
  oracle_conservatism  the dataset's witness path exists but our calibrated
                       capsule oracle blocks it while the sound hull-surface
                       verifier (envs/strict.py) says it is collision-free:
                       the capsule approximation removed the corridor
  graph_disconnected   a witness exists (capsule-valid dataset path, or
                       BIT* solves it), but the exact protocol RGG draw
                       contains NO feasible init->goal path (full oracle
                       check + BFS, graphs/audit.py) — sample-coverage
                       bound: no explorer can solve a disconnected graph
  planner_miss         a witness corridor exists under OUR oracle AND the
                       protocol RGG is connected, yet the GNN pipeline
                       misses it even at 4x budget — the only genuinely
                       model-bound class
  presumed_hard        no witness found: 4x-budget GNN, the dataset witness
                       (if any), and a 60 s BIT* run all fail — consistent
                       with an unsolvable / near-unsolvable instance

Each failure record carries the evidence: explored-node count and last
frontier size at protocol budget, witness-edge verdicts (capsule + strict),
and the retry outcomes. Writes assets/benchmarks/failures_<env>.json, which
BASELINE.md's "Residual failures" section summarizes.

Usage: python tools/triage_failures.py <env> [n_problems]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

OUT = REPO / "assets" / "benchmarks"

# envs whose oracle is exact (grid lookup) — no capsule/hull question
EXACT_ORACLE = {"maze2", "maze2easy", "maze2hard", "maze3", "snake7"}


def _strict_checker(name, env):
    """Hull-surface strict checker (moved to envs/strict.py::strict_checker
    in round 5 so the planner's strict-fallback stage shares it)."""

    from gnn_motion_planning_tpu.envs.strict import strict_checker

    return strict_checker(env)


def _witness_verdicts(env, witness, strict):
    """Per-edge capsule verdicts on the stored witness path, plus strict
    verdicts on the capsule-blocked edges. Collision counters restored."""

    from gnn_motion_planning_tpu.envs.strict import validate_path_strict

    c0 = env.collision_check_count
    blocked = []
    for a, b in zip(witness[:-1], witness[1:]):
        blocked.append(not env._edge_fp(np.asarray(a), np.asarray(b)))
    env.collision_check_count = c0

    strict_free_blocked = 0
    if strict is not None and any(blocked):
        for i, is_blocked in enumerate(blocked):
            if not is_blocked:
                continue
            hits = validate_path_strict(
                env, [np.asarray(witness[i]), np.asarray(witness[i + 1])], strict
            )
            if hits == 0:
                strict_free_blocked += 1
    return sum(blocked), len(blocked), strict_free_blocked


def triage(name: str, n_problems: int = 1000, seed: int = 1234):
    from gnn_motion_planning_tpu.api.eval_gnn import explore
    from gnn_motion_planning_tpu.api.registry import (
        scalar_overrides,
        str2env,
        str2name,
    )
    from gnn_motion_planning_tpu.config import problem_rng
    from gnn_motion_planning_tpu.planners.bit_star import BITStar

    env, indexes = str2env(name)
    _, model, _, model_s, _ = str2name(name)
    over = scalar_overrides(name)
    t_max = over.get("t_max", 500)

    idx = list(indexes[:n_problems])
    failures = []
    solutions = []  # the sweep doubles as the registry GNN row (same
    # protocol: per-problem streams, eval_gnn.py:128-142 metric block)
    times = []
    t_start = time()
    strict = None

    from gnn_motion_planning_tpu.api.eval_gnn import path_cost

    for i in idx:
        env.rng = problem_rng(seed, int(i))
        env.init_new_problem(int(i))
        t_p = time()
        r = explore(env, model, model_s, smooth=True, **over)
        times.append(time() - t_p)
        solutions.append(
            (
                r["success"],
                path_cost(r["smooth_path"]),
                r["c_explore"] + r["c_smooth"],
                r["total"],
            )
        )
        if r["success"]:
            continue

        rec = {
            "index": int(i),
            "explored_nodes": len(r["explored"]),
            "sampled_nodes": int(r["v"].shape[0] // 2),
            "last_frontier_state": np.asarray(
                r["v"][r["explored"][-1]]
            ).tolist()
            if r["explored"]
            else None,
        }

        # retry A: same pipeline, 4x sample budget (independent stream so
        # the protocol draws don't constrain the retry)
        env.rng = problem_rng(seed + 7, int(i))
        env.init_new_problem(int(i))
        big = dict(over)
        big["t_max"] = 4 * t_max
        r4 = explore(env, model, model_s, smooth=True, **big)
        rec["retry_4x_budget"] = bool(r4["success"])
        if r4["success"]:
            rec["retry_4x_nodes"] = len(r4["v"]) // 2

        # witness-path verdicts (arm datasets store a solvability witness)
        witness = getattr(env, "path", None)
        rec["witness_len"] = len(witness) if witness is not None else 0
        if witness is not None and len(witness) >= 2:
            if name not in EXACT_ORACLE and strict is None:
                strict = _strict_checker(name, env)
            n_blocked, n_edges, strict_free = _witness_verdicts(
                env, witness, strict
            )
            rec["witness_edges"] = int(n_edges)
            rec["witness_edges_capsule_blocked"] = int(n_blocked)
            rec["witness_blocked_but_strict_free"] = int(strict_free)

        # retry B: classical sampler with a generous budget
        if not r4["success"]:
            env.rng = problem_rng(seed + 13, int(i))
            env.init_new_problem(int(i))
            c0 = env.collision_check_count
            bit = BITStar(env, batch_size=100, T=1500)
            try:
                _, _, _, cost, _, _ = bit.plan(
                    float("inf"), refine_time_budget=0, time_budget=60
                )
                rec["retry_bitstar"] = bool(np.isfinite(cost))
            except Exception as e:  # pragma: no cover - defensive
                rec["retry_bitstar"] = False
                rec["bitstar_error"] = repr(e)
            env.collision_check_count = c0
        else:
            rec["retry_bitstar"] = None  # not needed

        # classification (see module docstring for the taxonomy)
        if rec["retry_4x_budget"]:
            rec["class"] = "budget_exhaustion"
        elif rec.get("witness_blocked_but_strict_free", 0) > 0:
            rec["class"] = "oracle_conservatism"
        elif (
            rec.get("witness_edges_capsule_blocked", 1) == 0
            and rec.get("witness_edges", 0) > 0
        ) or rec.get("retry_bitstar"):
            # a witness exists under our oracle — but before blaming the
            # model, check whether the exact protocol RGG contains ANY
            # feasible path (round-5 finding: all three round-4 kuka13
            # "planner_miss" failures were graph-disconnected at the
            # protocol draw, miss_probe_kuka13.json — no explorer can
            # solve a disconnected graph at that budget)
            from gnn_motion_planning_tpu.graphs.audit import (
                protocol_rgg_connected,
            )

            conn = protocol_rgg_connected(env, seed, int(i))
            rec["protocol_rgg"] = conn
            rec["class"] = (
                "planner_miss" if conn["connected"] else "graph_disconnected"
            )
        else:
            rec["class"] = "presumed_hard"

        failures.append(rec)
        print(
            f"[{name}] idx {i}: {rec['class']} "
            f"(4x={rec['retry_4x_budget']} bit={rec.get('retry_bitstar')} "
            f"witness_blocked={rec.get('witness_edges_capsule_blocked')})",
            flush=True,
        )

    counts = {}
    for rec in failures:
        counts[rec["class"]] = counts.get(rec["class"], 0) + 1

    n_success = sum(s[0] for s in solutions)
    metrics = {
        "n_problems": len(idx),
        "success": int(n_success),
        "collision_checks": float(np.mean([s[2] for s in solutions])),
        "running_time_s": float(
            sum(s[3] for s in solutions if s[0]) / n_success
        )
        if n_success
        else float("nan"),
        "path_cost": float(sum(s[1] for s in solutions if s[0]) / n_success)
        if n_success
        else float("nan"),
        "total_time_s": float(sum(s[3] for s in solutions)),
        "p50_s": round(float(np.median(times)), 4),
        "p95_s": round(float(np.percentile(times, 95)), 4),
    }
    if over:
        metrics["protocol_overrides"] = over

    report = {
        "env": name,
        "n_problems": len(idx),
        "n_failures": len(failures),
        "classes": counts,
        "protocol": f"seed {seed}, per-problem streams, overrides {over}",
        "taxonomy": "budget_exhaustion | oracle_conservatism | graph_disconnected | planner_miss | presumed_hard",
        "metrics": metrics,
        "failures": failures,
        "wall_s": round(time() - t_start, 1),
    }
    OUT.mkdir(parents=True, exist_ok=True)
    out_path = OUT / f"failures_{name}.json"
    out_path.write_text(json.dumps(report, indent=1))

    # the sweep IS a protocol GNN row: refresh the registry artifact so the
    # full-split row and its triage always come from the same run (guarded
    # to full splits — a partial smoke run must not clobber the row)
    if len(idx) >= 1000:
        row_path = OUT / f"{name}.json"
        rows = json.loads(row_path.read_text()) if row_path.exists() else {}
        rows["GNN"] = dict(metrics, wall_s=round(time() - t_start, 1))
        row_path.write_text(json.dumps(rows, indent=1))
    print(f"{name}: {len(failures)} failures {counts} -> {out_path}", flush=True)
    print(json.dumps(metrics), flush=True)
    return report


if __name__ == "__main__":
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    triage(name, n)
