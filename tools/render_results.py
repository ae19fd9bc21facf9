"""Render BASELINE.md result tables from the measured artifacts.

Reads data/result.p (grand sweep), assets/benchmarks/*.json (registry
benchmarks) and assets/calibration/strict_*.json (two-sided capsule-oracle
audits) and prints the markdown tables BASELINE.md embeds. Keeping the
tables generated avoids transcription drift between the artifacts and the
document (reference metric schema: eval_gnn.py:128-142).

Usage:  python tools/render_results.py [sweep|bench|strict]
"""

from __future__ import annotations

import json
import pickle
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

SWEEP_ENVS = [
    "Maze_2D_Easy", "Maze_2D_Normal", "Maze_2D_Hard", "Maze_3D",
    "Kuka_7D", "Kuka_13D", "Kuka_14D",
]
SWEEP_METHODS = ["GNN", "NEXT", "BIT*", "RRT*", "LazySP"]
GNN_SPLIT = {  # fallback ns for pre-round-5 cells without an "n" entry
    "Maze_2D_Easy": 1000, "Maze_2D_Normal": 1000, "Maze_2D_Hard": 1000,
    "Maze_3D": 1000, "Kuka_7D": 1000, "Kuka_13D": 1000, "Kuka_14D": 1000,
}

BENCH_ORDER = [
    "maze2easy", "maze2hard", "maze3", "kuka7", "kuka13", "kuka14",
    "ur5", "snake7",
]
METHOD_LABEL = {
    "GNN": "GNN (scalar)",
    "GNN-batched": "GNN (batched lanes)",
    "GNN-p50": "GNN (scalar, per-problem timed)",
    "GNN-serve": "GNN (serving mode)",
    "GNN-ref-budget": "GNN (reference budget, no overrides)",
}


def render_sweep() -> str:
    d = pickle.load(open(REPO / "data" / "result.p", "rb"))
    lines = [
        "| env | method | n | success | coll. checks | time (s/prob) | path cost |",
        "|---|---|---|---|---|---|---|",
    ]
    for env in SWEEP_ENVS:
        for m in SWEEP_METHODS:
            key = (env, m, "Avg")
            if key not in d:
                continue
            succ, checks, t, cost, _total = d[key]
            # cells written since round 5 carry their size; older cells:
            # GNN ran full splits, classical baselines the first 100
            n = d.get((env, m, "n"), GNN_SPLIT[env] if m == "GNN" else 100)
            lines.append(
                f"| {env} | {m} | {n} | {succ:.0f} | {checks:.0f} "
                f"| {t:.2f} | {cost:.2f} |"
            )
    return "\n".join(lines)


def render_bench() -> str:
    lines = [
        "| env | method | n | success | coll. checks | time (s/prob) "
        "| path cost | notes |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in BENCH_ORDER:
        p = REPO / "assets" / "benchmarks" / f"{name}.json"
        if not p.exists():
            continue
        res = json.loads(p.read_text())
        for m, r in res.items():
            if m not in METHOD_LABEL:
                continue
            notes = []
            if "p50_s" in r:
                notes.append(f"p50 {r['p50_s']:.2f}s / p95 {r['p95_s']:.2f}s")
            for k, v in r.get("protocol_overrides", {}).items():
                notes.append(f"{k}={v}")
            lines.append(
                f"| {name} | {METHOD_LABEL[m]} | {r['n_problems']} "
                f"| {r['success']} | {r['collision_checks']:.0f} "
                f"| {r['running_time_s']:.2f} | {r['path_cost']:.2f} "
                f"| {', '.join(notes)} |"
            )
    return "\n".join(lines)


def render_strict() -> str:
    lines = [
        "| env | configs | capsule-free | proven false-free | rate (LB) "
        "| capsule-collide | possible false-collide | rate (UB) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for p in sorted((REPO / "assets" / "calibration").glob("strict_*.json")):
        r = json.loads(p.read_text())
        lines.append(
            f"| {r['env']} | {r['n_configs']} | {r['capsule_free']} "
            f"| {r['false_free_proven']} | {100 * r['false_free_rate_lb']:.2f}% "
            f"| {r['capsule_collide']} | {r['possible_false_collide']} "
            f"| {100 * r['false_collide_rate_ub']:.2f}% |"
        )
    return "\n".join(lines)


if __name__ == "__main__":
    which = sys.argv[1:] or ["sweep", "bench", "strict"]
    for w in which:
        print(f"\n### {w}\n")
        print({"sweep": render_sweep, "bench": render_bench,
               "strict": render_strict}[w]())
