"""Run the benchmark suite and record results (BASELINE.md tracking table).

Runs the GNN planner (scalar protocol and batched lanes) and optionally the
classical baselines on each available env config, writing a JSON results
file under assets/benchmarks/ that BASELINE.md references.

Usage:
  python tools/run_benchmarks.py maze2easy [n_problems] [--methods GNN,BIT*,...]
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


def run(name: str, n: int = 1000, methods=("GNN", "GNN-batched")):
    from gnn_motion_planning_tpu.api import (
        eval_bit,
        eval_gnn,
        eval_gnn_batched,
        eval_lazysp,
        eval_next,
        eval_rrt,
        str2env,
    )

    table = {
        "GNN": lambda env, idx: eval_gnn(name, 1234, env, idx, use_tqdm=False),
        "GNN-batched": lambda env, idx: eval_gnn_batched(name, 1234, env, idx, lanes=25),
        "BIT*": lambda env, idx: eval_bit(name, 1234, env, idx),
        "LazySP": lambda env, idx: eval_lazysp(name, 1234, env, idx),
        "RRT*": lambda env, idx: eval_rrt(name, 1234, env, idx),
        "NEXT": lambda env, idx: eval_next(name, 1234, env, idx),
    }

    OUT.mkdir(parents=True, exist_ok=True)
    out_path = OUT / f"{name}.json"
    results = json.loads(out_path.read_text()) if out_path.exists() else {}

    for method in methods:
        env, indexes = str2env(name)
        idx = indexes[:n]
        print(f"=== {name} / {method} / {len(idx)} problems ===", flush=True)
        t0 = time()
        out = table[method](env, idx)
        wall = time() - t0
        results[method] = {
            "n_problems": int(len(idx)),
            "success": int(out[0]),
            "collision_checks": float(out[1]),
            "running_time_s": float(out[2]),
            "path_cost": float(out[3]),
            "total_time_s": float(out[4]),
            "wall_s": round(wall, 2),
        }
        out_path.write_text(json.dumps(results, indent=1))
        print(json.dumps(results[method]), flush=True)
    return results


if __name__ == "__main__":
    name = sys.argv[1]
    n = 1000
    methods = ["GNN", "GNN-batched"]
    for a in sys.argv[2:]:
        if a.startswith("--methods="):
            methods = a.split("=", 1)[1].split(",")
        else:
            n = int(a)
    run(name, n, methods)
