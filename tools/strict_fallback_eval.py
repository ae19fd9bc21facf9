"""Re-run an env's triaged failures with the strict-hull fallback enabled.

Produces assets/benchmarks/strict_fallback_<env>.json: per-failure rows
(success, strict_certified, checks, cost) under the reference protocol +
strict_fallback=True. Expected outcome for kuka14: the two
oracle_conservatism failures (idx 2118, 2170 — witness capsule-blocked
but hull-verified, assets/benchmarks/failures_kuka14.json) become
strict-certified successes; budget/presumed-hard failures are unchanged
in class.

Usage: python tools/strict_fallback_eval.py [kuka14] [t_max]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main(name: str = "kuka14", t_max: int = 500):
    from gnn_motion_planning_tpu.api.eval_gnn import explore, path_cost
    from gnn_motion_planning_tpu.api.registry import str2env, str2name
    from gnn_motion_planning_tpu.config import problem_rng

    failures = json.loads(
        (REPO / "assets" / "benchmarks" / f"failures_{name}.json").read_text()
    )
    indexes = [f["index"] for f in failures["failures"]]
    classes = {f["index"]: f["class"] for f in failures["failures"]}
    env, _ = str2env(name)
    _, model, _, model_s, _ = str2name(name)

    rows = []
    for idx in indexes:
        env.rng = problem_rng(1234, int(idx))
        env.init_new_problem(int(idx))
        t0 = time()
        res = explore(
            env, model, model_s, smooth=True, batch=500, t_max=t_max, k=30,
            strict_fallback=True,
        )
        rows.append({
            "index": int(idx),
            "round4_class": classes[idx],
            "success": bool(res["success"]),
            "strict_certified": bool(res.get("strict_certified", False)),
            "checks": int(res["c_explore"] + res["c_smooth"]),
            "cost": round(path_cost(res["smooth_path"]), 4),
            "wall_s": round(time() - t0, 2),
        })
        print(rows[-1], flush=True)

    out = {
        "env": name,
        "protocol": {"seed": 1234, "batch": 500, "t_max": t_max, "k": 30,
                     "strict_fallback": True},
        "source_failures": f"assets/benchmarks/failures_{name}.json",
        "rows": rows,
        "recovered": [r["index"] for r in rows if r["strict_certified"]],
    }
    path = REPO / "assets" / "benchmarks" / f"strict_fallback_{name}.json"
    path.write_text(json.dumps(out, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "kuka14",
        int(sys.argv[2]) if len(sys.argv) > 2 else 500,
    )
