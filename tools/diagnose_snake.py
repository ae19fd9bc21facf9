"""Diagnose snake7 GNN eval failures (round-1 benchmark: 89/100).

For every failed problem in the benchmark head, classify the failure:
  * `frontier_dry`  — the greedy search exhausted all graph edges without
    reaching the goal region (graph connectivity / sampling issue);
  * `budget`        — t_max stopped resampling (search-budget issue);
  * BIT* solvability — does BIT* (our own oracle, generous budget) solve
    the same problem? If not, the regenerated dataset instance may be
    unsolvable under the capsule oracle (calibration issue).

Usage: python tools/diagnose_snake.py [n_problems] [out_json]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

INF = float("inf")


def main(n: int = 100, out_json: str = "/tmp/snake7_diag.json"):
    from gnn_motion_planning_tpu.api import explore, str2env, str2name
    from gnn_motion_planning_tpu.config import set_random_seed
    from gnn_motion_planning_tpu.planners.bit_star import BITStar

    env, indexes = str2env("snake7")
    _, model, _, model_s, _ = str2name("snake7")
    env.rng = set_random_seed(1234)

    rows = []
    for i in indexes[:n]:
        env.init_new_problem(int(i))
        r = explore(env, model, model_s, smooth=True)
        rows.append(
            {
                "index": int(i),
                "success": bool(r["success"]),
                "c_explore": int(r["c_explore"]),
                "n_explored": len(r["explored"]),
            }
        )
        print(
            f"#{i} success={r['success']} explored={len(r['explored'])} "
            f"checks={r['c_explore']}",
            flush=True,
        )

    failed = [row for row in rows if not row["success"]]
    print(f"\n=== {len(failed)} failures; probing with BIT* ===", flush=True)
    for row in failed:
        env.init_new_problem(row["index"])
        bit = BITStar(env, batch_size=100, T=3000, sampling=None)
        _, _, n_checks, cost, _, _ = bit.plan(
            INF, refine_time_budget=0, time_budget=120
        )
        row["bit_solves"] = bool(cost != INF)
        row["bit_checks"] = int(n_checks)
        row["bit_cost"] = float(cost) if cost != INF else None
        # also: straight-line feasibility start->goal (easy instances)
        free = env._edge_fp(
            np.asarray(env.init_state), np.asarray(env.goal_state)
        )
        row["straight_line_free"] = bool(free)
        print(json.dumps(row), flush=True)

    Path(out_json).write_text(json.dumps(rows, indent=1))
    n_succ = sum(r["success"] for r in rows)
    n_bit = sum(1 for r in failed if r.get("bit_solves"))
    print(
        f"\nsummary: GNN {n_succ}/{len(rows)}; of {len(failed)} failures, "
        f"BIT* solves {n_bit} (GNN/search gap) and "
        f"{len(failed) - n_bit} unsolved (dataset/oracle gap)"
    )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 100,
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/snake7_diag.json",
    )
