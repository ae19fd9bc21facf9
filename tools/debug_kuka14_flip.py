"""Find and A/B the kuka14 problems that flipped between the round-4
scalar row (993/1000) and the round-5 batched refresh (989/1000).

Stage 1 (this script, default): run the full kuka14 split through the
batched path (bit-identical to scalar per problem — verified on a head
incl. a failure) and record the failed indexes + per-problem
success/checks next to the round-4 failure set.

Stage 2 (--ab i j k ...): for each flipped index, run the scalar
protocol under the CURRENT tree and print success/checks/cost, so the
same command run from the round-4 worktree (.r4wt) separates code drift
from environment drift.

Usage:
  python tools/debug_kuka14_flip.py            # stage 1 (TPU, ~15 min)
  python tools/debug_kuka14_flip.py --ab 2345  # stage 2, current tree
  (cd .r4wt && python tools/debug_kuka14_flip.py --ab 2345)  # round-4 code
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

R4_FAILURES = {2006, 2096, 2118, 2164, 2170, 2212, 2651}


def stage1():
    from gnn_motion_planning_tpu.api.batched import explore_batch
    from gnn_motion_planning_tpu.api.registry import str2env, str2name

    env, idx = str2env("kuka14")
    _, model, _, model_s, _ = str2name("kuka14")
    idx = [int(i) for i in idx]
    res = explore_batch(
        env, model, model_s, idx, smooth=True, batch=500, t_max=500,
        k=30, loop=5, lanes=25, seed=1234,
    )
    failed = [i for i, r in zip(idx, res) if not r["success"]]
    per_problem = {
        int(i): {
            "success": bool(r["success"]),
            "c_explore": int(r["c_explore"]),
            "c_smooth": int(r["c_smooth"]),
        }
        for i, r in zip(idx, res)
    }
    out = {
        "n": len(idx),
        "success": len(idx) - len(failed),
        "failed_indexes": failed,
        "new_vs_round4": sorted(set(failed) - R4_FAILURES),
        "fixed_vs_round4": sorted(R4_FAILURES - set(failed)),
        "per_problem": per_problem,
    }
    p = REPO / "assets" / "benchmarks" / "kuka14_flip_probe.json"
    p.write_text(json.dumps(out, indent=1))
    print("success", out["success"], "failed", failed)
    print("new_vs_round4", out["new_vs_round4"])
    print("fixed_vs_round4", out["fixed_vs_round4"])
    print("wrote", p)


def stage2(indexes):
    from gnn_motion_planning_tpu.api.eval_gnn import explore
    from gnn_motion_planning_tpu.api.registry import str2env, str2name
    from gnn_motion_planning_tpu.config import problem_rng

    env, _ = str2env("kuka14")
    _, model, _, model_s, _ = str2name("kuka14")
    for i in indexes:
        env.rng = problem_rng(1234, int(i))
        env.init_new_problem(int(i))
        r = explore(
            env, model, model_s, smooth=True, batch=500, t_max=500,
            k=30, loop=5,
        )
        print(
            f"idx {i}: success={r['success']} c_explore={r['c_explore']} "
            f"c_smooth={r['c_smooth']}",
            flush=True,
        )


if __name__ == "__main__":
    if "--ab" in sys.argv:
        stage2([int(a) for a in sys.argv[sys.argv.index("--ab") + 1 :]])
    else:
        stage1()
