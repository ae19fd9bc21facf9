"""Phase breakdown of the batched-lane serving shape, per env + lane width.

Answers the round-4 verdict question "where does batched time go?": host
sampling vs device search rounds (with stacked-width history, exposing
straggler cost) vs smoothing vs scalar fallback, at lane widths {8, 25,
64}. Writes assets/benchmarks/profile_batched_<env>.json and prints one
table per width, plus the scalar reference on the same head for the
amortized-vs-protocol comparison.

Usage: python tools/profile_batched.py <env> [n_problems=100] [widths...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def profile_env(name: str, n: int = 100, widths=(8, 25, 64)):
    from gnn_motion_planning_tpu.api.batched import explore_batch
    from gnn_motion_planning_tpu.api.eval_gnn import explore
    from gnn_motion_planning_tpu.api.registry import (
        eval_overrides,
        str2env,
        str2name,
    )
    from gnn_motion_planning_tpu.config import problem_rng

    env, idx = str2env(name)
    _, model, _, model_s, _ = str2name(name)
    t_max = eval_overrides(name).get("t_max", 500)
    indexes = [int(i) for i in idx[:n]]

    out = {"env": name, "n": n, "t_max": t_max, "widths": {}}

    # scalar reference on the same head (warm = excluding the first problem,
    # which pays the scalar path's XLA compiles)
    per = []
    for i in indexes:
        env.rng = problem_rng(1234, i)
        env.init_new_problem(i)
        t0 = time()
        explore(env, model, model_s, smooth=True, batch=500, t_max=t_max, k=30)
        per.append(time() - t0)
    out["scalar_s_per_problem"] = round(sum(per) / n, 4)
    out["scalar_warm_s_per_problem"] = (
        round(sum(per[1:]) / (n - 1), 4) if n > 1 else None
    )
    print(
        f"{name} scalar: {out['scalar_s_per_problem']:.3f} s/problem over {n} "
        f"(warm {out['scalar_warm_s_per_problem']})"
    )

    for w in widths:
        stats: list = []
        t0 = time()
        try:
            explore_batch(
                env, model, model_s, indexes, smooth=True, batch=500,
                t_max=t_max, k=30, lanes=w, stats=stats,
            )
        except Exception as e:  # e.g. remote-compile infra failure at one
            # width (kuka14 lanes=64 HTTP 500) — record it and keep the
            # other widths' data instead of losing the whole artifact
            out["widths"][str(w)] = {"error": f"{type(e).__name__}: {e}"[:500]}
            print(f"{name} lanes={w}: FAILED ({type(e).__name__})")
            continue
        wall = time() - t0
        groups = [s for s in stats if "group_size" in s]
        fb = next((s for s in stats if "scalar_fallbacks" in s), {})
        # warm amortized: drop the first group, which pays the XLA compiles
        # for every (width, chunk) shape — with the package-level persistent
        # compilation cache this is also what any later process observes
        n_warm = n - groups[0]["group_size"] if len(groups) > 1 else 0
        warm_s = (
            round((wall - groups[0]["group_s"]) / n_warm, 4) if n_warm else None
        )
        agg = {
            "amortized_s_per_problem": round(wall / n, 4),
            "warm_s_per_problem": warm_s,
            "sample_s": round(sum(g["sample_s"] for g in groups), 2),
            "stack_s": round(sum(g.get("stack_s", 0.0) for g in groups), 2),
            "forward_s": round(sum(g.get("forward_s", 0.0) for g in groups), 2),
            "search_s": round(sum(g["search_s"] for g in groups), 2),
            "smooth_s": round(sum(g["smooth_s"] for g in groups), 2),
            "fallback_s": fb.get("fallback_s", 0.0),
            "scalar_fallbacks": fb.get("scalar_fallbacks", 0),
            "total_chunk_rounds": sum(len(g["search_rounds"]) for g in groups),
            # straggler exposure: device-rounds run while <= 25% of the
            # group's lanes were still live
            "quartile_tail_rounds": sum(
                sum(1 for _, live, _ in g["search_rounds"]
                    if live <= max(1, g["group_size"] // 4))
                for g in groups
            ),
            "groups": groups,
        }
        out["widths"][str(w)] = agg
        print(
            f"{name} lanes={w}: {agg['amortized_s_per_problem']:.3f} s/prob "
            f"(warm {warm_s}) "
            f"(sample {agg['sample_s']}s stack {agg['stack_s']}s forward "
            f"{agg['forward_s']}s search {agg['search_s']}s smooth "
            f"{agg['smooth_s']}s fallback {agg['fallback_s']}s x"
            f"{agg['scalar_fallbacks']}; tail rounds "
            f"{agg['quartile_tail_rounds']}/{agg['total_chunk_rounds']})"
        )

    path = REPO / "assets" / "benchmarks" / f"profile_batched_{name}.json"
    path.write_text(json.dumps(out, indent=1))
    print("wrote", path)
    return out


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "kuka14"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    widths = [int(w) for w in sys.argv[3:]] or (8, 25, 64)
    profile_env(name, n, widths)
