"""Run the benchmark suite and record results (BASELINE.md tracking table).

Runs the GNN planner (scalar protocol and batched lanes) and optionally the
classical baselines on each available env config, writing a JSON results
file under assets/benchmarks/ that BASELINE.md references.

Usage:
  python tools/run_benchmarks.py maze2easy [n_problems] [--methods GNN,BIT*,...]
                                 [--shards N]

--shards N runs the GNN-batched row with problem lanes sharded over an
N-device ``dp`` mesh (parallel.mesh.make_mesh; GSPMD partitions the lane
programs). On a multi-chip slice that is real chip-parallel serving; for a
hardware-free check use the virtual CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/run_benchmarks.py maze2easy 32 --methods=GNN-batched --shards=8
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


def tuned_lanes(name: str, shards: int = 0) -> int:
    """Lane width for the GNN-batched row.

    Uses the best measured width from this env's profile_batched artifact
    (tools/profile_batched.py sweeps {8, 25, 64} and records the warm
    amortized s/problem per width); falls back to the round-3 protocol
    default of 25 lanes when no profile exists. Sharded runs round the
    width up to a multiple of the mesh size so lanes partition evenly.
    """
    lanes = 25
    prof = OUT / f"profile_batched_{name}.json"
    if prof.exists():
        widths = json.loads(prof.read_text()).get("widths", {})
        # warm_s_per_problem (first group — which pays the XLA compiles —
        # dropped) is what a refresh run observes once the persistent
        # compile cache is hot; older artifacts only carry the cold number
        timed = {
            int(w): v.get("warm_s_per_problem")
            or v.get("amortized_s_per_problem")
            for w, v in widths.items()
            if v.get("warm_s_per_problem") or v.get("amortized_s_per_problem")
        }
        if timed:
            lanes = min(timed, key=timed.get)
            print(f"tuned lanes for {name}: {lanes} "
                  f"(profile warm {timed[lanes]:.3f}s/prob)")
    if shards:
        lanes = -(-lanes // shards) * shards
    return lanes


def run(name: str, n: int = 1000, methods=("GNN", "GNN-batched"), shards: int = 0):
    from gnn_motion_planning_tpu.api import (
        eval_bit,
        eval_gnn,
        eval_gnn_batched,
        eval_lazysp,
        eval_next,
        eval_rrt,
        str2env,
    )

    def gnn_percentiles(env, idx):
        """Scalar GNN with per-problem wall-time percentiles (p50/p95)."""

        from gnn_motion_planning_tpu.api import explore, path_cost, str2name
        from gnn_motion_planning_tpu.config import problem_rng, set_random_seed

        from gnn_motion_planning_tpu.api.registry import scalar_overrides

        over = dict(t_max=500)
        over.update(scalar_overrides(name))
        _, model, _, model_s, _ = str2name(name)
        set_random_seed(1234)
        # warm compiles outside the timed region
        env.rng = problem_rng(1234, int(idx[0]))
        env.init_new_problem(int(idx[0]))
        explore(env, model, model_s, smooth=True, **over)
        times, succ, costs, checks = [], 0, [], []
        for i in idx:
            env.rng = problem_rng(1234, int(i))
            env.init_new_problem(int(i))
            t0 = time()
            r = explore(env, model, model_s, smooth=True, **over)
            times.append(time() - t0)
            succ += r["success"]
            checks.append(r["c_explore"] + r["c_smooth"])
            if r["success"]:
                costs.append(path_cost(r["smooth_path"]))
        out = (
            succ,
            float(np.mean(checks)),
            float(np.median(times)),
            float(np.mean(costs)) if costs else float("nan"),
            float(np.sum(times)),
        )
        gnn_percentiles.last_p50 = float(np.median(times))
        gnn_percentiles.last_p95 = float(np.percentile(times, 95))
        print(
            f"p50 {np.median(times):.3f}s p95 {np.percentile(times, 95):.3f}s "
            f"mean {np.mean(times):.3f}s"
        )
        return out

    from gnn_motion_planning_tpu.api.registry import (
        eval_overrides,
        scalar_overrides,
    )

    mesh = None
    if shards:
        from gnn_motion_planning_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(shards)
        print(f"lane sharding over {shards}-device mesh "
              f"({mesh.devices.flat[0].platform})", flush=True)

    over = eval_overrides(name)
    over_scalar = scalar_overrides(name)

    def _serve(name, env, idx):
        """Serving mode with warm-up; returns the 5-metric tuple + stores
        p50/p95 via the printed block (eval_gnn_serve)."""

        from gnn_motion_planning_tpu.api.eval_gnn import eval_gnn_serve

        # warm the two compiled programs outside the timed region
        eval_gnn_serve(name, 1234, env, idx[:1])
        out = eval_gnn_serve(name, 1234, env, idx)
        # stash percentiles for the JSON writer
        _serve.last_p50, _serve.last_p95 = out[5], out[6]
        return out[:5]

    failed: list = []  # scalar GNN rows record failures for triage tools
    table = {
        "GNN": lambda env, idx: eval_gnn(
            name, 1234, env, idx, use_tqdm=False, failed_indexes=failed,
            **over_scalar
        ),
        "GNN-p50": gnn_percentiles,
        "GNN-batched": lambda env, idx: eval_gnn_batched(
            name, 1234, env, idx, mesh=mesh,
            lanes=tuned_lanes(name, shards), **over
        ),
        "GNN-serve": lambda env, idx: _serve(name, env, idx),
        # reference protocol budget with NO per-config overrides (snake7's
        # t_max=2000 override is a documented deviation; this row keeps the
        # cross-method comparison honest at t_max=500)
        "GNN-ref-budget": lambda env, idx: eval_gnn(
            name, 1234, env, idx, use_tqdm=False, failed_indexes=failed
        ),
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
        failed.clear()
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
        if method == "GNN-serve" and hasattr(_serve, "last_p50"):
            results[method]["p50_s"] = round(float(_serve.last_p50), 4)
            results[method]["p95_s"] = round(float(_serve.last_p95), 4)
        if method == "GNN-p50" and hasattr(gnn_percentiles, "last_p50"):
            results[method]["p50_s"] = round(gnn_percentiles.last_p50, 4)
            results[method]["p95_s"] = round(gnn_percentiles.last_p95, 4)
        # stamp protocol deviations (e.g. snake7 t_max override) into the
        # emitted JSON, not just the registry source
        if over_scalar and method.startswith("GNN") and method != "GNN-ref-budget":
            results[method]["protocol_overrides"] = over_scalar
        if failed and method in ("GNN", "GNN-ref-budget"):
            results[method]["failed_indexes"] = list(failed)
        if shards and method == "GNN-batched":
            # sharded rows are a different serving shape: stamp the mesh so
            # they are never mistaken for the single-chip amortized row
            results[method]["shards"] = int(shards)
            results[method]["shard_platform"] = str(mesh.devices.flat[0].platform)
        timer = getattr(env, "timer", None)
        if timer is not None and timer.log:
            results[method]["timer_s"] = timer.pretty()
            print("timer:", timer.pretty(), flush=True)
            timer.clear()
        out_path.write_text(json.dumps(results, indent=1))
        print(json.dumps(results[method]), flush=True)
    return results


if __name__ == "__main__":
    name = sys.argv[1]
    n = 1000
    methods = ["GNN", "GNN-batched"]
    shards = 0
    for a in sys.argv[2:]:
        if a.startswith("--methods="):
            methods = a.split("=", 1)[1].split(",")
        elif a.startswith("--shards="):
            shards = int(a.split("=", 1)[1])
        else:
            n = int(a)
    run(name, n, methods, shards=shards)
