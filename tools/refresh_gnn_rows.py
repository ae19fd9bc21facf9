"""Refresh GNN benchmark rows after a planner/smoother speed change.

One full-split scalar eval per env feeds BOTH artifacts that record it:
the registry benchmark JSON (assets/benchmarks/<name>.json, "GNN" row)
and the grand-sweep cell (data/result.p, (<sweep>, 'GNN', '1234')) — the
two tables in BASELINE.md are then mutually consistent without running
the split twice. Extra registry rows (p50/batched/serve) are delegated
to tools/run_benchmarks.py.

Usage: python tools/refresh_gnn_rows.py [step ...]
  steps (default: the full round-3 refresh plan):
    gnn:<registry_name>[:<sweep_name>[:<n>]]   dual-artifact scalar run
    sweep:<sweep_name>                         sweep-only scalar run
    bench:<name>:<n>:<m1,m2>                   run_benchmarks delegation
"""

from __future__ import annotations

import json
import pickle
import sys
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

PLAN = [
    "gnn:kuka14:Kuka_14D:400",
    "bench:kuka14:400:GNN-p50,GNN-batched,GNN-serve",
    "gnn:kuka7:Kuka_7D:1000",
    "gnn:kuka13:Kuka_13D:250",
    "gnn:maze3:Maze_3D:1000",
    "bench:maze3:1000:GNN-batched",
    "gnn:maze2hard:Maze_2D_Hard:1000",
    "sweep:Maze_2D_Normal",
    "gnn:maze2easy:Maze_2D_Easy:1000",
    "bench:maze2easy:1000:GNN-batched",
    "gnn:ur5::1000",
    "gnn:snake7::250",
    "bench:snake7:250:GNN-batched",
    "bench:kuka14:400:GNN",  # keeps wall_s/timer of the plain row current
]

SWEEP_ONLY_ENVS = {
    "Maze_2D_Normal": lambda: __import__(
        "gnn_motion_planning_tpu.envs", fromlist=["MazeEnv"]
    ).MazeEnv(dim=2, map_file="maze_files/mazes_normal.npz"),
}


def write_sweep_cell(sweep_name: str, result):
    out = REPO / "data" / "result.p"
    table = pickle.loads(out.read_bytes()) if out.exists() else {}
    table[(sweep_name, "GNN", "1234")] = tuple(
        r for i, r in enumerate(result) if i not in (5, 6)
    )
    table[(sweep_name, "GNN", "Avg")] = tuple(
        float(np.asarray(result[i]).mean()) for i in range(5)
    )
    pickle.dump(table, open(out, "wb"))
    print(f"  -> sweep cell ({sweep_name}, GNN) updated", flush=True)


def write_registry_row(name: str, n: int, result, wall: float, over, env):
    out_path = REPO / "assets" / "benchmarks" / f"{name}.json"
    rows = json.loads(out_path.read_text()) if out_path.exists() else {}
    row = {
        "n_problems": int(n),
        "success": int(result[0]),
        "collision_checks": float(result[1]),
        "running_time_s": float(result[2]),
        "path_cost": float(result[3]),
        "total_time_s": float(result[4]),
        "wall_s": round(wall, 2),
    }
    if over:
        row["protocol_overrides"] = over
    timer = getattr(env, "timer", None)
    if timer is not None and timer.log:
        row["timer_s"] = timer.pretty()
        timer.clear()
    rows["GNN"] = row
    out_path.write_text(json.dumps(rows, indent=1))
    print(f"  -> {out_path.name} GNN row updated", flush=True)


def run_gnn(name: str, sweep_name: str | None, n: int):
    from gnn_motion_planning_tpu.api.eval_gnn import eval_gnn
    from gnn_motion_planning_tpu.api.registry import scalar_overrides, str2env

    env, indexes = str2env(name)
    idx = indexes[:n]
    over = scalar_overrides(name)
    print(f"=== {name} / GNN / {len(idx)} problems ===", flush=True)
    t0 = time()
    result = eval_gnn(name, 1234, env, idx, use_tqdm=True, **over)
    wall = time() - t0
    write_registry_row(name, len(idx), result, wall, over, env)
    if sweep_name:
        write_sweep_cell(sweep_name, result)


def run_sweep_only(sweep_name: str):
    from gnn_motion_planning_tpu.api.eval_gnn import eval_gnn

    env = SWEEP_ONLY_ENVS[sweep_name]()
    idx = np.arange(1000)
    print(f"=== {sweep_name} / GNN / {len(idx)} problems ===", flush=True)
    result = eval_gnn(str(env), 1234, env, idx, use_tqdm=True)
    write_sweep_cell(sweep_name, result)


def main(steps):
    for step in steps:
        parts = step.split(":")
        t0 = time()
        try:
            if parts[0] == "gnn":
                name = parts[1]
                sweep = parts[2] if len(parts) > 2 and parts[2] else None
                n = int(parts[3]) if len(parts) > 3 else 1000
                run_gnn(name, sweep, n)
            elif parts[0] == "sweep":
                run_sweep_only(parts[1])
            elif parts[0] == "bench":
                from tools.run_benchmarks import run

                run(parts[1], int(parts[2]), parts[3].split(","))
            else:
                raise ValueError(f"unknown step {step}")
            print(f"[step done] {step} ({time() - t0:.0f}s)", flush=True)
        except Exception as e:  # keep the chain alive past a bad step
            print(f"[step FAILED] {step}: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or PLAN)
