"""Grand benchmark sweep with per-method problem budgets, resumable.

The reference sweep (eval_all.py:9-47) runs 7 env configs x 5 methods and
pickles every cell into data/result.p. This driver reproduces that artifact
with a per-method problem budget (GNN: full split; classical baselines:
first `n_base` problems — they run the host oracle per call and the full
split would be days of chip time), and it resumes: cells already present
in the output pickle are skipped, so the sweep can be stopped/restarted.

Kuka_13D and Kuka_14D run on the regenerated datasets (upstream kukas_13/14
files are not shipped; see tools/generate_problems.py) — full 1000-problem
splits since round 4 (solvability-verified through index 3000).

Usage: python tools/grand_sweep.py [--methods=GNN,BIT*] [--envs=Maze_2D_Easy]
       [--n-base=100] [--out=data/result.p] [--force]

--force re-runs (and overwrites) cells already in the pickle — used by the
round-5 full-split baseline refresh (n-base=1000) to replace the n=100
classical-baseline cells the resume logic would otherwise keep.
"""

from __future__ import annotations

import pickle
import sys
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def env_table():
    import gnn_motion_planning_tpu.envs as envs
    from gnn_motion_planning_tpu.api.registry import str2env

    def reg(name, head=None):
        """Registry env, optionally clipped to the verified solvable head
        of a regenerated dataset (tools/generate_problems.py)."""

        def make():
            env, idx = str2env(name)
            return env, (idx[:head] if head else idx)

        return make

    return [
        ("Maze_2D_Easy", lambda: (envs.MazeEnv(dim=2, map_file="maze_files/mazes_easy.npz"), np.arange(1000))),
        ("Maze_2D_Normal", lambda: (envs.MazeEnv(dim=2, map_file="maze_files/mazes_normal.npz"), np.arange(1000))),
        ("Maze_2D_Hard", lambda: (envs.MazeEnv(dim=2, map_file="maze_files/mazes_hard.npz"), np.arange(1000))),
        # reference eval_all.py:19 indexes 2000-3000, but the shipped
        # mazes_hard_3.npz holds 1000 problems — an upstream out-of-range
        # bug; evaluate the file's full range instead
        ("Maze_3D", lambda: (envs.MazeEnv(dim=3, map_file="maze_files/mazes_hard_3.npz"), np.arange(1000))),
        ("Kuka_7D", lambda: (envs.KukaEnv(), np.arange(2000, 3000))),
        # full splits since round 4: the regenerated datasets are
        # solvability-verified through index 3000 (tools/generate_problems.py
        # --reverify), matching reference str2env.py:29-37
        ("Kuka_13D", reg("kuka13")),
        ("Kuka_14D", reg("kuka14")),
    ]


def main(argv):
    from gnn_motion_planning_tpu.api.eval_all import METHODS

    method_names = list(METHODS)
    env_names = None
    n_base = 100
    out_path = "data/result.p"
    force = False  # re-run (and overwrite) cells already in the pickle
    for a in argv:
        if a.startswith("--methods="):
            method_names = a.split("=", 1)[1].split(",")
        elif a.startswith("--envs="):
            env_names = a.split("=", 1)[1].split(",")
        elif a.startswith("--n-base="):
            n_base = int(a.split("=", 1)[1])
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        elif a == "--force":
            force = True

    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    result_total = pickle.loads(out.read_bytes()) if out.exists() else {}

    seed = 1234
    for env_name, make in env_table():
        if env_names and env_name not in env_names:
            continue
        env = None
        for method_name in method_names:
            key = (env_name, method_name, str(seed))
            if key in result_total and not force:
                print(f"skip {key} (done)", flush=True)
                continue
            if env is None:
                env, indexes = make()
            idx = indexes if method_name == "GNN" else indexes[:n_base]
            print(f"=== {env_name} / {method_name} / {len(idx)} problems ===",
                  flush=True)
            t0 = time()
            result = METHODS[method_name](str(env), seed, env, idx, use_tqdm=True)
            # drop the per-problem path payloads from the pickle: the
            # reference stores them too, but 1000-problem path lists
            # balloon the artifact; keep the metric tuple + counts
            result_total[key] = tuple(
                r for i, r in enumerate(result) if i not in (5, 6)
            )
            result_total[env_name, method_name, "Avg"] = tuple(
                float(np.asarray(result[i]).mean()) for i in range(5)
            )
            # cell size, so the table renderer doesn't have to guess
            result_total[env_name, method_name, "n"] = len(idx)
            # merge-on-write: another sweep process may have added cells to
            # the pickle since we loaded it — never clobber them
            if out.exists():
                merged = pickle.loads(out.read_bytes())
                merged.update(result_total)
                result_total = merged
            pickle.dump(result_total, open(out, "wb"))
            print(f"cell wall: {time() - t0:.1f}s -> {out}", flush=True)

    print("sweep complete:", len(result_total), "cells")


if __name__ == "__main__":
    main(sys.argv[1:])
