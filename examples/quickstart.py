"""Quickstart — the reference main.ipynb workflow, TPU-native.

Covers the notebook's documented usage surface (reference main.ipynb cells
2-11): evaluate the GNN planner on a registry env, plan a single problem
with a small budget, generate a new problem dataset, and run a classical
baseline for comparison.

Run: python examples/quickstart.py [n_problems]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gnn_motion_planning_tpu.api import eval_gnn, explore, str2env, str2name
from gnn_motion_planning_tpu.api.eval_baselines import eval_bit
from gnn_motion_planning_tpu.config import set_random_seed


def main(n: int = 10):
    # --- cell 2-3: evaluate the GNN planner on a registry env ---------------
    env, indexes = str2env("maze2easy")
    eval_gnn("maze2easy", 1234, env, indexes[:n], use_tqdm=False)

    # --- single problem with a small budget (notebook cell 11) --------------
    env, model, _, model_s, _ = str2name("maze2easy")
    env.rng = set_random_seed(7)
    env.init_new_problem(2042)
    result = explore(env, model, model_s, smooth=True, batch=50, t_max=300)
    print(
        f"single problem: success={result['success']} "
        f"checks={result['c_explore']}+{result['c_smooth']} "
        f"path={len(result['path'])} waypoints"
    )

    # --- classical baseline on the same problems ----------------------------
    env, indexes = str2env("maze2easy")
    eval_bit("maze2easy", 1234, env, indexes[:n])

    # --- dataset generation entry points (see tools/) -----------------------
    print("dataset tools: tools/generate_problems.py, tools/generate_prm.py,")
    print("               tools/diversify_maze.py, tools/calibrate_capsules.py")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
