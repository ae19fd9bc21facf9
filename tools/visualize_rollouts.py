"""Visualize GNN / NEXT / BIT* rollouts (reference: visualize_next_gnn.py).

Headless replacement for the reference's PyBullet-GUI gallery: renders maze
problems with explored trees and solution paths to PNG files under
data/images/.

Usage: python tools/visualize_rollouts.py [maze2easy] [n_problems]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main(name: str = "maze2easy", n: int = 3):
    from gnn_motion_planning_tpu.api import explore, str2env, str2name
    from gnn_motion_planning_tpu.config import set_random_seed
    from gnn_motion_planning_tpu.planners.bit_star import BITStar
    from gnn_motion_planning_tpu.utils.plot import plot_edges

    env, indexes = str2env(name)
    _, model, _, model_s, _ = str2name(name)
    rng = set_random_seed(1234)
    env.rng = rng

    out_dir = REPO / "assets" / "data" / "images"
    out_dir.mkdir(parents=True, exist_ok=True)

    for index in indexes[:n]:
        env.init_new_problem(int(index))
        result = explore(env, model, model_s, smooth=True, batch=200, t_max=400)
        pb = env.get_problem()
        if result["success"]:
            path = np.asarray(result["path"])
            edges = list(zip(path[:-1], path[1:]))
            plot_edges(
                result["path"],
                edges,
                pb,
                save_path=str(out_dir / f"gnn_{name}_{index}.png"),
                title=f"GNN explore #{index} ({result['c_explore']} checks)",
            )
            spath = np.asarray(result["smooth_path"])
            plot_edges(
                result["smooth_path"],
                list(zip(spath[:-1], spath[1:])),
                pb,
                save_path=str(out_dir / f"gnn_smooth_{name}_{index}.png"),
                title=f"GNN smoothed #{index}",
            )

        env.init_new_problem(int(index))
        bit = BITStar(env, batch_size=50, T=500)
        bit.plan(float("inf"), refine_time_budget=0, time_budget=10)
        path = bit.get_best_path()
        if path:
            plot_edges(
                path,
                list(zip(path[:-1], path[1:])),
                pb,
                save_path=str(out_dir / f"bit_{name}_{index}.png"),
                title=f"BIT* #{index}",
            )
        print(f"rendered problem {index}", flush=True)


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "maze2easy",
        int(sys.argv[2]) if len(sys.argv) > 2 else 3,
    )
