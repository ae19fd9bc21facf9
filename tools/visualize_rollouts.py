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


def _render(env, name, index, path, tag, out_dir, gif=False):
    """Render a path via env.plot (all env families) and, for mazes, the
    edge-level overlay too."""

    kwargs = dict(make_gif=gif)
    suffix = "gif" if gif else "png"
    save = str(out_dir / f"{tag}_{name}_{index}.{suffix}")
    if str(env).startswith("snake"):
        env.plot(env.map, path, save_path=save, **kwargs)
    else:
        env.plot(path, save_path=save, **kwargs)
    return save


def main(name: str = "maze2easy", n: int = 3, gif: bool = False):
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
            _render(env, name, index, result["path"], "gnn", out_dir, gif)
            _render(
                env, name, index, result["smooth_path"], "gnn_smooth",
                out_dir, gif,
            )
            if name.startswith("maze"):  # edge-level maze overlay
                path = np.asarray(result["path"])
                plot_edges(
                    result["path"],
                    list(zip(path[:-1], path[1:])),
                    pb,
                    save_path=str(out_dir / f"gnn_edges_{name}_{index}.png"),
                    title=f"GNN explore #{index} ({result['c_explore']} checks)",
                )

        env.init_new_problem(int(index))
        bit = BITStar(env, batch_size=50, T=500)
        bit.plan(float("inf"), refine_time_budget=0, time_budget=10)
        path = bit.get_best_path()
        if path:
            _render(env, name, index, path, "bit", out_dir, gif)
        print(f"rendered problem {index}", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--gif"]
    main(
        args[0] if args else "maze2easy",
        int(args[1]) if len(args) > 1 else 3,
        gif="--gif" in sys.argv,
    )
