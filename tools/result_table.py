"""Render data/result.p (grand sweep pickle) as a markdown table.

Usage: python tools/result_table.py [data/result.p]
"""

from __future__ import annotations

import pickle
import sys

ORDER = ["GNN", "NEXT", "BIT*", "RRT*", "LazySP"]
ENVS = [
    "Maze_2D_Easy", "Maze_2D_Normal", "Maze_2D_Hard", "Maze_3D",
    "Kuka_7D", "Kuka_13D", "Kuka_14D",
]


GNN_N = {
    "Maze_2D_Easy": 1000, "Maze_2D_Normal": 1000, "Maze_2D_Hard": 1000,
    "Maze_3D": 1000, "Kuka_7D": 1000, "Kuka_13D": 250, "Kuka_14D": 400,
}


def main(path="data/result.p"):
    r = pickle.load(open(path, "rb"))
    counts = {
        (env, m): (GNN_N[env] if m == "GNN" else min(GNN_N[env], 100))
        for env in ENVS
        for m in ORDER
    }
    print("| env | method | n | success | coll. checks | time (s/prob) | path cost |")
    print("|---|---|---|---|---|---|---|")
    for env in ENVS:
        for m in ORDER:
            k = (env, m, "Avg")
            if k not in r:
                continue
            v = r[k]
            n = counts.get((env, m), "")
            print(
                f"| {env} | {m} | {n} | {v[0]:.0f} | {v[1]:.0f} | "
                f"{v[2]:.2f} | {v[3]:.2f} |"
            )


if __name__ == "__main__":
    main(*sys.argv[1:])
