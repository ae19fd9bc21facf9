"""Maze dataset diversification (reference: diversify_maze.py:14-102).

Filters a maze pool by obstacle density and start-goal distance into
easy/normal/hard splits. The reference's 100k-maze pool
(maze_files/mazes_100000.npz) is missing upstream; this tool can either use
it if provided or synthesise a pool from random cellular mazes with the
same 15x15 format.

Usage: python tools/diversify_maze.py <easy|normal|hard> [n]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from gnn_motion_planning_tpu.config import HostRNG  # noqa: E402

INFINITY = float("inf")

# density windows per split (occupied cells of 225); reference comment:
# "grids num is between [57, 128]"
SPLITS = {
    "easy": (57, 80, 1.0),
    "normal": (80, 104, 1.0),
    "hard": (104, 128, 1.0),
}


def bfs_dist(start, goal, maze):
    """8-connected grid BFS distance (reference diversify_maze.py:14-31)."""

    frontier = [start]
    explored = set()
    dists = {start: 0.0}
    while frontier:
        current = frontier.pop()
        explored.add(current)
        if goal in explored:
            break
        for direction in [(0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (-1, -1), (1, -1), (-1, 1)]:
            nb = (current[0] + direction[0], current[1] + direction[1])
            if not (14 >= nb[0] >= 0 and 14 >= nb[1] >= 0) or maze[nb[0], nb[1]] == 1:
                continue
            step = float(np.linalg.norm(direction))
            if nb not in explored and nb not in frontier:
                frontier.append(nb)
                dists[nb] = min(dists.get(nb, INFINITY), dists[current] + step)
            elif nb in dists:
                dists[nb] = min(dists[current] + step, dists[nb])
    return dists.get(goal, INFINITY)


def random_maze_pool(rng, n, w=15):
    """Synthetic pool: random walls + random rooms, mixed densities."""

    pool = np.zeros((n, w, w))
    for i in range(n):
        m = (rng.uniform(0, 1, (w, w)) < rng.uniform(0.2, 0.5)).astype(float)
        # carve a few corridors so most mazes stay connected
        for _ in range(int(rng.randint(2, 6))):
            if rng.uniform(0, 1) < 0.5:
                m[int(rng.randint(0, w)), :] = 0
            else:
                m[:, int(rng.randint(0, w))] = 0
        pool[i] = m
    return pool


def find_mazes(maze_num, density, dist2goal_threshold=1, pool=None, seed=0):
    """Reference find_mazes (diversify_maze.py:39-74) over a maze pool."""

    from gnn_motion_planning_tpu.envs import MazeEnv

    rng = HostRNG(seed)
    if pool is None:
        try:
            from gnn_motion_planning_tpu.utils.assets import asset_path

            with np.load(asset_path("maze_files/mazes_100000.npz")) as f:
                pool = 1 - f[f.files[0]]
        except FileNotFoundError:
            pool = random_maze_pool(rng, 20000)

    env = MazeEnv(dim=2)
    env.rng = rng
    maps, init_states, goal_states = [], [], []
    for index in range(100 * len(pool)):
        env.map = np.asarray(pool[index % len(pool)])
        env.width = env.map.shape[0]
        try:
            env.set_random_init_goal()
        except Exception:
            continue
        if (env.init_state == env.goal_state).all():
            continue
        free = int((env.map == 0).sum())
        if density[0] <= 225 - free <= density[1] and (
            np.linalg.norm(env.init_state - env.goal_state) >= dist2goal_threshold
        ):
            maps.append(env.map.copy())
            init_states.append(env.init_state)
            goal_states.append(env.goal_state)
            if len(maps) >= maze_num:
                break
    return maps, init_states, goal_states


def main(split: str, n: int = 1000):
    lo, hi, thr = SPLITS[split]
    maps, inits, goals = find_mazes(n, (lo, hi), thr)
    out = REPO / "assets" / "maze_files" / f"mazes_{split}_regen.npz"
    np.savez(
        out,
        maps=np.asarray(maps),
        init_states=np.asarray(inits),
        goal_states=np.asarray(goals),
    )
    print(f"wrote {len(maps)} mazes -> {out}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1000)
