"""Regenerate missing problem datasets (kukas_13/14_3000.pkl schema).

The upstream checkout is missing several large problem files
(.MISSING_LARGE_BLOBS: kukas_13_3000.pkl, kukas_14_3000.pkl,
snakes_15_2_3000.npz — referenced by reference str2env.py:29-37). This tool
regenerates them with the same pickle schema
``[obstacles:[(halfExtents(3,), basePosition(3,)), ...], start, goal,
demo_path]`` and an obstacle distribution matched to the shipped
kukas_7_3000.pkl statistics (boxes: halfExtents ~ U[0.1, 0.3]^3, base
xy ~ U[-1, 1], z ~ U[0.5, 1.3], count ~ U{2..9}).

Every emitted problem is verified solvable: a BIT* run must find a path,
which is stored as the demo path (reference datasets likewise store sparse
planner waypoints, 2-9 per problem).

Usage: python tools/generate_problems.py kuka13|kuka14 [n] [seed]
"""

from __future__ import annotations

import pickle
import sys
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from gnn_motion_planning_tpu.config import HostRNG  # noqa: E402


def bounded_free_samples(env, rng, n, max_rounds: int = 20):
    """Draw up to max_rounds*64 candidates; None if free space is ~empty."""

    pr = np.array(env.pose_range)
    out = []
    for _ in range(max_rounds):
        cand = rng.uniform(pr[:, 0], pr[:, 1], (64, env.config_dim))
        free = env._batch_free(cand)
        out.extend(cand[free])
    # demand a workable free-space fraction (>= ~0.6%) so the downstream
    # batch sampler terminates quickly
    if len(out) >= max(n, 8):
        return out[:n]
    return None


def sample_obstacles(rng):
    n = rng.randint(2, 10)
    obstacles = []
    for _ in range(n):
        half = rng.uniform(0.1, 0.3, 3)
        base = np.concatenate([rng.uniform(-1, 1, 2), rng.uniform(0.5, 1.3, 1)])
        obstacles.append((half, base))
    return obstacles


def generate(env_name: str, n_problems: int, seed: int, out_path: Path, verify_n: int = 1000):
    from gnn_motion_planning_tpu.envs import Kuka2Env, KukaEnv
    from gnn_motion_planning_tpu.planners.bit_star import BITStar

    if env_name == "kuka13":
        env = KukaEnv(kuka_file="kuka_iiwa/model_3.urdf", map_file=None)
    elif env_name == "kuka14":
        env = Kuka2Env(map_file=None)
    else:
        raise KeyError(env_name)

    from gnn_motion_planning_tpu.api.eval_gnn import explore
    from gnn_motion_planning_tpu.api.registry import str2models

    model, model_s = str2models(env_name)

    rng = HostRNG(seed)
    env.rng = rng
    problems = []
    if out_path.exists():  # resume from the periodic checkpoint
        with open(out_path, "rb") as f:
            problems = pickle.load(f)
        print(f"resuming with {len(problems)} existing problems", flush=True)
    t0 = time()
    attempts = 0
    # Only the head of the evaluation split (indexes >= 2000, reference
    # str2env.py:14-38) gets a solvability proof + demo path; earlier indexes
    # supply obstacle scenes for PRM/trainer data generation only.
    verify_from = max(n_problems - 1000, 0)
    verify_to = verify_from + verify_n
    while len(problems) < n_problems:
        attempts += 1
        obstacles = sample_obstacles(rng)
        env.set_problem_data(obstacles, np.zeros(env.config_dim), np.zeros(env.config_dim))
        pts = bounded_free_samples(env, rng, 2)
        if pts is None:  # near-zero free space; discard this obstacle set
            continue
        start, goal = np.asarray(pts[0]), np.asarray(pts[1])
        if np.linalg.norm(start - goal) < env.RRT_EPS:
            continue
        env.set_problem_data(obstacles, start, goal)

        if not (verify_from <= len(problems) < verify_to):
            problems.append([obstacles, start, goal, [start, goal]])
        else:
            # solvability proof: GNN explorer, short BIT* fallback, else
            # discard (the reference sets likewise carry planner demo paths)
            path = None
            try:
                result = explore(
                    env, model, model_s, smooth=True, batch=300, t_max=600, smoother="none"
                )
                if result["success"]:
                    path = [np.asarray(p, np.float64) for p in result["path"]]
            except Exception:
                path = None
            if path is None:
                bit = BITStar(env, batch_size=100, T=400)
                try:
                    _, _, _, cost, _, _ = bit.plan(
                        float("inf"), refine_time_budget=0, time_budget=15
                    )
                except Exception:
                    continue
                if not np.isfinite(cost):
                    continue
                path = [np.asarray(p) for p in bit.get_best_path()]
            problems.append([obstacles, start, goal, path])
        if len(problems) % 5 == 0:
            rate = (time() - t0) / len(problems)
            print(
                f"{len(problems)}/{n_problems} ({attempts} attempts, {rate:.1f}s/problem)",
                flush=True,
            )
        if len(problems) % 25 == 0:
            with open(out_path, "wb") as f:
                pickle.dump(problems, f)

    with open(out_path, "wb") as f:
        pickle.dump(problems, f)
    print(f"wrote {len(problems)} problems -> {out_path}")


def generate_snake(n_problems: int, seed: int, out_path: Path, verify_n: int = 1000):
    """snakes_15_2_3000.npz schema: maps (N,15,15), init_states (N,7),
    goal_states (N,7). Maps reuse the shipped 15x15 maze distribution."""

    from gnn_motion_planning_tpu.api.eval_gnn import explore
    from gnn_motion_planning_tpu.api.registry import str2models
    from gnn_motion_planning_tpu.envs import SnakeEnv
    from gnn_motion_planning_tpu.utils.assets import asset_path

    with np.load(asset_path("maze_files/mazes_15_2_3000.npz")) as f:
        maze_maps = f["maps"]

    env = SnakeEnv(map_file=None)
    model, model_s = str2models("snake7")
    rng = HostRNG(seed)
    env.rng = rng

    maps, inits, goals = [], [], []
    t0 = time()
    attempts = 0
    verify_from = max(n_problems - 1000, 0)
    verify_to = verify_from + verify_n
    while len(maps) < n_problems:
        attempts += 1
        occ = maze_maps[attempts % len(maze_maps)]
        env.set_problem_data(occ, np.zeros(7), np.zeros(7))
        pts = bounded_free_samples(env, rng, 2)
        if pts is None:
            continue
        start, goal = np.asarray(pts[0]), np.asarray(pts[1])
        if np.linalg.norm(start - goal) < env.RRT_EPS:
            continue
        if verify_from <= len(maps) < verify_to:
            env.set_problem_data(occ, start, goal)
            try:
                result = explore(
                    env, model, model_s, smooth=True, batch=300, t_max=600, smoother="none"
                )
            except Exception:
                continue
            if not result["success"]:
                continue
        maps.append(occ)
        inits.append(start)
        goals.append(goal)
        if len(maps) % 5 == 0:
            rate = (time() - t0) / len(maps)
            print(f"{len(maps)}/{n_problems} ({attempts} attempts, {rate:.1f}s/problem)", flush=True)
        if len(maps) % 50 == 0:
            np.savez(
                out_path,
                maps=np.asarray(maps),
                init_states=np.asarray(inits),
                goal_states=np.asarray(goals),
            )
    np.savez(
        out_path,
        maps=np.asarray(maps),
        init_states=np.asarray(inits),
        goal_states=np.asarray(goals),
    )
    print(f"wrote {len(maps)} problems -> {out_path}")


def _verify_one(env, model, model_s, bit_budget_s: float = 15.0):
    """Solvability proof for env's current problem: GNN explore first, short
    BIT* fallback. Returns the witness path (list of float64 configs) or
    None. Same procedure as generate()'s verified head."""

    from gnn_motion_planning_tpu.api.eval_gnn import explore
    from gnn_motion_planning_tpu.planners.bit_star import BITStar

    try:
        result = explore(
            env, model, model_s, smooth=True, batch=300, t_max=600, smoother="none"
        )
        if result["success"]:
            return [np.asarray(p, np.float64) for p in result["path"]]
    except Exception:
        pass
    if bit_budget_s <= 0:
        return None
    bit = BITStar(env, batch_size=100, T=400)
    try:
        _, _, _, cost, _, _ = bit.plan(float("inf"), refine_time_budget=0,
                                       time_budget=bit_budget_s)
    except Exception:
        return None
    if not np.isfinite(cost):
        return None
    return [np.asarray(p) for p in bit.get_best_path()]


def reverify(env_name: str, lo: int, hi: int, seed: int, out_path: Path):
    """Verify (and where needed replace) problems [lo, hi) of an existing
    dataset in place, extending the solvability-proven head to the full
    eval split (reference str2env.py:29-37 tests indexes 2000-3000).

    Each existing problem gets the same proof procedure as generate()'s
    verified head (GNN explore, BIT* fallback); problems with no proof are
    replaced by freshly sampled verified ones. Progress is tracked in a
    sidecar <out>.verify.json so the sweep is resumable."""

    import json

    from gnn_motion_planning_tpu.api.registry import str2models
    from gnn_motion_planning_tpu.envs import Kuka2Env, KukaEnv

    if env_name == "kuka13":
        env = KukaEnv(kuka_file="kuka_iiwa/model_3.urdf", map_file=None)
    elif env_name == "kuka14":
        env = Kuka2Env(map_file=None)
    else:
        raise KeyError(env_name)
    model, model_s = str2models(env_name)

    with open(out_path, "rb") as f:
        problems = pickle.load(f)
    side = out_path.with_suffix(out_path.suffix + ".verify.json")
    if side.exists():
        lo = max(lo, json.loads(side.read_text()).get("done_until", lo))
        print(f"resuming reverify at {lo}", flush=True)

    rng = HostRNG(seed)
    env.rng = rng
    t0, n_done, n_replaced = time(), 0, 0
    for idx in range(lo, hi):
        obstacles, start, goal = problems[idx][0], problems[idx][1], problems[idx][2]
        path = None
        while path is None:
            env.set_problem_data(obstacles, np.asarray(start), np.asarray(goal))
            path = _verify_one(env, model, model_s)
            if path is None:  # replace with a freshly sampled problem
                n_replaced += 1
                while True:
                    obstacles = sample_obstacles(rng)
                    env.set_problem_data(
                        obstacles, np.zeros(env.config_dim), np.zeros(env.config_dim)
                    )
                    pts = bounded_free_samples(env, rng, 2)
                    if pts is None:
                        continue
                    start, goal = np.asarray(pts[0]), np.asarray(pts[1])
                    if np.linalg.norm(start - goal) >= env.RRT_EPS:
                        break
        problems[idx] = [obstacles, np.asarray(start), np.asarray(goal), path]
        n_done += 1
        if n_done % 5 == 0:
            rate = (time() - t0) / n_done
            print(
                f"reverify {idx + 1}/{hi} ({rate:.1f}s/problem, {n_replaced} replaced)",
                flush=True,
            )
        if n_done % 25 == 0 or idx == hi - 1:
            with open(out_path, "wb") as f:
                pickle.dump(problems, f)
            side.write_text(json.dumps({"done_until": idx + 1,
                                        "replaced": n_replaced}))
    with open(out_path, "wb") as f:
        pickle.dump(problems, f)
    side.write_text(json.dumps({"done_until": hi, "replaced": n_replaced}))
    print(f"reverified [{lo},{hi}) of {out_path} ({n_replaced} replaced)")


def reverify_snake(lo: int, hi: int, seed: int, out_path: Path):
    """Same as reverify() for the snake npz schema. Matches generate_snake's
    head procedure: a problem is verified iff GNN explore solves it; failed
    problems are replaced by freshly drawn (map, start, goal) triples that
    pass the same check."""

    import json

    from gnn_motion_planning_tpu.api.eval_gnn import explore
    from gnn_motion_planning_tpu.api.registry import str2models
    from gnn_motion_planning_tpu.envs import SnakeEnv
    from gnn_motion_planning_tpu.utils.assets import asset_path

    with np.load(asset_path("maze_files/mazes_15_2_3000.npz")) as f:
        maze_maps = f["maps"]
    with np.load(out_path) as f:
        maps = list(f["maps"])
        inits = list(f["init_states"])
        goals = list(f["goal_states"])

    side = Path(str(out_path) + ".verify.json")
    if side.exists():
        lo = max(lo, json.loads(side.read_text()).get("done_until", lo))
        print(f"resuming reverify at {lo}", flush=True)

    env = SnakeEnv(map_file=None)
    model, model_s = str2models("snake7")
    rng = HostRNG(seed)
    env.rng = rng

    def save(done_until, n_replaced):
        np.savez(out_path, maps=np.asarray(maps), init_states=np.asarray(inits),
                 goal_states=np.asarray(goals))
        side.write_text(json.dumps({"done_until": done_until,
                                    "replaced": n_replaced}))

    t0, n_done, n_replaced, attempts = time(), 0, 0, 0
    for idx in range(lo, hi):
        occ, start, goal = maps[idx], inits[idx], goals[idx]
        while True:
            env.set_problem_data(occ, np.asarray(start), np.asarray(goal))
            ok = False
            try:
                ok = explore(env, model, model_s, smooth=True, batch=300,
                             t_max=600, smoother="none")["success"]
            except Exception:
                ok = False
            if ok:
                break
            n_replaced += 1
            while True:  # draw a replacement candidate
                attempts += 1
                occ = maze_maps[attempts % len(maze_maps)]
                env.set_problem_data(occ, np.zeros(7), np.zeros(7))
                pts = bounded_free_samples(env, rng, 2)
                if pts is None:
                    continue
                start, goal = np.asarray(pts[0]), np.asarray(pts[1])
                if np.linalg.norm(start - goal) >= env.RRT_EPS:
                    break
        maps[idx], inits[idx], goals[idx] = occ, np.asarray(start), np.asarray(goal)
        n_done += 1
        if n_done % 5 == 0:
            rate = (time() - t0) / n_done
            print(
                f"reverify {idx + 1}/{hi} ({rate:.1f}s/problem, {n_replaced} replaced)",
                flush=True,
            )
        if n_done % 25 == 0 or idx == hi - 1:
            save(idx + 1, n_replaced)
    save(hi, n_replaced)
    print(f"reverified [{lo},{hi}) of {out_path} ({n_replaced} replaced)")


if __name__ == "__main__":
    name = sys.argv[1]
    reverify_range = None
    for a in sys.argv[2:]:
        if a.startswith("--reverify="):
            lo, hi = a.split("=")[1].split(":")
            reverify_range = (int(lo), int(hi))
    if reverify_range is not None:
        lo, hi = reverify_range
        seed = 20250818
        if name == "snake7":
            reverify_snake(lo, hi, seed,
                           REPO / "assets" / "maze_files" / "snakes_15_2_3000.npz")
        else:
            fname = {"kuka13": "kukas_13_3000.pkl", "kuka14": "kukas_14_3000.pkl"}[name]
            reverify(name, lo, hi, seed, REPO / "assets" / "maze_files" / fname)
        sys.exit(0)
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 20240816
    verify_n = 1000
    for a in sys.argv[2:]:
        if a.startswith("--verify="):
            verify_n = int(a.split("=")[1])
    if name == "snake7":
        generate_snake(n, seed, REPO / "assets" / "maze_files" / "snakes_15_2_3000.npz",
                       verify_n=verify_n)
    else:
        fname = {"kuka13": "kukas_13_3000.pkl", "kuka14": "kukas_14_3000.pkl"}[name]
        out = REPO / "assets" / "maze_files" / fname
        generate(name, n, seed, out, verify_n=verify_n)
