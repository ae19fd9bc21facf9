"""Serving-mode planning paths: minimum-latency fused device programs.

`explore_serve` runs the whole problem (device-side rejection sampling,
RGG build, explorer forward, greedy search, backtrack, smoothing) in one
or two device calls; `eval_gnn_serve` is its latency benchmark driver.
Draws come from a jax.random key instead of the host MT19937 protocol
stream, so serve metrics are statistically (not bit-) identical to the
protocol path in api.eval_gnn — disclosed in BASELINE.md.

Reference correspondence: sampling semantics mirror
sample_n_points(batch, need_negative=True) (reference kuka_env.py:194-222);
the metric block matches eval_gnn.py:128-142 plus p50/p95 latency.
"""

from __future__ import annotations

from time import time

import jax
import jax.numpy as jnp
import numpy as np

from gnn_motion_planning_tpu.api.planner_bundle import get_planner
from gnn_motion_planning_tpu.config import problem_rng, set_random_seed
from gnn_motion_planning_tpu.graphs.knn import k_scaled
from gnn_motion_planning_tpu.planners.gnn_explore import backtrack


def _protocol():
    """Protocol drivers, imported lazily (api.eval_gnn re-exports this
    module's entry points, so a top-level import would be circular)."""

    import importlib

    return importlib.import_module("gnn_motion_planning_tpu.api.eval_gnn")

def explore_serve(
    env,
    model,
    model_s,
    key,
    smooth: bool = True,
    batch: int = 500,
    k: int = 30,
    loop: int = 5,
    oversample: int = 4,
):
    """Serving-mode planning for the env's current problem: sampling +
    graph + model forward + greedy search in ONE device call, smoothing in
    a second. Minimum-latency path for online serving; draws come from a
    jax.random key instead of the protocol MT19937 stream (metrics are
    statistically, not bit-, identical to :func:`explore` — use the
    protocol path for reference comparisons).

    Falls back to :func:`explore` when the oversampled draw doesn't contain
    `batch` free samples (never observed at oversample=4 on the shipped
    problem sets) or when the single fused round fails.
    """

    planner = get_planner(env)
    scene = env.device_scene()
    c0 = env.collision_check_count
    t0 = time()

    obstacles, obs_mask = env.obs_tokens()
    if hasattr(env, "pose_range"):
        pr = np.array(env.pose_range, np.float32)
    else:  # maze envs sample from +/- LIMITS (reference maze_env.py:127-135)
        from gnn_motion_planning_tpu.envs.env_config import LIMITS

        lim = np.asarray(LIMITS[: env.config_dim], np.float32)
        pr = np.stack([-lim, lim], axis=1)
    if smooth and getattr(model_s, "params", None) is not None:
        # fully fused path: sampling + round + backtrack + smoothing in ONE
        # device call (pays the tunnel dispatch roundtrip exactly once)
        (success_d, n_checks, explored_d, raw_path, sm_path, n_path, fits,
         prefix_len, n_coll, sm_count, enough) = planner.serve_full(
            model.params,
            model.cfg,
            model_s.params,
            model_s.cfg,
            scene,
            key,
            jnp.asarray(pr[:, 0]),
            jnp.asarray(pr[:, 1]),
            jnp.asarray(np.asarray(env.init_state, np.float32)),
            jnp.asarray(np.asarray(env.goal_state, np.float32)),
            jnp.asarray(obstacles),
            jnp.asarray(obs_mask),
            batch=batch,
            k1=k_scaled(k, batch + 2),
            loop=loop,
            loop_s=1,
            oversample=oversample,
            l_pad=64,
            smooth_iters=5,
        )
        jax.block_until_ready(success_d)
        ok = bool(success_d) and bool(enough) and bool(fits)
        if not ok:
            # count the consumed sampling+round checks (the smoothing ran on
            # a garbage path and is NOT protocol work), then fall back
            env.collision_check_count += int(prefix_len) + int(n_checks)
            return _protocol().explore(env, model, model_s, smooth=smooth, batch=batch,
                           k=k, loop=loop)
        env.collision_check_count += (
            int(prefix_len) + int(n_checks) + int(sm_count)
        )
        c_explore = int(prefix_len) + int(n_checks)
        t1 = time()
        n_p = int(n_path)
        raw = np.asarray(raw_path)[:n_p]
        smp = np.asarray(sm_path)[:n_p]
        total = time()
        return {
            "c_explore": c_explore,
            "c_smooth": int(sm_count),
            "explored": list(np.nonzero(np.asarray(explored_d))[0]),
            "forward": t1 - t0,
            "total": total - t0,
            "total_explore": t1 - t0,
            "success": True,
            "path": [raw[i] for i in range(n_p)],
            "smooth_path": [smp[i] for i in range(n_p)],
            "v": None,
        }

    res, v, n_sample_checks, n_coll, enough = planner.serve_round(
        model.params,
        model.cfg,
        scene,
        key,
        jnp.asarray(pr[:, 0]),
        jnp.asarray(pr[:, 1]),
        jnp.asarray(np.asarray(env.init_state, np.float32)),
        jnp.asarray(np.asarray(env.goal_state, np.float32)),
        jnp.asarray(obstacles),
        jnp.asarray(obs_mask),
        batch=batch,
        k1=k_scaled(k, batch + 2),
        loop=loop,
        oversample=oversample,
    )
    jax.block_until_ready(res.success)
    success = bool(res.success)
    env.collision_check_count += int(n_sample_checks) + int(res.n_checks)
    if not bool(enough) or not success:
        # rare: fall back to the protocol path for this problem
        return _protocol().explore(env, model, model_s, smooth=smooth, batch=batch, k=k,
                       loop=loop)

    v_np = np.asarray(v)
    idx_path = backtrack(np.asarray(res.prev), int(res.success_node))
    path = [v_np[i] for i in idx_path]
    c_explore = env.collision_check_count - c0
    t1 = time()

    smooth_path = path
    if smooth:
        F = batch + 2
        free = [v_np[i] for i in range(F)]
        collided = [v_np[F + i] for i in range(int(n_coll))]
        if getattr(model_s, "params", None) is not None:
            smooth_path = _protocol().model_smooth(model_s, free, collided, path, env)
        else:
            from gnn_motion_planning_tpu.planners.oracle_smoother import (
                joint_smoother,
            )

            smooth_path = joint_smoother(path, env, iter=5)
    c_smooth = env.collision_check_count - c0 - c_explore

    total = time()
    return {
        "c_explore": int(c_explore),
        "c_smooth": int(c_smooth),
        "explored": list(np.nonzero(np.asarray(res.explored))[0]),
        "forward": t1 - t0,
        "total": total - t0,
        "total_explore": t1 - t0,
        "success": True,
        "path": path,
        "smooth_path": smooth_path,
        "v": v_np,
    }


def eval_gnn_serve(
    str_,
    seed,
    env,
    indexes,
    model=None,
    model_s=None,
    smooth: bool = True,
    batch: int = 500,
    k: int = 30,
    loop: int = 5,
    use_tqdm: bool = False,
    **kwargs,
):
    """Serving-latency benchmark: per-problem wall time of the fused
    serve path (2 device calls/problem). Prints the reference metric block
    plus p50/p95 latency over successes."""

    from gnn_motion_planning_tpu.api.registry import str2name

    set_random_seed(seed)
    if model is None:
        _, model, _, _, _ = str2name(str_)
    if model_s is None:
        _, _, _, model_s, _ = str2name(str_)

    root = jax.random.PRNGKey(seed)
    solutions, times = [], []
    iterator = indexes
    if use_tqdm:
        from tqdm import tqdm

        iterator = tqdm(indexes)
    for index in iterator:
        # the fallback path consumes the protocol stream for this problem
        env.rng = problem_rng(seed, int(index))
        env.init_new_problem(int(index))
        r = explore_serve(
            env, model, model_s, jax.random.fold_in(root, int(index)),
            smooth=smooth, batch=batch, k=k, loop=loop,
        )
        solutions.append(
            (r["success"], _protocol().path_cost(r["path"]), _protocol().path_cost(r["smooth_path"]),
             r["c_explore"], r["c_smooth"], r["total"], r["total_explore"])
        )
        if r["success"]:
            times.append(r["total"])

    n_success = sum(s[0] for s in solutions)
    collision = float(np.mean([s[3] + s[4] for s in solutions]))
    collision_explore = float(np.mean([s[3] for s in solutions]))
    running_time = float(np.mean(times)) if times else float("nan")
    solution_cost = (
        float(sum(s[2] for s in solutions if s[0])) / n_success
        if n_success else float("nan")
    )
    p50 = float(np.percentile(times, 50)) if times else float("nan")
    p95 = float(np.percentile(times, 95)) if times else float("nan")

    print("success rate:", n_success)
    print("collision check: %.2f" % collision)
    print("collision check explore: %.2f" % collision_explore)
    print("running time: %.2f" % running_time)
    print("path cost: %.2f" % solution_cost)
    print("p50 latency: %.3f  p95: %.3f" % (p50, p95))
    print("")
    return (
        n_success, collision, running_time, solution_cost,
        float(np.sum(times)), p50, p95,
    )
