"""GNN planner protocol drivers: explore + smooth + benchmark metrics.

Drop-in equivalent of the reference driver (reference: eval_gnn.py:80-276):
same call signatures, same metric definitions and printed block, same
collision-check accounting. The heavy lifting happens on device — model
forward, greedy frontier search, and smoothing projection are each one
compiled call per round instead of thousands of Python/PyBullet round trips.

Module layout (round-4 split of the former monolith):
  api.planner_bundle — compiled function bundle construction (get_planner)
  api.eval_gnn       — this module: the reference-protocol scalar drivers
  api.batched        — lane-batched sweeps (explore_batch, eval_gnn_batched)
  api.serve          — fused serving paths (explore_serve, eval_gnn_serve)
The batched/serve entry points are re-exported here for compatibility.
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
from gnn_motion_planning_tpu.planners.gnn_smooth import (
    base_chain_edges,
    pad_to_bucket,
)


def path_cost(path) -> float:
    """Euclidean path length (reference eval_gnn.py:53-58)."""

    if len(path) < 2:
        return 0.0
    path = np.asarray(path, np.float64)
    return float(np.sum(np.linalg.norm(path[1:] - path[:-1], axis=-1)))


def model_smooth(model_s, free, collided, old_path, env, iter: int = 5):
    """GNN smoothing driver (reference smoother.py:233-246).

    `free`/`collided` are truncated to 500 samples each exactly like the
    reference's obs_data (smoother.py:57-58) — including the quirk that the
    truncation may drop the tail of the free list.
    """

    planner = get_planner(env)
    scene = env.device_scene()
    d = env.config_dim

    free_used = np.asarray(free, np.float32)[:500]
    coll_used = (
        np.asarray(collided, np.float32)[:500]
        if len(collided)
        else np.zeros((0, d), np.float32)
    )
    env_nodes = np.zeros((1000, d), np.float32)
    env_valid = np.zeros(1000, bool)
    env_nodes[: len(free_used)] = free_used
    env_valid[: len(free_used)] = True
    env_nodes[500 : 500 + len(coll_used)] = coll_used
    env_valid[500 : 500 + len(coll_used)] = True
    n_free = jnp.int32(len(free_used))

    L = len(old_path)
    # coarse bucket: each (L_pad) variant compiles a separate fused-smooth
    # program; paths are rarely >64 waypoints
    l_pad = pad_to_bucket(L, step=64)
    base_src, base_dst, base_alive = base_chain_edges(l_pad, L)
    path_arr = np.zeros((l_pad, d), np.float32)
    path_arr[:L] = np.asarray(old_path, np.float32)
    path_arr[L:] = path_arr[L - 1]
    path_mask = np.zeros(l_pad, bool)
    path_mask[:L] = True

    args = (
        model_s.params,
        model_s.cfg,
        scene,
        jnp.asarray(path_arr),
        jnp.asarray(path_mask),
        jnp.asarray(env_nodes),
        jnp.asarray(env_valid),
        n_free,
        jnp.asarray(base_src),
        jnp.asarray(base_dst),
        jnp.asarray(base_alive),
        jnp.int32(L),
    )
    path_dev, cnt, ovf = planner.fused_smooth(*args, iters=iter, loop=1)
    if bool(ovf):
        # a checked segment exceeded the cheap interpolation budget (rare:
        # only very long segments); redo at the full budget — counts from
        # the cheap run are discarded, the full run is the protocol result
        path_dev, cnt, _ = planner.fused_smooth(
            *args, iters=iter, loop=1, cheap=False
        )
    env.collision_check_count += int(cnt)

    out = np.asarray(path_dev)[:L]
    return [out[i] for i in range(L)]


def explore(
    env,
    model,
    model_s,
    smooth: bool = True,
    batch: int = 500,
    t_max: int = 1000,
    k: int = 30,
    smoother: str = "model",
    loop: int = 5,
    strict_fallback: bool = False,
):
    """GNN-guided planning for the env's current problem
    (reference eval_gnn.py:168-276; same return payload).

    ``strict_fallback`` (opt-in, off under the reference protocol): when
    the capsule-feasible graph exhausts without success on an arm env,
    re-admit capsule-blocked RGG edges that the sound hull-surface
    verifier certifies free (planners/strict_fallback.py) — recovering
    the ``oracle_conservatism`` failure class the round-4 triage
    identified. All extra checks are counted; the result carries
    ``strict_certified=True``."""

    planner = get_planner(env)
    scene = env.device_scene()
    d = env.config_dim

    c0 = env.collision_check_count
    t0 = time()
    forward = 0.0

    success = False
    path, smooth_path = [], []
    n_batch = batch
    free, collided = env.sample_n_points(n_batch, need_negative=True)
    collided = list(collided)[: len(free)]
    free = [np.asarray(env.init_state, np.float64)] + [
        np.asarray(env.goal_state, np.float64)
    ] + [np.asarray(f) for f in free]

    obstacles, obs_mask = env.obs_tokens()
    goal = jnp.asarray(np.asarray(env.goal_state, np.float32))

    # resolve the smoother choice upfront (maze3: the reference names
    # smooth_3d_attv3.pt but ships only the legacy smooth_3d_att.pt, which
    # its own ModelSmoother cannot load — str2name.py:25 vs data/weights/)
    if (
        smooth
        and smoother == "model"
        and getattr(model_s, "params", None) is None
    ):
        smoother = "oracle"
    # model smoothing on a first-round success runs fused into the round
    # call (bit-identical results, one device dispatch per problem)
    fuse_smooth = smooth and smoother == "model"
    fused_sm = None  # (smooth_path_dev, n_path, sm_count) when fused

    state = None  # persistent (explored, prev, costs, edge_dead) as numpy
    v_np = None
    fb_F = fb_C = 0  # the (free, collided) split v_np was built with
    while not success and (len(free) - 2) <= t_max:
        F = len(free)
        C = len(collided)
        fb_F, fb_C = F, C
        N = 2 * F
        v_np = np.zeros((N, d), np.float32)
        v_np[:F] = np.asarray(free, np.float32)
        if C:
            v_np[F : F + C] = np.asarray(collided, np.float32)
        node_valid = np.zeros(N, bool)
        node_valid[: F + C] = True
        collided_mask = np.zeros(N, bool)
        collided_mask[F : F + C] = True

        v_dev = jnp.asarray(v_np)

        if state is None and fuse_smooth:
            t1 = time()
            res, _raw_d, sm_d, npth_d, fits_d, smc_d = planner.round1_full(
                model.params,
                model.cfg,
                model_s.params,
                model_s.cfg,
                scene,
                v_dev,
                jnp.asarray(node_valid),
                goal,
                jnp.asarray(obstacles),
                jnp.asarray(obs_mask),
                jnp.asarray(collided_mask),
                jnp.int32(C),
                n_free=F,
                k1=k_scaled(k, F),
                loop=loop,
                loop_s=1,
                l_pad=64,
                smooth_iters=5,
            )
            jax.block_until_ready(res.success)
            forward += time() - t1
            success = bool(res.success)
            env.collision_check_count += int(res.n_checks)
            if success:
                state = (
                    np.asarray(res.explored), np.asarray(res.prev), None, None
                )
                if bool(fits_d):
                    fused_sm = (sm_d, int(npth_d), int(smc_d))
                idx_path = backtrack(
                    np.asarray(res.prev), int(res.success_node)
                )
                path = [v_np[i] for i in idx_path]
                continue
            # keep the resume state on device: the (N, N) edge_dead mask is
            # up to 16 MB and re-uploading it each resample round costs
            # more than the round itself over a tunnel-attached TPU
            state = (res.explored, res.prev, res.costs, res.edge_dead)
            if not smooth:
                return []
            if (n_batch + len(free) - 2) > t_max:
                break
            new_free, new_collided = env.sample_n_points(
                n_batch, need_negative=True
            )
            free = free + [np.asarray(f) for f in new_free]
            collided = collided + list(new_collided)
            collided = collided[: len(free)]
            continue

        if state is None:
            explored = jnp.zeros(N, bool).at[0].set(True)
            prev = jnp.zeros(N, jnp.int32)
            costs = jnp.zeros(N, jnp.float32)
            edge_dead = jnp.zeros((N, N), bool)
        else:
            explored, prev, costs, edge_dead = state
            n_old = explored.shape[0]
            pad = N - n_old
            if pad:  # grow the device-resident state in place
                explored = jnp.pad(explored, (0, pad))
                prev = jnp.pad(prev, (0, pad))
                costs = jnp.pad(costs, (0, pad))
                edge_dead = jnp.pad(edge_dead, ((0, pad), (0, pad)))

        t1 = time()
        res = planner.fused_round(
            model.params,
            model.cfg,
            scene,
            v_dev,
            jnp.asarray(node_valid),
            goal,
            jnp.asarray(obstacles),
            jnp.asarray(obs_mask),
            jnp.asarray(collided_mask),
            jnp.asarray(explored),
            jnp.asarray(prev),
            jnp.asarray(costs),
            jnp.asarray(edge_dead),
            n_free=F,
            k1=k_scaled(k, F),
            loop=loop,
        )
        jax.block_until_ready(res.success)
        forward += time() - t1
        success = bool(res.success)
        env.collision_check_count += int(res.n_checks)

        if success:
            state = (np.asarray(res.explored), np.asarray(res.prev), None, None)
            idx_path = backtrack(np.asarray(res.prev), int(res.success_node))
            path = [v_np[i] for i in idx_path]
        else:
            # keep the resume state on device (see the round-1 branch)
            state = (res.explored, res.prev, res.costs, res.edge_dead)
            if not smooth:
                return []
            if (n_batch + len(free) - 2) > t_max:
                break
            new_free, new_collided = env.sample_n_points(
                n_batch, need_negative=True
            )
            free = free + [np.asarray(f) for f in new_free]
            collided = collided + list(new_collided)
            collided = collided[: len(free)]

    strict_certified = False
    if not success and strict_fallback and v_np is not None:
        from gnn_motion_planning_tpu.graphs.knn import build_rgg_edges
        from gnn_motion_planning_tpu.planners.strict_fallback import (
            strict_fallback_path,
        )

        edges = build_rgg_edges(
            jnp.asarray(v_np),
            jnp.asarray(np.arange(len(v_np)) < fb_F + fb_C),
            fb_F,
            k_scaled(k, fb_F),
        )
        edge_dead = (
            np.asarray(state[3])
            if state is not None and state[3] is not None
            else np.zeros((len(v_np), len(v_np)), bool)
        )
        idx_path = strict_fallback_path(env, v_np, fb_F, edges, edge_dead)
        if idx_path is not None:
            success = True
            strict_certified = True
            path = [v_np[i] for i in idx_path]

    c_explore = env.collision_check_count - c0
    c1 = env.collision_check_count
    t1 = time()
    if success and smooth:
        if fused_sm is not None:
            # smoothing already ran inside the round-1 device call
            sm_d, n_p, smc = fused_sm
            smp = np.asarray(sm_d)[:n_p]
            smooth_path = [smp[i] for i in range(n_p)]
            env.collision_check_count += smc
        elif smoother == "model":
            smooth_path = model_smooth(model_s, free, collided, path, env)
        elif smoother == "oracle":
            from gnn_motion_planning_tpu.planners.oracle_smoother import (
                joint_smoother,
            )

            smooth_path = joint_smoother(path, env, iter=5)
        else:
            smooth_path = path
    c_smooth = env.collision_check_count - c1

    if not smooth:
        return path, free, collided

    explored_idx = (
        list(np.nonzero(np.asarray(state[0]))[0]) if state is not None else [0]
    )
    total_time = time()
    return {
        "c_explore": int(c_explore),
        "c_smooth": int(c_smooth),
        "explored": explored_idx,
        "forward": forward,
        "total": total_time - t0,
        "total_explore": t1 - t0,
        "success": success,
        "strict_certified": strict_certified,
        "t0": t0,
        "path": path,
        "smooth_path": smooth_path,
        "v": v_np,
    }

def eval_gnn(
    str_,
    seed,
    env,
    indexes,
    model=None,
    model_s=None,
    use_tqdm: bool = False,
    smooth: bool = True,
    batch: int = 500,
    t_max: int = 500,
    k: int = 30,
    failed_indexes: list | None = None,
    **kwargs,
):
    """Benchmark sweep with the reference's metric block
    (reference eval_gnn.py:96-145).

    `failed_indexes`: optional caller-owned list; every problem index the
    planner fails is appended, so full-split rows come out triage-ready
    (tools/snake_refbudget_triage.py consumes them without a re-run).
    """

    from gnn_motion_planning_tpu.api.registry import str2name

    rng = set_random_seed(seed)
    env.rng = rng
    if model is None:
        _, model, _, _, _ = str2name(str_)
    if model_s is None:
        _, _, _, model_s, _ = str2name(str_)

    solutions = []
    paths, smooth_paths = [], []

    iterator = indexes
    if use_tqdm:
        from tqdm import tqdm

        iterator = tqdm(indexes)

    for index in iterator:
        # independent per-problem stream: problem ordering cannot change any
        # problem's draws, and the batched path reproduces them exactly
        env.rng = problem_rng(seed, int(index))
        env.init_new_problem(int(index))
        result = explore(
            env, model, model_s, smooth, batch=batch, t_max=t_max, k=k, **kwargs
        )
        paths.append(result["path"])
        smooth_paths.append(result["smooth_path"])
        if failed_indexes is not None and not result["success"]:
            failed_indexes.append(int(index))
        solutions.append(
            (
                result["success"],
                path_cost(result["path"]),
                path_cost(result["smooth_path"]),
                result["c_explore"],
                result["c_smooth"],
                result["total"],
                result["total_explore"],
            )
        )
        if use_tqdm:
            iterator.set_description(
                "gnn %.2fs, search %.2fs, explored %d"
                % (
                    result["forward"],
                    result["total"] - result["forward"],
                    len(result["explored"]),
                )
            )

    n_success = sum(s[0] for s in solutions)
    collision_explore = float(np.mean([s[3] for s in solutions]))
    collision = float(np.mean([s[3] + s[4] for s in solutions]))
    running_time = (
        float(sum(s[5] for s in solutions if s[0])) / n_success
        if n_success
        else float("nan")
    )
    solution_cost = (
        float(sum(s[2] for s in solutions if s[0])) / n_success
        if n_success
        else float("nan")
    )
    total_time = float(sum(s[5] for s in solutions))
    total_time_explore = float(sum(s[6] for s in solutions))

    print("success rate:", n_success)
    print("collision check: %.2f" % collision)
    print("collision check explore: %.2f" % collision_explore)
    print("running time: %.2f" % running_time)
    print("path cost: %.2f" % solution_cost)
    print("total time: %.2f" % total_time)
    print("total time explore: %.2f" % total_time_explore)
    print("")

    return (
        n_success,
        collision,
        running_time,
        solution_cost,
        total_time,
        paths,
        smooth_paths,
        collision_explore,
        total_time_explore,
    )


def eval_gnn_pure(
    str_, seed, env, indexes, model=None, model_s=None, **kwargs
):
    """Obstacle-encoding-free variant (reference eval_gnn.py:80-93)."""

    from gnn_motion_planning_tpu.api.registry import str2name

    if model is None:
        _, model, _, model_s, _ = str2name(str_, use_obstacle=False)
    model = model._replace(cfg=model.cfg._replace(use_obstacles=False))
    if model_s is None:
        _, _, _, model_s, _ = str2name(str_)
    return eval_gnn(str_, seed, env, indexes, model, model_s, **kwargs)


# compatibility re-exports: the batched sweep and serving paths moved to
# their own modules in the round-4 split; external callers keep importing
# them from here
from gnn_motion_planning_tpu.api.batched import (  # noqa: E402
    eval_gnn_batched,
    explore_batch,
)
from gnn_motion_planning_tpu.api.serve import (  # noqa: E402
    eval_gnn_serve,
    explore_serve,
)
