"""GNN planner driver: explore + smooth + benchmark metrics.

Drop-in equivalent of the reference driver (reference: eval_gnn.py:80-276):
same call signatures, same metric definitions and printed block, same
collision-check accounting. The heavy lifting happens on device — model
forward, greedy frontier search, and smoothing projection are each one
compiled call per round instead of thousands of Python/PyBullet round trips.
"""

from __future__ import annotations

from time import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gnn_motion_planning_tpu.config import problem_rng, set_random_seed
from gnn_motion_planning_tpu.graphs.knn import build_rgg_edges, k_scaled
from gnn_motion_planning_tpu.models.explorer import explorer_forward
from gnn_motion_planning_tpu.models.smoother import smoother_forward
from gnn_motion_planning_tpu.planners.gnn_explore import backtrack, make_explore_round
from gnn_motion_planning_tpu.planners.gnn_smooth import (
    base_chain_edges,
    make_projection,
    pad_to_bucket,
)


def path_cost(path) -> float:
    """Euclidean path length (reference eval_gnn.py:53-58)."""

    if len(path) < 2:
        return 0.0
    path = np.asarray(path, np.float64)
    return float(np.sum(np.linalg.norm(path[1:] - path[:-1], axis=-1)))


class _Planner(NamedTuple):
    round_fn: object
    project_fn: object
    model_fwd: object
    smoother_fwd: object
    edges_fn: object
    round_vfn: object  # vmapped over problem lanes
    round_vchunk: object  # vmapped + pop-bounded (lane compaction)
    project_vfn: object
    model_vfwd: object
    smoother_vfwd: object
    edges_vfn: object
    fused_round: object  # edges + model + greedy search in ONE device call
    fused_smooth: object  # all 5 smoothing iterations in ONE device call
    serve_round: object  # sampling + edges + model + search in ONE call
    serve_full: object  # whole problem (sample+round+backtrack+smooth) in ONE
    round1_full: object  # protocol round 1 + backtrack + smooth in ONE call


def get_planner(env) -> _Planner:
    """Jitted function bundle for one env instance (cached on the env)."""

    cached = getattr(env, "_gmp_planner", None)
    if cached is not None:
        return cached
    from gnn_motion_planning_tpu.planners.gnn_explore import (
        make_explore_round_batch,
        make_explore_round_batch_chunked,
    )
    from gnn_motion_planning_tpu.planners.gnn_smooth import make_projection_batch

    kernels = env.kernels()

    def _model_v(params, cfg, v, nv, goal, src, dst, ea, obstacles, obs_mask, loop):
        return jax.vmap(
            lambda *a: explorer_forward(params, cfg, *a, loop=loop)
        )(v, nv, goal, src, dst, ea, obstacles, obs_mask)

    def _smoother_v(params, cfg, path, mask, env_nodes, env_valid, n_free,
                    bs, bd, ba, loop):
        return jax.vmap(
            lambda *a: smoother_forward(params, cfg, *a, loop=loop)
        )(path, mask, env_nodes, env_valid, n_free, bs, bd, ba)

    def _edges_v(v, valid, n_free, k1):
        return jax.vmap(lambda vv, nv: build_rgg_edges(vv, nv, n_free, k1))(v, valid)

    from gnn_motion_planning_tpu.planners.gnn_explore import make_explore_round_core
    from gnn_motion_planning_tpu.planners.gnn_smooth import make_projection_core

    round_core = make_explore_round_core(kernels, float(env.RRT_EPS))
    project_core = make_projection_core(kernels, float(env.RRT_EPS))
    # fast projection core, bit-identical unless it raises the overflow
    # flag (callers then redo the smoothing at the full budget):
    #   flat  — packs exactly the counted states (per-edge K, interior
    #           nodes only) into one dense batch per sweep step; chain envs
    #           with kernel bounds (kuka/kuka2/snake/ur5). GMP_FLAT_PROJ=0
    #           forces the dense fallback.
    #   cheap — dense sweep at the K_CHEAP interpolation budget
    #           (envs/base.py) where the env provides edge_free_cheap.
    #   else  — the full dense sweep (maze OccScene checks are ~free).
    import os as _os

    if (
        kernels.bounds is not None
        and _os.environ.get("GMP_FLAT_PROJ", "auto") != "0"
    ):
        from gnn_motion_planning_tpu.planners.gnn_smooth import (
            make_projection_core_flat,
        )

        project_core_cheap = make_projection_core_flat(
            kernels, float(env.RRT_EPS)
        )
    else:
        project_core_cheap = make_projection_core(
            kernels, float(env.RRT_EPS), cheap=True
        )

    def _fused_round(
        params, cfg, scene, v, node_valid, goal, obstacles, obs_mask,
        collided_mask, explored, prev, costs, edge_dead, n_free, k1, loop,
    ):
        """One device call per planning round: graph build + model forward +
        compiled greedy search (cuts ~3 host-device round trips to 1)."""

        edges = build_rgg_edges(v, node_valid, n_free, k1)
        policy = explorer_forward(
            params, cfg, v, node_valid, goal, edges.src, edges.dst, edges.alive,
            obstacles, obs_mask, loop=loop,
        )
        return round_core(
            scene, v, goal, policy, edges, collided_mask, node_valid,
            explored, prev, costs, edge_dead,
        )

    def _serve_round(
        params, cfg, scene, key, lower, upper, init, goal, obstacles,
        obs_mask, batch, k1, loop, oversample,
    ):
        """Serving mode: device-side rejection sampling fused with the
        planning round — ONE device call per problem instead of several
        sampling RPCs plus the round RPC. Draws come from jax.random, not
        the host MT19937 protocol stream, so this is an opt-in serving
        path; the protocol path (explore) is unchanged.

        Sampling semantics mirror sample_n_points(batch, need_negative=True)
        (reference kuka_env.py:194-222): the consumed prefix ends at the
        batch-th accepted draw, every consumed draw counts one collision
        check, and the rejected draws within the prefix are kept (truncated
        to `batch`) as the collided set.
        """

        d = lower.shape[0]
        M = oversample * batch
        draws = jax.random.uniform(
            key, (M, d), minval=lower, maxval=upper, dtype=jnp.float32
        )
        if kernels.batch_state_free is not None:
            free_mask, _ = kernels.batch_state_free(scene, draws)
        else:
            free_mask, _ = jax.vmap(lambda q: kernels.state_free(scene, q))(draws)
        cum = jnp.cumsum(free_mask.astype(jnp.int32))
        enough = cum[-1] >= batch
        # prefix = everything up to and including the batch-th accept
        reached = cum >= batch
        prefix_len = jnp.where(enough, jnp.argmax(reached) + 1, M)
        idx = jnp.arange(M)
        # free draws in order, then everything else (stable by index)
        free_order = jnp.argsort(jnp.where(free_mask, idx, M + idx))
        free_rows = draws[free_order[:batch]]
        coll_in_prefix = (~free_mask) & (idx < prefix_len)
        n_coll = jnp.minimum(jnp.sum(coll_in_prefix.astype(jnp.int32)), batch)
        coll_order = jnp.argsort(jnp.where(coll_in_prefix, idx, M + idx))
        coll_rows = draws[coll_order[:batch]]

        F = batch + 2
        N = 2 * F
        v = jnp.zeros((N, d), jnp.float32)
        v = v.at[0].set(init)
        v = v.at[1].set(goal)
        v = v.at[2:F].set(free_rows)
        v = v.at[F : F + batch].set(coll_rows)
        j = jnp.arange(N)
        node_valid = (j < F) | ((j >= F) & (j < F + n_coll))
        collided_mask = (j >= F) & (j < F + n_coll)

        edges = build_rgg_edges(v, node_valid, F, k1)
        policy = explorer_forward(
            params, cfg, v, node_valid, goal, edges.src, edges.dst,
            edges.alive, obstacles, obs_mask, loop=loop,
        )
        res = round_core(
            scene, v, goal, policy, edges, collided_mask, node_valid,
            jnp.zeros(N, bool).at[0].set(True),
            jnp.zeros(N, jnp.int32),
            jnp.zeros(N, jnp.float32),
            jnp.zeros((N, N), bool),
        )
        return res, v, prefix_len, n_coll, enough

    def _backtrack_smooth(
        params_s, cfg_s, scene, v, res, n_coll, F, l_pad, smooth_iters,
        loop_s, cheap=True,
    ):
        """Shared device tail: path backtrack through the search-tree
        parents + all smoother iterations, entirely on device.

        Mirrors the host pipeline backtrack() -> model_smooth() bit-for-bit
        (incl. the [:500] free-list truncation quirk, reference
        smoother.py:57-58, and last-waypoint padding). ``fits`` is False
        when the path exceeds the static ``l_pad`` buffer — callers fall
        back to the host pipeline then (never observed at l_pad=64 on the
        shipped problem sets).
        """

        d = v.shape[1]

        # --- device backtrack: follow tree parents from the goal node ---
        s = jnp.maximum(res.success_node, 0)
        prev = res.prev

        def bt_cond(c):
            _, i, n = c
            return (i != 0) & (n < l_pad)

        def bt_body(c):
            buf, i, n = c
            buf = buf.at[n].set(i)
            return buf, prev[i], n + 1

        buf, last, n_rev = jax.lax.while_loop(
            bt_cond, bt_body,
            (jnp.zeros((l_pad,), jnp.int32), s, jnp.int32(0)),
        )
        fits = (last == 0) & res.success
        n_path = n_rev + 1  # buf holds [s, ..., child-of-root]; root is idx 0
        j = jnp.arange(l_pad)
        idx_path = jnp.where(
            j == 0, 0, buf[jnp.clip(n_rev - j, 0, l_pad - 1)]
        )
        raw_path = v[idx_path]  # (l_pad, d)
        pad_wp = v[s]
        raw_path = jnp.where((j < n_path)[:, None], raw_path, pad_wp[None])
        path_mask = j < n_path

        # --- smoothing inputs (model_smooth construction, incl. zeroed
        # invalid rows so outputs match the host path bitwise) ---
        nf_cap = min(F, 500)
        nc_cap = min(F, 500)
        env_nodes = jnp.zeros((1000, d), jnp.float32)
        env_nodes = env_nodes.at[:nf_cap].set(v[:nf_cap])
        env_nodes = env_nodes.at[500 : 500 + nc_cap].set(v[F : F + nc_cap])
        jj = jnp.arange(1000)
        env_valid = (jj < nf_cap) | (
            (jj >= 500) & (jj < 500 + jnp.minimum(n_coll, nc_cap))
        )
        env_nodes = jnp.where(env_valid[:, None], env_nodes, 0.0)
        n_free_s = jnp.int32(nf_cap)

        bs, bd, _ = base_chain_edges(l_pad, l_pad)
        bs = jnp.asarray(bs)
        bd = jnp.asarray(bd)
        alive_pairs = jnp.repeat(jnp.arange(1, l_pad) < n_path, 2)
        alive_self = j < n_path
        ba = jnp.concatenate([alive_pairs, alive_self])

        path = raw_path
        count = jnp.int32(0)
        ovf = jnp.asarray(False)
        proj = project_core_cheap if cheap else project_core
        for _ in range(smooth_iters):
            proposal = smoother_forward(
                params_s, cfg_s, path, path_mask, env_nodes, env_valid,
                n_free_s, bs, bd, ba, loop=loop_s,
            )
            path, cnt, ov = proj(scene, path, proposal, n_path)
            count = count + cnt
            ovf = ovf | ov

        return raw_path, path, n_path, fits & ~ovf, count

    def _serve_full(
        params, cfg, params_s, cfg_s, scene, key, lower, upper, init, goal,
        obstacles, obs_mask, batch, k1, loop, loop_s, oversample, l_pad,
        smooth_iters,
    ):
        """Minimum-latency serving: the WHOLE problem — rejection sampling,
        RGG build, explorer forward, greedy search, path backtrack, and all
        smoother iterations — as ONE device call. Over a tunnel-attached
        TPU the per-dispatch roundtrip is a large fraction of per-problem
        latency; this path pays it exactly once.
        """

        res, v, prefix_len, n_coll, enough = _serve_round(
            params, cfg, scene, key, lower, upper, init, goal, obstacles,
            obs_mask, batch, k1, loop, oversample,
        )
        raw_path, path, n_path, fits, count = _backtrack_smooth(
            params_s, cfg_s, scene, v, res, n_coll, batch + 2, l_pad,
            smooth_iters, loop_s,
        )
        return (
            res.success, res.n_checks, res.explored, raw_path, path,
            n_path, fits, prefix_len, n_coll, count, enough,
        )

    def _round1_full(
        params, cfg, params_s, cfg_s, scene, v, node_valid, goal, obstacles,
        obs_mask, collided_mask, n_coll, n_free, k1, loop, loop_s, l_pad,
        smooth_iters,
    ):
        """Protocol round 1 + fused smoothing: graph build + explorer
        forward + greedy search + path backtrack + all smoother iterations
        in ONE device call. Sampling stays on the host MT19937 protocol
        stream, search state is initialized on device (skips the (N, N)
        zeros upload), and the smoothing replicates model_smooth exactly —
        so results are bit-identical to the unfused scalar pipeline while
        paying the device-dispatch roundtrip once per problem."""

        n = v.shape[0]
        edges = build_rgg_edges(v, node_valid, n_free, k1)
        policy = explorer_forward(
            params, cfg, v, node_valid, goal, edges.src, edges.dst,
            edges.alive, obstacles, obs_mask, loop=loop,
        )
        res = round_core(
            scene, v, goal, policy, edges, collided_mask, node_valid,
            jnp.zeros(n, bool).at[0].set(True),
            jnp.zeros(n, jnp.int32),
            jnp.zeros(n, jnp.float32),
            jnp.zeros((n, n), bool),
        )
        raw_path, sm_path, n_path, fits, sm_count = _backtrack_smooth(
            params_s, cfg_s, scene, v, res, n_coll, n_free, l_pad,
            smooth_iters, loop_s,
        )
        return res, raw_path, sm_path, n_path, fits, sm_count

    def _fused_smooth(
        params, cfg, scene, path, path_mask, env_nodes, env_valid, n_free_s,
        base_src, base_dst, base_alive, n_path, iters, loop, cheap=True,
    ):
        """All smoothing iterations (model proposal + projection) fused.

        With ``cheap=True`` the projection runs at the K_CHEAP budget and
        the returned overflow flag tells the caller to redo with
        ``cheap=False`` (bit-identical whenever the flag is False)."""

        count = jnp.int32(0)
        ovf = jnp.asarray(False)
        proj = project_core_cheap if cheap else project_core
        for _ in range(iters):
            proposal = smoother_forward(
                params, cfg, path, path_mask, env_nodes, env_valid, n_free_s,
                base_src, base_dst, base_alive, loop=loop,
            )
            path, cnt, ov = proj(scene, path, proposal, n_path)
            count = count + cnt
            ovf = ovf | ov
        return path, count, ovf

    planner = _Planner(
        round_fn=make_explore_round(kernels, float(env.RRT_EPS)),
        project_fn=make_projection(kernels, float(env.RRT_EPS)),
        model_fwd=jax.jit(explorer_forward, static_argnames=("cfg", "loop")),
        smoother_fwd=jax.jit(
            smoother_forward, static_argnames=("cfg", "loop", "knn_k")
        ),
        edges_fn=jax.jit(build_rgg_edges, static_argnames=("n_free", "k1")),
        round_vfn=make_explore_round_batch(kernels, float(env.RRT_EPS)),
        round_vchunk=make_explore_round_batch_chunked(
            kernels, float(env.RRT_EPS)
        ),
        project_vfn=jax.jit(jax.vmap(project_core_cheap)),
        model_vfwd=jax.jit(_model_v, static_argnames=("cfg", "loop")),
        smoother_vfwd=jax.jit(_smoother_v, static_argnames=("cfg", "loop")),
        edges_vfn=jax.jit(_edges_v, static_argnames=("n_free", "k1")),
        fused_round=jax.jit(
            _fused_round, static_argnames=("cfg", "n_free", "k1", "loop")
        ),
        fused_smooth=jax.jit(
            _fused_smooth, static_argnames=("cfg", "iters", "loop", "cheap")
        ),
        serve_round=jax.jit(
            _serve_round,
            static_argnames=("cfg", "batch", "k1", "loop", "oversample"),
        ),
        serve_full=jax.jit(
            _serve_full,
            static_argnames=(
                "cfg", "cfg_s", "batch", "k1", "loop", "loop_s",
                "oversample", "l_pad", "smooth_iters",
            ),
        ),
        round1_full=jax.jit(
            _round1_full,
            static_argnames=(
                "cfg", "cfg_s", "n_free", "k1", "loop", "loop_s", "l_pad",
                "smooth_iters",
            ),
        ),
    )
    env._gmp_planner = planner
    return planner


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
):
    """GNN-guided planning for the env's current problem
    (reference eval_gnn.py:168-276; same return payload)."""

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
    while not success and (len(free) - 2) <= t_max:
        F = len(free)
        C = len(collided)
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
        "t0": t0,
        "path": path,
        "smooth_path": smooth_path,
        "v": v_np,
    }


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
            return explore(env, model, model_s, smooth=smooth, batch=batch,
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
        return explore(env, model, model_s, smooth=smooth, batch=batch, k=k,
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
            smooth_path = model_smooth(model_s, free, collided, path, env)
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
            (r["success"], path_cost(r["path"]), path_cost(r["smooth_path"]),
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


def explore_batch(
    env,
    model,
    model_s,
    indexes,
    smooth: bool = True,
    batch: int = 500,
    t_max: int = 500,
    k: int = 30,
    loop: int = 5,
    lanes: int = 25,
    chunk: int = 64,
    seed: int = 1234,
):
    """Plan a group of problems simultaneously — the TPU-native serving
    shape. One vmapped device call runs the model forward; the greedy
    search runs in `chunk`-pop device calls with lane compaction between
    them (finished lanes drop out, survivors re-batch into power-of-two
    buckets). Per-lane semantics (masks, collision counts) stay exactly
    those of :func:`explore`'s first round. Lanes that fail their first
    round fall back to the scalar multi-round path.

    Every problem consumes its own ``problem_rng(seed, index)`` stream —
    seeded at sampling, continued through oracle smoothing, re-seeded from
    the start for the scalar fallback — so lane grouping and fallback order
    cannot change any problem's draws and the per-problem metrics are
    bit-identical to :func:`eval_gnn`'s scalar loop.

    Returns a list of per-problem result dicts (same payload as explore).
    """

    planner = get_planner(env)
    d = env.config_dim
    indexes = list(indexes)
    results = {}
    rngs = {}  # index -> its HostRNG, continued across sampling/smoothing

    for g0 in range(0, len(indexes), lanes):
        group = indexes[g0 : g0 + lanes]
        B = len(group)

        scenes, vs, valids, coll_masks, goals, obs_t, obs_m = [], [], [], [], [], [], []
        sample_counts = []
        t0 = time()
        for idx in group:
            rngs[idx] = env.rng = problem_rng(seed, int(idx))
            env.init_new_problem(int(idx))
            c0 = env.collision_check_count
            free, collided = env.sample_n_points(batch, need_negative=True)
            collided = list(collided)[: len(free)]
            free = [np.asarray(env.init_state, np.float64)] + [
                np.asarray(env.goal_state, np.float64)
            ] + [np.asarray(f) for f in free]
            sample_counts.append(env.collision_check_count - c0)

            F = len(free)
            C = len(collided)
            N = 2 * F
            v_np = np.zeros((N, d), np.float32)
            v_np[:F] = np.asarray(free, np.float32)
            if C:
                v_np[F : F + C] = np.asarray(collided, np.float32)
            node_valid = np.zeros(N, bool)
            node_valid[: F + C] = True
            coll = np.zeros(N, bool)
            coll[F : F + C] = True
            ot, om = env.obs_tokens()

            scenes.append(env.device_scene())
            vs.append(v_np)
            valids.append(node_valid)
            coll_masks.append(coll)
            goals.append(np.asarray(env.goal_state, np.float32))
            obs_t.append(ot)
            obs_m.append(om)

        F = batch + 2
        N = 2 * F
        scene_b = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
        v_b = jnp.asarray(np.stack(vs))
        valid_b = jnp.asarray(np.stack(valids))
        coll_b = jnp.asarray(np.stack(coll_masks))
        goal_b = jnp.asarray(np.stack(goals))
        obs_tb = jnp.asarray(np.stack(obs_t))
        obs_mb = jnp.asarray(np.stack(obs_m))

        edges = planner.edges_vfn(v_b, valid_b, n_free=F, k1=k_scaled(k, F))
        policy = planner.model_vfwd(
            model.params, model.cfg, v_b, valid_b, goal_b,
            edges.src, edges.dst, edges.alive, obs_tb, obs_mb, loop=loop,
        )

        explored0 = np.zeros((B, N), bool)
        explored0[:, 0] = True

        # lane-compaction search: each device call advances every lane by at
        # most `chunk` pops; finished lanes drop out and the survivors are
        # re-batched into power-of-two buckets, so the group never pays
        # straggler iterations at full width (the kuka14 regression)
        pool = np.arange(B)  # original lane id of each stacked row
        dummy = np.zeros(B, bool)  # padded duplicate rows (ignored)
        st = (
            scene_b, v_b, goal_b, policy, edges, coll_b, valid_b,
            jnp.asarray(explored0),
            jnp.zeros((B, N), jnp.int32),
            jnp.zeros((B, N), jnp.float32),
            jnp.zeros((B, N, N), bool),
        )
        success_b = np.zeros(B, bool)
        checks_b = np.zeros(B, np.int64)
        node_b = np.full(B, -1, np.int32)
        prev_b = np.zeros((B, N), np.int32)
        explored_b = np.zeros((B, N), bool)

        while True:
            res = planner.round_vchunk(*st, jnp.asarray(dummy), chunk=chunk)
            done = np.asarray(res.done)
            live = ~dummy
            checks_np = np.asarray(res.n_checks)
            np.add.at(checks_b, pool[live], checks_np[live])
            fin = np.nonzero(done & live)[0]
            if fin.size:
                success_b[pool[fin]] = np.asarray(res.success)[fin]
                node_b[pool[fin]] = np.asarray(res.success_node)[fin]
                prev_b[pool[fin]] = np.asarray(res.prev[jnp.asarray(fin)])
                explored_b[pool[fin]] = np.asarray(res.explored[jnp.asarray(fin)])
            keep = np.nonzero(~done & live)[0]
            if keep.size == 0:
                break
            if keep.size == int(live.sum()):
                # no live lane finished: resume in place, no gather traffic
                # (compare against the live count, not len(pool): padding
                # dummies always report done and must not force a re-gather)
                st = (
                    st[0], st[1], st[2], st[3], st[4], st[5], st[6],
                    res.explored, res.prev, res.costs, res.edge_dead,
                )
                continue
            bucket = 1 << int(np.ceil(np.log2(keep.size)))
            # cap at the current stacked width: the full-width program is
            # already compiled, so e.g. 20 survivors of a 25-wide group reuse
            # the 25-wide program instead of compiling a fresh 32-wide one
            # (widths visited stay bounded: B, then powers of two below it)
            bucket = min(bucket, len(pool))
            pad = bucket - keep.size
            sel = np.concatenate([keep, np.repeat(keep[:1], pad)])
            dummy = np.zeros(bucket, bool)
            dummy[keep.size :] = True
            pool = pool[sel]
            sel_dev = jnp.asarray(sel.astype(np.int32))
            st = jax.tree.map(
                lambda x: x[sel_dev],
                (
                    st[0], st[1], st[2], st[3], st[4], st[5], st[6],
                    res.explored, res.prev, res.costs, res.edge_dead,
                ),
            )
        group_time = time() - t0

        # smoothing for the successful lanes, batched
        paths = {}
        for li, idx in enumerate(group):
            if success_b[li]:
                path_idx = backtrack(prev_b[li], int(node_b[li]))
                paths[li] = [vs[li][i] for i in path_idx]

        smooth_counts = {li: 0 for li in paths}
        smooth_paths = {}
        t_sm = time()
        if smooth and paths and getattr(model_s, "params", None) is not None:
            l_pad = pad_to_bucket(max(len(p) for p in paths.values()))
            lanes_idx = sorted(paths)
            # pad the smoothing batch to the fixed lane count: each distinct
            # (P, l_pad) pair compiles its own smoother program, and the
            # success count varies per group — dummy rows repeat lane 0 and
            # their counts are never read
            P = B
            path_arr = np.zeros((P, l_pad, d), np.float32)
            mask_arr = np.zeros((P, l_pad), bool)
            bs_l, bd_l, ba_l = [], [], []
            envn = np.zeros((P, 1000, d), np.float32)
            envv = np.zeros((P, 1000), bool)
            nfree = np.zeros(P, np.int32)
            pad_rows = [lanes_idx[0]] * (P - len(lanes_idx))
            for pi, li in enumerate(lanes_idx + pad_rows):
                p = paths[li]
                L = len(p)
                path_arr[pi, :L] = np.asarray(p, np.float32)
                path_arr[pi, L:] = path_arr[pi, L - 1]
                mask_arr[pi, :L] = True
                bs, bd, ba = base_chain_edges(l_pad, L)
                bs_l.append(bs)
                bd_l.append(bd)
                ba_l.append(ba)
                # env nodes: free prefix (truncated to 500) + collided block
                fr = vs[li][:F][: 500]
                envn[pi, : len(fr)] = fr
                envv[pi, : len(fr)] = True
                co = vs[li][F : F + 500][coll_masks[li][F : F + 500]]
                envn[pi, 500 : 500 + len(co)] = co
                envv[pi, 500 : 500 + len(co)] = True
                nfree[pi] = len(fr)

            path_dev = jnp.asarray(path_arr)
            scene_s = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[scenes[li] for li in lanes_idx + pad_rows],
            )
            cnt_acc = np.zeros(P, np.int64)
            ovf_acc = np.zeros(P, bool)
            for _ in range(5):
                proposal = planner.smoother_vfwd(
                    model_s.params, model_s.cfg, path_dev, jnp.asarray(mask_arr),
                    jnp.asarray(envn), jnp.asarray(envv), jnp.asarray(nfree),
                    jnp.asarray(np.stack(bs_l)), jnp.asarray(np.stack(bd_l)),
                    jnp.asarray(np.stack(ba_l)), loop=1,
                )
                n_paths = jnp.asarray(mask_arr.sum(axis=1).astype(np.int32))
                path_dev, cnts, ovfs = planner.project_vfn(
                    scene_s, path_dev, proposal, n_paths
                )
                cnt_acc += np.asarray(cnts)
                ovf_acc |= np.asarray(ovfs)
            out_paths = np.asarray(path_dev)
            for pi, li in enumerate(lanes_idx):
                L = len(paths[li])
                if ovf_acc[pi]:
                    # the cheap interpolation budget overflowed for this
                    # lane: redo its smoothing at the full budget (scalar
                    # fused program; the cheap run's counts are discarded)
                    p_full, c_full, _ = planner.fused_smooth(
                        model_s.params, model_s.cfg,
                        jax.tree.map(lambda x: x[pi], scene_s),
                        jnp.asarray(path_arr[pi]), jnp.asarray(mask_arr[pi]),
                        jnp.asarray(envn[pi]), jnp.asarray(envv[pi]),
                        jnp.int32(nfree[pi]), jnp.asarray(bs_l[pi]),
                        jnp.asarray(bd_l[pi]), jnp.asarray(ba_l[pi]),
                        jnp.int32(L), iters=5, loop=1, cheap=False,
                    )
                    smooth_counts[li] += int(c_full)
                    p_full = np.asarray(p_full)
                    smooth_paths[li] = [p_full[i] for i in range(L)]
                    continue
                smooth_counts[li] += int(cnt_acc[pi])
                smooth_paths[li] = [out_paths[pi, i] for i in range(L)]
        elif smooth and paths:
            # no loadable model smoother for this env (e.g. maze3, see
            # explore()): oracle-smooth per lane like the scalar path does
            from gnn_motion_planning_tpu.planners.oracle_smoother import (
                joint_smoother,
            )

            for li in sorted(paths):
                # continue the lane's own stream where sampling left it —
                # exactly the scalar path's consumption order
                env.rng = rngs[group[li]]
                env.init_new_problem(int(group[li]))
                c0 = env.collision_check_count
                smooth_paths[li] = joint_smoother(paths[li], env, iter=5)
                smooth_counts[li] = env.collision_check_count - c0
        smooth_time = time() - t_sm

        for li, idx in enumerate(group):
            if success_b[li]:
                results[idx] = {
                    "c_explore": int(sample_counts[li] + checks_b[li]),
                    "c_smooth": int(smooth_counts.get(li, 0)),
                    "explored": list(np.nonzero(explored_b[li])[0]),
                    "forward": group_time / B,
                    "total": group_time / B + smooth_time / max(len(paths), 1),
                    "total_explore": group_time / B,
                    "success": True,
                    "path": paths[li],
                    "smooth_path": smooth_paths.get(li, paths[li] if smooth else []),
                }

    # scalar fallback for lanes that failed their single batched round:
    # re-seed the problem's stream from the start so the fallback IS the
    # scalar run of that problem (its first round repeats the failed
    # batched round draw-for-draw, then continues to rounds 2+)
    for idx in indexes:
        if idx not in results:
            env.rng = problem_rng(seed, int(idx))
            env.init_new_problem(int(idx))
            results[idx] = explore(
                env, model, model_s, smooth=smooth, batch=batch, t_max=t_max, k=k,
                loop=loop,
            )
    return [results[idx] for idx in indexes]


def eval_gnn_batched(
    str_,
    seed,
    env,
    indexes,
    model=None,
    model_s=None,
    lanes: int = 25,
    smooth: bool = True,
    batch: int = 500,
    t_max: int = 500,
    k: int = 30,
    chunk: int = 64,
    **kwargs,
):
    """Batched-lane benchmark sweep: same metrics as eval_gnn, but problems
    are planned `lanes` at a time in fused device calls.

    Timing caveat: success/checks/cost are bit-identical to the scalar
    protocol, but the reported "running time" is amortized group wall time
    per problem (a throughput number), NOT the reference's per-problem wall
    time (eval_gnn.py:131,139) — lanes share device calls, so per-problem
    wall time is not defined. Compare against scalar `eval_gnn` for the
    reference-protocol latency metric."""

    from gnn_motion_planning_tpu.api.registry import str2name

    rng = set_random_seed(seed)
    env.rng = rng
    if model is None:
        _, model, _, _, _ = str2name(str_)
    if model_s is None:
        _, _, _, model_s, _ = str2name(str_)

    t0 = time()
    results = explore_batch(
        env, model, model_s, indexes, smooth=smooth, batch=batch,
        t_max=t_max, k=k, lanes=lanes, chunk=chunk, seed=seed,
    )
    wall = time() - t0

    solutions = [
        (
            r["success"],
            path_cost(r["path"]),
            path_cost(r["smooth_path"]),
            r["c_explore"],
            r["c_smooth"],
            r["total"],
            r["total_explore"],
        )
        for r in results
    ]
    n_success = sum(s[0] for s in solutions)
    collision = float(np.mean([s[3] + s[4] for s in solutions]))
    collision_explore = float(np.mean([s[3] for s in solutions]))
    solution_cost = (
        float(sum(s[2] for s in solutions if s[0])) / n_success if n_success else float("nan")
    )

    print("success rate:", n_success)
    print("collision check: %.2f" % collision)
    print("collision check explore: %.2f" % collision_explore)
    print("running time: %.2f" % (wall / max(n_success, 1)))
    print("path cost: %.2f" % solution_cost)
    print("total time: %.2f" % wall)
    print("")
    return (
        n_success,
        collision,
        wall / max(n_success, 1),
        solution_cost,
        wall,
        [r["path"] for r in results],
        [r["smooth_path"] for r in results],
        collision_explore,
        wall,
    )


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
    **kwargs,
):
    """Benchmark sweep with the reference's metric block
    (reference eval_gnn.py:96-145)."""

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
