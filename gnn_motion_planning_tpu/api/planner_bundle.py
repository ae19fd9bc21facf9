"""Compiled planner-function bundle: one jitted toolkit per env instance.

Builds and caches (on the env) every compiled entry point the GNN planning
drivers use — scalar round, vmapped lane variants, lane-compaction chunked
search, fully-fused serving programs, and the fused smoothing tail. Pure
construction: the protocol drivers live in api.eval_gnn, the batched sweep
in api.batched, the serving paths in api.serve.

Reference correspondence: the fused programs reproduce the reference
pipeline create_data -> model forward -> greedy search -> smoothing
(reference eval_gnn.py:150-276, smoother.py:233-246) with identical
masking/count semantics, collapsed into single device calls.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gnn_motion_planning_tpu.graphs.knn import build_rgg_edges
from gnn_motion_planning_tpu.models.explorer import explorer_forward
from gnn_motion_planning_tpu.models.smoother import smoother_forward
from gnn_motion_planning_tpu.planners.gnn_explore import make_explore_round
from gnn_motion_planning_tpu.planners.gnn_smooth import (
    base_chain_edges,
    make_projection,
)

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
