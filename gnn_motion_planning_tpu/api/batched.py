"""Batched-lane planning: many problems per device call (TPU serving shape).

`explore_batch` plans groups of problems simultaneously — vmapped model
forward, chunked greedy search with lane compaction, batched smoothing —
with per-problem RNG streams that make every metric bit-identical to the
scalar protocol path (pinned by tests/test_batched_eval.py).
`eval_gnn_batched` is the sweep driver printing the reference metric block.

Reference correspondence: metrics per eval_gnn.py:128-142; per-lane
semantics are those of api.eval_gnn.explore's first round.
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


def _protocol():
    """Protocol drivers, imported lazily (api.eval_gnn re-exports this
    module's entry points, so a top-level import would be circular)."""

    import importlib

    return importlib.import_module("gnn_motion_planning_tpu.api.eval_gnn")

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
    mesh=None,
    stats: list | None = None,
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

    With ``mesh`` (a 1-axis ``dp`` :class:`jax.sharding.Mesh`), the lane
    axis of every stacked tensor is sharded across the mesh's devices
    (GSPMD: the jitted lane programs partition automatically), so a group
    of lanes plans in parallel across chips with no code change in the
    kernels. Lane widths are rounded up to multiples of the mesh size;
    metrics stay bit-identical to the unsharded path (dummy padding lanes
    are never read). See tools/run_benchmarks.py --shards and
    tests/test_multichip.py for the 8-way virtual-mesh check.

    ``stats``: optional caller-owned list; one dict per lane group is
    appended with the phase breakdown (host sampling wall, per-chunk-round
    device wall + stacked width, smoothing wall, scalar-fallback count),
    feeding tools/profile_batched.py. No effect on results.

    Returns a list of per-problem result dicts (same payload as explore).
    """

    from gnn_motion_planning_tpu.parallel.mesh import data_sharding

    n_dev = int(mesh.devices.size) if mesh is not None else 1
    shard = data_sharding(mesh) if mesh is not None else None

    def _place(tree):
        """Shard the leading (lane) axis across the mesh, if one is given."""

        return jax.device_put(tree, shard) if mesh is not None else tree

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

        t_sample = time() - t0

        # pad short tail groups to the full lane width: every group then
        # reuses the `lanes`-wide compiled programs (plus the power-of-two
        # compaction widths below it) instead of compiling a fresh program
        # per distinct tail size (round-3 advisor item on :1057)
        W = max(B, min(lanes, len(indexes)))
        if mesh is not None:  # even lane shards per device
            W = max(n_dev, -(-W // n_dev) * n_dev)
        if B < W:
            for lst in (scenes, vs, valids, coll_masks, goals, obs_t, obs_m):
                lst.extend([lst[0]] * (W - B))

        F = batch + 2
        N = 2 * F
        t_st = time()
        scene_b = _place(jax.tree.map(lambda *xs: jnp.stack(xs), *scenes))
        v_b = _place(jnp.asarray(np.stack(vs)))
        valid_b = _place(jnp.asarray(np.stack(valids)))
        coll_b = _place(jnp.asarray(np.stack(coll_masks)))
        goal_b = _place(jnp.asarray(np.stack(goals)))
        obs_tb = _place(jnp.asarray(np.stack(obs_t)))
        obs_mb = _place(jnp.asarray(np.stack(obs_m)))
        if stats is not None:  # sync so stack/forward split honestly
            jax.block_until_ready(v_b)
        t_stack = time() - t_st

        t_f = time()
        edges = planner.edges_vfn(v_b, valid_b, n_free=F, k1=k_scaled(k, F))
        policy = planner.model_vfwd(
            model.params, model.cfg, v_b, valid_b, goal_b,
            edges.src, edges.dst, edges.alive, obs_tb, obs_mb, loop=loop,
        )
        if stats is not None:
            jax.block_until_ready(policy)
        t_forward = time() - t_f

        explored0 = np.zeros((W, N), bool)
        explored0[:, 0] = True

        # lane-compaction search: each device call advances every lane by at
        # most `chunk` pops; finished lanes drop out and the survivors are
        # re-batched into power-of-two buckets, so the group never pays
        # straggler iterations at full width (the kuka14 regression)
        pool = np.concatenate(
            [np.arange(B), np.zeros(W - B, np.int64)]
        )  # original lane id of each stacked row
        dummy = np.zeros(W, bool)  # padded duplicate rows (ignored)
        dummy[B:] = True
        st = (
            scene_b, v_b, goal_b, policy, edges, coll_b, valid_b,
            _place(jnp.asarray(explored0)),
            _place(jnp.zeros((W, N), jnp.int32)),
            _place(jnp.zeros((W, N), jnp.float32)),
            _place(jnp.zeros((W, N, N), bool)),
        )
        success_b = np.zeros(B, bool)
        checks_b = np.zeros(B, np.int64)
        node_b = np.full(B, -1, np.int32)
        prev_b = np.zeros((B, N), np.int32)
        explored_b = np.zeros((B, N), bool)

        round_log = []  # (stacked width, live lanes, device-round wall)
        W0 = len(pool)
        while True:
            t_r = time()
            # adaptive tail chunk: per-call pop work is width x chunk, so as
            # compaction narrows the stack the pop budget grows to match
            # (pow2 boost, capped) — the straggler tail then costs O(pops /
            # chunk_eff) device round-trips instead of O(pops / chunk). The
            # round core is a while_loop, so lanes that finish mid-chunk
            # exit early and an oversized budget costs nothing. One program
            # per (width, chunk_eff) pair — same compile count as fixed
            # chunking, since width determines chunk_eff.
            boost = 1
            while boost * 2 * len(pool) <= W0:
                boost *= 2
            chunk_eff = min(chunk * boost, 4096)
            res = planner.round_vchunk(
                *st, _place(jnp.asarray(dummy)), chunk=chunk_eff
            )
            done = np.asarray(res.done)
            live = ~dummy
            round_log.append(
                (len(pool), int(live.sum()), round(time() - t_r, 4))
            )
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
            if mesh is not None:
                # even shards: pow2 buckets >= n_dev stay multiples of the
                # (pow2) device count; smaller ones round up to one row/device
                bucket = max(bucket, -(-bucket // n_dev) * n_dev, n_dev)
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
                lambda x: _place(x[sel_dev]),
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
        n_overflow = 0  # lanes redone at full budget (stats)
        t_sm = time()
        if smooth and paths and getattr(model_s, "params", None) is not None:
            l_pad = pad_to_bucket(max(len(p) for p in paths.values()))
            lanes_idx = sorted(paths)
            # pad the smoothing batch to the fixed lane count: each distinct
            # (P, l_pad) pair compiles its own smoother program, and the
            # success count varies per group — dummy rows repeat lane 0 and
            # their counts are never read
            P = W
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

            path_dev = _place(jnp.asarray(path_arr))
            scene_s = _place(jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[scenes[li] for li in lanes_idx + pad_rows],
            ))
            mask_dev = _place(jnp.asarray(mask_arr))
            envn_dev = _place(jnp.asarray(envn))
            envv_dev = _place(jnp.asarray(envv))
            nfree_dev = _place(jnp.asarray(nfree))
            bs_dev = _place(jnp.asarray(np.stack(bs_l)))
            bd_dev = _place(jnp.asarray(np.stack(bd_l)))
            ba_dev = _place(jnp.asarray(np.stack(ba_l)))
            # queue all 5 smoother iterations without a host sync between
            # them (JAX async dispatch); counts/overflows are pulled once
            # at the end — 4 fewer tunnel round-trips per group
            n_paths = _place(jnp.asarray(mask_arr.sum(axis=1).astype(np.int32)))
            cnt_list, ovf_list = [], []
            for _ in range(5):
                proposal = planner.smoother_vfwd(
                    model_s.params, model_s.cfg, path_dev, mask_dev,
                    envn_dev, envv_dev, nfree_dev,
                    bs_dev, bd_dev, ba_dev, loop=1,
                )
                path_dev, cnts, ovfs = planner.project_vfn(
                    scene_s, path_dev, proposal, n_paths
                )
                cnt_list.append(cnts)
                ovf_list.append(ovfs)
            cnt_acc = np.sum([np.asarray(c) for c in cnt_list], axis=0).astype(np.int64)
            ovf_acc = np.any([np.asarray(o) for o in ovf_list], axis=0)
            out_paths = np.asarray(path_dev)
            for pi, li in enumerate(lanes_idx):
                L = len(paths[li])
                if ovf_acc[pi]:
                    # the cheap interpolation budget overflowed for this
                    # lane: redo its smoothing at the full budget (scalar
                    # fused program; the cheap run's counts are discarded)
                    n_overflow += 1
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

        if stats is not None:
            stats.append({
                "group_size": B,
                "stacked_width": W,
                "sample_s": round(t_sample, 4),
                "stack_s": round(t_stack, 4),
                "forward_s": round(t_forward, 4),
                "search_rounds": round_log,
                "search_s": round(sum(r[2] for r in round_log), 4),
                "smooth_s": round(smooth_time, 4),
                "smooth_overflow_redos": n_overflow,
                "group_s": round(time() - t0, 4),
                "first_round_failures": int(B - success_b.sum()),
            })

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
    t_fb = time()
    n_fb = 0
    for idx in indexes:
        if idx not in results:
            n_fb += 1
            env.rng = problem_rng(seed, int(idx))
            env.init_new_problem(int(idx))
            results[idx] = _protocol().explore(
                env, model, model_s, smooth=smooth, batch=batch, t_max=t_max, k=k,
                loop=loop,
            )
    if stats is not None and n_fb:
        stats.append({
            "scalar_fallbacks": n_fb,
            "fallback_s": round(time() - t_fb, 4),
        })
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
    mesh=None,
    **kwargs,
):
    """Batched-lane benchmark sweep: same metrics as eval_gnn, but problems
    are planned `lanes` at a time in fused device calls.

    ``mesh``: optional 1-axis ``dp`` Mesh — lanes shard across its devices
    (see :func:`explore_batch`); pass ``parallel.mesh.make_mesh(n)`` or
    ``global_mesh()`` under multi-chip. Metrics are unchanged by sharding.

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
        t_max=t_max, k=k, lanes=lanes, chunk=chunk, seed=seed, mesh=mesh,
    )
    wall = time() - t0

    solutions = [
        (
            r["success"],
            _protocol().path_cost(r["path"]),
            _protocol().path_cost(r["smooth_path"]),
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
