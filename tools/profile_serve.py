"""Latency breakdown of the fused serve path (VERDICT round-4 weak #2).

The serve row's p50 has only ever been measured end-to-end; this tool
splits it into the three device programs that compose it, warm, on the
same problems and jax.random keys:

  dispatch   p50 roundtrip of a trivial jitted op over the tunnel
  serve_round  sampling + RGG build + explorer forward + greedy search
  serve_full   serve_round + backtrack + all smoother iterations
  smooth tail  serve_full - serve_round (per problem, then p50)
  scalar       protocol explore() on the same problem (host MT19937)

Writes assets/benchmarks/profile_serve_<env>.json.

Usage: python tools/profile_serve.py <env> [n=30]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def profile_serve(name: str, n: int = 30):
    import jax
    import jax.numpy as jnp

    from gnn_motion_planning_tpu.api.eval_gnn import explore
    from gnn_motion_planning_tpu.api.planner_bundle import get_planner
    from gnn_motion_planning_tpu.api.registry import eval_overrides, str2env, str2name
    from gnn_motion_planning_tpu.config import problem_rng
    from gnn_motion_planning_tpu.graphs.knn import k_scaled

    env, idx = str2env(name)
    _, model, _, model_s, _ = str2name(name)
    t_max = eval_overrides(name).get("t_max", 500)
    batch, k, loop = 500, 30, 5
    indexes = [int(i) for i in idx[:n]]
    planner = get_planner(env)
    root = jax.random.PRNGKey(1234)

    # dispatch roundtrip floor
    one = jnp.float32(1.0)
    trivial = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(trivial(one))
    disp = []
    for _ in range(20):
        t0 = time()
        jax.block_until_ready(trivial(one))
        disp.append(time() - t0)

    def serve_args(index):
        env.rng = problem_rng(1234, index)
        env.init_new_problem(index)
        scene = env.device_scene()
        obstacles, obs_mask = env.obs_tokens()
        if hasattr(env, "pose_range"):
            pr = np.array(env.pose_range, np.float32)
        else:
            from gnn_motion_planning_tpu.envs.env_config import LIMITS

            lim = np.asarray(LIMITS[: env.config_dim], np.float32)
            pr = np.stack([-lim, lim], axis=1)
        key = jax.random.fold_in(root, index)
        return scene, (
            jnp.asarray(pr[:, 0]), jnp.asarray(pr[:, 1]),
            jnp.asarray(np.asarray(env.init_state, np.float32)),
            jnp.asarray(np.asarray(env.goal_state, np.float32)),
            jnp.asarray(obstacles), jnp.asarray(obs_mask),
        ), key

    def run_round(scene, args, key):
        res, v, prefix_len, n_coll, enough = planner.serve_round(
            model.params, model.cfg, scene, key, *args,
            batch=batch, k1=k_scaled(k, batch + 2), loop=loop,
            oversample=4,
        )
        jax.block_until_ready(res.success)
        return res

    def run_full(scene, args, key):
        outs = planner.serve_full(
            model.params, model.cfg, model_s.params, model_s.cfg, scene,
            key, *args, batch=batch, k1=k_scaled(k, batch + 2), loop=loop,
            loop_s=1, oversample=4, l_pad=64, smooth_iters=5,
        )
        jax.block_until_ready(outs[0])
        return outs

    # warm every program on problem 0 (the persistent compile cache makes
    # later processes warm too, but do not rely on it here)
    scene, args, key = serve_args(indexes[0])
    run_round(scene, args, key)
    if getattr(model_s, "params", None) is not None:
        run_full(scene, args, key)
    explore(env, model, model_s, smooth=True, batch=batch, t_max=t_max, k=k)

    rows = []
    for index in indexes:
        scene, args, key = serve_args(index)
        t0 = time()
        run_round(scene, args, key)
        t_round = time() - t0
        t_full = None
        if getattr(model_s, "params", None) is not None:
            t0 = time()
            run_full(scene, args, key)
            t_full = time() - t0
        env.rng = problem_rng(1234, index)
        env.init_new_problem(index)
        t0 = time()
        explore(env, model, model_s, smooth=True, batch=batch, t_max=t_max, k=k)
        t_scalar = time() - t0
        rows.append({"index": index, "round_s": round(t_round, 4),
                     "full_s": round(t_full, 4) if t_full else None,
                     "scalar_s": round(t_scalar, 4)})

    def p50(key_):
        vals = [r[key_] for r in rows if r[key_] is not None]
        return round(float(np.percentile(vals, 50)), 4) if vals else None

    out = {
        "env": name, "n": n, "t_max": t_max,
        "dispatch_p50_ms": round(float(np.percentile(disp, 50)) * 1e3, 2),
        "serve_round_p50_s": p50("round_s"),
        "serve_full_p50_s": p50("full_s"),
        "smooth_tail_p50_s": (
            round(p50("full_s") - p50("round_s"), 4)
            if p50("full_s") is not None else None
        ),
        "scalar_p50_s": p50("scalar_s"),
        "rows": rows,
    }
    path = REPO / "assets" / "benchmarks" / f"profile_serve_{name}.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}, indent=1))
    print("wrote", path)
    return out


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "kuka14"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    profile_serve(name, n)
