"""Latency breakdown for the kuka14 north-star row.

Separates the per-problem p50 into its real components so the <1.0 s
optimization is measurement-driven rather than guesswork:

  * tunnel roundtrip: a tiny dispatch+block (device-call fixed cost)
  * upload cost of the (N, N) edge_dead zeros the scalar path ships
  * scalar explore: sample / round (device) / smooth phases
  * serve: serve_round (device) / smooth phases

Usage:  python tools/profile_kuka14.py [n_problems=40]
Writes assets/benchmarks/profile_kuka14.json and prints a table.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from time import time

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def _p50(xs):
    return float(np.percentile(xs, 50)) if xs else float("nan")


def microbench_tunnel(n=30):
    """Fixed cost of one dispatch+block roundtrip, and a 1 MB upload."""

    f = jax.jit(lambda x: x + 1)
    x = jnp.float32(0.0)
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(n):
        t0 = time()
        jax.block_until_ready(f(x))
        ts.append(time() - t0)

    big = np.zeros((1004, 1004), bool)
    up = []
    for _ in range(10):
        t0 = time()
        jax.block_until_ready(jnp.asarray(big))
        up.append(time() - t0)

    dev = jnp.zeros((1004, 1004), bool)
    jax.block_until_ready(dev)
    down = []
    for _ in range(10):
        t0 = time()
        np.asarray(dev)
        down.append(time() - t0)
    return _p50(ts), _p50(up), _p50(down)


def main(n_problems=40):
    from gnn_motion_planning_tpu.api import str2env
    from gnn_motion_planning_tpu.api.registry import str2name
    from gnn_motion_planning_tpu.api.eval_gnn import explore, explore_serve
    from gnn_motion_planning_tpu.config import problem_rng, set_random_seed

    env, indexes = str2env("kuka14")
    _, model, _, model_s, _ = str2name("kuka14")
    seed = 1234
    set_random_seed(seed)

    rt, up1mb, down1mb = microbench_tunnel()
    print(f"tunnel roundtrip p50   : {rt * 1e3:8.2f} ms")
    print(f"1MB bool upload p50    : {up1mb * 1e3:8.2f} ms")
    print(f"1MB bool download p50  : {down1mb * 1e3:8.2f} ms")

    idxs = list(indexes)[:n_problems]

    # ---- scalar protocol path ----
    rows_sc = []
    for i, index in enumerate(idxs):
        env.rng = problem_rng(seed, int(index))
        env.init_new_problem(int(index))
        t0 = time()
        r = explore(env, model, model_s, smooth=True, t_max=500, batch=500)
        wall = time() - t0
        if i == 0:
            continue  # warmup/compile
        rows_sc.append(
            dict(
                total=wall,
                forward=r["forward"],  # fused_round device call(s)
                explore=r["total_explore"],  # sample+prep+forward
                smooth=r["total"] - r["total_explore"],
                success=bool(r["success"]),
            )
        )

    # ---- serve path ----
    root = jax.random.PRNGKey(seed)
    rows_sv = []
    for i, index in enumerate(idxs):
        env.rng = problem_rng(seed, int(index))
        env.init_new_problem(int(index))
        t0 = time()
        r = explore_serve(
            env, model, model_s, jax.random.fold_in(root, int(index)),
            smooth=True, batch=500,
        )
        wall = time() - t0
        if i == 0:
            continue
        rows_sv.append(
            dict(
                total=wall,
                forward=r["forward"],  # serve_round device call
                smooth=r["total"] - r["total_explore"],
                success=bool(r["success"]),
            )
        )

    def show(name, rows, keys):
        print(f"\n== {name} ({len(rows)} problems) ==")
        out = {}
        for k in keys:
            v = _p50([r[k] for r in rows])
            out[k] = v
            print(f"  {k:10s} p50 {v * 1e3:8.1f} ms")
        out["n"] = len(rows)
        out["success"] = sum(r["success"] for r in rows)
        return out

    res = {
        "tunnel_roundtrip_ms": rt * 1e3,
        "upload_1mb_ms": up1mb * 1e3,
        "download_1mb_ms": down1mb * 1e3,
        "scalar": show(
            "scalar explore", rows_sc, ["total", "explore", "forward", "smooth"]
        ),
        "serve": show("serve", rows_sv, ["total", "forward", "smooth"]),
    }
    sc = res["scalar"]
    print("\nderived (scalar):")
    print(f"  sample+prep p50 ~ {(sc['explore'] - sc['forward']) * 1e3:8.1f} ms")

    with open("assets/benchmarks/profile_kuka14.json", "w") as f:
        json.dump(res, f, indent=1)
    print("\nwrote assets/benchmarks/profile_kuka14.json")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    main(n)
