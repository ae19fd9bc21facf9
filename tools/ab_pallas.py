"""A/B the maze occupancy-lookup implementations on the real chip.

Three candidates for the maze oracle's hot primitive (occupancy at grid
cell of point, envs/maze.py::_occ_at):
  gather   — occ[cx, cy] (serializes on the VPU scalar path)
  occscene — any(flat == cells) compare against the occupied-cell list
             (production default since round 2)
  pallas   — ops/pallas_maze.py one-hot MXU contraction

Times each at N points over R reps (pipelined, block once) and writes
assets/benchmarks/ab_pallas.json. VERDICT r2 item 9: ship whichever wins
as the default, delete dead kernels.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N = 1 << 19  # points per call
REPS = 30


def main():
    import jax
    import jax.numpy as jnp

    import gnn_motion_planning_tpu.ops.pallas_maze as pm
    from gnn_motion_planning_tpu.envs.maze import MazeEnv, _occ_at, make_occ_scene

    env = MazeEnv(dim=2)
    env.init_new_problem(0)
    occ = np.asarray(env.map)
    width = occ.shape[0]
    rng = np.random.RandomState(0)
    coords = rng.randint(0, width, (N, 2)).astype(np.int32)
    xy = (coords + 0.5) / width - 0.5  # cell-center points for _occ_at

    scene = make_occ_scene(occ)
    occ_dev = jnp.asarray(occ.astype(np.float32))
    occ_pad = pm.pad_occ(occ_dev)
    xy_dev = jnp.asarray(xy, jnp.float32)
    coords_dev = jnp.asarray(coords)

    gather_fn = jax.jit(lambda p: _occ_at(occ_dev, p))
    occscene_fn = jax.jit(lambda p: _occ_at(scene, p))
    pallas_fn = jax.jit(
        lambda c: pm.points_occupied(occ_pad, c, width=width)
    )

    results = {}
    golden = None
    for name, fn, arg in [
        ("gather", gather_fn, xy_dev),
        ("occscene", occscene_fn, xy_dev),
        ("pallas", pallas_fn, coords_dev),
    ]:
        try:
            out = jax.block_until_ready(fn(arg))  # compile + warm
        except Exception as e:  # pallas may be unsupported off-TPU
            results[name] = {"error": str(e)[:200]}
            continue
        if golden is None:
            golden = np.asarray(out)
        else:
            assert (np.asarray(out) == golden).all(), f"{name} output mismatch"
        t0 = time()
        outs = [fn(arg) for _ in range(REPS)]
        jax.block_until_ready(outs[-1])
        dt = time() - t0
        results[name] = {
            "lookups_per_s": round(N * REPS / dt, 0),
            "ms_per_call": round(dt / REPS * 1e3, 3),
        }
        print(name, results[name], flush=True)

    results["backend"] = jax.default_backend()
    results["n_points"] = N
    out_path = REPO / "assets" / "benchmarks" / "ab_pallas.json"
    out_path.write_text(json.dumps(results, indent=1))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
