"""A/B the maze occupancy lookup: legacy padded-cell compare vs bitmap.

Runs the exact bench.py edge workload (32768 free-free maze2 edges,
reps queued, median of passes) twice — once with the legacy
`any(flat_id == cells)` compare (envs/maze.py::_occ_at_cells) and once
with the row-bitmask path (the default `_occ_at`) — asserting decisions
AND counts bit-identical, and writes assets/benchmarks/ab_occ.json.

Needs the TPU: run only when no other axon process is live.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from unittest import mock

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

sys.path.insert(0, str(REPO))  # bench.py lives at the repo root
import bench  # noqa: E402


def measure(env, a, b, legacy: bool):
    import gnn_motion_planning_tpu.envs.maze as maze

    # edge_free_2d reads _occ_at at call time via the module global, so a
    # patch swaps the lookup without touching the kernel
    if legacy:
        def occ_at(occ, xy):
            return maze._occ_at_cells(occ, xy)

        with mock.patch.object(maze, "_occ_at", occ_at):
            return bench.measure_tpu(env, a, b)
    return bench.measure_tpu(env, a, b)


def main():
    import jax
    import jax.numpy as jnp

    from gnn_motion_planning_tpu.envs.maze import (
        MazeEnv,
        edge_free_2d,
        make_occ_scene,
        _occ_at_cells,
    )
    import gnn_motion_planning_tpu.envs.maze as maze

    env = MazeEnv(dim=2)
    env.init_new_problem(2000)
    rng = np.random.RandomState(0)
    a, b = bench._sample_edges(env, rng, bench._N_EDGES)
    scene = make_occ_scene(env.map)

    # bit-equality of decisions and counts on the full workload
    av, bv = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
    f_new, c_new = jax.jit(
        jax.vmap(lambda x, y: edge_free_2d(scene, x, y))
    )(av, bv)
    with mock.patch.object(maze, "_occ_at", lambda o, xy: _occ_at_cells(o, xy)):
        f_old, c_old = jax.jit(
            jax.vmap(lambda x, y: edge_free_2d(scene, x, y))
        )(av, bv)
    assert bool(jnp.all(f_new == f_old)), "decision mismatch"
    assert bool(jnp.all(c_new == c_old)), "count mismatch"
    print("decisions + counts bit-identical", flush=True)

    bench._settle_host(budget_s=60.0)
    r_old = measure(env, a, b, legacy=True)
    r_new = measure(env, a, b, legacy=False)
    out = {
        "workload": "bench.py maze2 edge batch (32768 edges)",
        "legacy_cells_checks_per_s": round(r_old, 1),
        "bitmap_checks_per_s": round(r_new, 1),
        "speedup": round(r_new / r_old, 3),
        "bit_identical": True,
    }
    path = REPO / "assets" / "benchmarks" / "ab_occ.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
