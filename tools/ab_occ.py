"""A/B the maze occupancy lookup variants on the bench workload.

Three bit-identical implementations of the per-point occupancy test
(envs/maze.py::_occ_at):

  cells  legacy padded-cell compare (`any(flat_id == cells)`, ~cap=256
         compares/point)
  rows   per-row int32 bitmasks (W-wide compare-select + bit test; the
         round-4 default, ~7x less compare work than `cells`)
  flat   whole-grid packed bitmap (ceil(W^2/32)-wide compare-select + bit
         test; round 5 — half the select width of `rows` at W=15)

Runs the exact bench.py edge workload (32768 free-free maze2 edges, reps
queued, median of passes) once per variant, asserting decisions AND
counts bit-identical, and writes assets/benchmarks/ab_occ.json. The
fastest variant should be the `OCC_LOOKUP` default in envs/maze.py.

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


def measure(env, a, b, variant: str):
    import gnn_motion_planning_tpu.envs.maze as maze

    # edge_free_2d reads _occ_at at trace time via the module global, so a
    # patch swaps the lookup without touching the kernel
    if variant == "cells":
        with mock.patch.object(
            maze, "_occ_at", lambda o, xy: maze._occ_at_cells(o, xy)
        ):
            return bench.measure_tpu(env, a, b)
    with mock.patch.object(maze, "OCC_LOOKUP", "flat" if variant == "flat" else "row"):
        return bench.measure_tpu(env, a, b)


def main():
    import jax
    import jax.numpy as jnp

    import gnn_motion_planning_tpu.envs.maze as maze
    from gnn_motion_planning_tpu.envs.maze import (
        MazeEnv,
        edge_free_2d,
        make_occ_scene,
    )

    env = MazeEnv(dim=2)
    env.init_new_problem(2000)
    rng = np.random.RandomState(0)
    a, b = bench._sample_edges(env, rng, bench._N_EDGES)
    scene = make_occ_scene(env.map)

    # bit-equality of decisions and counts on the full workload
    av, bv = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
    outs = {}
    for variant, occ_at in (
        ("cells", lambda o, xy: maze._occ_at_cells(o, xy)),
        ("rows", lambda o, xy: maze._occ_at_rows(o, xy)),
        ("flat", lambda o, xy: maze._occ_at_flat(o, xy)),
    ):
        with mock.patch.object(maze, "_occ_at", occ_at):
            outs[variant] = jax.jit(
                jax.vmap(lambda x, y: edge_free_2d(scene, x, y))
            )(av, bv)
    for variant in ("rows", "flat"):
        assert bool(jnp.all(outs[variant][0] == outs["cells"][0])), variant
        assert bool(jnp.all(outs[variant][1] == outs["cells"][1])), variant
    print("decisions + counts bit-identical across all variants", flush=True)

    bench._settle_host(budget_s=60.0)
    rates = {v: measure(env, a, b, v) for v in ("cells", "rows", "flat")}
    best = max(rates, key=rates.get)
    out = {
        "workload": "bench.py maze2 edge batch (32768 edges)",
        "checks_per_s": {v: round(r, 1) for v, r in rates.items()},
        "flat_vs_rows": round(rates["flat"] / rates["rows"], 3),
        "best": best,
        "default_in_tree": maze.OCC_LOOKUP,
        "bit_identical": True,
    }
    path = REPO / "assets" / "benchmarks" / "ab_occ.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
