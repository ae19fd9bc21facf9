"""Benchmark: batched collision-check throughput on TPU.

Headline metric (BASELINE.md north star): collision checks per second
through the batched device oracle, versus the reference's per-call Python
oracle on the host CPU (the maze env is the reference's only
PyBullet-free oracle and is run live when the checkout is present;
otherwise a recorded measurement of the same code on this machine is used).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

# Recorded idle-host throughput of the reference MazeEnv._edge_fp loop on
# this machine (checks/sec). Acts as a FLOOR for the live denominator: the
# round-4 bench measured the reference at 11.1k checks/s under loadavg 1.31
# (settle guard expired) and published an 8179x ratio that idle reruns put
# at ~2900x. Idle-host live rates across rounds: ~26.7k (BENCH_r02),
# ~30.9k (BENCH_r03) — the floor is set just under those so a loaded
# measurement can never deflate the denominator, while a genuine idle
# measurement (which always reads above it) is used as-is.
_RECORDED_REF_CHECKS_PER_SEC = 26000.0

_N_EDGES = 32768
_REPS = 30
_PASSES = 5


def _sample_edges(env, rng, n):
    """Edges between collision-free samples — the planner's real workload
    (lazy edge checks between RGG nodes, reference eval_gnn.py:215)."""

    from gnn_motion_planning_tpu.config import HostRNG

    env.rng = HostRNG(0)
    pts = np.array(env.sample_n_points(1024))
    ia = rng.randint(0, len(pts), n)
    ib = rng.randint(0, len(pts), n)
    return pts[ia], pts[ib]


def measure_tpu(env, a, b):
    import jax
    import jax.numpy as jnp

    from gnn_motion_planning_tpu.envs.maze import edge_free_2d, make_occ_scene

    scene = make_occ_scene(env.map)  # gather-free occupancy lookup

    @jax.jit
    def batch_check(a, b):
        free, cnt = jax.vmap(lambda x, y: edge_free_2d(scene, x, y))(a, b)
        return free, jnp.sum(cnt)

    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    free, total = batch_check(a, b)  # compile + warm
    checks_per_rep = int(jax.block_until_ready(total))

    # steady-state pipelined throughput: queue all reps, block once.
    # Run several passes and take the median — single-pass numbers drift
    # +-4% run-to-run on the tunnel-attached chip (round-3 verdict item).
    rates = []
    for _ in range(_PASSES):
        t0 = time.perf_counter()
        for _ in range(_REPS):
            free, total = batch_check(a, b)
        jax.block_until_ready(total)
        dt = time.perf_counter() - t0
        rates.append(checks_per_rep * _REPS / dt)
    return float(np.median(rates))


def measure_reference(a, b, budget_s=3.0, passes=3):
    """Reference MazeEnv._edge_fp one call at a time (the baseline design).

    Median of several timed windows: the single-window rate drifts with
    host CPU scheduling (~10-20% round-to-round in BENCH_r0*.json ratios)."""

    ref_root = Path("/root/reference")
    if not ref_root.exists():
        return None
    import importlib.util
    import types

    pkg = types.ModuleType("_refenv")
    pkg.__path__ = [str(ref_root / "environment")]
    sys.modules["_refenv"] = pkg
    for mod in ("env_config", "maze_env"):
        spec = importlib.util.spec_from_file_location(
            f"_refenv.{mod}", ref_root / "environment" / f"{mod}.py"
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"_refenv.{mod}"] = m
        spec.loader.exec_module(m)
    ref_env = sys.modules["_refenv.maze_env"].MazeEnv(
        dim=2, map_file=str(ref_root / "maze_files" / "mazes_15_2_3000.npz")
    )
    ref_env.init_new_problem(2000)

    rates = []
    i = 0
    for _ in range(passes):
        c0 = ref_env.collision_check_count
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < budget_s and i < len(a):
            ref_env._edge_fp(a[i].astype(np.float32), b[i].astype(np.float32))
            i += 1
        dt = time.perf_counter() - t0
        checks = ref_env.collision_check_count - c0
        if checks:
            rates.append(checks / dt)
    return float(np.median(rates)) if rates else None


def _settle_host(threshold: float = 0.6, budget_s: float = 240.0) -> bool:
    """Wait (bounded) for host load to drop before timing.

    Both sides of the ratio are host-sensitive on a 1-core machine: the TPU
    rate is dispatch-bound over the tunnel and the reference rate is pure
    host CPU. A concurrent build/test process depresses either by 10-20%
    (observed round 3 -> 4 drift; round 4 published an 8179x ratio that was
    really ~2900x). Returns True iff the load settled; callers must NOT use
    a live denominator measured after a False return (main() falls back to
    the recorded idle-host rate instead).
    """

    import os

    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s:
        load = os.getloadavg()[0]
        if load < threshold:
            return True
        time.sleep(5.0)
    print(
        f"warning: host load {os.getloadavg()[0]:.2f} after {budget_s:.0f}s "
        "wait; using recorded baseline denominator",
        file=sys.stderr,
    )
    return False


def main():
    from gnn_motion_planning_tpu.envs.maze import MazeEnv

    settled = _settle_host()
    env = MazeEnv(dim=2)
    env.init_new_problem(2000)
    rng = np.random.RandomState(0)
    a, b = _sample_edges(env, rng, _N_EDGES)

    tpu_cps = measure_tpu(env, a, b)
    # Denominator discipline (round-4 verdict): a loaded host deflates the
    # live reference rate and inflates the ratio. If the load never
    # settled, skip the live measurement entirely; if it did, still clamp
    # to the recorded idle-host floor so an undetected load spike between
    # the settle check and the measurement cannot fake a >2x ratio jump.
    live_ref = measure_reference(a, b) if settled else None
    ref_cps = max(live_ref or 0.0, _RECORDED_REF_CHECKS_PER_SEC)

    print(
        json.dumps(
            {
                "metric": "collision_checks_per_sec",
                "value": round(tpu_cps, 1),
                "unit": "checks/s",
                "vs_baseline": round(tpu_cps / ref_cps, 2),
                "baseline_checks_per_sec": round(ref_cps, 1),
                "baseline_source": (
                    "live" if live_ref and live_ref > _RECORDED_REF_CHECKS_PER_SEC
                    else "recorded_floor"
                ),
                "host_settled": settled,
            }
        )
    )


if __name__ == "__main__":
    main()
