"""Calibrate capsule radii against shipped known-free configurations.

The reference problem datasets were generated with PyBullet rejection
sampling, so every start/goal/demo-path configuration is ground-truth
collision-free (reference: kuka_env.py:85,99-101 loads
(obstacles, start, goal, path)). A conservative capsule fit flags a small
fraction of them as colliding; this tool computes, per capsule, the maximum
penetration depth over the dataset and writes radius offsets (plus slack)
to assets/calibration/<urdf-stem>.json, which the envs apply at load time.

Usage: python tools/calibrate_capsules.py [kuka7|kuka13|ur5|kuka14|all]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SLACK = 2e-3  # extra shrink beyond observed max penetration


def calibrate_chain_env(env, n_problems: int = 3000, use_paths: bool = True):
    from gnn_motion_planning_tpu.envs.geometry import seg_box_sq_dist
    from gnn_motion_planning_tpu.envs.kinematics import capsules_world, chain_from_model

    # calibrate the raw (uncalibrated) decomposition
    chain = chain_from_model(env.model)

    @jax.jit
    def penetration(scene, qs):
        def one(q):
            p0, p1, r = capsules_world(chain, q)
            d2 = seg_box_sq_dist(
                p0[:, None, :], p1[:, None, :], scene.centers[None], scene.halfs[None]
            )
            pen = r[:, None] - jnp.sqrt(d2)  # >0 means capsule overlaps box
            pen = jnp.where(scene.mask[None, :], pen, -jnp.inf)
            return jnp.max(pen, axis=-1)  # (C,)

        return jax.vmap(one)(qs)  # (n, C)

    n_caps = int(np.asarray(chain.cap_r).shape[0])
    worst = np.full(n_caps, -np.inf)
    total = 0
    for i in range(min(n_problems, len(env.problems))):
        env.init_new_problem(i)
        configs = [env.init_state, env.goal_state]
        if use_paths and env.path is not None and len(env.path):
            configs.extend(np.asarray(p) for p in env.path)
        qs = jnp.asarray(np.stack(configs), jnp.float32)
        pen = np.asarray(penetration(env._scene, qs))
        worst = np.maximum(worst, pen.max(axis=0))
        total += len(configs)
    offsets = np.maximum(worst + SLACK, 0.0)
    offsets[~np.isfinite(offsets)] = 0.0
    return offsets, total


def main():
    targets = sys.argv[1:] or ["all"]
    jobs = []
    if "kuka7" in targets or "all" in targets:
        jobs.append(("kuka7", "kuka_iiwa/model_0.urdf"))
    if "kuka13" in targets or "all" in targets:
        jobs.append(("kuka13", "kuka_iiwa/model_3.urdf"))

    from gnn_motion_planning_tpu.api.registry import str2env

    out_dir = REPO / "assets" / "calibration"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, urdf in jobs:
        try:
            env, _ = str2env(name)
        except FileNotFoundError as e:
            print(f"skip {name}: {e}")
            continue
        offsets, total = calibrate_chain_env(env)
        stem = Path(urdf).stem
        payload = {
            "urdf": urdf,
            "n_configs": total,
            "slack": SLACK,
            "radius_offsets": [float(x) for x in offsets],
        }
        path = out_dir / f"{stem}.json"
        path.write_text(json.dumps(payload, indent=1))
        print(f"{name}: {total} configs, max offset {offsets.max():.4f} -> {path}")


if __name__ == "__main__":
    main()
