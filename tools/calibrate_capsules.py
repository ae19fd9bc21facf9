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
    BLOCK = 16
    for i in range(min(n_problems, len(env.problems))):
        env.init_new_problem(i)
        configs = [env.init_state, env.goal_state]
        if use_paths and env.path is not None and len(env.path):
            configs.extend(np.asarray(p) for p in env.path)
        configs = configs[:BLOCK]
        n_live = len(configs)
        qs = np.zeros((BLOCK, env.config_dim), np.float32)
        qs[:n_live] = np.stack(configs)
        qs[n_live:] = configs[0]
        pen = np.asarray(penetration(env._scene, jnp.asarray(qs)))
        worst = np.maximum(worst, pen[:n_live].max(axis=0))
        total += n_live
    offsets = np.maximum(worst + SLACK, 0.0)
    offsets[~np.isfinite(offsets)] = 0.0
    return offsets, total


def calibrate_ur5(env, n_problems: int = 3000):
    """Per-capsule offsets for the UR5's box / self / plane check families."""

    from gnn_motion_planning_tpu.envs.geometry import seg_box_sq_dist, seg_seg_sq_dist
    from gnn_motion_planning_tpu.envs.kinematics import capsules_world
    from gnn_motion_planning_tpu.envs.ur5 import build_ur5_geom

    chain = env.chain
    geom = build_ur5_geom(env.model, chain, calibration=None)
    raw_r = np.asarray(chain.cap_r)
    n_caps = raw_r.shape[0]

    @jax.jit
    def penetrations(scene, qs):
        def one(q):
            p0, p1, r = capsules_world(chain, q)
            d2 = seg_box_sq_dist(
                p0[:, None, :], p1[:, None, :], scene.centers[None], scene.halfs[None]
            )
            box_pen = jnp.max(
                jnp.where(scene.mask[None, :], r[:, None] - jnp.sqrt(d2), -jnp.inf),
                axis=-1,
            )
            pair_d = jnp.sqrt(
                seg_seg_sq_dist(
                    p0[:, None, :], p1[:, None, :], p0[None, :, :], p1[None, :, :]
                )
            )
            pair_pen = jnp.where(
                geom.pair_mask, (r[:, None] + r[None, :]) - pair_d, -jnp.inf
            )
            zmin = jnp.minimum(p0[:, 2], p1[:, 2])
            plane_pen = jnp.where(geom.plane_mask, r - zmin, -jnp.inf)
            return box_pen, pair_pen, plane_pen

        return jax.vmap(one)(qs)

    box_w = np.full(n_caps, -np.inf)
    pair_w = np.full((n_caps, n_caps), -np.inf)
    plane_w = np.full(n_caps, -np.inf)
    total = 0
    BLOCK = 16  # pad per-problem config count to one static shape
    for i in range(min(n_problems, len(env.problems))):
        env.init_new_problem(i)
        configs = [env.init_state, env.goal_state]
        if env.path is not None and len(env.path):
            configs.extend(np.asarray(p) for p in env.path)
        configs = configs[:BLOCK]
        n_live = len(configs)
        qs = np.zeros((BLOCK, env.config_dim), np.float32)
        qs[:n_live] = np.stack(configs)
        qs[n_live:] = configs[0]
        b, pr, pl = penetrations(env._scene, jnp.asarray(qs))
        box_w = np.maximum(box_w, np.asarray(b)[:n_live].max(0))
        pair_w = np.maximum(pair_w, np.asarray(pr)[:n_live].max(0))
        plane_w = np.maximum(plane_w, np.asarray(pl)[:n_live].max(0))
        total += n_live

    box_off = np.maximum(np.where(np.isfinite(box_w), box_w, 0.0) + SLACK, 0.0)
    plane_off = np.maximum(np.where(np.isfinite(plane_w), plane_w, 0.0) + SLACK, 0.0)

    # pair requirement off_i + off_j >= pen_ij: greedy worst-pair split
    self_off = np.zeros(n_caps)
    P = np.where(np.isfinite(pair_w), pair_w + SLACK, -np.inf)
    for _ in range(200):
        R = P - self_off[:, None] - self_off[None, :]
        k = np.unravel_index(np.argmax(R), R.shape)
        if R[k] <= 0:
            break
        self_off[k[0]] += R[k] / 2
        self_off[k[1]] += R[k] / 2

    return {
        "box_offsets": [float(x) for x in box_off],
        "self_offsets": [float(x) for x in self_off],
        "plane_offsets": [float(x) for x in plane_off],
        "n_configs": total,
        "slack": SLACK,
    }


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

    if "ur5" in targets or "all" in targets:
        env, _ = str2env("ur5")
        payload = calibrate_ur5(env)
        path = out_dir / "ur5.json"
        path.write_text(json.dumps(payload, indent=1))
        print(
            f"ur5: {payload['n_configs']} configs, offsets box<={max(payload['box_offsets']):.3f} "
            f"self<={max(payload['self_offsets']):.3f} plane<={max(payload['plane_offsets']):.3f} -> {path}"
        )

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
