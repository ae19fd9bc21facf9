"""Two-sided capsule-oracle audit against the strict hull-surface checker.

For each arm env, samples uniform configurations across the eval-split
problem scenes and cross-tabulates the production capsule oracle against
the strict verifier (envs/strict.py):

- ``false_free``:   capsule says free, strict PROVES a hull-box contact
                    (lower bound on the true false-"free" rate);
- ``false_collide``: capsule says collide, strict finds no contact
                    (upper bound on the true false-"collide" rate).

kuka14 additionally audits the cross-arm capsule check against hull
half-space containment on a smaller sample (hull-vs-hull point test).

Writes assets/calibration/strict_<env>.json. Usage:
    python tools/strict_verifier.py [kuka7|kuka13|kuka14|ur5|all] [n_configs]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _make_env(name: str):
    from gnn_motion_planning_tpu.envs import Kuka2Env, KukaEnv, UR5Env

    if name == "kuka7":
        return KukaEnv(), "assets/kuka_iiwa/model_0.urdf"
    if name == "kuka13":
        return (
            KukaEnv(
                kuka_file="kuka_iiwa/model_3.urdf",
                map_file="maze_files/kukas_13_3000.pkl",
            ),
            "assets/kuka_iiwa/model_3.urdf",
        )
    if name == "kuka14":
        return Kuka2Env(), "assets/kuka_iiwa/model_0.urdf"
    if name == "ur5":
        return UR5Env(), "assets/ur5/ur5.urdf"
    raise KeyError(name)


def audit(name: str, n_configs: int = 100_000, spacing: float = 0.01,
          margin: float = 0.0, seed: int = 0, chunk: int = 256):
    from gnn_motion_planning_tpu.envs.strict import (
        build_surface_points,
        make_strict_hit,
        make_strict_hit_dual,
    )

    env, urdf_path = _make_env(name)
    surface = build_surface_points(env.model, urdf_path, spacing=spacing)
    kern = env.kernels()

    if name == "kuka14":
        strict = make_strict_hit_dual(
            env.chain, surface, env.base1, env.base2, margin=margin
        )
    else:
        plane_point_mask = None
        if name == "ur5":
            # mark surface points on plane-tested links (mesh-exact z<0)
            geom = env.geom
            cap_link = np.asarray(env.chain.cap_link)
            plane_frames = set(
                cap_link[np.asarray(geom.plane_mask)].tolist()
            )
            plane_point_mask = np.isin(
                np.asarray(surface.frame), sorted(plane_frames)
            )
        base = getattr(env, "base_trans", None)
        strict = make_strict_hit(env.chain, surface, base_trans=base,
                                 margin=margin,
                                 plane_point_mask=plane_point_mask)

    @jax.jit
    def judge(scene, qs):
        cap_free = jax.vmap(lambda q: kern.state_free(scene, q)[0])(qs)
        s_hit = jax.vmap(lambda q: strict(scene, q))(qs)
        return cap_free, s_hit

    pr = np.array(env.pose_range, np.float64)
    rng = np.random.RandomState(seed)
    # audit on the eval-split scenes — these back the benchmark claims
    prob_indexes = list(range(2000, min(3000, len(env.problems))))

    counts = np.zeros(4, np.int64)  # [free&~hit, free&hit, coll&~hit, coll&hit]
    done = 0
    t0 = time()
    pi = 0
    while done < n_configs:
        env.init_new_problem(prob_indexes[pi % len(prob_indexes)])
        pi += 1
        qs = rng.uniform(pr[:, 0], pr[:, 1], (chunk, env.config_dim))
        cap_free, s_hit = judge(env.device_scene(), jnp.asarray(qs, jnp.float32))
        cap_free = np.asarray(cap_free)
        s_hit = np.asarray(s_hit)
        counts[0] += int(np.sum(cap_free & ~s_hit))
        counts[1] += int(np.sum(cap_free & s_hit))
        counts[2] += int(np.sum(~cap_free & ~s_hit))
        counts[3] += int(np.sum(~cap_free & s_hit))
        done += chunk

    n = int(counts.sum())
    n_free = int(counts[0] + counts[1])
    n_coll = int(counts[2] + counts[3])
    report = {
        "env": name,
        "n_configs": n,
        "surface_points": int(surface.pts.shape[0]),
        "spacing_m": spacing,
        "margin_m": margin,
        "capsule_free": n_free,
        "false_free_proven": int(counts[1]),
        "false_free_rate_lb": float(counts[1] / max(n_free, 1)),
        "capsule_collide": n_coll,
        "possible_false_collide": int(counts[2]),
        "false_collide_rate_ub": float(counts[2] / max(n_coll, 1)),
        "wall_s": round(time() - t0, 1),
        "semantics": (
            "strict_hit = any hull-surface sample point inside an obstacle "
            "AABB (sound, incomplete); false_free is a proven lower bound, "
            "false_collide an upper bound. Obstacle-side only: self/cross-"
            "collision terms are audited separately where applicable."
        ),
    }
    out = REPO / "assets" / "calibration" / f"strict_{name}.json"
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1), flush=True)
    return report


def main(argv):
    names = ["kuka7", "kuka13", "kuka14", "ur5"]
    if argv and argv[0] != "all":
        names = [argv[0]]
    n = int(argv[1]) if len(argv) > 1 else 100_000
    for name in names:
        audit(name, n_configs=n)


if __name__ == "__main__":
    main(sys.argv[1:])
