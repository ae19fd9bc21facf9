"""Strict (hull-surface) re-certification of planner-returned paths.

The two-sided audit (tools/strict_verifier.py) bounds the capsule oracle's
error on *uniform* configurations; this tool answers the question that
actually backs the benchmark tables: are the paths the planner RETURNS
hull-exactly collision-free? For each sampled eval problem it runs the
production GNN pipeline (reference protocol, eval_gnn.py:96-145 semantics)
and validates every state of the smoothed path at RRT_EPS resolution with
the strict checker (envs/strict.py::validate_path_strict).

Writes assets/calibration/strict_paths_<env>.json. Usage:
    python tools/strict_paths.py [kuka7|kuka13|kuka14|ur5|all] [n_problems]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def audit_paths(name: str, n_problems: int = 100, spacing: float = 0.01):
    from gnn_motion_planning_tpu.api.eval_gnn import explore
    from gnn_motion_planning_tpu.api.registry import (
        scalar_overrides,
        str2env,
        str2name,
    )
    from gnn_motion_planning_tpu.config import problem_rng
    from gnn_motion_planning_tpu.envs.strict import (
        build_surface_points,
        make_strict_hit,
        make_strict_hit_dual,
    )

    env, indexes = str2env(name)
    _, model, _, model_s, _ = str2name(name)
    urdf = {
        "kuka7": "assets/kuka_iiwa/model_0.urdf",
        "kuka13": "assets/kuka_iiwa/model_3.urdf",
        "kuka14": "assets/kuka_iiwa/model_0.urdf",
        "ur5": "assets/ur5/ur5.urdf",
    }[name]
    surface = build_surface_points(env.model, str(REPO / urdf), spacing=spacing)

    if name == "kuka14":
        strict = make_strict_hit_dual(
            env.chain, surface, env.base1, env.base2
        )
    else:
        plane_point_mask = None
        if name == "ur5":
            geom = env.geom
            cap_link = np.asarray(env.chain.cap_link)
            plane_frames = set(cap_link[np.asarray(geom.plane_mask)].tolist())
            plane_point_mask = np.isin(
                np.asarray(surface.frame), sorted(plane_frames)
            )
        strict = make_strict_hit(
            env.chain,
            surface,
            base_trans=getattr(env, "base_trans", None),
            plane_point_mask=plane_point_mask,
        )

    over = scalar_overrides(name)
    from gnn_motion_planning_tpu.envs.strict import validate_path_strict

    t0 = time()
    n_success = 0
    paths_clean = 0
    hit_states_total = 0
    bad = []
    idx = list(indexes[:n_problems])
    for i in idx:
        env.rng = problem_rng(1234, int(i))
        env.init_new_problem(int(i))
        r = explore(env, model, model_s, smooth=True, **over)
        if not r["success"]:
            continue
        n_success += 1
        hits = validate_path_strict(env, r["smooth_path"], strict)
        if hits == 0:
            paths_clean += 1
        else:
            hit_states_total += hits
            bad.append({"index": int(i), "hit_states": int(hits)})

    report = {
        "env": name,
        "n_problems": len(idx),
        "n_success": n_success,
        "paths_strict_clean": paths_clean,
        "paths_with_hits": len(bad),
        "hit_states_total": int(hit_states_total),
        "surface_spacing_m": spacing,
        "protocol": "eval_gnn reference protocol (seed 1234, per-problem streams)"
        + (f", overrides {over}" if over else ""),
        "bad": bad[:20],
        "wall_s": round(time() - t0, 1),
        "semantics": (
            "every smoothed-path state, interpolated at RRT_EPS, checked by "
            "the sound hull-surface verifier; paths_strict_clean == n_success "
            "means no benchmark path relies on a capsule false-'free' verdict"
        ),
    }
    out = REPO / "assets" / "calibration" / f"strict_paths_{name}.json"
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report)[:800])
    return report


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ur5"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    names = ["kuka7", "kuka13", "kuka14", "ur5"] if which == "all" else [which]
    for nm in names:
        audit_paths(nm, n)
