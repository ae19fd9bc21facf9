"""UR5 6-DoF tabletop environment — self-collision + ground plane.

Equivalent of the reference UR5Env (reference: environment/ur5_env.py:8-427):
UR5 with PyBullet self-collision enabled (ur5_env.py:107), a ground plane
(collision with the shoulder link filtered, ur5_env.py:111), box obstacles
from the shipped ur5s_6_3000.pkl, RRT_EPS = 0.1, and the same fixed-step
edge rule.

Device oracle adds two check families to the KUKA box checks:
  * self-collision: capsule-capsule distances over non-adjacent link pairs
    (PyBullet excludes directly-connected links from self-collision);
  * ground plane: capsule lowest point below z = 0 for links that can
    physically reach the plane.
Each family has its own per-capsule calibrated radius offsets (see
tools/calibrate_capsules.py) fitted on the shipped known-free configs.
"""

from __future__ import annotations

import pickle
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gnn_motion_planning_tpu.envs.base import (
    EnvKernels,
    K_CHEAP,
    make_fixed_step_edge_free,
)
from gnn_motion_planning_tpu.envs.geometry import seg_box_sq_dist, seg_seg_sq_dist
from gnn_motion_planning_tpu.envs.kinematics import (
    capsules_world,
    chain_from_model,
    fk_link_frames,
)
from gnn_motion_planning_tpu.envs.kuka import BoxScene, KukaEnv, make_box_scene
from gnn_motion_planning_tpu.envs.urdf import parse_urdf
from gnn_motion_planning_tpu.utils.assets import asset_path

_BIG = np.int32(1 << 30)


class UR5Geom(NamedTuple):
    """Static UR5 collision metadata beyond the kinematic chain."""

    pair_mask: jnp.ndarray  # (C, C) bool — self-collision pairs to test
    plane_mask: jnp.ndarray  # (C,) bool — capsules tested against z=0
    r_box: jnp.ndarray  # (C,) effective radii per family
    r_self: jnp.ndarray
    r_plane: jnp.ndarray


def _link_graph_distance(model):
    """Hop counts between links in the kinematic tree."""

    names = model.link_order
    idx = {n: i for i, n in enumerate(names)}
    n = len(names)
    dist = np.full((n, n), 99, int)
    np.fill_diagonal(dist, 0)
    for j in model.joints:
        a, b = idx[j.parent], idx[j.child]
        dist[a, b] = dist[b, a] = 1
    for _ in range(n):
        for k in range(n):
            dist = np.minimum(dist, dist[:, k : k + 1] + dist[k : k + 1, :])
    return dist


def build_ur5_geom(model, chain, calibration: Optional[dict] = None) -> UR5Geom:
    cap_link = np.asarray(chain.cap_link)
    n_caps = cap_link.shape[0]
    hops = _link_graph_distance(model)

    # self-collision: PyBullet excludes directly connected links; conservative
    # capsule fits of neighbours overlap spuriously, so test pairs >= 3 hops
    # apart (wrist vs base/shoulder etc.), calibrated on shipped-free data.
    pair_mask = np.zeros((n_caps, n_caps), bool)
    for i in range(n_caps):
        for j in range(n_caps):
            if hops[cap_link[i], cap_link[j]] >= 3:
                pair_mask[i, j] = True

    # ground plane: skip pedestal links that rest on/below the table by
    # construction (reference filters the shoulder-plane pair explicitly)
    names = model.link_order
    grounded = {
        "world",
        "rotated_base_link",
        "base_link",
        "base",
        "shoulder_link",
    }
    plane_mask = np.array(
        [names[cap_link[i]] not in grounded for i in range(n_caps)], bool
    )

    r = np.asarray(chain.cap_r)
    r_box, r_self, r_plane = r.copy(), r.copy(), r.copy()
    if calibration:
        for key, arr in (
            ("box_offsets", r_box),
            ("self_offsets", r_self),
            ("plane_offsets", r_plane),
        ):
            off = np.asarray(calibration.get(key, np.zeros(n_caps)), np.float32)
            if off.shape[0] == n_caps:
                arr -= off
        r_box = np.maximum(r_box, 1e-3)
        r_self = np.maximum(r_self, 1e-3)
        r_plane = np.maximum(r_plane, 1e-3)

    return UR5Geom(
        pair_mask=jnp.asarray(pair_mask),
        plane_mask=jnp.asarray(plane_mask),
        r_box=jnp.asarray(r_box, jnp.float32),
        r_self=jnp.asarray(r_self, jnp.float32),
        r_plane=jnp.asarray(r_plane, jnp.float32),
    )


def ur5_state_free(chain, geom: UR5Geom, scene: BoxScene, q: jnp.ndarray):
    valid = jnp.all((q >= chain.lower) & (q <= chain.upper))
    p0, p1, _ = capsules_world(chain, q)

    d2 = seg_box_sq_dist(
        p0[:, None, :], p1[:, None, :], scene.centers[None], scene.halfs[None]
    )
    box_contact = jnp.any((d2 < geom.r_box[:, None] ** 2) & scene.mask[None, :])

    pair_d2 = seg_seg_sq_dist(
        p0[:, None, :], p1[:, None, :], p0[None, :, :], p1[None, :, :]
    )
    pair_r = geom.r_self[:, None] + geom.r_self[None, :]
    self_contact = jnp.any((pair_d2 < pair_r**2) & geom.pair_mask)

    zmin = jnp.minimum(p0[:, 2], p1[:, 2])
    plane_contact = jnp.any((zmin < geom.r_plane) & geom.plane_mask)

    free = valid & ~box_contact & ~self_contact & ~plane_contact
    return free, valid.astype(jnp.int32)


def make_ur5_kernels(chain, geom: UR5Geom, rrt_eps: float, k_max: int) -> EnvKernels:
    def state_free(scene, q):
        return ur5_state_free(chain, geom, scene, q)

    def distance(a, b):
        b = jnp.clip(b, chain.lower, chain.upper)
        return jnp.sqrt(jnp.sum((b - a) ** 2, axis=-1))

    def interpolate(a, b, ratio):
        return jnp.clip(a + (b - a) * ratio, chain.lower, chain.upper)

    edge_free = make_fixed_step_edge_free(
        state_free, distance, chain.lower, chain.upper, rrt_eps, k_max
    )
    edge_free_cheap = None
    if k_max > K_CHEAP + 16:
        edge_free_cheap = make_fixed_step_edge_free(
            state_free, distance, chain.lower, chain.upper, rrt_eps,
            K_CHEAP, with_overflow=True,
        )

    return EnvKernels(
        state_free=state_free,
        edge_free=edge_free,
        distance=distance,
        interpolate=interpolate,
        edge_free_cheap=edge_free_cheap,
        bounds=(chain.lower, chain.upper),
    )


class UR5Env(KukaEnv):
    """Host wrapper with the reference UR5Env protocol."""

    RRT_EPS = 0.1
    voxel_r = 0.1

    _kernel_cache: dict = {}

    def __init__(self, GUI: bool = False, map_file: str = "maze_files/ur5s_6_3000.pkl"):
        self.dim = 3
        self.collision_check_count = 0
        self.collision_point = None
        self.maps = {}
        self.rng = None

        # 6 capsules per link: the UR5 collision meshes are chunky enough
        # that a 3-capsule fit overshoots by up to 5.4 cm, and the
        # per-capsule calibration shrink then under-covers the hull (strict
        # audit round 3: ~20% proven false-"free" on random configs); the
        # finer fit halves the overshoot and localizes the shrink
        model = parse_urdf(asset_path("ur5/ur5.urdf"), n_caps=6)
        self.model = model
        self.chain = chain_from_model(model)
        self.config_dim = model.config_dim
        self.pose_range = [(float(lo), float(hi)) for lo, hi in model.pose_range()]
        self.bound = np.array(self.pose_range).T.reshape(-1)
        self.tip_index = model.link_order.index("ee_link")

        calibration = None
        try:
            import json
            from pathlib import Path

            calibration = json.loads(
                Path(asset_path("calibration/ur5.json")).read_text()
            )
        except FileNotFoundError:
            pass
        self.geom = build_ur5_geom(model, self.chain, calibration)

        if map_file is None:
            self.problems = []
        else:
            with open(asset_path(map_file), "rb") as f:
                self.problems = pickle.load(f)
        self.order = list(range(len(self.problems)))
        self.episode_i = 0
        self._batch_state_free = None

    def __str__(self):
        return "ur5"

    def init_new_problem_with_config(self, start, goal, obstacles):
        """reference ur5_env.py:84-102."""

        self.set_problem_data(obstacles, start, goal)
        return self.get_problem()

    def kernels(self) -> EnvKernels:
        cache = UR5Env._kernel_cache
        key = id(self.chain)
        if key not in cache:
            cache[key] = make_ur5_kernels(
                self.chain, self.geom, self.RRT_EPS, self._k_max()
            )
        return cache[key]

    def get_robot_points(self, config, end_point: bool = True):
        from gnn_motion_planning_tpu.envs.kinematics import link_translations

        pts = link_translations(self.chain, config) - np.array([0.0, 0.0, 0.4])
        if end_point:
            return tuple(pts[self.tip_index])
        return [tuple(p) for p in pts[1 : self.tip_index + 1]]
