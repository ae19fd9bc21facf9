"""Dual-KUKA 14-DoF environment — two arms, cross-arm collision.

Equivalent of the reference Kuka2Env (reference:
environment/kuka_2arm_env.py:8-403): two iiwa arms fixed at x = -0.5 and
x = +0.5, configuration split 7+7, collision = either arm vs the obstacle
boxes or arm vs arm (PyBullet reports contacts of both bodies,
kuka_2arm_env.py:357-369). The reference robot file is pybullet_data's
``kuka_iiwa/model.urdf``; this build uses the repo's identical-limit
``kuka_iiwa/model_0.urdf`` iiwa (the dual-arm problem dataset is missing
upstream and regenerated with this geometry — see tools/generate_problems.py).

The device oracle runs both arms' FK in one batched kernel: capsules of both
arms vs AABBs plus cross-arm capsule-capsule distances.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gnn_motion_planning_tpu.envs.base import (
    EnvKernels,
    K_CHEAP,
    make_fixed_step_edge_free,
)
from gnn_motion_planning_tpu.envs.geometry import seg_box_sq_dist, seg_seg_sq_dist
from gnn_motion_planning_tpu.envs.kinematics import capsules_world, chain_from_model
from gnn_motion_planning_tpu.envs.kuka import (
    BoxScene,
    KukaEnv,
    _apply_calibration,
)
from gnn_motion_planning_tpu.envs.urdf import parse_urdf
from gnn_motion_planning_tpu.utils.assets import asset_path

_BIG = np.int32(1 << 30)


def dual_state_free(chain, base1, base2, scene: BoxScene, q: jnp.ndarray):
    """(free, n_checks) for a 14-DoF dual-arm configuration."""

    lower = jnp.concatenate([chain.lower, chain.lower])
    upper = jnp.concatenate([chain.upper, chain.upper])
    valid = jnp.all((q >= lower) & (q <= upper))

    dof = chain.lower.shape[0]
    p0a, p1a, r = capsules_world(chain, q[:dof], base_trans=base1)
    p0b, p1b, _ = capsules_world(chain, q[dof:], base_trans=base2)

    p0 = jnp.concatenate([p0a, p0b], axis=0)
    p1 = jnp.concatenate([p1a, p1b], axis=0)
    rr = jnp.concatenate([r, r], axis=0)
    d2 = seg_box_sq_dist(
        p0[:, None, :], p1[:, None, :], scene.centers[None], scene.halfs[None]
    )
    box_contact = jnp.any((d2 < rr[:, None] ** 2) & scene.mask[None, :])

    cross = seg_seg_sq_dist(
        p0a[:, None, :], p1a[:, None, :], p0b[None, :, :], p1b[None, :, :]
    )  # (C, C)
    arm_contact = jnp.any(cross < (r[:, None] + r[None, :]) ** 2)

    free = valid & ~box_contact & ~arm_contact
    return free, valid.astype(jnp.int32)


def make_dual_kernels(chain, base1, base2, rrt_eps: float, k_max: int) -> EnvKernels:
    lower = jnp.concatenate([chain.lower, chain.lower])
    upper = jnp.concatenate([chain.upper, chain.upper])

    def state_free(scene, q):
        return dual_state_free(chain, base1, base2, scene, q)

    def distance(a, b):
        b = jnp.clip(b, lower, upper)
        return jnp.sqrt(jnp.sum((b - a) ** 2, axis=-1))

    def interpolate(a, b, ratio):
        return jnp.clip(a + (b - a) * ratio, lower, upper)

    edge_free = make_fixed_step_edge_free(
        state_free, distance, lower, upper, rrt_eps, k_max
    )
    edge_free_cheap = None
    if k_max > K_CHEAP + 16:
        edge_free_cheap = make_fixed_step_edge_free(
            state_free, distance, lower, upper, rrt_eps,
            K_CHEAP, with_overflow=True,
        )

    return EnvKernels(
        state_free=state_free,
        edge_free=edge_free,
        distance=distance,
        interpolate=interpolate,
        edge_free_cheap=edge_free_cheap,
        bounds=(lower, upper),
    )


class Kuka2Env(KukaEnv):
    """Host wrapper (kuka_2arm_env.py protocol). Inherits the chunked
    sampling / metric / driver surface from KukaEnv; overrides geometry."""

    RRT_EPS = 0.5
    voxel_r = 0.1
    kukaEndEffectorIndex = 6

    def __init__(
        self,
        GUI: bool = False,
        kuka_file: str = "kuka_iiwa/model_0.urdf",
        map_file: str = "maze_files/kukas_14_3000.pkl",
    ):
        import pickle

        self.dim = 3
        self.kuka_file = kuka_file
        self.collision_check_count = 0
        self.collision_point = None
        self.maps = {}
        self.rng = None

        model = parse_urdf(asset_path(kuka_file))
        self.model = model
        self.chain = _apply_calibration(chain_from_model(model), kuka_file)
        self.config_dim = model.config_dim * 2
        single = [(float(lo), float(hi)) for lo, hi in model.pose_range()]
        self.pose_range = single * 2
        self.bound = np.array(self.pose_range).T.reshape(-1)
        self.base1 = jnp.asarray([-0.5, 0.0, 0.0], jnp.float32)
        self.base2 = jnp.asarray([0.5, 0.0, 0.0], jnp.float32)

        if map_file is None:
            self.problems = []
        else:
            with open(asset_path(map_file), "rb") as f:
                self.problems = pickle.load(f)
        self.order = list(range(len(self.problems)))
        self.episode_i = 0
        self._batch_state_free = None

        self._native = None
        try:
            from gnn_motion_planning_tpu.utils.geomcore import GeomDual

            self._native = GeomDual(
                self.chain, np.asarray(self.base1, np.float64),
                np.asarray(self.base2, np.float64), self.RRT_EPS,
            )
        except Exception:
            self._native = None

    _kernel_cache: dict = {}

    def kernels(self) -> EnvKernels:
        cache = Kuka2Env._kernel_cache
        key = id(self.chain)
        if key not in cache:
            cache[key] = make_dual_kernels(
                self.chain, self.base1, self.base2, self.RRT_EPS, self._k_max()
            )
        return cache[key]

    def _render_segments(self, config):
        q = jnp.asarray(config, jnp.float32)
        dof = self.config_dim // 2
        p0a, p1a, _ = capsules_world(self.chain, q[:dof], base_trans=self.base1)
        p0b, p1b, _ = capsules_world(self.chain, q[dof:], base_trans=self.base2)
        return (
            np.concatenate([np.asarray(p0a), np.asarray(p0b)]),
            np.concatenate([np.asarray(p1a), np.asarray(p1b)]),
        )

    def get_robot_points(self, config, end_point: bool = True):
        from gnn_motion_planning_tpu.envs.kinematics import link_translations

        dof = self.config_dim // 2
        pts1 = link_translations(self.chain, config[:dof], base_trans=self.base1)[1:]
        pts2 = link_translations(self.chain, config[dof:], base_trans=self.base2)[1:]
        if end_point:
            # kuka_2arm_env.py:348-353: both end effectors, no z shift
            return list(pts1[self.kukaEndEffectorIndex]) + list(
                pts2[self.kukaEndEffectorIndex]
            )
        out = [tuple(p - np.array([0.0, 0.0, 0.4])) for p in pts1[:7]]
        out += [tuple(p - np.array([0.0, 0.0, 0.4])) for p in pts2[:7]]
        return out
