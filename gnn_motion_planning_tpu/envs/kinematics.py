"""Batched forward kinematics over serial chains (replaces PyBullet FK).

The reference computes FK one configuration at a time through PyBullet
(``resetJointState`` + ``getLinkState``, reference:
environment/kuka_env.py:168-180,274-279). Here the chain is a static set of
arrays (joint origins, axes, capsule attachments) produced by envs/urdf.py,
and FK is a pure jittable scan over joints — vmapped over thousands of
configurations per call.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gnn_motion_planning_tpu.envs.urdf import RobotModel, rpy_to_matrix

_FK_PRECISION = jax.lax.Precision.HIGHEST


class ChainParams(NamedTuple):
    """Static kinematic-tree arrays. J joints (topo order), L link frames
    (frame 0 = root link, frame j+1 = child of topo joint j), C capsules."""

    origin_rot: jnp.ndarray  # (J, 3, 3)
    origin_trans: jnp.ndarray  # (J, 3)
    axis: jnp.ndarray  # (J, 3) unit
    q_index: jnp.ndarray  # (J,) index into config vector, -1 if fixed
    parent_frame: jnp.ndarray  # (J,) frame index of the parent link
    cap_link: jnp.ndarray  # (C,) frame index
    cap_p0: jnp.ndarray  # (C, 3)
    cap_p1: jnp.ndarray  # (C, 3)
    cap_r: jnp.ndarray  # (C,)
    lower: jnp.ndarray  # (dof,)
    upper: jnp.ndarray  # (dof,)


def chain_from_model(model: RobotModel) -> ChainParams:
    J = len(model.joints)
    origin_rot = np.stack([rpy_to_matrix(j.origin_rpy) for j in model.joints])
    origin_trans = np.stack([j.origin_xyz for j in model.joints])
    axis = np.stack(
        [j.axis / max(np.linalg.norm(j.axis), 1e-12) for j in model.joints]
    )
    q_index = np.full(J, -1, np.int32)
    for qi, ji in enumerate(model.movable):
        q_index[ji] = qi

    frame_of = {name: i for i, name in enumerate(model.link_order)}
    parent_frame = np.array(
        [frame_of[j.parent] for j in model.joints], np.int32
    )
    cap_link = np.array([frame_of[c.link] for c in model.capsules], np.int32)
    cap_p0 = np.stack([c.p0 for c in model.capsules])
    cap_p1 = np.stack([c.p1 for c in model.capsules])
    cap_r = np.array([c.radius for c in model.capsules])
    pr = model.pose_range()
    return ChainParams(
        origin_rot=jnp.asarray(origin_rot, jnp.float32),
        origin_trans=jnp.asarray(origin_trans, jnp.float32),
        axis=jnp.asarray(axis, jnp.float32),
        q_index=jnp.asarray(q_index),
        parent_frame=jnp.asarray(parent_frame),
        cap_link=jnp.asarray(cap_link),
        cap_p0=jnp.asarray(cap_p0, jnp.float32),
        cap_p1=jnp.asarray(cap_p1, jnp.float32),
        cap_r=jnp.asarray(cap_r, jnp.float32),
        lower=jnp.asarray(pr[:, 0], jnp.float32),
        upper=jnp.asarray(pr[:, 1], jnp.float32),
    )


def _axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation matrix about a unit axis."""

    x, y, z = axis[0], axis[1], axis[2]
    c, s = jnp.cos(angle), jnp.sin(angle)
    C = 1.0 - c
    return jnp.array(
        [
            [x * x * C + c, x * y * C - z * s, x * z * C + y * s],
            [y * x * C + z * s, y * y * C + c, y * z * C - x * s],
            [z * x * C - y * s, z * y * C + x * s, z * z * C + c],
        ]
    )


@jax.jit
def _link_translations_jit(chain: "ChainParams", q: jnp.ndarray, base_trans: jnp.ndarray):
    _, ts = fk_link_frames(chain, q, base_trans=base_trans)
    return ts


def link_translations(chain: "ChainParams", q, base_trans=None) -> np.ndarray:
    """World translations of every link frame, via a cached jitted FK.

    fk_link_frames called eagerly retraces its scan on every call (~100 ms);
    per-state callers (NEXT's get_robot_points augmentation) need this
    compiled path.
    """

    if base_trans is None:
        base_trans = jnp.zeros(3, jnp.float32)
    return np.asarray(
        _link_translations_jit(chain, jnp.asarray(q, jnp.float32), jnp.asarray(base_trans))
    )


def fk_link_frames(chain: ChainParams, q: jnp.ndarray, base_rot=None, base_trans=None):
    """World (R, t) for every link frame of the kinematic tree.

    Frames are indexed by link order (0 = root); topo joint j writes frame
    j+1, reading its parent's frame dynamically, so branching trees (fixed
    tool/base links, dual-arm rigs) work with one scan.
    """

    J = chain.origin_rot.shape[0]
    r0 = jnp.eye(3, dtype=jnp.float32) if base_rot is None else base_rot
    t0 = jnp.zeros(3, jnp.float32) if base_trans is None else base_trans

    Rs0 = jnp.zeros((J + 1, 3, 3), jnp.float32).at[0].set(r0)
    ts0 = jnp.zeros((J + 1, 3), jnp.float32).at[0].set(t0)

    def step(carry, j):
        Rs, ts = carry
        pf = chain.parent_frame[j]
        R = Rs[pf]
        t = ts[pf]
        qi = chain.q_index[j]
        angle = jnp.where(qi >= 0, q[jnp.maximum(qi, 0)], 0.0)
        Rq = _axis_angle(chain.axis[j], angle)
        # FK must stay true-f32: bf16 link frames shift capsule endpoints by
        # ~1e-3 m, enough to flip near-surface collision verdicts vs the
        # calibrated host oracle
        R_new = jnp.matmul(
            jnp.matmul(R, chain.origin_rot[j], precision=_FK_PRECISION),
            Rq,
            precision=_FK_PRECISION,
        )
        t_new = jnp.matmul(R, chain.origin_trans[j], precision=_FK_PRECISION) + t
        return (Rs.at[j + 1].set(R_new), ts.at[j + 1].set(t_new)), None

    (Rs, ts), _ = jax.lax.scan(step, (Rs0, ts0), jnp.arange(J))
    return Rs, ts


def capsules_world(chain: ChainParams, q: jnp.ndarray, base_rot=None, base_trans=None):
    """Capsule endpoints in world frame: (C,3), (C,3), radii (C,)."""

    Rs, ts = fk_link_frames(chain, q, base_rot, base_trans)
    R = Rs[chain.cap_link]  # (C, 3, 3)
    t = ts[chain.cap_link]  # (C, 3)
    p0 = jnp.einsum("cij,cj->ci", R, chain.cap_p0, precision=_FK_PRECISION) + t
    p1 = jnp.einsum("cij,cj->ci", R, chain.cap_p1, precision=_FK_PRECISION) + t
    return p0, p1, chain.cap_r


def end_effector(chain: ChainParams, q: jnp.ndarray, link_index: int = -1):
    Rs, ts = fk_link_frames(chain, q)
    return ts[link_index]
