"""Primitive distance kernels: capsule vs AABB, capsule vs capsule.

These replace PyBullet's narrow-phase (reference collision flow:
environment/kuka_env.py:354-370 — resetJointState + getContactPoints per
configuration). Obstacles in all reference problem sets are axis-aligned
boxes (halfExtents, basePosition pickles — SURVEY.md §2.2), and robot links
are approximated by conservative capsules (envs/urdf.py), so collision
reduces to segment-box and segment-segment distances, evaluated for every
(capsule, obstacle) pair of a whole batch of configurations in one fused
device kernel.
"""

from __future__ import annotations

import jax.numpy as jnp


def point_box_sq_dist(p: jnp.ndarray, center: jnp.ndarray, half: jnp.ndarray):
    """Squared distance from point(s) to an AABB surface (0 if inside)."""

    d = jnp.maximum(jnp.abs(p - center) - half, 0.0)
    return jnp.sum(d * d, axis=-1)


def seg_box_sq_dist(
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    center: jnp.ndarray,
    half: jnp.ndarray,
):
    """Exact min squared distance between segment [p0, p1] and an AABB.

    f(t) = dist²(p0 + t·v, box) = Σ_i max(|u_i + v_i t| - h_i, 0)² is convex
    piecewise-quadratic with breakpoints where each axis crosses ±h_i. The
    minimum is attained either at a breakpoint/endpoint or at the vertex of
    one interval's quadratic; both sets are evaluated in parallel (no
    iterative search — latency-critical inside planner loops). Broadcasts
    over leading batch dims.
    """

    u = p0 - center
    v = p1 - p0
    eps = 1e-12
    safe_v = jnp.where(jnp.abs(v) > eps, v, 1.0)
    t_a = jnp.where(jnp.abs(v) > eps, (half - u) / safe_v, 0.0)
    t_b = jnp.where(jnp.abs(v) > eps, (-half - u) / safe_v, 0.0)
    zeros = jnp.zeros_like(u[..., :1])
    cands = jnp.concatenate(
        [zeros, jnp.ones_like(zeros), jnp.clip(t_a, 0.0, 1.0), jnp.clip(t_b, 0.0, 1.0)],
        axis=-1,
    )  # (..., 8)

    def f(t):
        # t: (..., K); u/v/half: (..., 3)
        p = u[..., None, :] + t[..., :, None] * v[..., None, :]
        d = jnp.maximum(jnp.abs(p) - half[..., None, :], 0.0)
        return jnp.sum(d * d, axis=-1)

    # f is convex, so f' is monotone non-decreasing; bracket the minimiser
    # between the candidates with f' < 0 and f' > 0 (no sort — sorts are the
    # slow path on TPU and this runs ~1e5x per planner pop)
    w = u[..., None, :] + cands[..., :, None] * v[..., None, :]  # (..., 8, 3)
    excess = jnp.maximum(jnp.abs(w) - half[..., None, :], 0.0)
    g = jnp.sum(2.0 * jnp.sign(w) * excess * v[..., None, :], axis=-1)  # (..., 8)
    t_lo = jnp.max(jnp.where(g < 0, cands, 0.0), axis=-1)
    t_hi = jnp.min(jnp.where(g > 0, cands, 1.0), axis=-1)
    t_hi = jnp.maximum(t_hi, t_lo)

    # active set at the bracket midpoint -> closed-form quadratic vertex
    mid = 0.5 * (t_lo + t_hi)
    wm = u + mid[..., None] * v
    active = jnp.abs(wm) > half
    s = jnp.sign(wm)
    alpha = jnp.where(active, s * v, 0.0)
    beta = jnp.where(active, s * u - half, 0.0)
    denom = jnp.sum(alpha * alpha, axis=-1)
    t_star = -jnp.sum(alpha * beta, axis=-1) / jnp.maximum(denom, eps)
    t_star = jnp.clip(t_star, t_lo, t_hi)

    f_all = jnp.concatenate(
        [f(cands), f(jnp.stack([t_lo, t_hi, t_star], axis=-1))], axis=-1
    )
    return jnp.min(f_all, axis=-1)


def seg_seg_sq_dist(p0, p1, q0, q1, eps: float = 1e-12):
    """Min squared distance between two segments (closed form, Ericson
    'Real-Time Collision Detection' §5.1.9), broadcastable."""

    d1 = p1 - p0
    d2 = q1 - q0
    r = p0 - q0
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b

    s = jnp.where(denom > eps, jnp.clip((b * f - c * e) / jnp.where(denom > eps, denom, 1.0), 0.0, 1.0), 0.0)
    t = jnp.where(e > eps, (b * s + f) / jnp.where(e > eps, e, 1.0), 0.0)

    t_cl = jnp.clip(t, 0.0, 1.0)
    s2 = jnp.where(a > eps, jnp.clip((b * t_cl - c) / jnp.where(a > eps, a, 1.0), 0.0, 1.0), 0.0)
    recompute = (t != t_cl) | True  # always recompute s with clamped t
    s = jnp.where(recompute, s2, s)

    cp = p0 + s[..., None] * d1
    cq = q0 + t_cl[..., None] * d2
    diff = cp - cq
    return jnp.sum(diff * diff, axis=-1)
