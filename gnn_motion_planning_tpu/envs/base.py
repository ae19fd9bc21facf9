"""Env kernel bundle: the device-side face of an environment.

Planners are generic over environments through this bundle of pure,
jittable functions closed over nothing (scene is an explicit pytree arg),
mirroring the reference's duck-typed oracle surface
(_state_fp/_edge_fp/distance/interpolate — reference:
environment/maze_env.py:137-347, environment/kuka_env.py:224-411) but
batched and with the collision-check count as an explicit return value
instead of a side effect.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Scene = Any  # env-specific pytree (occupancy grid, obstacle boxes, ...)

_BIG = np.int32(1 << 30)

# Static interpolation budget of the *cheap* edge kernel (see
# make_fixed_step_edge_free): real graph/smoothing segments need
# K = ceil(len/RRT_EPS) points, almost always far below the worst-case
# space diagonal the full kernel budgets for. 128 covers 12.8 rad of
# joint-space motion at eps=0.1; longer segments raise the overflow flag
# and the caller redoes the computation with the full kernel.
K_CHEAP = 128


class EnvKernels(NamedTuple):
    """Pure device kernels for one environment family.

    state_free(scene, q)        -> (free: bool, n_checks: int32)
    edge_free(scene, q0, q1)    -> (free: bool, n_checks: int32)
    distance(q0, q1)            -> float (the env's metric, incl. wrap/clamp)
    interpolate(q0, q1, ratio)  -> q (the env's steering rule)
    batch_state_free(scene, qs) -> (free: (B,) bool, n_checks: (B,) int32),
        optional: a whole-batch implementation (e.g. a Pallas kernel) that
        beats `vmap(state_free)`; callers fall back to the vmap when None.
    edge_free_cheap(scene, q0, q1) -> (free, n_checks, overflow), optional:
        edge check with a small static interpolation budget (K_CHEAP points
        instead of the space-diagonal worst case). Bit-identical decision
        and count whenever overflow is False; overflow=True means the
        result is unusable and the caller must redo with `edge_free`.
        None when the env's worst-case budget is already small.
    """

    state_free: Callable[[Scene, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]
    edge_free: Callable[
        [Scene, jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]
    ]
    distance: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
    interpolate: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]
    batch_state_free: Any = None
    edge_free_cheap: Any = None
    bounds: Any = None  # (lower, upper) joint limits for fixed-step envs


def make_fixed_step_edge_free(
    state_free, distance, lower, upper, rrt_eps: float, k_pts: int,
    with_overflow: bool = False,
):
    """Fixed-step edge oracle shared by every serial-chain env.

    Reference rule (kuka_env.py:372-395 and the ur5/snake/dual variants):
    endpoints first, then K = int(d / RRT_EPS) evenly spaced interior
    points checked in order with stop-at-first-collision counting. ``k_pts``
    is the static buffer the K points are drawn from; the full kernel sizes
    it to the space diagonal, the cheap kernel (``with_overflow=True``) to
    K_CHEAP and reports ``overflow`` when a segment's decision could depend
    on points beyond the buffer (only when K > k_pts, both endpoints free,
    and no collision found inside the buffer — every other case is exact).
    """

    def edge_free(scene, qa, qb):
        valid = jnp.all((qa >= lower) & (qa <= upper)) & jnp.all(
            (qb >= lower) & (qb <= upper)
        )
        fa, _ = state_free(scene, qa)
        fb, _ = state_free(scene, qb)
        disp = qb - qa
        d = distance(qa, qb)
        K = (d / rrt_eps).astype(jnp.int32)
        ks = jnp.arange(k_pts, dtype=qa.dtype)
        active = ks < K.astype(qa.dtype)
        cs = (
            qa[None, :]
            + (ks / jnp.maximum(K, 1).astype(qa.dtype))[:, None] * disp[None, :]
        )
        in_free, _ = jax.vmap(lambda c: state_free(scene, c))(cs)
        failing = active & ~in_free
        order = jnp.arange(k_pts, dtype=jnp.int32)
        first_fail = jnp.min(jnp.where(failing, order, _BIG))
        interior_cnt = jnp.sum((active & (order <= first_fail)).astype(jnp.int32))
        interior_free = first_fail == _BIG
        free = valid & fa & fb & interior_free
        count = jnp.where(
            valid, 1 + jnp.where(fa, 1 + jnp.where(fb, interior_cnt, 0), 0), 0
        )
        if not with_overflow:
            return free, count.astype(jnp.int32)
        overflow = (K > k_pts) & valid & fa & fb & interior_free
        return free & ~overflow, count.astype(jnp.int32), overflow

    return edge_free
