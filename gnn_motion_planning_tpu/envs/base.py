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

import jax.numpy as jnp

Scene = Any  # env-specific pytree (occupancy grid, obstacle boxes, ...)


class EnvKernels(NamedTuple):
    """Pure device kernels for one environment family.

    state_free(scene, q)        -> (free: bool, n_checks: int32)
    edge_free(scene, q0, q1)    -> (free: bool, n_checks: int32)
    distance(q0, q1)            -> float (the env's metric, incl. wrap/clamp)
    interpolate(q0, q1, ratio)  -> q (the env's steering rule)
    batch_state_free(scene, qs) -> (free: (B,) bool, n_checks: (B,) int32),
        optional: a whole-batch implementation (e.g. a Pallas kernel) that
        beats `vmap(state_free)`; callers fall back to the vmap when None.
    """

    state_free: Callable[[Scene, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]
    edge_free: Callable[
        [Scene, jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]
    ]
    distance: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
    interpolate: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]
    batch_state_free: Any = None
