"""Segment aggregation for padded edge lists (message passing on TPU).

Replaces torch_scatter / PyG MessagePassing aggregation (reference:
model.py:22-45, model_smoother.py:22-43) with static-shape
``jax.ops.segment_*`` over edge lists where dead (padding) edges are routed
to a dummy segment. All shapes static; no sorting required.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_segment_max(
    data: jnp.ndarray, segment_ids: jnp.ndarray, alive: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    """Max-aggregate rows of `data` into `num_segments` buckets.

    Dead edges are routed to an extra trash segment. Empty segments yield 0
    (matching torch-scatter's zero base for max aggregation in the versions
    the reference models were trained with — every live node has a self-loop
    so this only affects padding).
    """

    ids = jnp.where(alive, segment_ids, num_segments)
    out = jax.ops.segment_max(data, ids, num_segments=num_segments + 1)
    out = jnp.where(jnp.isneginf(out), 0.0, out)
    return out[:num_segments]


def masked_segment_sum(
    data: jnp.ndarray, segment_ids: jnp.ndarray, alive: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    """Sum-aggregate rows of `data`; dead edges contribute nothing."""

    ids = jnp.where(alive, segment_ids, num_segments)
    out = jax.ops.segment_sum(data, ids, num_segments=num_segments + 1)
    return out[:num_segments]
