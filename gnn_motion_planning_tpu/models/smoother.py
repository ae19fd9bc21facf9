"""Smoother GNN: iterative path refinement over a dynamically re-wired graph.

Functional equivalent of the reference ``ModelSmoother``
(reference: model_smoother.py:46-142): per loop iteration it (a) links each
path waypoint to its 10 nearest environment samples, (b) runs one
add-aggregation residual MPNN pass over [path | free | collided] nodes with
a 3-bit type one-hot, and (c) rewrites the interior waypoints.

TPU-native: the per-iteration kNN re-wiring is a dense masked top-k (static
shapes), edge dedup is a sort over encoded ids, and the whole `loop` is
unrolled at trace time so a single jit covers the full refinement.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gnn_motion_planning_tpu.graphs.knn import dedup_edges
from gnn_motion_planning_tpu.models.mlp import batch_norm_eval, linear, mlp2
from gnn_motion_planning_tpu.ops.segment import masked_segment_sum


class SmootherConfig(NamedTuple):
    workspace_size: int
    config_size: int
    obs_size: int
    embed_size: int
    scale: float = 1.0


def _node_code(p, x):
    """Seq(Lin, BatchNorm1d(eval), ReLU, Lin) (model_smoother.py:65)."""

    h = linear(p["0"], x)
    h = batch_norm_eval(p["1"], h)
    return linear(p["3"], jnp.maximum(h, 0.0))


def _mpnn_add(p, x, src, dst, e_alive):
    """Residual add-aggregation MPNN (model_smoother.py:22-39)."""

    x_j = x[src]
    x_i = x[dst]
    msg = mlp2(p["lin_0"], jnp.concatenate([x_j - x_i, x_j, x_i], axis=-1))
    agg = masked_segment_sum(msg, dst, e_alive, x.shape[0])
    return x + mlp2(p["lin_1"], agg)


def smoother_forward(
    params,
    cfg: SmootherConfig,
    path: jnp.ndarray,  # (L, d) padded waypoints
    path_mask: jnp.ndarray,  # (L,) bool, prefix-true
    env_nodes: jnp.ndarray,  # (S, d) padded [free | collided] samples
    env_valid: jnp.ndarray,  # (S,) bool
    n_free: jnp.ndarray,  # scalar: live free count within env_nodes prefix
    base_src: jnp.ndarray,  # (Eb,) chain + self-loop edges over path indices
    base_dst: jnp.ndarray,
    base_alive: jnp.ndarray,
    loop: int,
    knn_k: int = 10,
) -> jnp.ndarray:
    """New path of the same shape (interior waypoints rewritten)."""

    L = path.shape[0]
    S = env_nodes.shape[0]
    n_total = L + S
    path = path / cfg.scale
    env = env_nodes / cfg.scale

    n_path = jnp.sum(path_mask.astype(jnp.int32))
    idx = jnp.arange(L)
    interior = path_mask & (idx >= 1) & (idx <= n_path - 2)

    # type one-hot over [path | free | collided] (model_smoother.py:130-133)
    env_idx = jnp.arange(S)
    is_free = env_valid & (env_idx < n_free)
    is_coll = env_valid & ~(env_idx < n_free)
    info_env = jnp.stack(
        [jnp.zeros(S), is_free.astype(path.dtype), is_coll.astype(path.dtype)], axis=-1
    )
    info_path = jnp.concatenate(
        [jnp.ones((L, 1), path.dtype), jnp.zeros((L, 2), path.dtype)], axis=-1
    )

    for _ in range(loop):
        # kNN: each path waypoint -> its k nearest env samples, edge direction
        # env -> path (model_smoother.py:125-127)
        d = jnp.sum((path[:, None, :] - env[None, :, :]) ** 2, axis=-1)
        d = jnp.where(env_valid[None, :], d, jnp.inf)
        nn_idx = jnp.argsort(d, axis=-1)[:, :knn_k]
        nn_d = jnp.take_along_axis(d, nn_idx, axis=-1)
        nn_alive = jnp.isfinite(nn_d) & path_mask[:, None]

        knn_src = (nn_idx + L).reshape(-1).astype(jnp.int32)
        knn_dst = jnp.broadcast_to(
            jnp.arange(L, dtype=jnp.int32)[:, None], nn_idx.shape
        ).reshape(-1)
        src = jnp.concatenate([base_src, knn_src])
        dst = jnp.concatenate([base_dst, knn_dst])
        alive = jnp.concatenate([base_alive, nn_alive.reshape(-1)])
        edges = dedup_edges(src, dst, alive, n_total)

        nodes = jnp.concatenate([path, env], axis=0)
        info = jnp.concatenate([info_path, info_env], axis=0)
        x = _node_code(params["node_code"], jnp.concatenate([nodes, info], axis=-1))
        h = _mpnn_add(params["process"], x, edges.src, edges.dst, edges.alive)

        proposal = linear(params["smooth_node"], h[:L])
        path = jnp.where(interior[:, None], proposal, path)

    return path * cfg.scale
