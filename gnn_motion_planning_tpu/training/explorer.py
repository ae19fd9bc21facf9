"""Explorer training: oracle next-edge cross-entropy, data-parallel.

The reference trains the explorer by rolling the current policy to a random
frontier and supervising the next-edge choice with cross-entropy over the
frontier edges against a Dijkstra oracle (reference:
train_explorer.py:96-211, loss at :172-177). Here the loss is a pure
function over a *batch* of problems (the reference accumulates grads over 8
problems sequentially — config.py batch_size; we vmap), and the train step
is one pjit-compiled update over a ``dp`` mesh with XLA all-reduce for
gradients.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from gnn_motion_planning_tpu.models.explorer import ExplorerConfig, explorer_forward
from gnn_motion_planning_tpu.parallel.mesh import data_sharding, make_mesh, replicated

_NEG = -1e9


class ExplorerBatch(NamedTuple):
    """One training example per leading-axis row (padded, static shapes)."""

    v: jnp.ndarray  # (B, N, d)
    node_valid: jnp.ndarray  # (B, N)
    goal: jnp.ndarray  # (B, d)
    src: jnp.ndarray  # (B, E)
    dst: jnp.ndarray  # (B, E)
    e_alive: jnp.ndarray  # (B, E)
    obstacles: jnp.ndarray  # (B, M, obs)
    obs_mask: jnp.ndarray  # (B, M)
    frontier: jnp.ndarray  # (B, N, N) bool — eligible frontier entries
    target: jnp.ndarray  # (B,) int32 — flat index of the oracle edge
    loop: jnp.ndarray  # (B,) int32 — per-problem loop count (rand 1..10)


def frontier_cross_entropy(
    params, cfg: ExplorerConfig, ex: ExplorerBatch, max_loop: int = 10
):
    """-log softmax over frontier entries at the oracle edge
    (train_explorer.py:172-177)."""

    def one(v, valid, goal, src, dst, e_alive, obstacles, obs_mask, frontier, target, loop):
        # per-problem randomized loop count, executed as masked fixed passes
        policy = explorer_forward(
            params, cfg, v, valid, goal, src, dst, e_alive, obstacles, obs_mask,
            loop=max_loop,
        )
        logits = jnp.where(frontier, policy, _NEG).reshape(-1)
        return -(logits[target] - jax.nn.logsumexp(logits))

    losses = jax.vmap(one)(
        ex.v, ex.node_valid, ex.goal, ex.src, ex.dst, ex.e_alive,
        ex.obstacles, ex.obs_mask, ex.frontier, ex.target, ex.loop,
    )
    return jnp.mean(losses)


def make_train_step(cfg: ExplorerConfig, optimizer=None, mesh=None):
    """pjit-compiled DP train step: sharded batch, replicated params,
    XLA all-reduced grads."""

    if optimizer is None:
        optimizer = optax.adam(1e-3, eps=1e-8)
    if mesh is None:
        mesh = make_mesh()
    dsh = data_sharding(mesh)
    rsh = replicated(mesh)

    def step(params, opt_state, ex: ExplorerBatch):
        loss, grads = jax.value_and_grad(frontier_cross_entropy)(params, cfg, ex)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    batch_sh = ExplorerBatch(*([dsh] * len(ExplorerBatch._fields)))
    return (
        jax.jit(
            step,
            in_shardings=(rsh, rsh, batch_sh),
            out_shardings=(rsh, rsh, rsh),
        ),
        optimizer,
        mesh,
    )
