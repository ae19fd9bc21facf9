"""Explorer GNN: encoder-process-decoder over the RGG, TPU-native.

Functionally equivalent to the reference ``EncoderProcessDecoder``
(reference: model.py:48-150): obstacle cross-attention on node/edge
free-codes, a goal-seeded latent, `loop` weight-tied max-aggregation MPNN
passes, and a per-directed-edge policy score scattered into a dense (N, N)
matrix.

TPU-native differences: static padded shapes with node/edge alive masks,
segment-max message passing instead of torch_scatter, and the dense policy
scatter uses drop-mode so dead edges vanish. The reference's orientation
quirk is preserved exactly: the score of directed edge (src -> dst) is
written at ``policy[dst, src]`` (model.py:148-149), which the planner then
reads as "expand dst -> src" (eval_gnn.py:204-215).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gnn_motion_planning_tpu.models.mlp import layer_norm, linear, mlp2, mlp3
from gnn_motion_planning_tpu.ops.segment import masked_segment_max

_NEG = -1e9


def _init_linear(key, n_in, n_out, bias=True):
    import jax

    k1, k2 = jax.random.split(key)
    bound = 1.0 / (n_in**0.5)
    p = {"weight": jax.random.uniform(k1, (n_out, n_in), jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (n_out,), jnp.float32, -bound, bound)
    return p


def _init_mlp2(key, n_in, n_hidden, n_out):
    import jax

    k1, k2 = jax.random.split(key)
    return {"0": _init_linear(k1, n_in, n_hidden), "2": _init_linear(k2, n_hidden, n_out)}


def init_explorer_params(key, cfg: "ExplorerConfig"):
    """Random params with torch nn.Linear default init (training from
    scratch; reference model.py:48-105 module structure)."""

    import jax

    e = cfg.embed_size
    d = cfg.config_size
    keys = jax.random.split(key, 24)
    params = {
        "node_code": _init_mlp2(keys[0], d * 4, e, e),
        "edge_code": _init_mlp2(keys[1], d * 2, e, e),
        "obs_node_code": _init_mlp2(keys[2], cfg.obs_size, e, e),
        "obs_edge_code": _init_mlp2(keys[3], cfg.obs_size, e, e),
        "node_free_code": _init_mlp2(keys[4], d, e, e),
        "edge_free_code": _init_mlp2(keys[5], d * 2, e, e),
        "goal_encoder": jax.random.uniform(keys[6], (e,), jnp.float32),
        "encoder": _init_linear(keys[7], e * 4, e),
        "decoder": _init_linear(keys[8], e * 2, e),
        "process": {
            "lin_0": _init_mlp2(keys[9], e * 5, e, e),
            "lin_1": _init_linear(keys[10], e * 2, e),
        },
        "policy": {
            "0": _init_linear(keys[11], e * 3, e),
            "2": _init_linear(keys[12], e, e),
            "4": _init_linear(keys[13], e, 1, bias=False),
        },
    }
    for mod, base in (("node_attentions", 14), ("edge_attentions", 17)):
        params[mod] = {}
        for i in range(3):
            k = jax.random.split(keys[base + i], 10)
            params[mod][str(i)] = {
                "attention": {
                    "key": _init_linear(k[0], e, e, bias=False),
                    "query": _init_linear(k[1], e, e, bias=False),
                    "value": _init_linear(k[2], e, e, bias=False),
                    "layer_norm": {"weight": jnp.ones(e), "bias": jnp.zeros(e)},
                },
                "map_feed": {
                    "w_1": _init_linear(k[3], e, e),
                    "w_2": _init_linear(k[4], e, e),
                    "layer_norm": {"weight": jnp.ones(e), "bias": jnp.zeros(e)},
                },
                "obs_feed": {
                    "w_1": _init_linear(k[5], e, e),
                    "w_2": _init_linear(k[6], e, e),
                    "layer_norm": {"weight": jnp.ones(e), "bias": jnp.zeros(e)},
                },
            }
    return params


class ExplorerConfig(NamedTuple):
    workspace_size: int
    config_size: int
    embed_size: int
    obs_size: int
    use_obstacles: bool = True


def _attention(p, map_code, obs_code, obs_mask, temperature):
    """Cross-attention of map tokens over obstacle tokens + a self token
    (reference model.py:153-181), with padding masked out of the softmax."""

    map_value = linear(p["value"], map_code)
    obs_value = linear(p["value"], obs_code)
    map_query = linear(p["query"], map_code)
    map_key = linear(p["key"], map_code)
    obs_key = linear(p["key"], obs_code)

    from gnn_motion_planning_tpu.models.mlp import PARITY_PRECISION

    obs_att = jnp.matmul(map_query, obs_key.T, precision=PARITY_PRECISION)  # (N, M)
    self_att = jnp.sum(map_query * map_key, axis=-1)  # (N,)
    logits = jnp.concatenate([self_att[:, None], obs_att], axis=-1) / temperature
    mask = jnp.concatenate(
        [jnp.ones((map_code.shape[0], 1), bool), jnp.broadcast_to(obs_mask[None, :], obs_att.shape)],
        axis=-1,
    )
    logits = jnp.where(mask, logits, _NEG)
    attn = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    attn = attn * mask
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)

    new = attn[:, :1] * map_value + jnp.matmul(
        attn[:, 1:], obs_value, precision=PARITY_PRECISION
    )
    return layer_norm(p["layer_norm"], new + map_code, eps=1e-6)


def _feed_forward(p, x):
    h = jnp.maximum(linear(p["w_1"], x), 0.0)
    return layer_norm(p["layer_norm"], linear(p["w_2"], h) + x, eps=1e-6)


def _block(p, map_code, obs_code, obs_mask, embed_size):
    map_code = _attention(p["attention"], map_code, obs_code, obs_mask, embed_size**0.5)
    map_code = _feed_forward(p["map_feed"], map_code)
    obs_code = _feed_forward(p["obs_feed"], obs_code)
    return map_code, obs_code


def _mpnn_max(p, x, src, dst, e_alive, edge_attr):
    """Max-aggregation MPNN (reference model.py:22-45): messages flow
    src -> dst; out = lin_1([x, max-aggr(msg)])."""

    x_j = x[src]
    x_i = x[dst]
    z = jnp.concatenate([x_j - x_i, x_j, x_i, edge_attr], axis=-1)
    msg = mlp2(p["lin_0"], z)
    agg = masked_segment_max(msg, dst, e_alive, x.shape[0])
    return linear(p["lin_1"], jnp.concatenate([x, agg], axis=-1))


def explorer_forward(
    params,
    cfg: ExplorerConfig,
    v: jnp.ndarray,  # (N, d) padded node configs
    node_valid: jnp.ndarray,  # (N,) bool
    goal: jnp.ndarray,  # (d,)
    src: jnp.ndarray,  # (E,) int32
    dst: jnp.ndarray,  # (E,)
    e_alive: jnp.ndarray,  # (E,) bool
    obstacles: jnp.ndarray,  # (M, obs_size) padded
    obs_mask: jnp.ndarray,  # (M,) bool
    loop: int,
) -> jnp.ndarray:
    """Dense (N, N) directed edge-score matrix (reference model.py:115-150)."""

    goal = goal.reshape(-1)
    gdiff = v - goal[None, :]
    node_code = mlp2(
        params["node_code"],
        jnp.concatenate(
            [v, jnp.broadcast_to(goal[None, :], v.shape), gdiff**2, gdiff], axis=-1
        ),
    )
    ecat = jnp.concatenate([v[src], v[dst]], axis=-1)
    edge_code = mlp2(params["edge_code"], ecat)
    node_free_code = mlp2(params["node_free_code"], v)
    edge_free_code = mlp2(params["edge_free_code"], ecat)

    if cfg.use_obstacles:
        obs = obstacles.reshape(-1, cfg.obs_size)
        obs_node_code = mlp2(params["obs_node_code"], obs)
        obs_edge_code = mlp2(params["obs_edge_code"], obs)
        for i in range(3):
            node_free_code, obs_node_code = _block(
                params["node_attentions"][str(i)],
                node_free_code,
                obs_node_code,
                obs_mask,
                cfg.embed_size,
            )
            edge_free_code, obs_edge_code = _block(
                params["edge_attentions"][str(i)],
                edge_free_code,
                obs_edge_code,
                obs_mask,
                cfg.embed_size,
            )

    # goal node = nearest node to the goal config (model.py:132; the goal is
    # node 1 of the free block, so this resolves to 1 with distance 0)
    gd = jnp.sum((v - goal[None, :]) ** 2, axis=-1)
    goal_index = jnp.argmin(jnp.where(node_valid, gd, jnp.inf))
    h_0 = jnp.zeros((v.shape[0], cfg.embed_size), v.dtype)
    h_0 = h_0.at[goal_index].add(params["goal_encoder"])
    h_i = h_0

    edge_attr = jnp.concatenate([edge_free_code, edge_code], axis=-1)
    decode = jnp.zeros_like(h_0)
    for _ in range(loop):
        encode = linear(
            params["encoder"],
            jnp.concatenate([node_code, node_free_code, h_0, h_i], axis=-1),
        )
        h_i = _mpnn_max(params["process"], encode, src, dst, e_alive, edge_attr)
        decode = linear(
            params["decoder"], jnp.concatenate([node_code, h_i], axis=-1)
        )

    score = mlp3(
        params["policy"],
        jnp.concatenate(
            [decode[src], decode[src] - decode[dst], edge_free_code], axis=-1
        ),
    ).squeeze(-1)

    n = v.shape[0]
    policy = jnp.zeros((n, n), v.dtype)
    row = jnp.where(e_alive, dst, n)  # out-of-bounds rows drop
    policy = policy.at[row, src].set(score, mode="drop")
    return policy
