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
import numpy as np
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


def make_train_step(cfg: ExplorerConfig, optimizer=None, mesh=None, loop: int = 10):
    """pjit-compiled DP train step: sharded batch, replicated params,
    XLA all-reduced grads."""

    if optimizer is None:
        optimizer = optax.adam(1e-3, eps=1e-8)
    if mesh is None:
        mesh = make_mesh()
    dsh = data_sharding(mesh)
    rsh = replicated(mesh)

    def step(params, opt_state, ex: ExplorerBatch):
        loss, grads = jax.value_and_grad(frontier_cross_entropy)(
            params, cfg, ex, loop
        )
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


# ---------------------------------------------------------------------------
# Full trainer (reference train_explorer.py:96-211)
# ---------------------------------------------------------------------------


def _pad_bucket(n, step=64):
    return max(step, ((n + step - 1) // step) * step)


def host_rollout(edge_cost_arr, policy, start, end, step):
    """Roll the current policy over the PRM cost matrix to a frontier
    (reference train_explorer.py:42-63). Mutates a copy of `policy`."""

    policy = np.array(policy)
    np.fill_diagonal(policy, 0.0)
    policy[end, end] = 1.0
    explored = [start]
    step_i = 0
    for step_i in range(step):
        rows = policy[explored, :]
        nz = np.nonzero(rows)
        if len(nz[0]) == 0:
            break
        k = np.argmax(rows[nz])
        end_a, end_b = explored[nz[0][k]], int(nz[1][k])
        if edge_cost_arr[end_a, end_b] != np.inf:
            explored.append(end_b)
            policy[:, end_b] = 0.0
            if end_b == end:
                return step_i, explored, policy
        else:
            policy[end_a, end_b] = 0.0
            policy[end_b, end_a] = 0.0
    return step_i, explored, policy


def host_policy_data(edge_cost_arr, dist, prev, policy, start, end, step):
    """Oracle next-edge target at a rollout frontier
    (reference train_explorer.py:66-93)."""

    _, explored, policy = host_rollout(edge_cost_arr, policy, start, end, step)
    next_node = explored[int(np.argmin([dist[e] for e in explored]))]
    policy[end, end] = 1.0
    rows = policy[explored, :]
    nz = np.nonzero(rows)
    frontier_rows = np.array(explored)[nz[0]]
    frontier_cols = nz[1]
    next_edge = (next_node, int(prev[next_node]))
    d = np.linalg.norm(
        np.stack([frontier_rows, frontier_cols]).astype(float)
        - np.array(next_edge, float)[:, None],
        axis=0,
    )
    next_edge_idx = int(np.argmin(d))
    return next_edge, next_edge_idx, (frontier_rows, frontier_cols)


def train_explorer(
    epoch,
    data_path,
    model,
    model_path,
    env,
    use_obstacle: bool = True,
    iter: int = 20,
    loop: int = 10,
    batch_size: int = 8,
    seed: int = 1234,
    log_every: int = 10,
    log_dir: str | None = None,
):
    """DAgger-style explorer training (reference train_explorer.py:96-211).

    TPU-native deviations: samples are batched (vmap) instead of per-sample
    grad accumulation, and each optimiser step uses one randomly drawn loop
    count for the whole batch (the reference draws per sample).
    """

    import pickle

    from gnn_motion_planning_tpu.config import set_random_seed
    from gnn_motion_planning_tpu.models.convert import _flatten
    from gnn_motion_planning_tpu.models.explorer import init_explorer_params
    from gnn_motion_planning_tpu.planners.dijkstra import dijkstra_dense
    from gnn_motion_planning_tpu.utils.assets import asset_path

    rng = set_random_seed(seed)
    env.rng = rng
    cfg = model.cfg._replace(use_obstacles=use_obstacle)
    params = model.params
    if params is None:
        params = init_explorer_params(jax.random.PRNGKey(seed), cfg)
    params = jax.tree.map(jnp.asarray, params)

    with open(asset_path(data_path) if not str(data_path).startswith("/") else data_path, "rb") as f:
        graphs = pickle.load(f)

    epoch = min(epoch, len(graphs))

    # one global padded shape: every (shape, loop) pair compiles a separate
    # XLA program, and dozens of bucket variants exhaust compile memory
    global_n_pad = _pad_bucket(max(len(g[0]) for g in graphs[:epoch]))
    global_e_pad = _pad_bucket(max(len(g[3]) for g in graphs[:epoch]), 512)

    def _fwd(p, v, nv, goal, src, dst, ea, obstacles, obs_mask, loop):
        return explorer_forward(
            p, cfg, v, nv, goal, src, dst, ea, obstacles, obs_mask, loop=loop
        )

    fwd = jax.jit(_fwd, static_argnames=("loop",))

    steps = {}

    # DP mesh size must divide the batch: largest power-of-two divisor of
    # batch_size that the host's devices can provide
    n_dev = len(jax.devices())
    mesh_n = 1
    while mesh_n * 2 <= min(n_dev, batch_size) and batch_size % (mesh_n * 2) == 0:
        mesh_n *= 2

    def get_step(cur_loop):
        if cur_loop not in steps:
            from gnn_motion_planning_tpu.parallel.mesh import make_mesh

            step, optimizer, mesh = make_train_step(
                cfg, mesh=make_mesh(mesh_n), loop=cur_loop
            )
            steps[cur_loop] = (step, optimizer)
        return steps[cur_loop]

    import optax as _optax

    optimizer = _optax.adam(1e-3, eps=1e-8)
    opt_state = optimizer.init(params)

    from gnn_motion_planning_tpu.utils.metrics import ScalarLogger

    logger = ScalarLogger(log_dir) if log_dir else None

    obstacles, obs_mask = None, None
    batch_buf = []
    losses = []
    T = 0

    for _ in range(iter):
        indexes = rng.choice(np.arange(epoch), size=epoch, replace=False)
        for index in indexes:
            env.init_new_problem(int(index))
            obstacles, obs_mask = env.obs_tokens()
            points, neighbors, edge_cost, edge_index, edge_free = graphs[index]
            points = np.asarray(points, np.float32)
            n = len(points)
            goal_index = int(rng.choice(n))

            costs_flat = []
            for d_node in range(n):
                costs_flat.extend(
                    (s, d_node, c)
                    for s, c in zip(neighbors[d_node], edge_cost[d_node])
                )
            ei = np.array([(s, d) for s, d, _ in costs_flat], np.int64)
            ec = np.array([c for _, _, c in costs_flat])
            dist, prev = dijkstra_dense(n, ei[:, [1, 0]], ec, goal_index)
            # reference orientation: edges_dict[u] lists u's in-neighbours, so
            # traversal follows reversed adjacency; dense uses (from, to)
            valid_node = np.isfinite(dist)
            if valid_node.sum() <= 1:
                continue

            n_pad = global_n_pad
            e_pad = global_e_pad
            v = np.zeros((n_pad, points.shape[1]), np.float32)
            v[:n] = points
            node_valid = np.zeros(n_pad, bool)
            node_valid[:n] = True
            src = np.zeros(e_pad, np.int32)
            dst = np.zeros(e_pad, np.int32)
            e_alive = np.zeros(e_pad, bool)
            src[: len(ei)] = edge_index[:, 0]
            dst[: len(ei)] = edge_index[:, 1]
            e_alive[: len(ei)] = True

            cur_loop = int(rng.randint(1, loop))
            cur_loop = max(1, 2 * (cur_loop // 2))  # quantize: halves compile variants
            policy = np.asarray(
                fwd(
                    params,
                    jnp.asarray(v),
                    jnp.asarray(node_valid),
                    jnp.asarray(points[goal_index]),
                    jnp.asarray(src),
                    jnp.asarray(dst),
                    jnp.asarray(e_alive),
                    jnp.asarray(obstacles),
                    jnp.asarray(obs_mask),
                    loop=cur_loop,
                )
            )[:n, :n]

            cost_arr = np.full((n, n), np.inf)
            for x in neighbors:
                for y, c in zip(neighbors[x], edge_cost[x]):
                    cost_arr[x, y] = c

            start_index = int(rng.choice(np.arange(n)[valid_node]))
            try:
                step_n, _, _ = host_rollout(
                    cost_arr, policy, start_index, goal_index, 1000
                )
                next_edge, next_edge_idx, frontier = host_policy_data(
                    cost_arr,
                    dist,
                    prev,
                    policy,
                    start_index,
                    goal_index,
                    int(rng.randint(0, step_n + 1)),
                )
            except Exception:
                continue

            frontier_mask = np.zeros((n_pad, n_pad), bool)
            frontier_mask[frontier[0], frontier[1]] = True
            target_flat = int(frontier[0][next_edge_idx]) * n_pad + int(
                frontier[1][next_edge_idx]
            )

            batch_buf.append(
                dict(
                    v=v,
                    node_valid=node_valid,
                    goal=points[goal_index],
                    src=src,
                    dst=dst,
                    e_alive=e_alive,
                    obstacles=obstacles,
                    obs_mask=obs_mask,
                    frontier=frontier_mask,
                    target=target_flat,
                    loop=cur_loop,
                    shape=(n_pad, e_pad),
                )
            )

            # flush a batch of same-shaped samples
            shapes = [s["shape"] for s in batch_buf]
            same = [s for s in batch_buf if s["shape"] == shapes[-1]]
            if len(same) >= batch_size:
                batch_buf = [s for s in batch_buf if s["shape"] != shapes[-1]]
                ex = ExplorerBatch(
                    v=np.stack([s["v"] for s in same]),
                    node_valid=np.stack([s["node_valid"] for s in same]),
                    goal=np.stack([s["goal"] for s in same]),
                    src=np.stack([s["src"] for s in same]),
                    dst=np.stack([s["dst"] for s in same]),
                    e_alive=np.stack([s["e_alive"] for s in same]),
                    obstacles=np.stack([s["obstacles"] for s in same]),
                    obs_mask=np.stack([s["obs_mask"] for s in same]),
                    frontier=np.stack([s["frontier"] for s in same]),
                    target=np.array([s["target"] for s in same], np.int32),
                    loop=np.array([s["loop"] for s in same], np.int32),
                )
                cur = int(np.round(np.mean([s["loop"] for s in same])))
                step_fn, _ = get_step(max(cur, 1))
                params, opt_state, loss = step_fn(params, opt_state, ex)
                losses.append(float(loss))
                T += 1
                if logger is not None:
                    # reference tag: train_explorer.py:191 add_scalar('train/loss')
                    logger.add_scalar("train/loss", losses[-1], T)
                if T % log_every == 0:
                    print(
                        f"step {T}: policy loss {np.mean(losses[-log_every:]):.3f}",
                        flush=True,
                    )
                    np.savez(model_path, **_flatten(jax.tree.map(np.asarray, params)))

    np.savez(model_path, **_flatten(jax.tree.map(np.asarray, params)))
    return params, losses
