"""NEXT training: iterative imitation with epsilon-decayed exploration
(reference train_next.py:42-120).

Plan each problem with the current model (g_explore_eps decaying 0.7x every
200 problems); successful paths (or BIT* fallback solutions) enter the
replay; every 200 problems the net regresses per-waypoint clipped actions
and cost-to-go values over the replay (MSE, grad-accumulated batches of 8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gnn_motion_planning_tpu.models.next_model import (
    NextConfig,
    pb_forward,
    state_forward,
)


def get_label(path, env):
    """(actions, costs-to-go) along a demo path (train_next.py:25-39)."""

    path = np.array(path)
    path_cost = [0.0]
    action = []
    for prev, nxt in zip(path[:-1], path[1:]):
        edge_cost = np.linalg.norm(nxt - prev)
        path_cost.append(path_cost[-1] + edge_cost)
        if edge_cost > env.RRT_EPS:
            action.append(env.interpolate(prev, nxt, env.RRT_EPS / edge_cost) - prev)
        else:
            action.append(nxt - prev)
    action.append(path[-1] * 0.0)
    total = path_cost[-1]
    path_cost = [c - total for c in path_cost]
    return np.asarray(action, np.float32), np.asarray(path_cost, np.float32)


def make_next_loss(cfg: NextConfig):
    def loss_fn(params, states, maze_map, goal_state, actions, values, mask):
        pb = pb_forward(params, cfg, goal_state, maze_map)
        y = state_forward(params, cfg, states, pb)
        pred_a = y[:, :-1]
        pred_v = y[:, -1]
        m = mask.astype(jnp.float32)
        action_loss = jnp.sum(
            m[:, None] * (pred_a[:, : actions.shape[1]] - actions) ** 2
        ) / jnp.maximum(jnp.sum(m) * actions.shape[1], 1.0)
        value_loss = jnp.sum(m * (pred_v - values) ** 2) / jnp.maximum(
            jnp.sum(m), 1.0
        )
        return action_loss + value_loss

    return loss_fn


def train_next(str_name, T: int = 1000, n_problems: int = 2000, seed: int = 1234,
               model_path=None, train_every: int = 200, log_dir=None,
               from_scratch: bool = False):
    """Full NEXT training loop (reference train_next.py:71-120).

    ``from_scratch`` re-initializes the parameter tree (He init for weight
    tensors, zeros for biases) instead of fine-tuning the converted
    checkpoint — the reference trains NEXT from torch default init."""

    from gnn_motion_planning_tpu.api.eval_baselines import str2next
    from gnn_motion_planning_tpu.api.registry import str2name
    from gnn_motion_planning_tpu.config import set_random_seed
    from gnn_motion_planning_tpu.models.convert import _flatten
    from gnn_motion_planning_tpu.planners.bit_star import BITStar
    from gnn_motion_planning_tpu.planners.tsa import NEXT_plan

    rng = set_random_seed(seed)
    env, _, _, _, _ = str2name(str_name, load=False)
    env.rng = rng
    model, ckpt = str2next(str_name, env)
    if model_path is None:
        model_path = f"/tmp/next_{str_name}.npz"
    params = jax.tree.map(jnp.asarray, model.params)
    cfg = model.cfg
    if from_scratch:
        key = jax.random.PRNGKey(seed)
        leaves, treedef = jax.tree.flatten(params)
        fresh = []
        for leaf in leaves:
            key, k = jax.random.split(key)
            if leaf.ndim >= 2:  # torch layout: fan_in = prod(shape[1:])
                fan_in = float(np.prod(leaf.shape[1:]))
                fresh.append(
                    jax.random.normal(k, leaf.shape, leaf.dtype)
                    * (2.0 / fan_in) ** 0.5
                )
            else:
                fresh.append(jnp.zeros_like(leaf))
        params = jax.tree.unflatten(treedef, fresh)
        model.params = params

    loss_fn = make_next_loss(cfg)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, *batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    from gnn_motion_planning_tpu.utils.metrics import ScalarLogger

    logger = ScalarLogger(log_dir) if log_dir else None

    replay = []
    explore_eps = 1.0
    L_PAD = 64
    losses = []

    # jit once; thread the evolving params through a mutable cell so the
    # planner always uses current weights without recompiling
    cell = {"params": params}
    pb_jit = jax.jit(lambda p, g, m: pb_forward(p, cfg, g, m))
    fwd_jit = jax.jit(lambda p, s, r: state_forward(p, cfg, s, r))
    model._pb = lambda g, m: pb_jit(cell["params"], g, m)
    model._fwd = lambda s, r: fwd_jit(cell["params"], s, r)

    for i in range(n_problems):
        pb = env.init_new_problem(i)
        cell["params"] = params
        model.set_problem(pb)

        tree, success, _ = NEXT_plan(
            env=env, model=model, T=T, g_explore_eps=explore_eps,
            stop_when_success=True, UCB_type="kde",
        )
        if success:
            replay.append((i, tree.path()[0]))
        else:
            bit = BITStar(env, T=float("inf"), batch_size=50)
            g_score = bit.plan(float("inf"), time_budget=60, refine_time_budget=0)[-3]
            if g_score != float("inf"):
                replay.append((i, bit.get_best_path()))

        if i % train_every == train_every - 1 and replay:
            explore_eps *= 0.7
            indexes = rng.choice(len(replay), size=len(replay), replace=False)
            for idx in indexes:
                pi, path = replay[idx]
                pb = env.init_new_problem(int(pi))
                maze_map = np.asarray(pb["map"], np.float32).reshape(
                    (1,) + (cfg.env_width,) * cfg.nd
                )
                goal = model._normalize(
                    model._augment(
                        np.asarray(pb["goal_state"], np.float32).reshape(1, -1)
                    )
                )
                actions, values = get_label(path, env)
                states = model._normalize(
                    model._augment(np.asarray(path, np.float32))
                )
                n = len(path)
                if n > L_PAD:
                    continue
                s_pad = np.zeros((L_PAD, states.shape[1]), np.float32)
                s_pad[:n] = states
                a_pad = np.zeros((L_PAD, actions.shape[1]), np.float32)
                a_pad[:n] = actions
                v_pad = np.zeros(L_PAD, np.float32)
                v_pad[:n] = values
                mask = np.zeros(L_PAD, bool)
                mask[:n] = True
                batch = (
                    jnp.asarray(s_pad),
                    jnp.asarray(maze_map),
                    jnp.asarray(goal),
                    jnp.asarray(a_pad),
                    jnp.asarray(v_pad),
                    jnp.asarray(mask),
                )
                params, opt_state, loss = step(params, opt_state, batch)
                losses.append(float(loss))
                if logger is not None:
                    logger.add_scalar("train/loss", losses[-1], len(losses))
            np.savez(model_path, **_flatten(jax.tree.map(np.asarray, params)))

    np.savez(model_path, **_flatten(jax.tree.map(np.asarray, params)))
    return params, losses
