"""Smoother training: DAgger-style oracle-smoothed replay, MSE on interior
waypoints (reference train_smoother.py:33-133).

Data collection runs the explorer (smooth=False), oracle-smooths the raw
path with joint_smoother_ratio, and fills a replay buffer; training batches
replay samples, runs the smoother with a random loop count, and regresses
interior waypoints to the oracle-smoothed ones with SGD+momentum and a
reduce-on-plateau schedule.

Deviation from the reference: the smoother's BatchNorm uses its running
statistics (identity at init) rather than per-batch statistics during
training — node features are already near-normalised by the config-space
scale, and inference semantics (eval-mode BN) are unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gnn_motion_planning_tpu.models.smoother import SmootherConfig, smoother_forward


def init_smoother_params(key, cfg: SmootherConfig):
    """torch-default random init mirroring ModelSmoother's used modules
    (model_smoother.py:62-94)."""

    from gnn_motion_planning_tpu.models.explorer import _init_linear, _init_mlp2

    e = cfg.embed_size
    d = cfg.config_size
    keys = jax.random.split(key, 8)
    return {
        "node_code": {
            "0": _init_linear(keys[0], d + 3, e),
            "1": {
                "weight": jnp.ones(e),
                "bias": jnp.zeros(e),
                "running_mean": jnp.zeros(e),
                "running_var": jnp.ones(e),
            },
            "3": _init_linear(keys[1], e, e),
        },
        "process": {
            "lin_0": _init_mlp2(keys[2], e * 3, e, e),
            "lin_1": _init_mlp2(keys[3], e, e, e),
        },
        "smooth_node": _init_linear(keys[4], e, d),
    }


def smoother_mse(params, cfg, batch, loop: int):
    """Mean MSE over interior waypoints (train_smoother.py:53-55)."""

    def one(path, path_mask, env_nodes, env_valid, n_free, base_src, base_dst, base_alive, target):
        pred = smoother_forward(
            params, cfg, path, path_mask, env_nodes, env_valid, n_free,
            base_src, base_dst, base_alive, loop=loop,
        )
        n_path = jnp.sum(path_mask.astype(jnp.int32))
        idx = jnp.arange(path.shape[0])
        interior = path_mask & (idx >= 1) & (idx <= n_path - 2)
        se = jnp.sum((pred - target) ** 2, axis=-1)
        return jnp.sum(jnp.where(interior, se, 0.0)) / (
            jnp.maximum(jnp.sum(interior), 1) * path.shape[1]
        )

    losses = jax.vmap(one)(*batch)
    return jnp.mean(losses)


def train_smoother(
    epoch,
    model_explore,
    model,
    model_path,
    env,
    data_iter: int = 3,
    train_iter: int = 20,
    seed: int = 1234,
    batch_size: int = 8,
    log_dir: str | None = None,
):
    """Full smoother training loop (reference train_smoother.py:67-133)."""

    from gnn_motion_planning_tpu.api.eval_gnn import explore
    from gnn_motion_planning_tpu.config import set_random_seed
    from gnn_motion_planning_tpu.models.convert import _flatten
    from gnn_motion_planning_tpu.planners.gnn_smooth import base_chain_edges, pad_to_bucket
    from gnn_motion_planning_tpu.planners.oracle_smoother import joint_smoother_ratio

    rng = set_random_seed(seed)
    env.rng = rng
    cfg = model.cfg
    params = model.params
    if params is None:
        params = init_smoother_params(jax.random.PRNGKey(seed), cfg)
    params = jax.tree.map(jnp.asarray, params)

    # -- data collection -------------------------------------------------------
    replay = []
    for iter_i in range(data_iter):
        indexes = rng.choice(np.arange(epoch), size=epoch, replace=False)
        for index in indexes:
            env.init_new_problem(int(index))
            if iter_i != 0:
                env.set_random_init_goal()
            try:
                result = explore(env, model_explore, None, smooth=False)
                if result == []:
                    continue
                path, free, collided = result
                if len(path) > 2:
                    path_smooth = joint_smoother_ratio(
                        [tuple(node) for node in path], env, iter=5
                    )
                    replay.append(
                        (int(index), path, path_smooth, free, collided)
                    )
            except Exception:
                continue

    if len(replay) <= batch_size:
        return params, []

    # -- training --------------------------------------------------------------
    lr = 1e-3
    losses_out = []
    d = cfg.config_size

    def build_sample(item, l_pad):
        _, path, path_smooth, free, collided = item
        L = len(path)
        path_arr = np.zeros((l_pad, d), np.float32)
        path_arr[:L] = np.asarray(path, np.float32)
        path_arr[L:] = path_arr[L - 1]
        target = np.array(path_arr)
        target[:L] = np.asarray(path_smooth, np.float32)
        mask = np.zeros(l_pad, bool)
        mask[:L] = True
        env_nodes = np.zeros((1000, d), np.float32)
        env_valid = np.zeros(1000, bool)
        fr = np.asarray(free, np.float32)[:500]
        co = np.asarray(collided, np.float32)[:500] if len(collided) else np.zeros((0, d), np.float32)
        env_nodes[: len(fr)] = fr
        env_valid[: len(fr)] = True
        env_nodes[500 : 500 + len(co)] = co
        env_valid[500 : 500 + len(co)] = True
        bs, bd, ba = base_chain_edges(l_pad, L)
        return (
            path_arr, mask, env_nodes, env_valid, np.int32(len(fr)), bs, bd, ba, target
        )

    opt = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(1e-4),
            optax.sgd(learning_rate, momentum=0.9),
        )
    )(learning_rate=lr)
    opt_state = opt.init(params)

    step_fns = {}

    def get_step(loop, l_pad):
        key = (loop, l_pad)
        if key not in step_fns:

            @jax.jit
            def step(params, opt_state, batch):
                loss, grads = jax.value_and_grad(smoother_mse)(
                    params, cfg, batch, loop
                )
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss

            step_fns[key] = step
        return step_fns[key]

    from gnn_motion_planning_tpu.utils.metrics import ScalarLogger

    logger = ScalarLogger(log_dir) if log_dir else None

    prev_loss = np.inf
    for iter_i in range(train_iter):
        indexes = rng.choice(len(replay), size=len(replay), replace=False)
        losses = []
        for bstart in range(0, len(indexes) - batch_size + 1, batch_size):
            items = [replay[i] for i in indexes[bstart : bstart + batch_size]]
            l_pad = pad_to_bucket(max(len(it[1]) for it in items))
            batch = tuple(
                np.stack(cols)
                for cols in zip(*[build_sample(it, l_pad) for it in items])
            )
            loop = int(rng.randint(1, 10))
            step = get_step(loop, l_pad)
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        mean_loss = float(np.mean(losses)) if losses else np.inf
        losses_out.append(mean_loss)
        if logger is not None:
            logger.add_scalar("train/loss", mean_loss, iter_i)
            logger.add_scalar("train/lr", lr, iter_i)
        # ReduceLROnPlateau(patience=0)
        if mean_loss >= prev_loss:
            lr *= 0.1
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
        prev_loss = min(prev_loss, mean_loss)
        np.savez(model_path, **_flatten(jax.tree.map(np.asarray, params)))

    np.savez(model_path, **_flatten(jax.tree.map(np.asarray, params)))
    return params, losses_out
