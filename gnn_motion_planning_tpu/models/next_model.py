"""NEXT models: attention + conv-LSTM value iteration over map grids.

Functional JAX equivalents of the reference GPPN-style networks
(reference: next_model/model2D.py:12-210, next_model/model3D.py:11-307):
a spatial attention over the 15^d occupancy grid driven by the query state,
a 20-iteration conv-LSTM latent value iteration seeded from the goal
attention, and dim-action + value heads. Model2D/Model3D wrappers keep the
reference's numpy-facing API (`set_problem`, `pred_value`, `policy`) with
the problem representation cached on device.

Weights convert 1:1 from the shipped ``next_*.pt`` torch state dicts
(Conv2d/3d OIHW/OIDHW layouts are used natively; LSTMCell gate order i,f,g,o).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gnn_motion_planning_tpu.envs.env_config import LIMITS
from gnn_motion_planning_tpu.models.mlp import linear


def _conv(p, x, nd: int):
    dn = ("NCHW", "OIHW", "NCHW") if nd == 2 else ("NCDHW", "OIDHW", "NCDHW")
    pad = [(k // 2, k // 2) for k in p["weight"].shape[2:]]
    y = jax.lax.conv_general_dilated(
        x, p["weight"], window_strides=(1,) * nd, padding=pad, dimension_numbers=dn
    )
    return y + p["bias"].reshape((1, -1) + (1,) * nd)


def _mlp_seq(p, x, keys):
    for i, k in enumerate(keys):
        x = linear(p[k], x)
        if i < len(keys) - 1:
            x = jnp.maximum(x, 0.0)
    return x


def _conv_seq(p, x, keys, nd):
    for i, k in enumerate(keys):
        x = _conv(p[k], x, nd)
        if i < len(keys) - 1:
            x = jnp.maximum(x, 0.0)
    return x


def _lstm_cell(p, x, h, c):
    from gnn_motion_planning_tpu.models.mlp import PARITY_PRECISION

    gates = (
        jnp.matmul(x, p["weight_ih"].T, precision=PARITY_PRECISION)
        + p["bias_ih"]
        + jnp.matmul(h, p["weight_hh"].T, precision=PARITY_PRECISION)
        + p["bias_hh"]
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


class NextConfig(NamedTuple):
    env_width: int = 15
    cap: int = 8
    dim: int = 2
    point_dim: int = 0  # 0 => 2D variant (state prefix is spatial)
    nd: int = 2
    g: int = 8
    iters: int = 20

    @property
    def latent_dim(self):
        return self.cap * self.g

    @property
    def conv_cap(self):
        return self.cap * 8


def _coords(cfg: NextConfig):
    idx = np.arange(cfg.env_width, dtype=np.float32)
    w = cfg.env_width
    if cfg.nd == 2:
        col = np.tile(idx, (w, 1))
        row = np.tile(idx.reshape(w, 1), (1, w))
        return jnp.asarray(np.stack([col, row])[None])  # (1, 2, w, w)
    col = np.tile(idx.reshape(1, w, 1), (w, 1, w))
    row = np.tile(idx.reshape(w, 1, 1), (1, w, w))
    layer = np.tile(idx.reshape(1, 1, w), (w, w, 1))
    return jnp.asarray(np.stack([col, row, layer])[None])  # (1, 3, w, w, w)


_CONV_KEYS = ["0", "2", "4", "6", "8", "10"]


def attention(p, cfg: NextConfig, inp: jnp.ndarray) -> jnp.ndarray:
    """(B, cap, w^nd...) spatial x capacity attention
    (model2D.py:57-82 / model3D.py:59-86)."""

    b = inp.shape[0]
    w = cfg.env_width
    spatial = cfg.point_dim if cfg.point_dim else 2
    x = inp[:, :spatial].reshape((b, spatial) + (1,) * cfg.nd)
    x = jnp.broadcast_to(x, (b, spatial) + (w,) * cfg.nd)
    coords = jnp.broadcast_to(_coords(cfg), (b, cfg.nd) + (w,) * cfg.nd)
    x = jnp.concatenate([x, coords], axis=1)

    x = _conv_seq(p["mlp_share"], x, _CONV_KEYS, cfg.nd)
    x = jax.nn.softmax(x.reshape(b, -1), axis=-1)
    atten_spatial = x.reshape(b, 1, -1)

    mlp_in = inp if cfg.point_dim == 0 else inp[:, cfg.point_dim :]
    a3 = jax.nn.softmax(_mlp_seq(p["mlp"], mlp_in, ["0", "2"]), axis=-1)
    atten_cap = a3.reshape(b, cfg.cap, 1)

    out = atten_spatial * atten_cap
    return out.reshape((b, cfg.cap) + (w,) * cfg.nd)


def _lstm_rollout(params, cfg: NextConfig, x):
    b = x.shape[0]
    w = cfg.env_width
    n_cells = w**cfg.nd

    h_layer = _conv(params["hidden"], x, cfg.nd)
    # torch transposes (1, 3)/(1, 4): channel-last flatten over cells
    perm = (0, 2, 3, 1) if cfg.nd == 2 else (0, 2, 3, 4, 1)
    h0 = _conv(params["h0"], h_layer, cfg.nd).transpose(perm).reshape(
        b * n_cells, cfg.latent_dim
    )
    c0 = _conv(params["c0"], h_layer, cfg.nd).transpose(perm).reshape(
        b * n_cells, cfg.latent_dim
    )

    inv_perm = (0, cfg.nd + 1) + tuple(range(1, cfg.nd + 1))

    def body(carry, _):
        h, c = carry
        h_map = h.reshape((b,) + (w,) * cfg.nd + (cfg.latent_dim,))
        h_map = h_map.transpose(inv_perm)
        lstm_inp = (
            _conv(params["conv"], h_map, cfg.nd)
            .transpose(perm)
            .reshape(b * n_cells, cfg.conv_cap)
        )
        h, c = _lstm_cell(params["lstm"], lstm_inp, h, c)
        return (h, c), None

    (h, _), _ = jax.lax.scan(body, (h0, c0), None, length=cfg.iters)
    x = h.reshape((b,) + (w,) * cfg.nd + (cfg.latent_dim,)).transpose(inv_perm)
    return x.reshape((b, cfg.g, cfg.cap) + (w,) * cfg.nd)


def pb_forward(params, cfg: NextConfig, goal_state, maze_map):
    """Problem representation (model2D.py:151-185): goal attention + 20
    conv-LSTM iterations over the map."""

    goal_atten = attention(params["attention_g"], cfg, goal_state)
    b = maze_map.shape[0]
    w = cfg.env_width
    x = jnp.concatenate(
        [maze_map.reshape((b, 1) + (w,) * cfg.nd), goal_atten], axis=1
    )
    return _lstm_rollout(params, cfg, x)


def state_forward(params, cfg: NextConfig, cur_states, pb_rep):
    """(B, dim+1) action/value heads (model2D.py:187-210)."""

    b = cur_states.shape[0]
    w = cfg.env_width
    state_atten = attention(params["attention_s"], cfg, cur_states).reshape(
        (b, 1, cfg.cap) + (w,) * cfg.nd
    )
    x = pb_rep * state_atten
    x = x.reshape(b, cfg.g, cfg.cap, -1).sum(axis=-1).sum(axis=-1)
    return _mlp_seq(params["policy"], x, ["0", "2", "4"])


class _ModelBase:
    """Reference Model2D/Model3D numpy-facing API (set_problem /
    pred_value / policy) over the functional nets."""

    def __init__(self, env, params, cfg: NextConfig, std=None):
        if std is None:
            std = env.RRT_EPS * 0.3
        self.env = env
        self.params = params
        self.cfg = cfg
        self.std = std
        self.dim = env.config_dim
        self._pb = jax.jit(
            functools.partial(pb_forward, params, cfg)
        )
        self._fwd = jax.jit(functools.partial(state_forward, params, cfg))
        self.pb_rep = None

    # -- to be provided by subclass -------------------------------------------
    def _augment(self, states: np.ndarray) -> np.ndarray:
        return states

    def _normalize(self, states: np.ndarray) -> np.ndarray:
        return states

    def set_problem(self, problem):
        self.problem = problem
        w = self.cfg.env_width
        maze_map = np.asarray(problem["map"], np.float32).reshape(
            (1,) + (w,) * self.cfg.nd
        )
        goal = np.asarray(problem["goal_state"], np.float32).reshape(1, -1)
        goal = self._normalize(self._augment(goal))
        self.pb_rep = self._pb(jnp.asarray(goal), jnp.asarray(maze_map))

    def net_forward(self, states):
        states = np.asarray(states, np.float32)
        if states.ndim == 1:
            states = states.reshape(1, -1)
        aug = self._normalize(self._augment(states)).astype(np.float32)
        y = np.asarray(self._fwd(jnp.asarray(aug), self.pb_rep))
        pred_actions = y[:, : self.dim]
        pred_values = y[:, -1]
        if pred_actions.shape[0] == 1:
            return pred_actions[0], pred_values[0]
        return pred_actions, pred_values

    def pred_value(self, states):
        return self.net_forward(states)[1]

    def policy(self, state, k: int = 1):
        action_mean, _ = self.net_forward(state)
        rng = self.env.rng if getattr(self.env, "rng", None) is not None else np.random
        d = action_mean.shape[-1]
        actions, priors = [], []
        log_norm = -0.5 * d * np.log(2 * np.pi * self.std**2)
        for _ in range(k):
            eps = rng.normal(0.0, self.std, d)
            action = action_mean + eps
            logp = log_norm - 0.5 * np.sum(eps**2) / self.std**2
            actions.append(action)
            priors.append(float(np.exp(logp)))
        return actions, priors


class Model2D(_ModelBase):
    """Grid-map NEXT model (maze2/maze3/snake; model2D.py:213-294)."""

    def __init__(self, env, params, env_width=15, model_cap=8, dim=2, std=None):
        cfg = NextConfig(env_width=env_width, cap=model_cap, dim=dim, point_dim=0, nd=2)
        super().__init__(env, params, cfg, std)
        self.dim = dim

    def _normalize(self, states):
        states = states.copy()
        states[:, -1] = states[:, -1] / LIMITS[2]
        return states


class Model3D(_ModelBase):
    """Voxel-map NEXT model (kuka/ur5; model3D.py:216-307): the state is
    augmented with FK workspace points (get_robot_points)."""

    def __init__(self, env, params, env_width=15, model_cap=8, dim=2, std=None, point_dim=2):
        cfg = NextConfig(
            env_width=env_width, cap=model_cap, dim=dim, point_dim=point_dim, nd=3
        )
        super().__init__(env, params, cfg, std)
        self.dim = dim

    def _augment(self, states):
        out = []
        for s in states:
            pts = np.asarray(self.env.get_robot_points(s)).reshape(-1)
            out.append(np.concatenate([pts, s], axis=-1))
        return np.asarray(out, np.float32)
