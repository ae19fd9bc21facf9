"""Typed configuration + seeding for the TPU framework.

Mirrors the reference's config surface (reference: config.py:6-51) with a
typed dataclass tree instead of global DotDicts, and replaces the global
``np.random.seed`` protocol with an explicit, owned RNG stream
(:class:`HostRNG`) so sampling is reproducible and thread-safe.

The host RNG deliberately uses numpy's legacy MT19937 ``RandomState`` and
consumes it in the same call order as the reference's
``np.random.uniform(...)`` calls (reference: environment/maze_env.py:127-135,
environment/kuka_env.py:211-222). For a given seed, the rejection-sampled RGG
node set is therefore *bit-identical* to the reference's on environments
whose collision oracle agrees (the pure-grid maze envs), which pins down
metric parity end-to-end.
"""

from __future__ import annotations

import dataclasses
import random as _pyrandom

import numpy as np


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference: config.py:19-27)."""

    batch_size: int = 8
    gamma: float = 2.0
    alpha: float = 1.0
    n: int = 1
    lr: float = 1e-3
    adam_eps: float = 1e-8
    anchor_num: int = 64


@dataclasses.dataclass(frozen=True)
class NNConfig:
    """Model width defaults (reference: config.py:39-45)."""

    layer_num: int = 1
    embed_dim: int = 32
    feature_dim: int = 32
    hidden_dim: int = 32
    output_dim: int = 32


@dataclasses.dataclass(frozen=True)
class PlannerConfig:
    """GNN planner defaults (reference: eval_gnn.py:96-97,169)."""

    batch: int = 500
    t_max: int = 500
    k: int = 30
    loop: int = 5
    smoother: str = "model"


train_config = TrainConfig()
nn_config = NNConfig()
planner_config = PlannerConfig()


class HostRNG:
    """Owned MT19937 stream with save/restore, mirroring np.random global use.

    ``uniform`` consumes the stream exactly like sequential calls to the
    reference's ``np.random.uniform`` (numpy fills arrays from the same
    underlying double stream regardless of call granularity), and
    ``get_state``/``set_state`` allow chunked rejection sampling to "un-draw"
    overshoot so the consumed prefix matches the reference's one-at-a-time
    loop (reference: environment/maze_env.py:85-100).
    """

    def __init__(self, seed: int):
        self._rs = np.random.RandomState(seed)

    def uniform(self, low, high, size=None) -> np.ndarray:
        return self._rs.uniform(low, high, size)

    def randint(self, low, high=None, size=None):
        return self._rs.randint(low, high, size)

    def choice(self, a, size=None, replace=True):
        return self._rs.choice(a, size=size, replace=replace)

    def normal(self, loc=0.0, scale=1.0, size=None):
        return self._rs.normal(loc, scale, size)

    def get_state(self):
        return self._rs.get_state()

    def set_state(self, state) -> None:
        self._rs.set_state(state)


def problem_rng(seed: int, index: int) -> HostRNG:
    """Independent per-problem MT19937 stream derived from ``(seed, index)``.

    Both the scalar protocol driver and the batched serving path seed the
    env with this stream at every problem entry (sampling, oracle smoothing,
    fallback re-planning), so problem ordering, lane grouping, and fallback
    order cannot change any problem's random draws. This is what makes the
    batched path's success/checks/cost *bit-identical* to the scalar
    protocol's — the reference instead threads one global stream through the
    whole sweep (reference: config.py:48-51, eval_gnn.py:98), which makes
    each problem's draws depend on every earlier problem's outcome; metric
    parity with the reference is defined per-protocol, not per-stream.
    """

    root = np.random.SeedSequence([int(seed), int(index)]).generate_state(1)[0]
    return HostRNG(int(root))


def set_random_seed(seed: int) -> HostRNG:
    """Seed all host RNGs and return an owned stream.

    Equivalent of reference config.py:48-51; torch seeding is replaced by the
    returned :class:`HostRNG` (device randomness in this framework flows
    through explicit ``jax.random`` keys instead of global state).
    """

    np.random.seed(seed)
    _pyrandom.seed(seed)
    return HostRNG(seed)
