"""Functional NN primitives over torch-layout parameter pytrees.

Models in this framework are pure functions over nested parameter dicts
whose keys mirror torch ``state_dict`` names (e.g.
``params["node_code"]["0"]["weight"]``). This makes the checkpoint
converter a pure renaming (no transposes beyond torch's (out, in) layout
being applied here) and keeps the numerics bit-comparable to the reference
models (reference: model.py, model_smoother.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Checkpoint numerical parity with the torch reference requires true-f32
# matmuls on TPU: bf16-input matmuls perturb policy logits by ~3e-3 and flip
# near-tie argmaxes. Scoped here (the parity-sensitive model path) instead of
# a process-global jax_default_matmul_precision, so the collision/FK/search
# kernels keep default MXU precision.
PARITY_PRECISION = lax.Precision.HIGHEST


def linear(p, x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.Linear: weight (out, in), optional bias."""

    y = jnp.matmul(x, p["weight"].T, precision=PARITY_PRECISION)
    if "bias" in p:
        y = y + p["bias"]
    return y


def mlp2(p, x: jnp.ndarray) -> jnp.ndarray:
    """torch Seq(Lin, ReLU, Lin) with keys '0', '2'."""

    return linear(p["2"], jnp.maximum(linear(p["0"], x), 0.0))


def mlp3(p, x: jnp.ndarray) -> jnp.ndarray:
    """torch Seq(Lin, ReLU, Lin, ReLU, Lin) with keys '0', '2', '4'."""

    h = jnp.maximum(linear(p["0"], x), 0.0)
    h = jnp.maximum(linear(p["2"], h), 0.0)
    return linear(p["4"], h)


def layer_norm(p, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch nn.LayerNorm over the last axis (biased variance)."""

    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]


def batch_norm_eval(p, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch nn.BatchNorm1d in eval mode (running statistics)."""

    return (x - p["running_mean"]) / jnp.sqrt(p["running_var"] + eps) * p[
        "weight"
    ] + p["bias"]
