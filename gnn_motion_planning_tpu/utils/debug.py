"""Debug / consistency utilities (SURVEY.md §5: the TPU build's substitute
for the reference's absent sanitizers).

The reference relies on single-threaded Python determinism; here the
equivalents are (a) jit-vs-eager consistency checks for the pure kernels,
(b) NaN guards around model forwards, (c) jax.profiler trace helpers.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np


def jit_eager_consistent(fn, *args, rtol=1e-5, atol=1e-6) -> bool:
    """Run fn jitted and eagerly; assert outputs agree (pure-function check)."""

    with jax.disable_jit():
        eager = fn(*args)
    jitted = jax.jit(fn)(*args)
    for a, b in zip(jax.tree.leaves(eager), jax.tree.leaves(jitted)):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64), rtol=rtol, atol=atol
        )
    return True


def assert_finite(tree, name: str = "output"):
    """NaN/Inf guard for model outputs (debug builds)."""

    for leaf in jax.tree.leaves(tree):
        leaf = jnp.asarray(leaf)
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                raise FloatingPointError(f"non-finite values in {name}")
    return tree


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/gmp_trace"):
    """jax.profiler section trace (host tags pair with utils/timer.py)."""

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
