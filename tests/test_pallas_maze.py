"""Pallas occupancy-lookup kernel: correctness vs the XLA gather path.

Runs in Pallas interpreter mode on CPU (the kernel itself targets TPU);
the timing A/B lives in bench.py territory and is TPU-only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_pallas_lookup_matches_gather(monkeypatch):
    from jax.experimental import pallas as pl

    import gnn_motion_planning_tpu.ops.pallas_maze as pm

    # run the kernel interpreted on CPU
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    pm._pallas_lookup._clear_cache()

    rng = np.random.RandomState(0)
    occ = (rng.uniform(0, 1, (15, 15)) < 0.3).astype(np.float32)
    coords = rng.randint(0, 15, (700, 2)).astype(np.int32)

    got = np.asarray(
        pm.points_occupied(pm.pad_occ(jnp.asarray(occ)), jnp.asarray(coords))
    )
    want = occ[coords[:, 0], coords[:, 1]] != 0
    np.testing.assert_array_equal(got, want)
