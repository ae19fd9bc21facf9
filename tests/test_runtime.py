"""Runtime layer: sharded resumable eval + orbax checkpoint roundtrip."""

import numpy as np
import pytest


def test_shard_indexes_partition():
    from gnn_motion_planning_tpu.parallel.sharded_eval import shard_indexes

    idx = np.arange(2000, 3000)
    parts = [shard_indexes(idx, 4, i) for i in range(4)]
    assert sum(len(p) for p in parts) == 1000
    np.testing.assert_array_equal(np.concatenate(parts), idx)


def test_resumable_eval_resumes(tmp_path):
    from gnn_motion_planning_tpu.parallel.sharded_eval import resumable_eval

    calls = []

    def fake_method(str_name, seed, env, part, **kwargs):
        calls.append(list(part))
        n = len(part)
        return (n, 10.0, 0.5, 2.0, n * 0.1)

    out = tmp_path / "res.pkl"
    s1 = resumable_eval(fake_method, "x", 1, None, np.arange(10), str(out), chunk=4)
    assert s1["n_problems"] == 10 and s1["success"] == 10
    n_calls = len(calls)
    # resume: nothing re-runs
    s2 = resumable_eval(fake_method, "x", 1, None, np.arange(10), str(out), chunk=4)
    assert len(calls) == n_calls
    assert s2 == s1


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    import optax

    from gnn_motion_planning_tpu.parallel.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    params = {"a": {"w": jnp.arange(6.0).reshape(2, 3)}, "b": jnp.ones(4)}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    rng_state = np.random.RandomState(7).get_state()

    save_train_state(str(tmp_path / "ckpt"), 3, params, opt_state, rng_state)
    p2, o2, step, rng2 = restore_train_state(
        str(tmp_path / "ckpt"), params, opt_state
    )
    assert step == 3
    np.testing.assert_allclose(p2["a"]["w"], np.asarray(params["a"]["w"]))
    assert rng2 is not None and rng2[0] == "MT19937"
    rs = np.random.RandomState()
    rs.set_state(rng2)
    want = np.random.RandomState(7).uniform(0, 1, 5)
    np.testing.assert_allclose(rs.uniform(0, 1, 5), want)
