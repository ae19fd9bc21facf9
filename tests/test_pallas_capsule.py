"""Parity of the Pallas capsule-vs-AABB kernel against the XLA path.

The Pallas kernel (ops/pallas_capsule.py) re-expresses
geometry.py::seg_box_sq_dist in SoA layout; these tests pin its contact
decisions to the XLA implementation on random scenes and on the real kuka7
chain (interpret mode — the chip A/B lives in tools/ab_capsule.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_motion_planning_tpu.envs.geometry import seg_box_sq_dist
from gnn_motion_planning_tpu.ops.pallas_capsule import capsules_hit


def _xla_hit(p0, p1, r, centers, halfs, mask):
    d2 = seg_box_sq_dist(
        p0[:, :, None, :], p1[:, :, None, :], centers[None, None], halfs[None, None]
    )  # (B, C, O)
    contact = (d2 < (r[None, :, None] ** 2)) & mask[None, None, :]
    return jnp.any(contact, axis=(1, 2))


@pytest.mark.parametrize("seed", [0, 1])
def test_random_scenes_match_xla(seed):
    rng = np.random.RandomState(seed)
    B, C, O = 200, 5, 7
    p0 = rng.uniform(-1, 1, (B, C, 3)).astype(np.float32)
    p1 = p0 + rng.uniform(-0.5, 0.5, (B, C, 3)).astype(np.float32)
    r = rng.uniform(0.02, 0.15, C).astype(np.float32)
    centers = rng.uniform(-0.8, 0.8, (O, 3)).astype(np.float32)
    halfs = rng.uniform(0.05, 0.4, (O, 3)).astype(np.float32)
    mask = rng.rand(O) > 0.3

    ref = np.asarray(_xla_hit(*map(jnp.asarray, (p0, p1, r, centers, halfs, mask))))
    got = np.asarray(
        capsules_hit(
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(r),
            jnp.asarray(centers), jnp.asarray(halfs), jnp.asarray(mask),
            block=128, interpret=True,
        )
    )
    assert ref.any() and not ref.all()  # non-degenerate scene
    np.testing.assert_array_equal(got, ref)


def test_degenerate_segments_match_xla():
    # zero-length capsules (point robots) and segments far outside boxes
    rng = np.random.RandomState(2)
    B, C, O = 64, 3, 4
    p0 = rng.uniform(-1, 1, (B, C, 3)).astype(np.float32)
    p1 = p0.copy()  # degenerate: v == 0 on every axis
    r = np.full(C, 0.1, np.float32)
    centers = rng.uniform(-1, 1, (O, 3)).astype(np.float32)
    halfs = np.full((O, 3), 0.2, np.float32)
    mask = np.ones(O, bool)

    ref = np.asarray(_xla_hit(*map(jnp.asarray, (p0, p1, r, centers, halfs, mask))))
    got = np.asarray(
        capsules_hit(
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(r),
            jnp.asarray(centers), jnp.asarray(halfs), jnp.asarray(mask),
            block=128, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_gated_batch_state_free_matches_vmap(monkeypatch):
    """GMP_PALLAS_CAPSULE=1 wires batch_state_free into the chain kernels;
    its (free, checks) must equal vmap(state_free) including out-of-limit
    configurations (which count as one check and are never free)."""

    from gnn_motion_planning_tpu.api.registry import str2env
    from gnn_motion_planning_tpu.envs.kuka import chain_state_free, make_chain_kernels

    monkeypatch.setenv("GMP_PALLAS_CAPSULE", "1")
    env, indexes = str2env("kuka7")
    env.init_new_problem(int(indexes[0]))
    kern = make_chain_kernels(env.chain, env.RRT_EPS, 64)
    assert kern.batch_state_free is not None

    rng = np.random.RandomState(3)
    lo, hi = np.asarray(env.chain.lower), np.asarray(env.chain.upper)
    qs = rng.uniform(lo, hi, (64, lo.shape[0])).astype(np.float32)
    qs[::7] = qs[::7] + (hi - lo)  # push some configs out of limits

    free_b, cnt_b = kern.batch_state_free(env._scene, jnp.asarray(qs))
    free_v, cnt_v = jax.vmap(
        lambda q: chain_state_free(env.chain, env._scene, q)
    )(jnp.asarray(qs))
    np.testing.assert_array_equal(np.asarray(free_b), np.asarray(free_v))
    np.testing.assert_array_equal(np.asarray(cnt_b), np.asarray(cnt_v))


@pytest.mark.slow
def test_kuka7_chain_states_match_xla():
    from gnn_motion_planning_tpu.api.registry import str2env
    from gnn_motion_planning_tpu.envs.kinematics import capsules_world

    env, indexes = str2env("kuka7")
    env.init_new_problem(int(indexes[0]))
    chain, scene = env.chain, env._scene
    rng = np.random.RandomState(0)
    lo = np.asarray(chain.lower)
    hi = np.asarray(chain.upper)
    qs = rng.uniform(lo, hi, (96, lo.shape[0])).astype(np.float32)

    p0, p1, r = jax.vmap(lambda q: capsules_world(chain, q))(jnp.asarray(qs))
    args = (p0, p1, r[0], scene.centers, scene.halfs, scene.mask)
    ref = np.asarray(_xla_hit(*args))
    got = np.asarray(capsules_hit(*args, block=128, interpret=True))
    np.testing.assert_array_equal(got, ref)
