"""Property tests for the geometry/oracle layer (SURVEY §4: property tests
the reference never had — metric symmetry, interpolation endpoints, oracle
self-consistency)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_motion_planning_tpu.api.registry import str2env


def _rand_states(env, n, seed=0):
    rng = np.random.RandomState(seed)
    pr = np.array(env.pose_range, float) if hasattr(env, "pose_range") else None
    if pr is None:
        return rng.uniform(-1, 1, (n, env.config_dim))
    return rng.uniform(pr[:, 0], pr[:, 1], (n, pr.shape[0]))


@pytest.mark.parametrize("name", ["maze2easy", "maze3", "kuka7", "snake7"])
def test_interpolate_endpoints(name):
    env, idx = str2env(name)
    env.init_new_problem(int(idx[0]))
    a, b = _rand_states(env, 2)
    start = np.asarray(env.interpolate(a, b, 0.0), float).reshape(-1)
    end = np.asarray(env.interpolate(a, b, 1.0), float).reshape(-1)
    # envs clip/wrap into the valid range; a and b are drawn inside it
    np.testing.assert_allclose(start, a, atol=1e-6)
    np.testing.assert_allclose(end, b, atol=1e-6)


def test_maze_distance_symmetric():
    env, idx = str2env("maze2easy")
    env.init_new_problem(int(idx[0]))
    rng = np.random.RandomState(1)
    for _ in range(20):
        a, b = rng.uniform(-1, 1, (2, 2))
        np.testing.assert_allclose(env.distance(a, b), env.distance(b, a))


@pytest.mark.parametrize(
    "name", ["maze2easy", pytest.param("kuka7", marks=pytest.mark.slow)]
)
def test_degenerate_edge_matches_state_check(name):
    """edge_free(a, a) agrees with the state oracle at a."""

    env, idx = str2env(name)
    env.init_new_problem(int(idx[0]))
    kernels = env.kernels()
    scene = env.device_scene()
    states = jnp.asarray(_rand_states(env, 32), jnp.float32)
    sf, _ = jax.vmap(lambda q: kernels.state_free(scene, q))(states)
    ef, _ = jax.vmap(lambda q: kernels.edge_free(scene, q, q))(states)
    np.testing.assert_array_equal(np.asarray(sf), np.asarray(ef))


@pytest.mark.parametrize(
    "name", ["maze2easy", pytest.param("kuka7", marks=pytest.mark.slow)]
)
def test_free_edge_implies_free_endpoints(name):
    env, idx = str2env(name)
    env.init_new_problem(int(idx[0]))
    kernels = env.kernels()
    scene = env.device_scene()
    a = jnp.asarray(_rand_states(env, 64, seed=2), jnp.float32)
    b = jnp.asarray(_rand_states(env, 64, seed=3), jnp.float32)
    ef, cnt = jax.vmap(lambda x, y: kernels.edge_free(scene, x, y))(a, b)
    sa, _ = jax.vmap(lambda q: kernels.state_free(scene, q))(a)
    sb, _ = jax.vmap(lambda q: kernels.state_free(scene, q))(b)
    ef, sa, sb = map(np.asarray, (ef, sa, sb))
    assert not np.any(ef & ~(sa & sb))
    # every valid-input check costs at least one counted oracle call
    assert np.all(np.asarray(cnt) >= 1)


def test_collision_count_parity_host_device():
    """Host mirror and device kernel agree on decisions AND counts for the
    same random edges (the paper's primary metric)."""

    env, idx = str2env("maze2easy")
    env.init_new_problem(int(idx[0]))
    kernels = env.kernels()
    scene = env.device_scene()
    rng = np.random.RandomState(4)
    a = rng.uniform(-1, 1, (32, 2))
    b = rng.uniform(-1, 1, (32, 2))
    df, dc = jax.vmap(lambda x, y: kernels.edge_free(scene, jnp.asarray(x), jnp.asarray(y)))(
        jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
    )
    for i in range(32):
        c0 = env.collision_check_count
        hf = env._edge_fp(a[i], b[i])
        hc = env.collision_check_count - c0
        assert bool(np.asarray(df)[i]) == bool(hf), i
        assert int(np.asarray(dc)[i]) == hc, i
