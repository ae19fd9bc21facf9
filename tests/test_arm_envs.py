"""Arm/snake env coverage: protocol surface, oracle consistency, counters."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ur5():
    from gnn_motion_planning_tpu.envs import UR5Env

    env = UR5Env()
    env.init_new_problem(2000)
    return env


def test_ur5_protocol(ur5):
    env = ur5
    assert env.config_dim == 6
    assert str(env) == "ur5"
    # shipped start/goal must be free under the calibrated oracle
    assert env._state_fp(env.init_state)
    assert env._state_fp(env.goal_state)
    c0 = env.collision_check_count
    assert c0 == 2
    # edge check counts: endpoints + interior
    free = env._edge_fp(env.init_state, env.init_state + 1e-3)
    assert free
    assert env.collision_check_count > c0
    # step / goal region / interpolate surface
    new_state, action, ok, done = env.step(
        env.init_state, action=np.full(6, 1e-3)
    )
    assert ok
    mid = env.interpolate(env.init_state, env.goal_state, 0.5)
    assert mid.shape == (6,)


def test_ur5_edge_count_semantics(ur5):
    env = ur5
    rng = np.random.RandomState(0)
    # K = int(d / eps), k = 0..K-1 plus two endpoint checks on a free edge
    a = env.init_state
    b = env.interpolate(env.init_state, env.goal_state, 0.02)
    d = float(env.distance(a, b))
    K = int(d / env.RRT_EPS)
    c0 = env.collision_check_count
    free = env._edge_fp(a, b)
    used = env.collision_check_count - c0
    if free:
        assert used == 2 + K, (used, K)


def test_kuka2_state_and_edge():
    from gnn_motion_planning_tpu.envs import Kuka2Env

    try:
        env = Kuka2Env()
    except FileNotFoundError:
        pytest.skip("kuka14 dataset not generated yet")
    env.init_new_problem(2000)
    assert env.config_dim == 14
    assert env._state_fp(env.init_state)
    assert env._state_fp(env.goal_state)
    # arm-arm collision: fold both arms into each other at the center
    q = np.zeros(14)
    q[1] = 1.5   # lean arm 1 toward +x
    q[8] = -1.5  # lean arm 2 toward -x
    centered = env._batch_free(q[None])
    # (not asserting a value — just exercising the cross-arm path)
    assert centered.shape == (1,)


def test_snake_env_protocol():
    from gnn_motion_planning_tpu.envs import SnakeEnv

    try:
        env = SnakeEnv()
    except FileNotFoundError:
        pytest.skip("snake dataset not generated yet")
    env.init_new_problem(0)
    assert env.config_dim == 7
    assert env._state_fp(env.init_state)


def test_snake_config_quirks():
    """The reference maps yaw=q[3] and leaves q[6] unused
    (snake_env.py:118-135) — q[6] must not affect the oracle."""

    from gnn_motion_planning_tpu.envs import SnakeEnv

    env = SnakeEnv(map_file=None)
    occ = np.zeros((15, 15))
    occ[7, 7] = 1
    env.set_problem_data(occ, np.zeros(7), np.ones(7) * 0.1)
    rng = np.random.RandomState(0)
    qs = env.uniform_sample(50)
    qs2 = qs.copy()
    qs2[:, 6] = rng.uniform(-np.pi, np.pi, 50)
    np.testing.assert_array_equal(env._batch_free(qs), env._batch_free(qs2))


def test_snake_grid_scene_matches_full_scan():
    """The 3x3-window grid kernel must agree with the full 225-cell scan
    (exactness argument in SnakeGridScene's docstring)."""

    import jax
    import jax.numpy as jnp

    from gnn_motion_planning_tpu.envs.snake import (
        SnakeEnv,
        make_snake_grid_scene,
        make_snake_scene,
        snake_state_free,
        snake_state_free_grid,
    )

    env = SnakeEnv()
    env.init_new_problem(0)
    old = make_snake_scene(env.map)
    new = make_snake_grid_scene(env.map)
    f_old = jax.jit(jax.vmap(
        lambda q: snake_state_free(
            env.chain, env.pair_mask, old, q, env.lower, env.upper)[0]
    ))
    f_new = jax.jit(jax.vmap(
        lambda q: snake_state_free_grid(
            env.chain, env.pair_mask, new, q, env.lower, env.upper)[0]
    ))
    rng = np.random.RandomState(7)
    pr = np.array(env.pose_range)
    qs = rng.uniform(pr[:, 0], pr[:, 1], (1024, 7)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(f_old(jnp.asarray(qs))), np.asarray(f_new(jnp.asarray(qs)))
    )


def test_snake_straight_bias_sampler():
    """Opt-in narrow-passage sampler (envs/snake.py::_bias_draws): off by
    default (draws untouched), deterministic per-row (the accept-rate
    chunking's stream replay stays exact), support-preserving, and it
    concentrates angle mass near the straight pose."""

    from gnn_motion_planning_tpu.config import set_random_seed
    from gnn_motion_planning_tpu.envs import SnakeEnv

    env = SnakeEnv(map_file=None)
    occ = np.zeros((15, 15))
    occ[7, 7] = 1
    env.set_problem_data(occ, np.zeros(7), np.ones(7) * 0.1)

    # default off: _bias_draws is the identity
    draws = np.random.RandomState(0).uniform(-1, 1, (64, 7))
    np.testing.assert_array_equal(env._bias_draws(draws), draws)

    # reproducible: same seed + bias -> identical samples AND identical
    # downstream stream position (the replay path consumed the same count).
    # Replay re-inits the problem (resets the per-problem draw counter that
    # anchors bias-row selection), exactly like the per-problem eval loop.
    env.sampler_bias = "straight"
    env.set_problem_data(occ, np.zeros(7), np.ones(7) * 0.1)
    env.rng = set_random_seed(7)
    a, na = env.sample_n_points(50, need_negative=True)
    after_a = env.rng.uniform(0.0, 1.0, 3)
    env.set_problem_data(occ, np.zeros(7), np.ones(7) * 0.1)
    env.rng = set_random_seed(7)
    b, nb = env.sample_n_points(50, need_negative=True)
    after_b = env.rng.uniform(0.0, 1.0, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(len(na), len(nb))
    np.testing.assert_array_equal(after_a, after_b)

    # biased rows are squashed toward straight, unbiased rows untouched
    env.sampler_bias = "straight"
    u = np.random.RandomState(1).uniform(-np.pi, np.pi, (90, 7))
    u[:, :2] *= 9.0 / np.pi
    biased = env._bias_draws(u)
    np.testing.assert_array_equal(biased[1], u[1])  # row 1 not a bias row
    sel = np.arange(0, 90, SnakeEnv._BIAS_EVERY)
    assert np.all(np.abs(biased[sel][:, 2:]) <= np.abs(u[sel][:, 2:]) + 1e-12)
    np.testing.assert_array_equal(biased[sel][:, :2], u[sel][:, :2])


def test_snake_corridor_bias_sampler():
    """Corridor-guided sampler (envs/snake.py::_bias_draws "corridor"):
    deterministic per-row (stream replay exact), remapped rows' base (x,y)
    land inside corridor cells joining init and goal, other rows untouched,
    and the corridor BFS routes through the only gap in a wall."""

    from gnn_motion_planning_tpu.config import set_random_seed
    from gnn_motion_planning_tpu.envs import SnakeEnv

    env = SnakeEnv(map_file=None)
    # vertical wall at i=7 with a single gap at j=3
    occ = np.zeros((15, 15))
    occ[7, :] = 1
    occ[7, 3] = 0
    init = np.zeros(7)
    init[:2] = (1.4 * 2 - 10.5, 1.4 * 7 - 10.5)  # cell (2, 7)
    goal = np.zeros(7)
    goal[:2] = (1.4 * 12 - 10.5, 1.4 * 7 - 10.5)  # cell (12, 7)
    env.set_problem_data(occ, init, goal)
    env.sampler_bias = "corridor"

    cells, dirs = env._corridor_cells()
    # the corridor must use the gap cell (7, 3) and never an occupied cell
    gap = (1.4 * 7 - 10.5, 1.4 * 3 - 10.5)
    assert any(np.allclose(c, gap) for c in cells)
    ij = np.round((cells + 10.5) / 1.4).astype(int)
    assert not occ[ij[:, 0], ij[:, 1]].any()
    # directions are unit (or zero at the goal cell / undefined descent)
    nrm = np.hypot(dirs[:, 0], dirs[:, 1])
    assert np.all((np.abs(nrm - 1.0) < 1e-9) | (nrm == 0.0))

    # remapped rows fall in corridor cells; other rows untouched
    u = np.random.RandomState(1).uniform(-np.pi, np.pi, (64, 7))
    u[:, :2] *= 9.0 / np.pi
    biased = env._bias_draws(u)
    np.testing.assert_array_equal(biased[1], u[1])
    sel = np.arange(0, 64, SnakeEnv._CORRIDOR_EVERY)
    bij = np.round((biased[sel][:, :2] + 10.5) / 1.4).astype(int)
    keys = {tuple(r) for r in ij}
    assert all(tuple(r) in keys for r in bij)
    # slab-pose structure: for rows whose cell has a corridor tangent, the
    # angles are exactly slab(delta(phi)) + 0.4*u^3/pi^2 (deterministic in
    # the draw — the stream-replay contract); all within pose bounds
    uu = (u[sel, :2] + 9.0) / 18.0
    c = np.minimum((uu[:, 0] * len(cells)).astype(np.int64), len(cells) - 1)
    d = dirs[c]
    aimed = (d[:, 0] != 0) | (d[:, 1] != 0)
    phi = np.arctan2(d[:, 1], d[:, 0])
    delta = np.mod(np.pi / 2 - phi + np.pi / 2, np.pi) - np.pi / 2
    slab = np.stack([-delta / 2, -delta / 2, 0.75 * delta,
                     0 * delta, 0 * delta], 1)
    expect = slab + 0.4 * u[sel, 2:] ** 3 / np.pi**2
    np.testing.assert_allclose(
        biased[sel][:, 2:][aimed], expect[aimed], atol=1e-12
    )
    assert np.all(np.abs(biased[:, 2:]) <= np.pi)

    # stream-exact under the chunked sampler (replay re-inits the problem,
    # resetting the per-problem draw counter, like the eval loop does)
    env.set_problem_data(occ, init, goal)
    env.rng = set_random_seed(7)
    a, na = env.sample_n_points(50, need_negative=True)
    after_a = env.rng.uniform(0.0, 1.0, 3)
    env.set_problem_data(occ, init, goal)
    env.rng = set_random_seed(7)
    b, nb = env.sample_n_points(50, need_negative=True)
    after_b = env.rng.uniform(0.0, 1.0, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert len(na) == len(nb)
    np.testing.assert_array_equal(after_a, after_b)


def test_snake_corridor_cache_and_chunk_invariance():
    """Regression tests for two round-4 advisor findings (ADVICE.md):

    1. `_corridor_cells` cached on `id(self.map)` — a recycled allocator
       address (or the same map object with new init/goal via
       set_problem_data) could serve the previous problem's corridor.
       Now: explicit invalidation + strong-ref key incl. init/goal.
    2. Bias-row selection was relative to each accept-rate chunk, so the
       same rng stream got different rows biased depending on the EMA
       history. Now: rows come from the absolute per-problem draw count,
       so the biased transform is chunking-independent.
    """

    from gnn_motion_planning_tpu.envs import SnakeEnv

    env = SnakeEnv(map_file=None)
    occ1 = np.zeros((15, 15))
    occ1[7, :] = 1
    occ1[7, 3] = 0
    init = np.zeros(7)
    init[:2] = (1.4 * 2 - 10.5, 1.4 * 7 - 10.5)
    goal = np.zeros(7)
    goal[:2] = (1.4 * 12 - 10.5, 1.4 * 7 - 10.5)
    env.set_problem_data(occ1, init, goal)
    env.sampler_bias = "corridor"
    cells1, _ = env._corridor_cells()

    # same map object, new init/goal -> corridor must be recomputed
    init2 = np.zeros(7)
    init2[:2] = (1.4 * 2 - 10.5, 1.4 * 3 - 10.5)  # cell (2, 3): same side
    goal2 = np.zeros(7)
    goal2[:2] = (1.4 * 2 - 10.5, 1.4 * 11 - 10.5)  # cell (2, 11)
    env.set_problem_data(occ1, init2, goal2)
    cells2, _ = env._corridor_cells()
    assert cells1.shape != cells2.shape or not np.array_equal(cells1, cells2)

    # mutated init/goal without set_problem_data (set_random_init_goal
    # path): the strong-ref key must notice
    env.init_state = init
    env.goal_state = goal
    cells3, _ = env._corridor_cells()
    assert np.array_equal(cells3, cells1)

    # chunk-splitting independence: biasing one 64-row block equals
    # biasing it as 64 single rows at the right offsets
    env.set_problem_data(occ1, init, goal)
    u = np.random.RandomState(3).uniform(-np.pi, np.pi, (64, 7))
    u[:, :2] *= 9.0 / np.pi
    whole = env._bias_draws(u, offset=0)
    rows = np.stack(
        [env._bias_draws(u[i : i + 1], offset=i)[0] for i in range(64)]
    )
    np.testing.assert_array_equal(whole, rows)


def test_kuka_endpoint_bias_sampler():
    """Opt-in endpoint bias (envs/kuka.py::_bias_draws): off by default,
    chunk-independent per-problem row selection, stream-replay exact, and
    biased rows concentrate near init/goal (the kuka13 graph-disconnection
    fix, assets/benchmarks/miss_probe_kuka13.json)."""

    from gnn_motion_planning_tpu.config import set_random_seed
    from gnn_motion_planning_tpu.envs import KukaEnv

    env = KukaEnv()
    env.init_new_problem(2000)

    # default off: identity
    pr = np.array(env.pose_range)
    draws = np.random.RandomState(0).uniform(pr[:, 0], pr[:, 1], (32, 7))
    np.testing.assert_array_equal(env._bias_draws(draws), draws)

    env.sampler_bias = "endpoint"
    biased = env._bias_draws(draws, offset=0)
    every = KukaEnv._ENDPOINT_EVERY
    sel = np.arange(0, 32, every)
    unsel = np.setdiff1d(np.arange(32), sel)
    np.testing.assert_array_equal(biased[unsel], draws[unsel])
    # biased rows are within the shrunk neighborhood of init or goal
    span = pr[:, 1] - pr[:, 0]
    d_init = np.abs(biased[sel] - env.init_state)
    d_goal = np.abs(biased[sel] - env.goal_state)
    near = np.minimum(d_init.max(axis=1) / span.max(),
                      d_goal.max(axis=1) / span.max())
    assert np.all(near <= 0.25 + 1e-12)

    # chunk-splitting independence
    whole = env._bias_draws(draws, offset=0)
    rows = np.stack(
        [env._bias_draws(draws[i : i + 1], offset=i)[0] for i in range(32)]
    )
    np.testing.assert_array_equal(whole, rows)

    # stream-replay exact through the chunked sampler (per-problem reset)
    env.init_new_problem(2000)
    env.rng = set_random_seed(7)
    a, na = env.sample_n_points(50, need_negative=True)
    after_a = env.rng.uniform(0.0, 1.0, 3)
    env.init_new_problem(2000)
    env.rng = set_random_seed(7)
    b, nb = env.sample_n_points(50, need_negative=True)
    after_b = env.rng.uniform(0.0, 1.0, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert len(na) == len(nb)
    np.testing.assert_array_equal(after_a, after_b)
    env.sampler_bias = None
