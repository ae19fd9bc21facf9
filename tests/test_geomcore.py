"""Native geometry core agrees with the device kernels (kuka oracle)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def kuka_with_native():
    from gnn_motion_planning_tpu.envs.kuka import KukaEnv
    from gnn_motion_planning_tpu.utils.geomcore import GeomChain

    env = KukaEnv()
    env.init_new_problem(2000)
    native = GeomChain(env.chain, env.RRT_EPS)
    centers = np.stack([np.asarray(b, np.float64) for _, b in env.obstacles])
    halfs = np.stack([np.asarray(h, np.float64) for h, _ in env.obstacles])
    native.set_scene(centers, halfs)
    return env, native


def test_state_free_agreement(kuka_with_native):
    env, native = kuka_with_native
    rng = np.random.RandomState(0)
    qs = env.uniform_sample(300)
    dev = env._batch_free(qs)
    nat, cnt = native.states_free(qs)
    # float32 (device) vs float64 (native) may disagree only at contact
    # boundaries; demand > 99.5% agreement
    agree = (dev == nat).mean()
    assert agree > 0.995, agree
    assert (cnt == 1).all()


def test_edge_free_agreement(kuka_with_native):
    env, native = kuka_with_native
    rng = np.random.RandomState(1)
    qs = env.uniform_sample(40)
    mismatches = 0
    for i in range(0, 40, 2):
        a, b = qs[i], qs[i + 1]
        c0 = env.collision_check_count
        dev = env._edge_fp(a, b)
        dev_cnt = env.collision_check_count - c0
        nat, nat_cnt = native.edge_free(a, b)
        if dev != nat:
            mismatches += 1
        else:
            assert abs(dev_cnt - nat_cnt) <= 2, (dev_cnt, nat_cnt)
    assert mismatches <= 1


@pytest.fixture(scope="module")
def kuka2_with_native():
    from gnn_motion_planning_tpu.envs.kuka2 import Kuka2Env

    env = Kuka2Env()
    env.init_new_problem(2000)
    assert env._native is not None, "dual native core failed to build"
    return env


def test_dual_state_free_agreement(kuka2_with_native):
    import jax
    import jax.numpy as jnp

    env = kuka2_with_native
    kern = env.kernels()
    scene = env.device_scene()
    qs = env.uniform_sample(200)
    dev, dev_cnt = jax.vmap(lambda q: kern.state_free(scene, q))(
        jnp.asarray(qs, jnp.float32)
    )
    nat, cnt = env._native.states_free(qs)
    agree = (np.asarray(dev) == nat).mean()
    assert agree > 0.995, agree
    np.testing.assert_array_equal(np.asarray(dev_cnt), cnt)


def test_dual_edge_free_agreement(kuka2_with_native):
    import jax.numpy as jnp

    env = kuka2_with_native
    env._ensure_batch_fns()
    qs = env.uniform_sample(30)
    scene = env.device_scene()
    mismatches = 0
    for i in range(0, 30, 2):
        a, b = qs[i], qs[i + 1]
        dev, dev_cnt = env._edge_fp_dev(
            scene, jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
        )
        nat, nat_cnt = env._native.edge_free(a, b)
        if bool(dev) != nat:
            mismatches += 1
        else:
            assert abs(int(dev_cnt) - nat_cnt) <= 2, (int(dev_cnt), nat_cnt)
    assert mismatches <= 1
