"""jit-vs-eager consistency of the core kernels + NaN guards."""

import jax.numpy as jnp
import numpy as np
import pytest

from gnn_motion_planning_tpu.envs.maze import MazeEnv, edge_free_2d
from gnn_motion_planning_tpu.utils.debug import assert_finite, jit_eager_consistent


def test_maze_edge_kernel_jit_eager():
    env = MazeEnv(dim=2)
    env.init_new_problem(2000)
    occ = jnp.asarray(env.map)
    a = jnp.asarray([-0.8, -0.8], jnp.float32)
    b = jnp.asarray([0.7, 0.6], jnp.float32)
    assert jit_eager_consistent(lambda x, y: edge_free_2d(occ, x, y), a, b)


def test_assert_finite_raises():
    with pytest.raises(FloatingPointError):
        assert_finite({"x": jnp.asarray([1.0, np.nan])})
    assert_finite({"x": jnp.asarray([1.0, 2.0])})


def test_env_oracle_timer_tags():
    """Env oracles carry the reference timer taxonomy
    (kuka_env.py:373-410: VERTEX_CHECK / EDGE_CHECK brackets)."""

    import numpy as np

    from gnn_motion_planning_tpu.api.registry import str2env
    from gnn_motion_planning_tpu.utils.timer import Timer

    env, idx = str2env("maze2easy")
    env.init_new_problem(int(idx[0]))
    env._state_fp(np.asarray(env.init_state))
    env._edge_fp(np.asarray(env.init_state), np.asarray(env.goal_state))
    tags = {a for _, _, a in env.timer.log}
    assert Timer.VERTEX_CHECK in tags
    assert Timer.EDGE_CHECK in tags
    assert env.timer.total(Timer.EDGE_CHECK) > 0
    pretty = env.timer.pretty()
    assert "edge_check" in pretty
    env.timer.clear()
    assert env.timer.log == []
