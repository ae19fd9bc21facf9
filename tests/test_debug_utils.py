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
