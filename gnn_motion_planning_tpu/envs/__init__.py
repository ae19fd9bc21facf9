"""Batched, stateless environment geometry for TPU motion planning.

Each environment provides two faces:

* a **host wrapper class** with the reference's duck-typed env protocol
  (``init_new_problem``, ``sample_n_points``, ``_state_fp``/``_edge_fp``,
  ``distance``/``interpolate``/``in_goal_region``/``step``,
  ``collision_check_count`` — reference: environment/maze_env.py,
  environment/kuka_env.py) so drivers, baselines, and tests are drop-in
  compatible; and
* a **device kernel set** (pure jittable functions over a pytree "scene")
  used inside fully-compiled planner loops, replacing the reference's
  per-configuration PyBullet calls with batched JAX/Pallas geometry.
"""

_LAZY = {
    "MazeEnv": "gnn_motion_planning_tpu.envs.maze",
    "KukaEnv": "gnn_motion_planning_tpu.envs.kuka",
    "Kuka2Env": "gnn_motion_planning_tpu.envs.kuka2",
    "SnakeEnv": "gnn_motion_planning_tpu.envs.snake",
    "UR5Env": "gnn_motion_planning_tpu.envs.ur5",
}

__all__ = list(_LAZY)

# reference environment/__init__.py:8
strs = ["maze2", "kuka7", "snake7", "kuka13", "ur5", "kuka14"]


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(name)
