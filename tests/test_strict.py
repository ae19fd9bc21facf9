"""Strict (hull-surface) verifier: soundness and benchmark-path feasibility.

The capsule oracle is an approximation of the reference's PyBullet mesh
collision (reference kuka_env.py:354-411); these tests pin (a) that the
strict checker agrees with ground truth on the shipped known-free
configurations, and (b) that paths the planner actually returns are
hull-exactly collision-free.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def kuka_strict():
    from gnn_motion_planning_tpu.envs import KukaEnv
    from gnn_motion_planning_tpu.envs.strict import (
        build_surface_points,
        make_strict_hit,
    )

    env = KukaEnv()
    sp = build_surface_points(
        env.model, "assets/kuka_iiwa/model_0.urdf", spacing=0.01
    )
    return env, make_strict_hit(env.chain, sp)


def test_strict_free_on_known_free_configs(kuka_strict):
    """Dataset starts/goals are PyBullet-verified free (kuka_env.py:85):
    the sound strict checker must never flag them."""

    import jax
    import jax.numpy as jnp

    env, strict = kuka_strict
    batch = jax.jit(lambda sc, qs: jax.vmap(lambda q: strict(sc, q))(qs))
    for idx in range(2000, 2016):
        env.init_new_problem(idx)
        qs = np.stack([env.init_state, env.goal_state]).astype(np.float32)
        hits = np.asarray(batch(env.device_scene(), jnp.asarray(qs)))
        assert not hits.any(), f"strict hit on known-free config, problem {idx}"


def test_strict_detects_gross_contact(kuka_strict):
    """A configuration whose capsules deeply penetrate a box must be
    strict-hit too (the checker is not vacuous)."""

    import jax.numpy as jnp

    env, strict = kuka_strict
    # build a fake scene: one huge box swallowing the robot base
    from gnn_motion_planning_tpu.envs.kuka import make_box_scene

    scene = make_box_scene([((1.0, 1.0, 1.0), (0.0, 0.0, 0.5))])
    q = jnp.zeros(env.config_dim, jnp.float32)
    assert bool(strict(scene, q))


@pytest.mark.slow
def test_planned_paths_strict_feasible(kuka_strict):
    """Smoothed paths returned by the production pipeline must be
    hull-exactly collision-free (VERDICT r2 item 5)."""

    from gnn_motion_planning_tpu.api.eval_gnn import explore
    from gnn_motion_planning_tpu.api.registry import str2name
    from gnn_motion_planning_tpu.config import problem_rng
    from gnn_motion_planning_tpu.envs.strict import validate_path_strict

    env, strict = kuka_strict
    _, model, _, model_s, _ = str2name("kuka7")
    checked = 0
    for idx in range(2000, 2006):
        env.rng = problem_rng(1234, idx)
        env.init_new_problem(idx)
        r = explore(env, model, model_s, smooth=True, batch=200, t_max=200)
        if not r["success"]:
            continue
        hits = validate_path_strict(env, r["smooth_path"], strict)
        assert hits == 0, f"problem {idx}: {hits} strict-hit path states"
        checked += 1
    assert checked >= 3
