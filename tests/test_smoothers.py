"""Oracle smoothers: feasibility preserved, cost non-increasing."""

import numpy as np
import pytest

from gnn_motion_planning_tpu.api import explore, str2env, str2name
from gnn_motion_planning_tpu.config import set_random_seed
from gnn_motion_planning_tpu.planners.oracle_smoother import (
    interpolate_path,
    joint_smoother,
    joint_smoother_ratio,
    path_cost,
    prune_path,
    random_path_smoother,
)


@pytest.fixture(scope="module")
def maze_path():
    env, _ = str2env("maze2easy")
    _, model, _, model_s, _ = str2name("maze2easy")
    env.rng = set_random_seed(3)
    for index in range(2001, 2010):
        env.init_new_problem(index)
        result = explore(env, model, model_s, smooth=False, batch=200, t_max=200)
        if result != [] and len(result[0]) > 2:
            path = result[0]
            return env, [tuple(np.asarray(p, np.float64)) for p in path]
    pytest.fail("no multi-waypoint path found on any probe problem")


def _feasible(env, path):
    return all(
        env._edge_fp(np.asarray(a), np.asarray(b))
        for a, b in zip(path[:-1], path[1:])
    )


def test_random_path_smoother(maze_path):
    env, path = maze_path
    out = random_path_smoother(path, env.RRT_EPS, env, iter=50)
    assert _feasible(env, out)
    assert path_cost(out) <= path_cost(path) + 1e-9


def test_prune_path(maze_path):
    env, path = maze_path
    out = prune_path(list(path), env, iter=10)
    assert _feasible(env, out)
    assert path_cost(out) <= path_cost(path) + 1e-9


def test_joint_smoother(maze_path):
    env, path = maze_path
    out = joint_smoother(list(path), env, iter=2, random_iter=30, prune_iter=10)
    assert _feasible(env, out)
    assert path_cost(out) <= path_cost(path) + 1e-9


def test_joint_smoother_ratio_keeps_length(maze_path):
    env, path = maze_path
    out = joint_smoother_ratio(list(path), env, iter=2, random_iter=30, prune_iter=10)
    # training target keeps the waypoint count (train_smoother MSE aligns them)
    assert len(out) == len(path)
    assert path_cost(out) <= path_cost(path) + 1e-9


def test_interpolate_path(maze_path):
    env, path = maze_path
    dense = interpolate_path(env, path)
    assert len(dense) >= len(path)
    steps = [
        np.linalg.norm(np.asarray(b) - np.asarray(a))
        for a, b in zip(dense[:-1], dense[1:])
    ]
    assert max(steps) <= env.RRT_EPS + 1e-9


def test_projection_matches_sequential_sweep(maze_path):
    """The batched projection sweep (gnn_smooth._body_step hoists the edge
    checks out of the Gauss-Seidel chain) must be bit-identical to a
    straightforward sequential implementation of the reference semantics
    (proposed_path_smootherv2, reference smoother.py:194-216): same
    accepted nodes, same waypoints, same check counts."""

    import jax.numpy as jnp

    from gnn_motion_planning_tpu.planners.gnn_smooth import make_projection

    env, path = maze_path
    kernels = env.kernels()
    scene = env.device_scene()
    eps = float(env.RRT_EPS)
    project = make_projection(kernels, eps)

    rng = np.random.default_rng(0)
    L = 16
    for trial in range(4):
        n_path = int(rng.integers(4, L + 1))
        old = np.asarray(path[0], np.float32) + 0.0  # anchor in-bounds
        old_path = rng.uniform(-1, 1, (L, len(old))).astype(np.float32)
        proposal = old_path + rng.normal(0, 0.3, old_path.shape).astype(
            np.float32
        )

        # sequential reference sweep (host, same kernels)
        def seq_project(old_path, new_path, n_path):
            pth = old_path.copy()
            count = 0
            K = int(
                np.ceil(
                    np.max(
                        np.linalg.norm(pth - new_path, axis=-1)[:n_path]
                    )
                    / eps
                )
            )
            for _ in range(K):
                prev_val = pth[0]
                diff = 0.0
                base = pth.copy()
                for i in range(L):
                    old_n = base[i]
                    new_n = new_path[i]
                    dist = np.linalg.norm(old_n - new_n)
                    if dist < eps:
                        cand = new_n
                    else:
                        cand = np.asarray(
                            kernels.interpolate(
                                jnp.asarray(old_n),
                                jnp.asarray(new_n),
                                eps / max(dist, 1e-30),
                            )
                        )
                    nxt = base[min(i + 1, L - 1)]
                    ok1, c1 = kernels.edge_free(
                        scene, jnp.asarray(prev_val), jnp.asarray(cand)
                    )
                    ok2, c2 = kernels.edge_free(
                        scene, jnp.asarray(nxt), jnp.asarray(cand)
                    )
                    ok1, ok2, c1, c2 = bool(ok1), bool(ok2), int(c1), int(c2)
                    interior = 1 <= i <= n_path - 2
                    acc = interior and ok1 and ok2
                    out_val = cand if acc else old_n
                    if interior:
                        count += c1 + (c2 if ok1 else 0)
                    if acc:
                        diff += float(np.linalg.norm(out_val - new_n))
                    pth[i] = out_val
                    prev_val = out_val
                if diff < 1e-5:
                    break
            return pth, count

        want_path, want_count = seq_project(old_path, proposal, n_path)
        got_path, got_count = project(
            scene,
            jnp.asarray(old_path),
            jnp.asarray(proposal),
            jnp.int32(n_path),
        )
        assert int(got_count) == want_count, f"trial {trial}"
        np.testing.assert_allclose(
            np.asarray(got_path), want_path, atol=1e-6, err_msg=f"trial {trial}"
        )
