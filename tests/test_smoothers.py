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
        got_path, got_count, _ = project(
            scene,
            jnp.asarray(old_path),
            jnp.asarray(proposal),
            jnp.int32(n_path),
        )
        assert int(got_count) == want_count, f"trial {trial}"
        np.testing.assert_allclose(
            np.asarray(got_path), want_path, atol=1e-6, err_msg=f"trial {trial}"
        )


def test_cheap_edge_kernel_matches_full_ur5():
    """edge_free_cheap (K_CHEAP interpolation budget, envs/base.py) must be
    bit-identical to edge_free whenever overflow is False, and must raise
    overflow exactly when the decision could depend on points beyond the
    budget (K > K_CHEAP, both endpoints free, no collision found inside)."""

    import jax
    import jax.numpy as jnp

    from gnn_motion_planning_tpu.envs import UR5Env
    from gnn_motion_planning_tpu.envs.base import K_CHEAP

    env = UR5Env()
    env.init_new_problem(0)
    kernels = env.kernels()
    assert kernels.edge_free_cheap is not None  # k_max=289 > K_CHEAP
    scene = env.device_scene()
    full = jax.jit(kernels.edge_free)
    cheap = jax.jit(kernels.edge_free_cheap)

    rng = np.random.default_rng(7)
    lo, hi = np.array(env.pose_range).T
    eps = float(env.RRT_EPS)

    n_short = 0
    for _ in range(30):
        qa = rng.uniform(lo, hi).astype(np.float32)
        # random direction, length spanning below/above the cheap budget
        step = rng.normal(size=len(lo)).astype(np.float32)
        step /= np.linalg.norm(step)
        length = float(rng.uniform(0.2, 2.0 * K_CHEAP * eps))
        qb = np.clip(qa + length * step, lo, hi).astype(np.float32)
        K = int(np.linalg.norm(qb - qa) / eps)

        f_free, f_cnt = full(scene, jnp.asarray(qa), jnp.asarray(qb))
        c_free, c_cnt, c_ovf = cheap(scene, jnp.asarray(qa), jnp.asarray(qb))
        if bool(c_ovf):
            assert K > K_CHEAP  # flag only possible past the budget
            continue
        assert bool(c_free) == bool(f_free)
        assert int(c_cnt) == int(f_cnt)
        if K <= K_CHEAP:
            n_short += 1
    assert n_short >= 5

    # overflow regime: a long segment that stays free — sweep both wrist
    # joints across their range from a known-free pose over an empty scene
    # (in clutter something collides inside the budget, which is exact)
    base = np.asarray(env.init_state, np.float32)
    env.set_problem_data([], base, base)
    empty = env.device_scene()
    qa, qb = base.copy(), base.copy()
    for j in (4, 5):
        qa[j], qb[j] = lo[j] * 0.95, hi[j] * 0.95
    assert int(np.linalg.norm(qb - qa) / eps) > K_CHEAP
    c_free, _, c_ovf = cheap(empty, jnp.asarray(qa), jnp.asarray(qb))
    f_free, _ = full(empty, jnp.asarray(qa), jnp.asarray(qb))
    assert bool(c_ovf) and not bool(c_free) and bool(f_free)


def test_cheap_projection_matches_full_ur5():
    """Projection at the cheap budget must reproduce the full-budget sweep
    bitwise when no overflow is flagged (the production smoothing path:
    eval_gnn get_planner project_core_cheap / fused_smooth)."""

    import jax
    import jax.numpy as jnp

    from gnn_motion_planning_tpu.envs import UR5Env
    from gnn_motion_planning_tpu.planners.gnn_smooth import (
        make_projection_core,
    )

    env = UR5Env()
    env.init_new_problem(0)
    kernels = env.kernels()
    scene = env.device_scene()
    eps = float(env.RRT_EPS)
    full = jax.jit(make_projection_core(kernels, eps))
    cheap = jax.jit(make_projection_core(kernels, eps, cheap=True))

    rng = np.random.default_rng(3)
    lo, hi = np.array(env.pose_range).T
    L, n_path = 8, 6
    hit_clean = False
    for trial in range(4):
        base = rng.uniform(lo, hi).astype(np.float32)
        old = np.clip(
            base + np.cumsum(
                rng.normal(0, 0.8, (L, len(lo))).astype(np.float32), axis=0
            ),
            lo, hi,
        )
        proposal = np.clip(
            old + rng.normal(0, 0.5, old.shape).astype(np.float32), lo, hi
        )
        a = (scene, jnp.asarray(old), jnp.asarray(proposal), jnp.int32(n_path))
        fp, fc, fo = full(*a)
        cp, cc, co = cheap(*a)
        assert not bool(fo)  # full budget never overflows
        if bool(co):
            continue  # long segment: caller redoes with full — nothing to pin
        hit_clean = True
        assert int(cc) == int(fc), f"trial {trial}"
        assert np.array_equal(np.asarray(cp), np.asarray(fp)), f"trial {trial}"
    assert hit_clean


def test_flat_projection_matches_full_ur5():
    """The flat-packed projection (make_projection_core_flat — exactly the
    counted states per sweep step in one dense batch) must reproduce the
    full dense sweep bitwise: same waypoints, same counts, no overflow at
    the default slot budget on realistic paths."""

    import jax
    import jax.numpy as jnp

    from gnn_motion_planning_tpu.envs import UR5Env
    from gnn_motion_planning_tpu.planners.gnn_smooth import (
        make_projection_core,
        make_projection_core_flat,
    )

    env = UR5Env()
    env.init_new_problem(0)
    kernels = env.kernels()
    scene = env.device_scene()
    eps = float(env.RRT_EPS)
    full = jax.jit(make_projection_core(kernels, eps))
    flat = jax.jit(make_projection_core_flat(kernels, eps))

    rng = np.random.default_rng(11)
    lo, hi = np.array(env.pose_range).T
    L = 8
    n_clean = 0
    for trial in range(4):
        n_path = int(rng.integers(3, L + 1))
        base = rng.uniform(lo, hi).astype(np.float32)
        old = np.clip(
            base + np.cumsum(
                rng.normal(0, 0.7, (L, len(lo))).astype(np.float32), axis=0
            ),
            lo, hi,
        )
        proposal = np.clip(
            old + rng.normal(0, 0.5, old.shape).astype(np.float32), lo, hi
        )
        a = (scene, jnp.asarray(old), jnp.asarray(proposal), jnp.int32(n_path))
        fp, fc, fo = full(*a)
        gp, gc, go = flat(*a)
        assert not bool(fo)
        if bool(go):
            continue  # slot overflow: caller redoes with full — fine
        n_clean += 1
        assert int(gc) == int(fc), f"trial {trial}"
        assert np.array_equal(np.asarray(gp), np.asarray(fp)), f"trial {trial}"
    assert n_clean >= 3

    # tiny slot budget must raise the overflow flag on a long path
    tiny = jax.jit(make_projection_core_flat(kernels, eps, slots=64))
    n_path = 6
    old = np.clip(
        base + np.cumsum(
            rng.normal(0, 1.2, (L, len(lo))).astype(np.float32), axis=0
        ),
        lo, hi,
    )
    proposal = np.clip(
        old + rng.normal(0, 1.0, old.shape).astype(np.float32), lo, hi
    )
    _, _, ov = tiny(
        scene, jnp.asarray(old), jnp.asarray(proposal), jnp.int32(n_path)
    )
    assert bool(ov)
