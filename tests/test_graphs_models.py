"""Unit tests: kNN graph semantics, model padding invariance, Dijkstra."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gnn_motion_planning_tpu.graphs.knn import build_rgg_edges, dedup_edges, k_scaled
from gnn_motion_planning_tpu.graphs.knn_host import knn_graph_numpy
from gnn_motion_planning_tpu.models.explorer import ExplorerConfig, explorer_forward, init_explorer_params
from gnn_motion_planning_tpu.planners.dijkstra import dijkstra, dijkstra_dense


def test_k_scaled_matches_reference_formula():
    # eval_gnn.py:159: k1 = ceil(k * log(len(free)) / log(100))
    assert k_scaled(30, 502) == int(np.ceil(30 * np.log(502) / np.log(100)))
    assert k_scaled(10, 100) == 10


def test_dedup_edges_sorted_unique():
    src = jnp.asarray([3, 1, 3, 0, 2], jnp.int32)
    dst = jnp.asarray([1, 2, 1, 0, 2], jnp.int32)
    alive = jnp.asarray([True, True, True, True, False])
    out = dedup_edges(src, dst, alive, n=4)
    live = np.asarray(out.alive)
    pairs = sorted(zip(np.asarray(out.src)[live], np.asarray(out.dst)[live]))
    assert pairs == [(0, 0), (1, 2), (3, 1)]


def test_build_rgg_edges_vs_host_bruteforce():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, (40, 2)).astype(np.float32)
    valid = np.ones(40, bool)
    out = build_rgg_edges(jnp.asarray(pts), jnp.asarray(valid), n_free=40, k1=5)
    live = np.asarray(out.alive)
    got = set(zip(np.asarray(out.src)[live].tolist(), np.asarray(out.dst)[live].tolist()))
    want = set(map(tuple, knn_graph_numpy(pts, 5, loop=True).tolist()))
    # float32 rounding may flip near-ties at the k-th-neighbour boundary;
    # any disagreement must be such a tie
    d = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    for a, b in got.symmetric_difference(want):
        kth = np.sort(d[a])[4]
        kth_b = np.sort(d[b])[4]
        assert min(abs(d[a, b] - kth), abs(d[a, b] - kth_b)) < 1e-3, (a, b)
    assert len(got.symmetric_difference(want)) <= 4


@pytest.mark.slow
def test_explorer_padding_invariance():
    """Dead padding nodes/edges must not change live policy entries."""

    cfg = ExplorerConfig(workspace_size=2, config_size=2, embed_size=16, obs_size=2)
    params = init_explorer_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    n, e, m = 12, 40, 5
    v = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    goal = v[1]
    src = rng.randint(0, n, e).astype(np.int32)
    dst = rng.randint(0, n, e).astype(np.int32)
    obstacles = rng.uniform(-1, 1, (m, 2)).astype(np.float32)

    def run(n_pad, e_pad, m_pad):
        vp = np.zeros((n_pad, 2), np.float32)
        vp[:n] = v
        valid = np.zeros(n_pad, bool)
        valid[:n] = True
        sp = np.zeros(e_pad, np.int32)
        dp = np.zeros(e_pad, np.int32)
        ap = np.zeros(e_pad, bool)
        sp[:e], dp[:e], ap[:e] = src, dst, True
        op = np.zeros((m_pad, 2), np.float32)
        op[:m] = obstacles
        om = np.zeros(m_pad, bool)
        om[:m] = True
        pol = explorer_forward(
            params, cfg, jnp.asarray(vp), jnp.asarray(valid), jnp.asarray(goal),
            jnp.asarray(sp), jnp.asarray(dp), jnp.asarray(ap),
            jnp.asarray(op), jnp.asarray(om), loop=3,
        )
        return np.asarray(pol)[:n, :n]

    a = run(n, e, m)
    b = run(n + 7, e + 33, m + 9)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_dijkstra_dense_matches_dict():
    rng = np.random.RandomState(0)
    n = 30
    pts = rng.uniform(-1, 1, (n, 2))
    ei = knn_graph_numpy(pts, 4, loop=False)
    cost = np.linalg.norm(pts[ei[:, 0]] - pts[ei[:, 1]], axis=-1)

    from collections import defaultdict

    edges = defaultdict(list)
    costs = defaultdict(list)
    for (a, b), c in zip(ei, cost):
        edges[int(a)].append(int(b))
        costs[int(a)].append(float(c))
    dist_dict, _ = dijkstra(list(range(n)), edges, costs, 0)
    dist_dense, _ = dijkstra_dense(n, ei, cost, 0)
    got = np.array([dist_dict[i] for i in range(n)])
    np.testing.assert_allclose(
        np.where(np.isfinite(got), got, 1e18),
        np.where(np.isfinite(dist_dense), dist_dense, 1e18),
        rtol=1e-9,
    )
