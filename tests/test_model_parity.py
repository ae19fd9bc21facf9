"""Full-model golden parity against the reference's own forward code.

The reference model definitions (reference model.py:115-150,
model_smoother.py:104-142, next_model/model2D.py:151-210,
model3D.py:154-214) are imported directly from /root/reference and executed
in plain torch: the torch_geometric / torch_scatter / torch_sparse
primitives they use at forward time (MessagePassing aggregation, knn,
coalesce) are stubbed with exact plain-torch equivalents, so the goldens
here are produced by the reference's unmodified forward code running the
shipped checkpoints. Every checkpoint family's converted-weight JAX forward
must reproduce them.

This is the whole-model complement to tests/test_torch_parity.py's
layer-level pins (round-3 verdict task 1).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gnn_motion_planning_tpu.models.convert import load_params

# ---------------------------------------------------------------------------
# plain-torch stubs for the PyG primitives the reference forwards use
# ---------------------------------------------------------------------------


def _install_pyg_stubs():
    if "torch_geometric" in sys.modules:
        return

    class MessagePassing(torch.nn.Module):
        """Minimal PyG MessagePassing: source_to_target flow, max/add aggr,
        empty segments = 0 (torch_scatter semantics)."""

        def __init__(self, aggr="max", **kwargs):
            super().__init__()
            self.aggr = aggr

        def propagate(self, edge_index, x=None, edge_attr=None):
            xs, xd = x if isinstance(x, tuple) else (x, x)
            src, dst = edge_index[0], edge_index[1]
            kwargs = {"x_i": xd[dst], "x_j": xs[src]}
            if edge_attr is not None:
                kwargs["edge_attr"] = edge_attr
            import inspect

            accepted = inspect.signature(self.message).parameters
            msg = self.message(**{k: v for k, v in kwargs.items() if k in accepted})
            out = torch.zeros(xd.shape[0], msg.shape[-1], dtype=msg.dtype)
            idx = dst[:, None].expand_as(msg)
            if self.aggr == "max":
                return out.scatter_reduce(0, idx, msg, "amax", include_self=False)
            if self.aggr == "add":
                return out.scatter_reduce(0, idx, msg, "sum", include_self=True)
            raise NotImplementedError(self.aggr)

    def knn(x, y, k):
        """For each y[i], the k nearest rows of x: [2, len(y)*k] with row 0
        an index into y and row 1 an index into x (PyG nn.pool.knn)."""

        d = torch.cdist(y.float(), x.float())
        idx = d.topk(min(k, x.shape[0]), largest=False).indices
        row = torch.arange(len(y))[:, None].expand_as(idx)
        return torch.stack([row.reshape(-1), idx.reshape(-1)]).long()

    def coalesce(edge_index, value, m, n):
        ids = edge_index[0].long() * n + edge_index[1].long()
        ids = torch.unique(ids, sorted=True)
        return torch.stack([ids // n, ids % n]), value

    def _unused(*a, **k):
        raise NotImplementedError("stubbed PyG symbol not used by forwards")

    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_conv = types.ModuleType("torch_geometric.nn.conv")
    tg_pool = types.ModuleType("torch_geometric.nn.pool")
    tg_consec = types.ModuleType("torch_geometric.nn.pool.consecutive")
    tg_utils = types.ModuleType("torch_geometric.utils")
    t_sparse = types.ModuleType("torch_sparse")
    t_scatter = types.ModuleType("torch_scatter")
    nets = types.ModuleType("nets")

    tg_conv.MessagePassing = MessagePassing
    tg_nn.MessagePassing = MessagePassing
    tg_nn.knn = knn
    tg_pool.knn = knn
    for name in ("voxel_grid", "radius_graph", "knn_graph", "GraphConv"):
        setattr(tg_nn, name, _unused)
    tg_consec.consecutive_cluster = _unused
    for name in ("grid", "add_self_loops", "remove_self_loops", "softmax"):
        setattr(tg_utils, name, _unused)
    t_sparse.coalesce = coalesce
    for name in ("scatter_mean", "scatter_max", "scatter_add"):
        setattr(t_scatter, name, _unused)
    for name in ("GATConv", "EdgePooling", "ASAPooling", "SAModule", "FPModule", "MLP"):
        setattr(nets, name, _unused)

    tg.nn = tg_nn
    tg_nn.conv = tg_conv
    tg_nn.pool = tg_pool
    sys.modules.update(
        {
            "torch_geometric": tg,
            "torch_geometric.nn": tg_nn,
            "torch_geometric.nn.conv": tg_conv,
            "torch_geometric.nn.pool": tg_pool,
            "torch_geometric.nn.pool.consecutive": tg_consec,
            "torch_geometric.utils": tg_utils,
            "torch_sparse": t_sparse,
            "torch_scatter": t_scatter,
            "nets": nets,
        }
    )


def _import_by_path(modname, path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref(reference_path):
    """The reference model modules, imported with plain-torch stubs."""

    _install_pyg_stubs()
    env_config = _import_by_path(
        "_ref_env_config", reference_path / "environment" / "env_config.py"
    )
    # model2D does `from environment import LIMITS`
    env_stub = types.ModuleType("environment")
    env_stub.LIMITS = env_config.LIMITS
    sys.modules.setdefault("environment", env_stub)

    ns = types.SimpleNamespace(LIMITS=env_config.LIMITS)
    ns.model = _import_by_path("_ref_model", reference_path / "model.py")
    ns.smoother = _import_by_path(
        "_ref_model_smoother", reference_path / "model_smoother.py"
    )
    ns.next2d = _import_by_path(
        "_ref_next2d", reference_path / "next_model" / "model2D.py"
    )
    ns.next3d = _import_by_path(
        "_ref_next3d", reference_path / "next_model" / "model3D.py"
    )
    return ns


def _torch_state_dict(ckpt):
    from gnn_motion_planning_tpu.utils.assets import asset_path

    return torch.load(asset_path(ckpt), map_location="cpu", weights_only=True)


def _edges(rng, n, extra=300):
    """Directed edge list: all self-loops + random pairs (dedup'd)."""

    src = np.concatenate([np.arange(n), rng.randint(0, n, extra)])
    dst = np.concatenate([np.arange(n), rng.randint(0, n, extra)])
    ids = np.unique(src * n + dst)
    return (ids // n).astype(np.int64), (ids % n).astype(np.int64)


# ---------------------------------------------------------------------------
# explorer: all 7 checkpoint families
# ---------------------------------------------------------------------------

EXPLORERS = [
    # (family, ckpt, config_size, embed_size, obs_size)
    ("maze2", "data/weights/weights_maze.pt", 2, 32, 2),
    ("maze3", "data/weights/weights_maze_3.pt", 3, 32, 2),
    ("kuka7", "data/weights/weights_kuka.pt", 7, 64, 6),
    ("ur5", "data/weights/weights_ur5.pt", 6, 32, 6),
    ("snake7", "data/weights/weights_snake.pt", 7, 32, 2),
    ("kuka13", "data/weights/weights_kuka_13.pt", 13, 32, 6),
    ("kuka14", "data/weights/kuka_14.pt", 14, 32, 6),
]


@pytest.mark.parametrize("family,ckpt,d,e,obs_size", EXPLORERS)
def test_explorer_forward_matches_reference(ref, family, ckpt, d, e, obs_size):
    import jax.numpy as jnp

    from gnn_motion_planning_tpu.models.explorer import (
        ExplorerConfig,
        explorer_forward,
    )

    rng = np.random.RandomState(7)
    n, m, loop = 60, 9, 5
    v = rng.uniform(-1, 1, (n, d)).astype(np.float32)
    goal = v[1]
    obstacles = rng.uniform(-1, 1, (m, obs_size)).astype(np.float32)
    src, dst = _edges(rng, n)

    # reference golden (its own forward code, shipped weights)
    tm = ref.model.EncoderProcessDecoder(
        workspace_size=2, config_size=d, embed_size=e, obs_size=obs_size
    )
    tm.load_state_dict(_torch_state_dict(ckpt))
    tm.eval()
    with torch.no_grad():
        golden = tm(
            goal=torch.tensor(goal),
            loop=loop,
            v=torch.tensor(v),
            obstacles=torch.tensor(obstacles),
            free=None,
            collided=None,
            edge_index=torch.tensor(np.stack([src, dst])),
        ).numpy()

    cfg = ExplorerConfig(
        workspace_size=2, config_size=d, embed_size=e, obs_size=obs_size
    )
    got = np.asarray(
        explorer_forward(
            load_params(ckpt),
            cfg,
            jnp.asarray(v),
            jnp.ones(n, bool),
            jnp.asarray(goal),
            jnp.asarray(src, jnp.int32),
            jnp.asarray(dst, jnp.int32),
            jnp.ones(len(src), bool),
            jnp.asarray(obstacles),
            jnp.ones(m, bool),
            loop,
        )
    )

    scale = np.abs(golden).max()
    np.testing.assert_allclose(got, golden, atol=max(1e-5, 1e-5 * scale), rtol=1e-4)
    # the planner-relevant property: identical greedy edge ranking
    assert np.argmax(golden) == np.argmax(got)


# ---------------------------------------------------------------------------
# smoother: all loadable checkpoint families
# ---------------------------------------------------------------------------

SMOOTHERS = [
    ("maze2", "data/weights/smooth_2d_attv3.pt", 2, 1.0),
    ("kuka7", "data/weights/smooth_7d_attv3.pt", 7, 1.0),
    ("ur5", "data/weights/smooth_ur5_attv3.pt", 6, 2.0),
    ("snake7", "data/weights/smooth_snake_attv3.pt", 7, 1.0),
    ("kuka13", "data/weights/smooth_13d_attv3.pt", 13, 1.0),
    ("kuka14", "data/weights/smooth_14d_attv3.pt", 14, 1.0),
]


@pytest.mark.parametrize("family,ckpt,d,scale", SMOOTHERS)
def test_smoother_forward_matches_reference(ref, family, ckpt, d, scale):
    import jax.numpy as jnp

    from gnn_motion_planning_tpu.models.smoother import (
        SmootherConfig,
        smoother_forward,
    )

    rng = np.random.RandomState(11)
    L, n_free, n_coll, loop = 8, 40, 20, 5
    path = rng.uniform(-1, 1, (L, d)).astype(np.float32)
    free = rng.uniform(-1, 1, (n_free, d)).astype(np.float32)
    collided = rng.uniform(-1, 1, (n_coll, d)).astype(np.float32)

    # base edges: bidirectional path chain + self loops (over path indices)
    i = np.arange(L - 1)
    base_src = np.concatenate([i, i + 1, np.arange(L)]).astype(np.int64)
    base_dst = np.concatenate([i + 1, i, np.arange(L)]).astype(np.int64)

    tm = ref.smoother.ModelSmoother(
        workspace_size=3, config_size=d, obs_size=6, embed_size=128, scale=scale
    )
    tm.load_state_dict(_torch_state_dict(ckpt))
    tm.eval()
    with torch.no_grad():
        golden = tm(
            path=torch.tensor(path.copy()),
            free=torch.tensor(free),
            collided=torch.tensor(collided),
            obstacles=None,
            edge_index=torch.tensor(np.stack([base_src, base_dst])),
            loop=loop,
        ).numpy()

    cfg = SmootherConfig(
        workspace_size=3, config_size=d, obs_size=6, embed_size=128, scale=scale
    )
    got = np.asarray(
        smoother_forward(
            load_params(ckpt),
            cfg,
            jnp.asarray(path),
            jnp.ones(L, bool),
            jnp.asarray(np.concatenate([free, collided])),
            jnp.ones(n_free + n_coll, bool),
            jnp.asarray(n_free),
            jnp.asarray(base_src, jnp.int32),
            jnp.asarray(base_dst, jnp.int32),
            jnp.ones(len(base_src), bool),
            loop,
        )
    )

    np.testing.assert_allclose(got, golden, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# NEXT: all 7 checkpoint families (pb_forward + state_forward)
# ---------------------------------------------------------------------------

NEXTS = [
    # (family, ckpt, dim, point_dim; point_dim None => 2D model).
    # The 3D conv-LSTM families take ~10-15s each on CPU -> slow-marked.
    ("maze2", "data/weights/next_2.pt", 2, None),
    ("maze3", "data/weights/next_3.pt", 3, None),
    ("snake7", "data/weights/next_snake.pt", 7, None),
    pytest.param("kuka7", "data/weights/next_7.pt", 7, 3, marks=pytest.mark.slow),
    pytest.param("ur5", "data/weights/next_ur5.pt", 6, 3, marks=pytest.mark.slow),
    pytest.param("kuka13", "data/weights/next_13.pt", 13, 3, marks=pytest.mark.slow),
    pytest.param("kuka14", "data/weights/next_14.pt", 14, 6, marks=pytest.mark.slow),
]


@pytest.mark.parametrize("family,ckpt,dim,point_dim", NEXTS)
def test_next_forward_matches_reference(ref, family, ckpt, dim, point_dim):
    import jax.numpy as jnp

    from gnn_motion_planning_tpu.models.next_model import (
        NextConfig,
        pb_forward,
        state_forward,
    )

    rng = np.random.RandomState(13)
    b = 4
    is2d = point_dim is None
    nd = 2 if is2d else 3
    w = 15
    maze_map = (rng.rand(*((1,) + (w,) * nd)) < 0.3).astype(np.float32)
    in_dim = dim if is2d else point_dim + dim
    goal = rng.uniform(-1, 1, (1, in_dim)).astype(np.float32)
    states = rng.uniform(-1, 1, (b, in_dim)).astype(np.float32)

    if is2d:
        tm = ref.next2d.PPN(cuda=False, env_width=w, cap=8, dim=dim)
    else:
        tm = ref.next3d.PPN(cuda=False, env_width=w, cap=8, dim=dim, point_dim=point_dim)
    tm.load_state_dict(_torch_state_dict(ckpt))
    tm.eval()
    with torch.no_grad():
        golden_pb = tm.pb_forward(torch.tensor(goal), torch.tensor(maze_map))
        golden_out = tm.state_forward(torch.tensor(states), golden_pb).numpy()
        golden_pb = golden_pb.numpy()

    cfg = NextConfig(
        env_width=w, cap=8, dim=dim, point_dim=0 if is2d else point_dim, nd=nd
    )
    # the reference 2D PPN normalizes the last state component inside
    # pb/state_forward (model2D.py:163-165, LIMITS[2]); this framework's
    # wrapper normalizes outside the jitted net (next_model.Model2D._normalize)
    goal_n, states_n = goal.copy(), states.copy()
    if is2d:
        goal_n[:, -1] /= ref.LIMITS[2]
        states_n[:, -1] /= ref.LIMITS[2]

    params = load_params(ckpt)
    got_pb = np.asarray(pb_forward(params, cfg, jnp.asarray(goal_n), jnp.asarray(maze_map)))
    got_out = np.asarray(
        state_forward(params, cfg, jnp.asarray(states_n), jnp.asarray(got_pb))
    )

    np.testing.assert_allclose(got_pb, golden_pb, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got_out, golden_out, atol=2e-4, rtol=1e-3)
