"""Head-to-head: the reference's own planner vs this framework, per problem.

The parity chain has three links: the collision oracle (bit-identical,
tests/test_maze_env.py), the model forwards (golden-pinned against the
reference's own torch code, tests/test_model_parity.py), and the planner
loop + metrics — which this tool closes by running the reference's
UNMODIFIED `explore` (reference eval_gnn.py:168-276) end-to-end on the
CPU-runnable maze2 configs and diffing per-problem success / collision
checks / path cost against this framework's planner on the SAME RNG
stream.

How the reference code runs here: its PyG/torch_scatter/torch_sparse
imports are satisfied with exact plain-torch equivalents (the
tests/test_model_parity.py stub technique, extended with the runtime
primitives `explore` needs: knn_graph, coalesce, add_self_loops, Data),
and its `environment` package is narrowed to the pure-numpy maze env —
no reference line is edited.

Stream alignment: the reference threads ONE global np.random stream
through the whole sweep (reference config.py:48-51, eval_gnn.py:98).
Our maze env reproduces that stream bit-exactly when `env.rng is None`
(envs/maze.py::sample_n_points, pinned by tests/test_maze_env.py), so
the ours-side loop here seeds np.random once and clears env.rng per
problem — both planners then see the IDENTICAL sample sequence, and the
remaining divergence is exactly the planner-loop question this tool
answers (known risk: float32 argmax tie-breaking, SURVEY §7 hard part 1).

Usage:
  python tools/ref_headtohead.py <maze2easy|maze2hard> [n] [--ref-only|--ours-only]

Artifact: assets/benchmarks/headtohead_<config>.json with per-problem rows
for both sides + agreement summary. Consumed by
tests/test_headtohead.py.
"""

from __future__ import annotations

import json
import sys
import types
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
REF = Path("/root/reference")
sys.path.insert(0, str(REPO))

PROTOCOL = {"seed": 1234, "batch": 500, "t_max": 500, "k": 30, "loop": 5}

MAP_FILES = {
    "maze2easy": "maze_files/mazes_15_2_3000.npz",
    "maze2hard": "maze_files/mazes_hard.npz",
}
SPLITS = {
    "maze2easy": np.arange(2000, 3000),
    "maze2hard": np.arange(1000),
}


# ---------------------------------------------------------------------------
# plain-torch stubs for the PyG primitives the reference planner uses at
# runtime (superset of tests/test_model_parity.py::_install_pyg_stubs)
# ---------------------------------------------------------------------------


def _install_runtime_stubs(torch):
    class MessagePassing(torch.nn.Module):
        """Minimal PyG MessagePassing (source_to_target, max/add aggr,
        empty segments = 0 — torch_scatter semantics)."""

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
            msg = self.message(
                **{k: v for k, v in kwargs.items() if k in accepted}
            )
            out = torch.zeros(xd.shape[0], msg.shape[-1], dtype=msg.dtype)
            idx = dst[:, None].expand_as(msg)
            if self.aggr == "max":
                return out.scatter_reduce(0, idx, msg, "amax", include_self=False)
            if self.aggr == "add":
                return out.scatter_reduce(0, idx, msg, "sum", include_self=True)
            raise NotImplementedError(self.aggr)

    def knn(x, y, k):
        d = torch.cdist(y.float(), x.float())
        idx = d.topk(min(k, x.shape[0]), largest=False).indices
        row = torch.arange(len(y))[:, None].expand_as(idx)
        return torch.stack([row.reshape(-1), idx.reshape(-1)]).long()

    def knn_graph(x, k, loop=False, **kwargs):
        """torch_cluster.knn_graph, source_to_target flow: edges
        (neighbor -> query). Ties broken by index order (torch.topk);
        the reference symmetrizes + coalesces right after
        (eval_gnn.py:160-164), so direction convention cancels out."""

        d = torch.cdist(x.float(), x.float())
        if not loop:
            d.fill_diagonal_(float("inf"))
        idx = d.topk(min(k, len(x)), largest=False).indices
        row = torch.arange(len(x))[:, None].expand_as(idx)
        return torch.stack([idx.reshape(-1), row.reshape(-1)]).long()

    def coalesce(edge_index, value, m, n):
        ids = edge_index[0].long() * n + edge_index[1].long()
        ids = torch.unique(ids, sorted=True)
        return torch.stack([ids // n, ids % n]), value

    def add_self_loops(edge_index, num_nodes=None):
        n = num_nodes if num_nodes is not None else int(edge_index.max()) + 1
        loops = torch.arange(n).repeat(2, 1)
        return torch.cat([edge_index, loops], dim=-1), None

    class Data:
        """torch_geometric.data.Data: attribute bag with .to/.to_dict."""

        def __init__(self, **kwargs):
            for k, v in kwargs.items():
                setattr(self, k, v)

        def to(self, device):
            return self

        def to_dict(self):
            return dict(self.__dict__)

    def _unused(*a, **k):
        raise NotImplementedError("stubbed symbol not used by the planner")

    mods = {}

    def mod(name):
        m = types.ModuleType(name)
        mods[name] = m
        return m

    tg = mod("torch_geometric")
    tg_data = mod("torch_geometric.data")
    tg_nn = mod("torch_geometric.nn")
    tg_conv = mod("torch_geometric.nn.conv")
    tg_pool = mod("torch_geometric.nn.pool")
    tg_consec = mod("torch_geometric.nn.pool.consecutive")
    tg_utils = mod("torch_geometric.utils")
    t_sparse = mod("torch_sparse")
    t_scatter = mod("torch_scatter")
    nets = mod("nets")

    tg_data.Data = Data
    tg_conv.MessagePassing = MessagePassing
    tg_nn.MessagePassing = MessagePassing
    tg_nn.knn = knn
    tg_pool.knn = knn
    tg_nn.knn_graph = knn_graph
    tg_utils.add_self_loops = add_self_loops
    for name in ("voxel_grid", "radius_graph", "GraphConv"):
        setattr(tg_nn, name, _unused)
    tg_consec.consecutive_cluster = _unused
    for name in ("grid", "remove_self_loops", "softmax"):
        setattr(tg_utils, name, _unused)
    t_sparse.coalesce = coalesce
    for name in ("scatter_mean", "scatter_max", "scatter_add"):
        setattr(t_scatter, name, _unused)
    for name in ("GATConv", "EdgePooling", "ASAPooling", "SAModule",
                 "FPModule", "MLP"):
        setattr(nets, name, _unused)

    tg.data = tg_data
    tg.nn = tg_nn
    tg.utils = tg_utils
    tg_nn.conv = tg_conv
    tg_nn.pool = tg_pool

    # the reference-repo modules `explore` pulls in but never executes on
    # the model-smoother maze2 path
    alg = mod("algorithm")
    alg_bit = mod("algorithm.bit_star")
    alg_dij = mod("algorithm.dijkstra")
    alg_bit.BITStar = _unused
    alg_dij.dijkstra = _unused
    alg.bit_star = alg_bit
    alg.dijkstra = alg_dij
    uplot = mod("utils.plot")
    uplot.plot_edges = _unused
    mods["utils"] = types.ModuleType("utils")
    mods["utils"].plot = uplot
    s2n = mod("str2name")
    s2n.str2name = _unused

    # the reference `environment` package, narrowed to the pure-numpy
    # modules (the package __init__ would import pybullet)
    envpkg = mod("environment")
    envpkg.__path__ = [str(REF / "environment")]

    sys.modules.update(mods)


def _import_by_path(modname, path, transform=None):
    import importlib.util

    if transform is None:
        spec = importlib.util.spec_from_file_location(modname, path)
        m = importlib.util.module_from_spec(spec)
        sys.modules[modname] = m
        spec.loader.exec_module(m)
        return m
    src = Path(path).read_text()
    src = transform(src)
    m = types.ModuleType(modname)
    m.__file__ = str(path)
    sys.modules[modname] = m
    exec(compile(src, str(path), "exec"), m.__dict__)
    return m


# The one legacy-runtime shim the reference planner needs (documented in
# the artifact): `policy[np.array(explored_edges).reshape(2, -1)] = 0`
# (reference eval_gnn.py:202) relied on the torch-1.x "non-tuple sequence
# is a multidimensional index" behavior, which zeroes the (row, col)
# ENTRY pairs. Modern torch instead converts the 2-D ndarray to a tensor
# index along dim 0, zeroing the whole policy ROW of every endpoint of
# every explored edge — including row 0 (init) via the [[0, 0]] seed —
# which kills all expansion and fails every problem (empirically
# verified; torch 2.13 still prints the tuple-deprecation warning for
# list indices). Wrapping the index in tuple() restores the exact
# semantics the reference's published results ran under; no algorithmic
# line is changed.
_LEGACY_IDX = "policy[np.array(explored_edges).reshape(2, -1)] = 0"
_LEGACY_IDX_FIXED = (
    "policy[tuple(np.array(explored_edges).reshape(2, -1))] = 0"
)


def _legacy_indexing_shim(src: str) -> str:
    assert src.count(_LEGACY_IDX) == 1, "reference eval_gnn.py changed"
    return src.replace(_LEGACY_IDX, _LEGACY_IDX_FIXED)


_REF_NS = None


def load_reference():
    """Import the reference planner modules, unmodified, with stubs."""

    global _REF_NS
    if _REF_NS is not None:
        return _REF_NS
    import torch

    _install_runtime_stubs(torch)
    cfg = _import_by_path("config", REF / "config.py")
    smoother = _import_by_path("smoother", REF / "smoother.py")
    eval_gnn = _import_by_path(
        "_ref_eval_gnn", REF / "eval_gnn.py", transform=_legacy_indexing_shim
    )
    model = _import_by_path("_ref_model", REF / "model.py")
    model_smoother = _import_by_path(
        "_ref_model_smoother", REF / "model_smoother.py"
    )
    _REF_NS = types.SimpleNamespace(
        cfg=cfg, smoother=smoother, eval_gnn=eval_gnn, model=model,
        model_smoother=model_smoother, torch=torch,
        maze_env=sys.modules["environment.maze_env"],
    )
    return _REF_NS


def _ref_models(ns):
    import torch

    m = ns.model.EncoderProcessDecoder(
        workspace_size=2, config_size=2, embed_size=32, obs_size=2
    )
    m.load_state_dict(
        torch.load(REF / "data/weights/weights_maze.pt", map_location="cpu",
                   weights_only=True)
    )
    m.eval()
    ms = ns.model_smoother.ModelSmoother(
        workspace_size=2, config_size=2, embed_size=128, obs_size=6
    )
    ms.load_state_dict(
        torch.load(REF / "data/weights/smooth_2d_attv3.pt",
                   map_location="cpu", weights_only=True)
    )
    ms.eval()
    return m, ms


def _row(index, success, c_explore, c_smooth, cost_raw, cost_smooth, wall):
    return {
        "index": int(index),
        "success": bool(success),
        "c_explore": int(c_explore),
        "c_smooth": int(c_smooth),
        "c_total": int(c_explore) + int(c_smooth),
        "cost_raw": round(float(cost_raw), 6),
        "cost_smooth": round(float(cost_smooth), 6),
        "wall_s": round(float(wall), 4),
    }


def run_reference(config: str, indexes) -> list[dict]:
    """The reference eval_gnn sweep loop (eval_gnn.py:96-127), with the
    per-problem solution tuples kept instead of aggregated away. Every
    planning decision is made by the reference's own `explore`."""

    ns = load_reference()
    env = ns.maze_env.MazeEnv(
        dim=2, map_file=str(REF / MAP_FILES[config])
    )
    model, model_s = _ref_models(ns)
    ns.cfg.set_random_seed(PROTOCOL["seed"])
    rows = []
    for index in indexes:
        env.init_new_problem(int(index))
        t0 = time()
        result = ns.eval_gnn.explore(
            env, model, model_s, smooth=True,
            batch=PROTOCOL["batch"], t_max=PROTOCOL["t_max"],
            k=PROTOCOL["k"], loop=PROTOCOL["loop"],
        )
        rows.append(_row(
            index, result["success"], result["c_explore"],
            result["c_smooth"],
            ns.eval_gnn.path_cost(result["path"]),
            ns.eval_gnn.path_cost(result["smooth_path"]),
            time() - t0,
        ))
        print(f"ref {config} #{index}: success={rows[-1]['success']} "
              f"checks={rows[-1]['c_total']}", flush=True)
    return rows


def run_ours(config: str, indexes) -> list[dict]:
    """This framework's planner under the reference's GLOBAL-stream RNG
    protocol (env.rng=None -> the maze env consumes np.random exactly
    like reference maze_env.py:85-100; our api.eval_gnn instead uses
    per-problem streams, which are deliberately not comparable)."""

    import os

    if os.environ.get("JAX_PLATFORMS"):
        # honor the env var even after torch import (verify-skill gotcha:
        # torch's import can initialize the plugin search before jax reads
        # the variable)
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from gnn_motion_planning_tpu.api.eval_gnn import explore, path_cost
    from gnn_motion_planning_tpu.api.registry import str2env, str2name
    from gnn_motion_planning_tpu.config import set_random_seed

    env, _ = str2env(config)
    _, model, _, model_s, _ = str2name(config)
    set_random_seed(PROTOCOL["seed"])
    rows = []
    for index in indexes:
        env.rng = None  # global-stream mode (reference protocol)
        env.init_new_problem(int(index))
        t0 = time()
        result = explore(
            env, model, model_s, smooth=True,
            batch=PROTOCOL["batch"], t_max=PROTOCOL["t_max"],
            k=PROTOCOL["k"], loop=PROTOCOL["loop"],
        )
        rows.append(_row(
            index, result["success"], result["c_explore"],
            result["c_smooth"], path_cost(result["path"]),
            path_cost(result["smooth_path"]), time() - t0,
        ))
        print(f"ours {config} #{index}: success={rows[-1]['success']} "
              f"checks={rows[-1]['c_total']}", flush=True)
    return rows


def _agg(rows):
    """The reference metric block (eval_gnn.py:128-142)."""

    n_success = sum(r["success"] for r in rows)
    return {
        "n": len(rows),
        "success": n_success,
        "collision_check": float(np.mean([r["c_total"] for r in rows])),
        "collision_check_explore": float(
            np.mean([r["c_explore"] for r in rows])
        ),
        "path_cost": (
            float(np.mean([r["cost_smooth"] for r in rows if r["success"]]))
            if n_success else None
        ),
        "running_time_s": (
            float(sum(r["wall_s"] for r in rows if r["success"])) / n_success
            if n_success else None
        ),
    }


def compare(ref_rows, our_rows):
    assert len(ref_rows) == len(our_rows)
    pairs = list(zip(ref_rows, our_rows))
    succ_agree = sum(r["success"] == o["success"] for r, o in pairs)
    both = [(r, o) for r, o in pairs if r["success"] and o["success"]]
    checks_equal = sum(r["c_total"] == o["c_total"] for r, o in both)
    d_checks = [o["c_total"] - r["c_total"] for r, o in both]
    d_cost = [o["cost_smooth"] - r["cost_smooth"] for r, o in both]
    return {
        "n": len(pairs),
        "success_agree": succ_agree,
        "success_ref": sum(r["success"] for r, _ in pairs),
        "success_ours": sum(o["success"] for _, o in pairs),
        "disagree_indexes": [
            r["index"] for r, o in pairs if r["success"] != o["success"]
        ],
        "both_success": len(both),
        "checks_identical": checks_equal,
        "checks_delta_mean": float(np.mean(d_checks)) if both else None,
        "checks_delta_p95": float(np.percentile(np.abs(d_checks), 95))
        if both else None,
        "cost_delta_mean": float(np.mean(d_cost)) if both else None,
        "cost_delta_max_abs": float(np.max(np.abs(d_cost))) if both else None,
    }


def main(config: str, n: int = 250, mode: str = "both"):
    indexes = SPLITS[config][:n]
    out = {"config": config, "protocol": PROTOCOL,
           "rng_protocol": "reference_global_stream",
           "note": ("reference side runs /root/reference/eval_gnn.py explore "
                    "unmodified with plain-torch PyG stubs; both sides see "
                    "the identical np.random sample stream")}
    t0 = time()
    if mode in ("both", "ref"):
        out["reference_rows"] = run_reference(config, indexes)
        out["reference_agg"] = _agg(out["reference_rows"])
    if mode in ("both", "ours"):
        out["ours_rows"] = run_ours(config, indexes)
        out["ours_agg"] = _agg(out["ours_rows"])
    if mode == "both":
        out["compare"] = compare(out["reference_rows"], out["ours_rows"])
    out["wall_s"] = round(time() - t0, 1)
    path = REPO / "assets" / "benchmarks" / f"headtohead_{config}.json"
    path.write_text(json.dumps(out, indent=1))
    print("wrote", path)
    if "compare" in out:
        print(json.dumps(out["compare"], indent=1))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mode = "both"
    if "--ref-only" in sys.argv:
        mode = "ref"
    if "--ours-only" in sys.argv:
        mode = "ours"
    main(args[0], int(args[1]) if len(args) > 1 else 250, mode)
