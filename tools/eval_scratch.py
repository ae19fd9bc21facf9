"""Evaluate a from-scratch checkpoint on a registry config.

Loads an npz checkpoint produced by the trainers, swaps it into the
standard eval harness (same protocol as the shipped weights), and prints
the reference metric block. Explorer checkpoints run the GNN protocol;
NEXT checkpoints run the tree-planner protocol (eval_next.py:47-88).

Usage: python tools/eval_scratch.py [ckpt.npz] [config] [n_problems]
       python tools/eval_scratch.py --next <ckpt.npz> <config> [n_problems]
       python tools/eval_scratch.py --smoother <ckpt.npz> <config> [n_problems]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main(ckpt="assets/weights_jax/weights_maze_scratch.npz",
         name="maze2easy", n=1000, bias=None, **kwargs):
    from gnn_motion_planning_tpu.api.eval_gnn import eval_gnn
    from gnn_motion_planning_tpu.api.registry import str2env, str2name
    from gnn_motion_planning_tpu.models.convert import _nest

    env, idx = str2env(name)
    if bias:
        env.sampler_bias = bias  # opt-in narrow-passage sampler (envs/snake.py)
    _, model, _, model_s, _ = str2name(name)
    with np.load(ckpt) as f:
        params = _nest({k: f[k] for k in f.files})
    model = model._replace(params=params)
    failed: list = []
    out = eval_gnn(name, 1234, env, idx[:n], model=model, model_s=model_s,
                   failed_indexes=failed, **kwargs)
    print("success", out[0], "of", n)
    if failed:
        print("failed indexes:", failed)

    # eval artifact next to the training curve (same fields as the
    # converted-weights rows in assets/benchmarks/<name>.json)
    import json

    log_dir = REPO / "assets" / "train_logs" / f"{name}_explorer_scratch"
    log_dir.mkdir(parents=True, exist_ok=True)
    row = {
        "ckpt": Path(ckpt).name,
        "n_problems": int(n),
        "success": int(out[0]),
        "collision_checks": float(out[1]),
        "running_time_s": float(out[2]),
        "path_cost": float(out[3]),
        "protocol_overrides": dict(kwargs, sampler_bias=bias)
        if bias
        else (kwargs or None),
        "converted_weights_row": f"assets/benchmarks/{name}.json",
        "failed_indexes": failed,
    }
    stem = f"eval_{name}" + (f"_tmax{kwargs['t_max']}" if "t_max" in kwargs
                             else "") + (f"_bias_{bias}" if bias else "")
    (log_dir / f"{stem}.json").write_text(json.dumps(row, indent=1))
    print("wrote", log_dir / f"{stem}.json")
    return out


def main_smoother(ckpt, name="maze2easy", n=100):
    """Smoother scratch checkpoint: shipped explorer + fresh smoother.

    The metric that isolates smoother quality is the smoothed path cost
    (reference eval_gnn.py:132) — success rate and check counts are
    explorer-owned and should match the converted-weights row.
    """

    from gnn_motion_planning_tpu.api.eval_gnn import eval_gnn
    from gnn_motion_planning_tpu.api.registry import (
        scalar_overrides,
        str2env,
        str2name,
    )
    from gnn_motion_planning_tpu.models.convert import _nest

    env, idx = str2env(name)
    _, model, _, model_s, _ = str2name(name)
    with np.load(ckpt) as f:
        params = _nest({k: f[k] for k in f.files})
    model_s = model_s._replace(params=params)
    kwargs = scalar_overrides(name)
    out = eval_gnn(name, 1234, env, idx[:n], model=model, model_s=model_s,
                   **kwargs)
    print("success", out[0], "of", n, "path_cost", out[3])

    import json

    log_dir = REPO / "assets" / "train_logs" / f"{name}_smoother_scratch"
    log_dir.mkdir(parents=True, exist_ok=True)
    row = {
        "ckpt": Path(ckpt).name,
        "n_problems": int(n),
        "success": int(out[0]),
        "collision_checks": float(out[1]),
        "running_time_s": float(out[2]),
        "path_cost": float(out[3]),
        "protocol_overrides": kwargs or None,
        "converted_weights_row": f"assets/benchmarks/{name}.json",
    }
    (log_dir / f"eval_{name}.json").write_text(json.dumps(row, indent=1))
    print("wrote", log_dir / f"eval_{name}.json")
    return out


def main_next(ckpt, name="maze2easy", n=250):
    """NEXT scratch checkpoint under the reference tree-planner protocol."""

    # The tree planner dispatches two tiny jitted forwards per iteration;
    # over the ~24 ms tunnel to the chip that is ~50 s/problem of pure
    # dispatch latency. The converted-NEXT sweep cells were measured on
    # host CPU (grand_sweep pins JAX_PLATFORMS=cpu) — pin CPU here too so
    # scratch-vs-converted times are apples-to-apples and the eval is
    # dispatch-bound no more.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gnn_motion_planning_tpu.api.eval_baselines import (
        _eval_tree_planner,
        _seed_env,
        str2next,
    )
    from gnn_motion_planning_tpu.api.registry import str2env
    from gnn_motion_planning_tpu.models.convert import _nest

    import functools

    import jax

    from gnn_motion_planning_tpu.models.next_model import (
        pb_forward,
        state_forward,
    )

    env, idx = str2env(name)
    _seed_env(1234, env)
    model, _ = str2next(name, env)
    with np.load(ckpt) as f:
        model.params = _nest({k: f[k] for k in f.files})
    # the constructor baked the converted params into the jit closures;
    # rebind them to the scratch checkpoint
    model._pb = jax.jit(functools.partial(pb_forward, model.params, model.cfg))
    model._fwd = jax.jit(
        functools.partial(state_forward, model.params, model.cfg)
    )
    out = _eval_tree_planner(env, idx[:n], False, 1000, model, 0.1)
    print("success", out[0], "of", n)

    import json

    log_dir = REPO / "assets" / "train_logs" / f"{name}_next_scratch"
    log_dir.mkdir(parents=True, exist_ok=True)
    row = {
        "ckpt": Path(ckpt).name,
        "n_problems": int(n),
        "success": int(out[0]),
        "collision_checks": float(out[1]),
        "running_time_s": float(out[2]),
        "path_cost": float(out[3]),
        "protocol": {"T": 1000, "g_explore_eps": 0.1},
        "converted_weights_row": f"assets/benchmarks/{name}.json",
    }
    (log_dir / f"eval_{name}.json").write_text(json.dumps(row, indent=1))
    print("wrote", log_dir / f"eval_{name}.json")
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--smoother":
        main_smoother(
            args[1],
            args[2] if len(args) > 2 else "maze2easy",
            int(args[3]) if len(args) > 3 else 100,
        )
    elif args and args[0] == "--next":
        main_next(
            args[1],
            args[2] if len(args) > 2 else "maze2easy",
            int(args[3]) if len(args) > 3 else 250,
        )
    else:
        kw = {}
        if "--bias" in args:
            i = args.index("--bias")
            kw["bias"] = args[i + 1]
            args = args[:i] + args[i + 2:]
        if len(args) > 3:
            kw["t_max"] = int(args[3])
        main(
            args[0] if args else "assets/weights_jax/weights_maze_scratch.npz",
            args[1] if len(args) > 1 else "maze2easy",
            int(args[2]) if len(args) > 2 else 1000,
            **kw,
        )
