"""Evaluate a from-scratch explorer checkpoint on a registry config.

Loads an npz checkpoint produced by training/explorer.py, swaps it into the
standard eval harness (same protocol as the shipped weights), and prints
the reference metric block.

Usage: python tools/eval_scratch.py [ckpt.npz] [config] [n_problems]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main(ckpt="assets/weights_jax/weights_maze_scratch.npz",
         name="maze2easy", n=1000):
    from gnn_motion_planning_tpu.api.eval_gnn import eval_gnn
    from gnn_motion_planning_tpu.api.registry import str2env, str2name
    from gnn_motion_planning_tpu.models.convert import _nest

    env, idx = str2env(name)
    _, model, _, model_s, _ = str2name(name)
    with np.load(ckpt) as f:
        params = _nest({k: f[k] for k in f.files})
    model = model._replace(params=params)
    out = eval_gnn(name, 1234, env, idx[:n], model=model, model_s=model_s)
    print("success", out[0], "of", n)
    return out


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "assets/weights_jax/weights_maze_scratch.npz",
        sys.argv[2] if len(sys.argv) > 2 else "maze2easy",
        int(sys.argv[3]) if len(sys.argv) > 3 else 1000,
    )
