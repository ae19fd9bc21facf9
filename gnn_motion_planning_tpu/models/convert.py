"""Torch state-dict -> JAX parameter-pytree converter.

The reference ships trained checkpoints as torch ``state_dict`` files
(``data/weights/*.pt``, loaded at reference str2name.py:71-76). Model params
here are nested dicts keyed by the same dotted names, so conversion is a
pure tree-ification of the state dict with no renaming — guaranteeing the
shipped weights reproduce reference numerics.

Torch is only needed the first time: converted checkpoints are cached as
``.npz`` next to the repo so TPU-only deployments never import torch.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

_CACHE_DIR = Path(__file__).resolve().parents[2] / "assets" / "weights_jax"


def _nest(flat: dict) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def _flatten(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        name = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, name))
        else:
            out[name] = v
    return out


def load_torch_checkpoint(pt_path: str) -> dict:
    """Read a torch .pt state dict into a nested numpy pytree."""

    import torch

    sd = torch.load(pt_path, map_location="cpu", weights_only=True)
    flat = {
        k: np.asarray(v.detach().numpy(), dtype=np.float32)
        for k, v in sd.items()
        if hasattr(v, "detach") and v.dtype.is_floating_point
    }
    return _nest(flat)


def load_params(relpath: str) -> dict:
    """Load params for a reference-style checkpoint path (cached as npz).

    `relpath` is the reference name, e.g. ``data/weights/weights_maze.pt``.
    """

    cache = _CACHE_DIR / (Path(relpath).stem + ".npz")
    if cache.exists():
        with np.load(cache) as f:
            return _nest({k: f[k] for k in f.files})

    from gnn_motion_planning_tpu.utils.assets import asset_path

    try:
        src = asset_path(relpath)
    except FileNotFoundError:
        # the reference names a maze3 smoother 'smooth_3d_attv3.pt' but only
        # ships 'smooth_3d_att.pt' (str2name.py:25 vs data/weights/);
        # fall back to the shipped variant
        if relpath.endswith("_attv3.pt"):
            src = asset_path(relpath.replace("_attv3.pt", "_att.pt"))
        else:
            raise
    tree = load_torch_checkpoint(src)
    os.makedirs(cache.parent, exist_ok=True)
    np.savez(cache, **_flatten(tree))
    return tree
