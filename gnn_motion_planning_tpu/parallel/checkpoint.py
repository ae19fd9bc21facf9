"""Checkpointing: orbax train state + torch-compatible weight export.

The reference checkpoints bare torch state dicts mid-training
(train_explorer.py:202) with no optimizer/RNG state. Here full train state
(params + opt_state + step + host RNG state) goes through orbax so training
sweeps can resume exactly; model-only exports stay interchangeable with the
torch naming via the flat npz format shared with models/convert.py.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from gnn_motion_planning_tpu.models.convert import _flatten, _nest


def save_train_state(ckpt_dir: str, step: int, params, opt_state, host_rng_state=None):
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).resolve()
    path.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": jax.tree.map(np.asarray, params),
        "opt_state": jax.tree.map(np.asarray, opt_state),
    }
    ckptr.save(path / f"step_{step}", payload, force=True)
    ckptr.wait_until_finished()
    if host_rng_state is not None:
        # numpy get_state() tuple: (bit-generator name, keys, pos,
        # has_gauss, cached_gaussian); the name is always "MT19937" here
        # (config.py owns the generator) so only the mutable state is kept
        name, keys, pos, has_gauss, cached = host_rng_state
        assert name == "MT19937", f"unexpected bit generator {name!r}"
        np.savez(
            path / f"step_{step}_rng.npz",
            keys=keys,
            pos=pos,
            has_gauss=has_gauss,
            cached=cached,
        )
    (path / "LATEST").write_text(str(step))


def restore_train_state(ckpt_dir: str, params_like, opt_state_like, step=None):
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).resolve()
    if step is None:
        step = int((path / "LATEST").read_text())
    ckptr = ocp.StandardCheckpointer()
    target = {
        "params": jax.tree.map(np.asarray, params_like),
        "opt_state": jax.tree.map(np.asarray, opt_state_like),
    }
    payload = ckptr.restore(path / f"step_{step}", target=target)
    rng_path = path / f"step_{step}_rng.npz"
    rng_state = None
    if rng_path.exists():
        with np.load(rng_path) as f:
            rng_state = (
                "MT19937",
                f["keys"],
                int(f["pos"]),
                int(f["has_gauss"]),
                float(f["cached"]),
            )
    return payload["params"], payload["opt_state"], step, rng_state


def export_params_npz(path: str, params) -> str:
    np.savez(path, **_flatten(jax.tree.map(np.asarray, params)))
    return path


def load_params_npz(path: str):
    with np.load(path) as f:
        return _nest({k: f[k] for k in f.files})
