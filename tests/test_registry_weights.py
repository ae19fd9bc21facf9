"""Registry checkpoint selection: GMP_WEIGHTS=scratch runs configs on the
in-repo-trained checkpoints (tools/train_scratch.py) instead of the
converted upstream weights (reference str2name.py:71-76 loads only the
shipped .pt files — reproducing every checkpoint from source is this
framework's addition)."""

import numpy as np
import pytest


def _leaf(params):
    """First weight tensor of the explorer node encoder."""

    return np.asarray(params["node_code"]["0"]["weight"])


def test_scratch_env_var_switches_explorer(monkeypatch):
    from gnn_motion_planning_tpu.api import registry

    monkeypatch.delenv("GMP_WEIGHTS", raising=False)
    conv, _ = registry.str2models("maze2easy")

    monkeypatch.setenv("GMP_WEIGHTS", "scratch")
    scratch, _ = registry.str2models("maze2easy")

    a, b = _leaf(conv.params), _leaf(scratch.params)
    assert a.shape == b.shape  # same architecture
    assert not np.allclose(a, b)  # genuinely different training run


def test_scratch_env_var_falls_back_when_absent(monkeypatch):
    """Configs without a scratch checkpoint keep the converted weights
    rather than failing (the switch is best-effort per config)."""

    from gnn_motion_planning_tpu.api import registry

    if registry._scratch_npz(
        registry._SPECS["kuka13"]["explorer_ckpt"]
    ).exists():
        pytest.skip("kuka13 scratch checkpoint now exists")

    monkeypatch.setenv("GMP_WEIGHTS", "scratch")
    m, _ = registry.str2models("kuka13")
    monkeypatch.delenv("GMP_WEIGHTS")
    conv, _ = registry.str2models("kuka13")
    np.testing.assert_array_equal(_leaf(m.params), _leaf(conv.params))


def test_scalar_overrides_drop_batched_only_knobs():
    """EVAL_OVERRIDES mixes protocol deviations (t_max) with batched-path
    tuning (chunk); the scalar explore() path must only ever see the
    former (regression: `chunk` leaked through tools/eval_scratch.py and
    TypeError'd the maze2easy smoother-scratch eval)."""

    from gnn_motion_planning_tpu.api.registry import (
        EVAL_OVERRIDES,
        eval_overrides,
        scalar_overrides,
    )

    assert "chunk" in eval_overrides("maze2easy")
    assert scalar_overrides("maze2easy") == {}
    assert scalar_overrides("snake7") == {"t_max": 2000}
    for name in EVAL_OVERRIDES:
        assert "chunk" not in scalar_overrides(name)
        assert "lanes" not in scalar_overrides(name)
