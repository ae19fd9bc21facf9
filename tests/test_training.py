"""All three trainers run end-to-end at tiny scale and improve/log.

Reference trainers: train_explorer.py:96-211, train_smoother.py:67-133,
train_next.py:42-120. These tests exercise the FULL loops (data generation
through optimiser steps through checkpoint write), not just the step
functions, plus the JSONL metrics logger (reference logs via tensorboardX,
train_explorer.py:101,191-195).
"""

import numpy as np
import pytest


def test_scalar_logger_roundtrip(tmp_path):
    from gnn_motion_planning_tpu.utils.metrics import ScalarLogger, read_scalars

    with ScalarLogger(tmp_path / "run", use_tensorboard=False) as log:
        for i in range(5):
            log.add_scalar("train/loss", 1.0 / (i + 1), i)
        log.add_scalar("train/lr", 1e-3, 0)
    scalars = read_scalars(tmp_path / "run")
    assert len(scalars["train/loss"]) == 5
    assert scalars["train/loss"][0] == (0, 1.0)
    assert scalars["train/lr"] == [(0, 1e-3)]


@pytest.mark.slow
def test_train_explorer_tiny(tmp_path):
    from gnn_motion_planning_tpu.api.registry import str2name
    from gnn_motion_planning_tpu.training.explorer import train_explorer
    from gnn_motion_planning_tpu.utils.metrics import read_scalars

    env, model, _, _, _, data_path = str2name("maze2easy", get_data=True)
    params, losses = train_explorer(
        epoch=6,
        data_path=data_path,
        model=model,
        model_path=str(tmp_path / "explorer.npz"),
        env=env,
        iter=2,
        batch_size=4,
        log_dir=str(tmp_path / "log"),
    )
    assert len(losses) >= 1
    assert all(np.isfinite(l) for l in losses)
    assert (tmp_path / "explorer.npz").exists()
    scalars = read_scalars(tmp_path / "log")
    assert len(scalars["train/loss"]) == len(losses)


@pytest.mark.slow
def test_train_smoother_tiny(tmp_path):
    from gnn_motion_planning_tpu.api.registry import str2name
    from gnn_motion_planning_tpu.training.smoother import train_smoother

    env, model_explore, _, model_s, _ = str2name("maze2easy")
    params, losses = train_smoother(
        epoch=3,
        model_explore=model_explore,
        model=model_s,
        model_path=str(tmp_path / "smoother.npz"),
        env=env,
        data_iter=1,
        train_iter=2,
        batch_size=2,
        log_dir=str(tmp_path / "log"),
    )
    assert len(losses) == 2
    assert all(np.isfinite(l) for l in losses)
    assert (tmp_path / "smoother.npz").exists()


def test_train_next_tiny(tmp_path):
    from gnn_motion_planning_tpu.training.next import train_next

    params, losses = train_next(
        "maze2easy",
        T=40,
        n_problems=3,
        model_path=str(tmp_path / "next.npz"),
        train_every=2,
        log_dir=str(tmp_path / "log"),
    )
    assert len(losses) >= 1
    assert all(np.isfinite(l) for l in losses)
    assert (tmp_path / "next.npz").exists()
