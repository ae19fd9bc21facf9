"""From-scratch training driver (explorer / smoother) for a registry config.

Reproduces the reference training protocol end-to-end with freshly
initialised parameters (reference train_explorer.py:96-211,
train_smoother.py:67-133) and writes the checkpoint + loss curve under
assets/. PRM training data comes from the regenerated train-split-only
pickles (tools/generate_prm.py — eval splits 2000+ are excluded).

Usage:
  python tools/train_scratch.py explorer <config> [epoch] [iter]
  python tools/train_scratch.py smoother <config> [epoch] [data_iter] [train_iter]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

OUT_DIR = REPO / "assets" / "weights_jax"
LOG_DIR = REPO / "assets" / "train_logs"

SCRATCH_NAMES = {
    ("explorer", "maze2"): "weights_maze_scratch.npz",
    ("explorer", "maze2easy"): "weights_maze_scratch.npz",
    ("explorer", "maze3"): "weights_maze_3_scratch.npz",
    ("explorer", "kuka7"): "weights_kuka_scratch.npz",
    ("explorer", "snake7"): "weights_snake_scratch.npz",
    ("explorer", "ur5"): "weights_ur5_scratch.npz",
    ("explorer", "kuka13"): "weights_kuka_13_scratch.npz",
    ("explorer", "kuka14"): "kuka_14_scratch.npz",  # matches registry ckpt stem
    ("smoother", "maze2"): "smooth_2d_scratch.npz",
    ("smoother", "maze2easy"): "smooth_2d_scratch.npz",
    ("smoother", "maze3"): "smooth_3d_scratch.npz",
    ("smoother", "kuka7"): "smooth_7d_scratch.npz",
    ("smoother", "ur5"): "smooth_ur5_scratch.npz",
    ("smoother", "snake7"): "smooth_snake_scratch.npz",
    ("smoother", "kuka13"): "smooth_13d_scratch.npz",
    ("smoother", "kuka14"): "smooth_14d_scratch.npz",
}


def train_explorer_scratch(
    config: str, epoch: int = 2000, iters: int = 20, finetune: bool = False
):
    from gnn_motion_planning_tpu.api.registry import str2name
    from gnn_motion_planning_tpu.training.explorer import train_explorer

    env, model, _, _, _, data_path = str2name(
        config, get_data=True, load=finetune
    )
    if finetune:
        # start from the converted upstream weights and adapt them to the
        # regenerated dataset (registry picks the result up via the spec's
        # explorer_ft field)
        out = OUT_DIR / SCRATCH_NAMES[("explorer", config)].replace(
            "_scratch", "_ft"
        )
    else:
        out = OUT_DIR / SCRATCH_NAMES[("explorer", config)]
    if out.exists():
        # resume: continue from the existing scratch checkpoint
        from gnn_motion_planning_tpu.models.convert import _nest

        with np.load(out) as f:
            model = model._replace(params=_nest({k: f[k] for k in f.files}))
        print(f"resuming from {out}", flush=True)
    log = LOG_DIR / (
        f"{config}_explorer_ft" if finetune else f"{config}_explorer_scratch"
    )
    log.mkdir(parents=True, exist_ok=True)
    t0 = time()
    params, losses = train_explorer(
        epoch=epoch,
        data_path=data_path,
        model=model,  # params=None -> fresh init
        model_path=str(out),
        env=env,
        iter=iters,
        log_dir=str(log),
    )
    (log / "summary.json").write_text(
        json.dumps(
            {
                "config": config,
                "epoch": epoch,
                "iters": iters,
                "steps": len(losses),
                "loss_first10": float(np.mean(losses[:10])) if losses else None,
                "loss_last10": float(np.mean(losses[-10:])) if losses else None,
                "wall_s": round(time() - t0, 1),
                "data_path": str(data_path),
                "ckpt": str(out),
            },
            indent=1,
        )
    )
    print(f"explorer scratch {config}: {len(losses)} steps -> {out}", flush=True)


def train_smoother_scratch(
    config: str, epoch: int = 300, data_iter: int = 3, train_iter: int = 20
):
    from gnn_motion_planning_tpu.api.registry import str2name
    from gnn_motion_planning_tpu.training.smoother import train_smoother

    # shipped explorer generates the raw paths (reference protocol); the
    # smoother itself starts from fresh init
    env, model_explore, _, smoother, _ = str2name(config)
    smoother = smoother._replace(params=None)
    out = OUT_DIR / SCRATCH_NAMES[("smoother", config)]
    log = LOG_DIR / f"{config}_smoother_scratch"
    log.mkdir(parents=True, exist_ok=True)
    t0 = time()
    params, losses = train_smoother(
        epoch=epoch,
        model_explore=model_explore,
        model=smoother,
        model_path=str(out),
        env=env,
        data_iter=data_iter,
        train_iter=train_iter,
        log_dir=str(log),
    )
    (log / "summary.json").write_text(
        json.dumps(
            {
                "config": config,
                "epoch": epoch,
                "data_iter": data_iter,
                "train_iter": train_iter,
                "losses": [round(float(x), 5) for x in losses],
                "wall_s": round(time() - t0, 1),
                "ckpt": str(out),
            },
            indent=1,
        )
    )
    print(f"smoother scratch {config}: losses {losses[:3]}...{losses[-3:]} -> {out}",
          flush=True)


def train_next_scratch(
    config: str, n_problems: int = 400, T: int = 1000, train_every: int = 100
):
    """From-scratch NEXT imitation run (reference train_next.py:42-120).

    The reference trains on 2000 problems; the in-repo runs use a reduced
    problem budget (recorded in summary.json) because NEXT planning is the
    per-sample cost and the 3D families run ~10-15 s/problem — the loss
    curve plateaus well before the reference budget on these datasets.
    """

    from gnn_motion_planning_tpu.training.next import train_next

    out = OUT_DIR / f"next_{config}_scratch.npz"
    log = LOG_DIR / f"{config}_next_scratch"
    log.mkdir(parents=True, exist_ok=True)
    t0 = time()
    params, losses = train_next(
        config, T=T, n_problems=n_problems, model_path=str(out),
        train_every=train_every, log_dir=str(log), from_scratch=True,
    )
    (log / "summary.json").write_text(
        json.dumps(
            {
                "config": config,
                "n_problems": n_problems,
                "T": T,
                "train_every": train_every,
                "reference_budget_note": "reference train_next.py uses 2000 problems",
                "losses": [round(float(x), 5) for x in losses],
                "wall_s": round(time() - t0, 1),
                "ckpt": str(out),
            },
            indent=1,
        )
    )
    print(f"next scratch {config}: {len(losses)} updates -> {out}", flush=True)


if __name__ == "__main__":
    kind, config = sys.argv[1], sys.argv[2]
    finetune = "--finetune" in sys.argv
    args = [int(a) for a in sys.argv[3:] if not a.startswith("--")]
    if kind == "explorer":
        train_explorer_scratch(config, *args, finetune=finetune)
    elif kind == "smoother":
        train_smoother_scratch(config, *args)
    elif kind == "next":
        train_next_scratch(config, *args)
    else:
        raise SystemExit(f"unknown kind {kind}")
