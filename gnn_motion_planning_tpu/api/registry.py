"""String registries mapping env names to environments, models, checkpoints.

Drop-in equivalents of the reference registries (reference: str2env.py:11-40,
str2name.py:11-81): same names, same test index ranges, same model
hyperparameters and checkpoint paths. Models are returned as (params, cfg)
bundles instead of torch modules.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from gnn_motion_planning_tpu.models.convert import load_params
from gnn_motion_planning_tpu.models.explorer import ExplorerConfig
from gnn_motion_planning_tpu.models.smoother import SmootherConfig


class ExplorerModel(NamedTuple):
    params: Optional[dict]
    cfg: ExplorerConfig


class SmootherModel(NamedTuple):
    params: Optional[dict]
    cfg: SmootherConfig


def str2env(name: str):
    """(env, test_indexes) for a benchmark config (str2env.py:11-40)."""

    import gnn_motion_planning_tpu.envs as envs

    if name == "maze2easy":
        return envs.MazeEnv(dim=2), np.arange(2000, 3000)
    if name == "maze2hard":
        return envs.MazeEnv(dim=2, map_file="maze_files/mazes_hard.npz"), np.arange(1000)
    if name == "maze3":
        return envs.MazeEnv(dim=3), np.arange(2000, 3000)
    if name == "kuka7":
        return envs.KukaEnv(), np.arange(2000, 3000)
    if name == "ur5":
        return envs.UR5Env(), np.arange(2000, 3000)
    if name == "snake7":
        return envs.SnakeEnv(map_file="maze_files/snakes_15_2_3000.npz"), np.arange(
            2000, 3000
        )
    if name == "kuka13":
        return (
            envs.KukaEnv(
                kuka_file="kuka_iiwa/model_3.urdf",
                map_file="maze_files/kukas_13_3000.pkl",
            ),
            np.arange(2000, 3000),
        )
    if name == "kuka14":
        return envs.Kuka2Env(), np.arange(2000, 3000)
    raise KeyError(name)


_SPECS = {
    # name -> (env_factory_key, explorer kwargs, ckpt, smoother kwargs, ckpt, data)
    "maze2": dict(
        explorer=dict(workspace_size=2, config_size=2, embed_size=32, obs_size=2),
        explorer_ckpt="data/weights/weights_maze.pt",
        smoother=dict(workspace_size=2, config_size=2, embed_size=128, obs_size=6),
        smoother_ckpt="data/weights/smooth_2d_attv3.pt",
        data="data/pkl/maze_prm_4000.pkl",
    ),
    "maze3": dict(
        explorer=dict(workspace_size=2, config_size=3, embed_size=32, obs_size=2),
        explorer_ckpt="data/weights/weights_maze_3.pt",
        smoother=dict(workspace_size=3, config_size=3, embed_size=128, obs_size=6),
        smoother_ckpt="data/weights/smooth_3d_attv3.pt",
        data="data/pkl/maze_prm_3.pkl",
    ),
    "kuka7": dict(
        explorer=dict(workspace_size=3, config_size=7, embed_size=64, obs_size=6),
        explorer_ckpt="data/weights/weights_kuka.pt",
        smoother=dict(workspace_size=3, config_size=7, embed_size=128, obs_size=6),
        smoother_ckpt="data/weights/smooth_7d_attv3.pt",
        data="data/pkl/kuka_prm_4000.pkl",
    ),
    "ur5": dict(
        explorer=dict(workspace_size=3, config_size=6, embed_size=32, obs_size=6),
        explorer_ckpt="data/weights/weights_ur5.pt",
        smoother=dict(workspace_size=3, config_size=6, embed_size=128, obs_size=6),
        smoother_ckpt="data/weights/smooth_ur5_attv3.pt",
        data="data/pkl/ur5_prm_3000.pkl",
    ),
    "snake7": dict(
        explorer=dict(workspace_size=3, config_size=7, embed_size=32, obs_size=2),
        explorer_ckpt="data/weights/weights_snake.pt",
        # snake7 runs on a regenerated problem set (upstream ships none);
        # the upstream snake weights were trained on upstream's own
        # (unavailable) dataset, so a checkpoint fine-tuned on the
        # regenerated PRM data replaces them when present
        # (tools/train_scratch.py explorer snake7 --finetune)
        explorer_ft="weights_snake_ft.npz",
        smoother=dict(workspace_size=3, config_size=7, embed_size=128, obs_size=6),
        smoother_ckpt="data/weights/smooth_snake_attv3.pt",
        data="data/pkl/snake_prm_3000.pkl",
    ),
    "kuka13": dict(
        explorer=dict(workspace_size=3, config_size=13, embed_size=32, obs_size=6),
        explorer_ckpt="data/weights/weights_kuka_13.pt",
        smoother=dict(workspace_size=3, config_size=13, embed_size=128, obs_size=6),
        smoother_ckpt="data/weights/smooth_13d_attv3.pt",
        data="data/pkl/kuka_prm_13.pkl",
    ),
    "kuka14": dict(
        explorer=dict(workspace_size=3, config_size=14, embed_size=32, obs_size=6),
        explorer_ckpt="data/weights/kuka_14.pt",
        smoother=dict(workspace_size=3, config_size=14, embed_size=128, obs_size=6),
        smoother_ckpt="data/weights/smooth_14d_attv3.pt",
        data="data/pkl/kuka_prm_14.pkl",
    ),
}


# Per-config eval-harness overrides. The reference protocol is batch=500,
# t_max=500 (eval_gnn.py:96) — one sampling round. snake7 runs on a
# regenerated dataset (upstream ships no snake problem file) that is harder
# than the other envs under that budget: its verified-solvable head
# contains narrow-passage instances needing 2-4 resample rounds
# (tools/diagnose_snake.py: every BIT*-unsolved failure is GNN-solvable at
# t_max=2000). Raising t_max only adds rounds on first-round failures, so
# mean collision checks stay well under the 2x inflation bound.
EVAL_OVERRIDES = {
    "snake7": {"t_max": 2000},
    # cheap-oracle envs finish their greedy search well inside one chunk;
    # a large chunk makes the batched path one device call per round (the
    # compaction machinery only pays off where per-pop kernels are heavy)
    "maze2easy": {"chunk": 4096},
    "maze2hard": {"chunk": 4096},
    "maze3": {"chunk": 4096},
}


# knobs that tune only the batched lane-compaction path; the scalar
# protocol explore() does not accept them
_BATCHED_ONLY = ("chunk", "lanes")


def eval_overrides(name: str) -> dict:
    """Harness kwargs overriding the reference defaults for one config."""

    return dict(EVAL_OVERRIDES.get(name, {}))


def scalar_overrides(name: str) -> dict:
    """Protocol overrides valid for the scalar explore path (batched-only
    knobs like `chunk` dropped — they would TypeError in explore())."""

    return {
        k: v for k, v in EVAL_OVERRIDES.get(name, {}).items()
        if k not in _BATCHED_ONLY
    }


def _spec_key(name: str) -> str:
    if "maze2" in name:
        return "maze2"
    return name


def _scratch_npz(ckpt: str):
    """Path of the from-scratch-trained twin of a converted checkpoint
    (tools/train_scratch.py naming: <stem-without-_attv3>_scratch.npz)."""

    from pathlib import Path

    return (
        Path(__file__).resolve().parents[2]
        / "assets" / "weights_jax"
        / (Path(ckpt).stem.replace("_attv3", "") + "_scratch.npz")
    )


def _load_npz(path):
    import numpy as np

    from gnn_motion_planning_tpu.models.convert import _nest

    with np.load(path) as f:
        return _nest({k: f[k] for k in f.files})


def _prefer_scratch() -> bool:
    """GMP_WEIGHTS=scratch runs every config on the in-repo-trained
    checkpoints (tools/train_scratch.py) instead of the converted upstream
    weights — the reproduce-everything-from-source mode."""

    import os

    return os.environ.get("GMP_WEIGHTS", "").lower() == "scratch"


def _load_explorer_params(spec, ckpt: str):
    """Explorer params: the converted upstream checkpoint, unless the spec
    names a fine-tuned replacement (``explorer_ft``) and it exists —
    configs on regenerated datasets (snake7) prefer weights trained on the
    data they are evaluated with. GMP_WEIGHTS=scratch overrides both with
    the from-scratch checkpoint when it exists."""

    if _prefer_scratch():
        scratch = _scratch_npz(ckpt)
        if scratch.exists():
            return _load_npz(scratch)

    ft_name = spec.get("explorer_ft")
    if ft_name and "_pure" not in ckpt:  # obstacle-free ablation keeps .pt
        from pathlib import Path

        ft = (
            Path(__file__).resolve().parents[2]
            / "assets" / "weights_jax" / ft_name
        )
        if ft.exists():
            import numpy as np

            from gnn_motion_planning_tpu.models.convert import _nest

            with np.load(ft) as f:
                return _nest({k: f[k] for k in f.files})
    return load_params(ckpt)


def _load_smoother_params(ckpt: str):
    """Smoother params, or None when only a legacy-architecture checkpoint
    exists. The reference names the maze3 smoother smooth_3d_attv3.pt but
    ships only smooth_3d_att.pt (str2name.py:25 vs data/weights/), an older
    lstm+graph-attention model its current ModelSmoother cannot load; maze3
    therefore smooths with the oracle smoother (eval_gnn.explore falls back
    when params is None). GMP_WEIGHTS=scratch prefers the from-scratch
    checkpoint whenever it exists."""

    if _prefer_scratch():
        scratch = _scratch_npz(ckpt)
        if scratch.exists():
            return _load_npz(scratch)

    params = load_params(ckpt)
    if "0" not in params.get("node_code", {}):
        # no loadable upstream checkpoint: prefer this framework's
        # from-scratch-trained replacement when present
        # (tools/train_scratch.py smoother maze3)
        scratch = _scratch_npz(ckpt)
        if scratch.exists():
            return _load_npz(scratch)
        return None
    return params


def str2models(name: str, use_obstacle: bool = True, scale: float = 1.0):
    """(explorer_model, smoother_model) without constructing the env —
    useful when the env's dataset is being (re)generated."""

    spec = _SPECS[_spec_key(name)]
    explorer_ckpt = spec["explorer_ckpt"]
    if not use_obstacle:
        explorer_ckpt = explorer_ckpt.replace(".pt", "_pure.pt")
    explorer = ExplorerModel(
        params=_load_explorer_params(spec, explorer_ckpt),
        cfg=ExplorerConfig(use_obstacles=use_obstacle, **spec["explorer"]),
    )
    smoother = SmootherModel(
        params=_load_smoother_params(spec["smoother_ckpt"]),
        cfg=SmootherConfig(scale=scale, **spec["smoother"]),
    )
    return explorer, smoother


def str2name(name: str, get_data: bool = False, use_obstacle: bool = True, load: bool = True):
    """(env, explorer_model, explorer_ckpt, smoother_model, smoother_ckpt
    [, data_path]) — reference str2name.py:11-81."""

    import gnn_motion_planning_tpu.envs as envs

    key = _spec_key(name)
    spec = _SPECS[key]

    if key == "maze2":
        env = envs.MazeEnv(dim=2)
    elif key == "maze3":
        env = envs.MazeEnv(dim=3)
    elif key == "kuka7":
        env = envs.KukaEnv()
    elif key == "ur5":
        env = envs.UR5Env()
    elif key == "snake7":
        env = envs.SnakeEnv(map_file="maze_files/snakes_15_2_3000.npz")
    elif key == "kuka13":
        env = envs.KukaEnv(
            kuka_file="kuka_iiwa/model_3.urdf",
            map_file="maze_files/kukas_13_3000.pkl",
        )
    elif key == "kuka14":
        env = envs.Kuka2Env()

    explorer_ckpt = spec["explorer_ckpt"]
    if not use_obstacle:
        explorer_ckpt = explorer_ckpt.replace(".pt", "_pure.pt")

    scale = float(np.max(env.bound)) if key == "ur5" else 1.0
    explorer_cfg = ExplorerConfig(use_obstacles=use_obstacle, **spec["explorer"])
    smoother_cfg = SmootherConfig(scale=scale, **spec["smoother"])

    explorer = ExplorerModel(
        params=_load_explorer_params(spec, explorer_ckpt) if load else None,
        cfg=explorer_cfg,
    )
    smoother = SmootherModel(
        params=_load_smoother_params(spec["smoother_ckpt"]) if load else None,
        cfg=smoother_cfg,
    )

    if get_data:
        return env, explorer, explorer_ckpt, smoother, spec["smoother_ckpt"], spec["data"]
    return env, explorer, explorer_ckpt, smoother, spec["smoother_ckpt"]
