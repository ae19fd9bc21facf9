"""env.plot renders on every env family (reference env protocol:
kuka_env.py:281, kuka_2arm_env.py:265, ur5_env.py:306, snake_env.py:287)."""

import numpy as np
import pytest

from gnn_motion_planning_tpu.api.registry import str2env


@pytest.mark.parametrize(
    "name",
    [
        "maze2easy", "maze3", "kuka7",
        pytest.param("kuka14", marks=pytest.mark.slow),
        pytest.param("ur5", marks=pytest.mark.slow),
        pytest.param("snake7", marks=pytest.mark.slow),
    ],
)
def test_plot_runs_and_returns_frames(name, tmp_path):
    env, idx = str2env(name)
    env.init_new_problem(int(idx[0]))
    path = [np.asarray(env.init_state, float), np.asarray(env.goal_state, float)]

    if name == "snake7":
        frames = env.plot(env.map, path, make_gif=True)
    else:
        frames = env.plot(path, make_gif=True)
    assert len(frames) >= 2
    f0 = np.asarray(frames[0])
    assert f0.ndim == 3 and f0.shape[-1] == 4  # RGBA
    assert f0.shape == np.asarray(frames[-1]).shape

    # static render + file output
    out = tmp_path / f"{name}.png"
    if name == "snake7":
        res = env.plot(env.map, path, make_gif=False, save_path=str(out))
    else:
        res = env.plot(path, make_gif=False, save_path=str(out))
    assert res == []
    assert out.exists() and out.stat().st_size > 0
