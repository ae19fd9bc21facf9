"""Grand-sweep smoke: eval_all runs ALL five methods end-to-end.

Round-1 regression: eval_all passed `str=` by keyword but eval_gnn's
parameter is `str_`, so the headline GNN method crashed with a TypeError
(reference sweep: eval_all.py:26-45). This pins every method dispatching
correctly through the sweep loop on a tiny problem count.
"""

import pytest
import pickle


@pytest.mark.slow
def test_eval_all_five_methods(tmp_path):
    from gnn_motion_planning_tpu.api.eval_all import METHODS, eval_all

    out = tmp_path / "result.p"
    result = eval_all(
        env_names=["Maze_2D_Easy"],
        method_names=list(METHODS),
        out_path=str(out),
        n_problems=2,
    )
    # 5 methods x (per-seed + Avg) rows
    methods_seen = {k[1] for k in result}
    assert methods_seen == set(METHODS)
    for key, row in result.items():
        assert len(row) >= 5
        n_success = row[0]
        assert 0 <= n_success <= 2, (key, n_success)

    saved = pickle.loads(out.read_bytes())
    assert {k[1] for k in saved} == set(METHODS)
