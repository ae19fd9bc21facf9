"""Reference-planner head-to-head: the last parity link, pinned.

tools/ref_headtohead.py runs the reference's own `explore`
(reference eval_gnn.py:168-276, unmodified but for a documented
torch-1.x indexing-semantics shim) against this framework's planner on
the identical global np.random stream, per problem. The committed
artifacts pin the result: on the CPU-runnable maze2 configs the two
planners agree on success for every problem and produce bit-identical
collision-check counts on ≥99% of them (float32 argmax tie-breaking is
the only known divergence channel, SURVEY §7 hard part 1).

The artifact test is the default-suite gate; the slow-marked live test
re-derives a 2-problem head-to-head from scratch.
"""

import json
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

ARTIFACTS = [
    REPO / "assets" / "benchmarks" / "headtohead_maze2easy.json",
    REPO / "assets" / "benchmarks" / "headtohead_maze2hard.json",
]


@pytest.mark.parametrize(
    "path", ARTIFACTS, ids=[p.stem.split("_", 1)[1] for p in ARTIFACTS]
)
def test_headtohead_artifact(path):
    assert path.exists(), f"run tools/ref_headtohead.py to produce {path}"
    art = json.loads(path.read_text())
    cmp_ = art["compare"]
    n = cmp_["n"]
    assert n >= 100, "head-to-head must cover >=100 problems"
    # success decisions must agree on every problem
    assert cmp_["success_agree"] == n, cmp_["disagree_indexes"]
    # collision-check counts: bit-identical on (almost) all problems —
    # identical samples + identical greedy decisions + identical lazy
    # checks; tie-break flips are the only tolerated channel
    assert cmp_["checks_identical"] >= 0.99 * cmp_["both_success"], cmp_
    # smoothed path cost matches to float32 round-off
    assert cmp_["cost_delta_max_abs"] <= 1e-3, cmp_

    # the aggregates both sides print (reference eval_gnn.py:128-142)
    ref, ours = art["reference_agg"], art["ours_agg"]
    assert ref["success"] == ours["success"]
    assert abs(ref["collision_check"] - ours["collision_check"]) <= (
        0.01 * ref["collision_check"]
    )


@pytest.mark.slow
def test_headtohead_live():
    """Re-derive a 2-problem head-to-head from scratch (reference code +
    our planner, same stream) and require bit-identical checks."""

    import sys

    sys.path.insert(0, str(REPO))
    from tools.ref_headtohead import SPLITS, compare, run_ours, run_reference

    indexes = SPLITS["maze2easy"][:2]
    ref_rows = run_reference("maze2easy", indexes)
    our_rows = run_ours("maze2easy", indexes)
    cmp_ = compare(ref_rows, our_rows)
    assert cmp_["success_agree"] == 2
    assert cmp_["checks_identical"] == cmp_["both_success"]
