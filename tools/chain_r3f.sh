#!/bin/bash
# Round-3 session-f TPU job chain — strictly sequential (one chip, 1-core
# host). Trimmed from chain_r3e.sh to fit a short session: the missing
# kuka7-scratch eval artifact first (BASELINE.md references it), then the
# timed refreshes that benefit from the flat-packed projection sweep
# (437fe69) and adaptive sampling chunks (672109c).
set -x
cd /root/repo

step() { echo "=== CHAIN STEP: $* ==="; }

step kuka7_scratch_eval
timeout 2400 python - <<'EOF' 2>&1 | tail -8
import json, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from eval_scratch import main
out = main("assets/weights_jax/weights_kuka_scratch.npz", "kuka7", 1000)
succ, checks, t, cost, total = out[:5]
rec = {
    "ckpt": "weights_kuka_scratch.npz",
    "n_problems": 1000,
    "success": int(succ),
    "collision_checks": float(checks),
    "running_time_s": float(t),
    "path_cost": float(cost),
    "converted_weights_row": "assets/benchmarks/kuka7.json (996/1000, 979 checks)",
}
open("assets/train_logs/kuka7_explorer_scratch/eval_kuka7.json", "w").write(
    json.dumps(rec, indent=1)
)
print(json.dumps(rec))
EOF

step snake7_rows_flat
timeout 2700 python tools/run_benchmarks.py snake7 250 "--methods=GNN,GNN-ref-budget" \
  2>&1 | tail -6

step kuka14_p50_flat
timeout 1800 python tools/refresh_gnn_rows.py \
  "bench:kuka14:400:GNN-p50" \
  2>&1 | tail -8

step ur5_row_flat
timeout 2400 python tools/run_benchmarks.py ur5 1000 "--methods=GNN" 2>&1 | tail -4

step done
