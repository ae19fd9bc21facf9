#!/bin/bash
# Round-3 session-e TPU job chain — strictly sequential (one chip, 1-core
# host; timed rows are contaminated by concurrent work). Order: timed
# benchmark refreshes first (flat projection landed in 437fe69), then the
# untimed audits.
set -x
cd /root/repo

step() { echo "=== CHAIN STEP: $* ==="; }

step ur5_rows_flat
timeout 3000 python tools/run_benchmarks.py ur5 1000 "--methods=GNN" 2>&1 | tail -4

step kuka_maze_rows_flat
timeout 14400 python tools/refresh_gnn_rows.py \
  "gnn:kuka14:Kuka_14D:400" \
  "bench:kuka14:400:GNN-p50,GNN-batched,GNN-serve" \
  "gnn:kuka7:Kuka_7D:1000" \
  "gnn:kuka13:Kuka_13D:250" \
  2>&1 | tail -20

step snake7_rows_flat
timeout 7200 python tools/run_benchmarks.py snake7 250 "--methods=GNN,GNN-batched,GNN-ref-budget" \
  2>&1 | tail -6

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

step strict_paths
timeout 14400 python tools/strict_paths.py all 100 2>&1 | tail -10

step done
