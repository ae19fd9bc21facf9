#!/bin/bash
# Round-3 session-e TPU job chain — strictly sequential (one chip, 1-core
# host). Runs after the ur5 cheap-kernel benchmark refresh:
#
#   1. kuka7 from-scratch explorer full-split eval (VERDICT item 4 parity;
#      writes the eval_kuka7.json BASELINE.md references).
#   2. snake7 registry rows re-measured with the cheap-budget edge kernel
#      (K_CHEAP=128 vs k_max=292 — envs/base.py).
#   3. strict hull-exact re-certification of planner-returned paths
#      (tools/strict_paths.py) on all four arm envs.
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

step snake7_rows
timeout 7200 python tools/run_benchmarks.py snake7 250 "--methods=GNN,GNN-batched,GNN-ref-budget" \
  2>&1 | tail -6

step strict_paths
timeout 14400 python tools/strict_paths.py all 100 2>&1 | tail -10

step done
