#!/bin/bash
# Round-4 phase 4, serialized behind chain_r4c (the axon TPU is
# single-process — .claude/skills/verify/SKILL.md):
# - occupancy-bitmap kernel A/B (bench headline path)
# - snake7 corridor-sampler rows at the reference budget (the remaining
#   round-3 verdict item: 902/1000 at t_max=500 is sample-coverage-bound,
#   failures_snake7_refbudget.json)
# - smoother scratch checkpoints for the four remaining families
#   (snake7/kuka13/kuka14/maze2)
# - kuka14 batched-lane row refresh (BASELINE.md "round-4 refresh pending")
set -euo pipefail
cd /root/repo
W=assets/weights_jax
LOG=assets/train_logs

step() { echo "=== [$(date +%H:%M:%S)] $1"; }

if [ -f /tmp/chain_r4c.pid ]; then
  while kill -0 "$(cat /tmp/chain_r4c.pid)" 2>/dev/null; do sleep 30; done
fi

step "occupancy bitmap A/B (bit-equality + throughput)"
timeout 900 python tools/ab_occ.py 2>&1 | tail -2

step "snake7 corridor sampler: ref-budget head (ft weights, t_max=500)"
timeout 2400 python tools/eval_scratch.py "$W/weights_snake_ft.npz" snake7 250 500 \
  --bias corridor 2>&1 | tail -3
step "snake7 corridor sampler: full split (ft weights, t_max=500)"
timeout 5400 python tools/eval_scratch.py "$W/weights_snake_ft.npz" snake7 1000 500 \
  --bias corridor 2>&1 | tail -3

step "snake7 smoother scratch (400/2/20)"
timeout 2700 python tools/train_scratch.py smoother snake7 400 2 20 \
  2>&1 | tee "$LOG/snake7_smoother_scratch.train.log" | tail -2
step "snake7 smoother eval (n=100)"
timeout 1500 python tools/eval_scratch.py --smoother "$W/smooth_snake_scratch.npz" snake7 100 \
  2>&1 | tail -3

step "kuka13 smoother scratch (400/2/20)"
timeout 2700 python tools/train_scratch.py smoother kuka13 400 2 20 \
  2>&1 | tee "$LOG/kuka13_smoother_scratch.train.log" | tail -2
step "kuka13 smoother eval (n=100)"
timeout 1500 python tools/eval_scratch.py --smoother "$W/smooth_13d_scratch.npz" kuka13 100 \
  2>&1 | tail -3

step "kuka14 smoother scratch (400/2/20)"
timeout 2700 python tools/train_scratch.py smoother kuka14 400 2 20 \
  2>&1 | tee "$LOG/kuka14_smoother_scratch.train.log" | tail -2
step "kuka14 smoother eval (n=100)"
timeout 1500 python tools/eval_scratch.py --smoother "$W/smooth_14d_scratch.npz" kuka14 100 \
  2>&1 | tail -3

step "maze2 smoother scratch (400/2/20)"
timeout 2700 python tools/train_scratch.py smoother maze2easy 400 2 20 \
  2>&1 | tee "$LOG/maze2_smoother_scratch.train.log" | tail -2
step "maze2 smoother eval (n=100)"
timeout 1500 python tools/eval_scratch.py --smoother "$W/smooth_2d_scratch.npz" maze2easy 100 \
  2>&1 | tail -3

step "kuka14 batched-lane row refresh"
timeout 2400 python tools/refresh_gnn_rows.py bench:kuka14:1000:GNN-batched 2>&1 | tail -4

echo "=== chain_r4d done"
