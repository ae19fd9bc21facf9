#!/bin/bash
# Round-4 phase 5: finish the smoother scratch matrix (ur5 + snake7 were
# interrupted by the session restart; kuka7 completed at 400/2/20).
set -euo pipefail
cd /root/repo
W=assets/weights_jax
LOG=assets/train_logs

step() { echo "=== [$(date +%H:%M:%S)] $1"; }

step "ur5 smoother scratch (epoch 400/2/20)"
timeout 4500 python tools/train_scratch.py smoother ur5 400 2 20 \
  2>&1 | tee "$LOG/ur5_smoother_scratch.train.log" | tail -2
step "ur5 smoother eval (n=100)"
timeout 1200 python tools/eval_scratch.py --smoother "$W/smooth_ur5_scratch.npz" ur5 100 \
  2>&1 | tail -3

step "snake7 smoother scratch (epoch 400/2/20)"
timeout 4500 python tools/train_scratch.py smoother snake7 400 2 20 \
  2>&1 | tee "$LOG/snake7_smoother_scratch.train.log" | tail -2
step "snake7 smoother eval (n=100)"
timeout 1200 python tools/eval_scratch.py --smoother "$W/smooth_snake_scratch.npz" snake7 100 \
  2>&1 | tail -3

echo "=== chain_r4e done"
