#!/bin/bash
# Round-4 phase 3: close the quality gap of the quick scratch runs.
# - kuka7/ur5 smoothers at the maze3-smoother scale (400/2/20; the
#   150/2/15 quick runs landed 20% worse path cost than converted)
# - maze3 explorer third leg (resume; 95/100 after two legs vs 98.6%
#   converted)
set -euo pipefail
cd /root/repo
W=assets/weights_jax
LOG=assets/train_logs

step() { echo "=== [$(date +%H:%M:%S)] $1"; }

step "kuka7 smoother retrain (epoch 400/2/20)"
timeout 4500 python tools/train_scratch.py smoother kuka7 400 2 20 \
  2>&1 | tee "$LOG/kuka7_smoother_scratch.train.log" | tail -2
step "kuka7 smoother eval (n=100)"
timeout 1200 python tools/eval_scratch.py --smoother "$W/smooth_7d_scratch.npz" kuka7 100 \
  2>&1 | tail -3

step "ur5 smoother retrain (epoch 400/2/20)"
timeout 4500 python tools/train_scratch.py smoother ur5 400 2 20 \
  2>&1 | tee "$LOG/ur5_smoother_scratch.train.log" | tail -2
step "ur5 smoother eval (n=100)"
timeout 1200 python tools/eval_scratch.py --smoother "$W/smooth_ur5_scratch.npz" ur5 100 \
  2>&1 | tail -3

step "maze3 explorer leg 3 (resume, epoch 4000/10)"
timeout 4000 python tools/train_scratch.py explorer maze3 4000 10 \
  2>&1 | tee "$LOG/maze3_explorer_scratch.train.log" | tail -2
step "maze3 scratch eval (n=100)"
timeout 1800 python tools/eval_scratch.py "$W/weights_maze_3_scratch.npz" maze3 100 \
  2>&1 | tail -3

echo "=== chain_r4c done"
