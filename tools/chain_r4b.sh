#!/bin/bash
# Round-4 phase 2: snake7 ref-budget experiments, maze3 explorer retrain
# (the 2000-epoch checkpoint was too weak to finish its eval), and the
# remaining scratch smoothers (kuka7, ur5). Serialized: one TPU chip.
set -euo pipefail
cd /root/repo
W=assets/weights_jax
LOG=assets/train_logs

step() { echo "=== [$(date +%H:%M:%S)] $1"; }

# --- A. snake7 ref-budget signal runs (n=250 heads, t_max=500) ---------
step "snake7 scratch @ ref budget"
timeout 900 python tools/eval_scratch.py "$W/weights_snake_scratch.npz" snake7 250 500 \
  2>&1 | tail -3
step "snake7 ft + straight bias @ ref budget"
timeout 900 python tools/eval_scratch.py "$W/weights_snake_ft.npz" snake7 250 500 \
  --bias straight 2>&1 | tail -3

# --- B. maze3 explorer retrain (bigger budget) + eval ------------------
step "maze3 explorer retrain (epoch 4000, iters 10)"
timeout 4000 python tools/train_scratch.py explorer maze3 4000 10 \
  2>&1 | tee "$LOG/maze3_explorer_scratch.train.log" | tail -2
step "maze3 scratch eval (n=100)"
timeout 1800 python tools/eval_scratch.py "$W/weights_maze_3_scratch.npz" maze3 100 \
  2>&1 | tail -3

# --- C. kuka7 smoother scratch + eval ----------------------------------
step "kuka7 smoother scratch (epoch 150)"
timeout 3600 python tools/train_scratch.py smoother kuka7 150 2 15 \
  2>&1 | tee "$LOG/kuka7_smoother_scratch.train.log" | tail -2
step "kuka7 smoother scratch eval (n=100)"
timeout 1200 python tools/eval_scratch.py --smoother "$W/smooth_7d_scratch.npz" kuka7 100 \
  2>&1 | tail -3

# --- D. ur5 smoother scratch + eval ------------------------------------
step "ur5 smoother scratch (epoch 150)"
timeout 3600 python tools/train_scratch.py smoother ur5 150 2 15 \
  2>&1 | tee "$LOG/ur5_smoother_scratch.train.log" | tail -2
step "ur5 smoother scratch eval (n=100)"
timeout 1200 python tools/eval_scratch.py --smoother "$W/smooth_ur5_scratch.npz" ur5 100 \
  2>&1 | tail -3

echo "=== chain_r4b done"
