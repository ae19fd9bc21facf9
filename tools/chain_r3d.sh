#!/bin/bash
# Round-3 session-d TPU job chain: run strictly sequentially (one chip,
# 1-core host — concurrent runs contaminate timing rows).
#
#   1. snake7 ref-budget eval with the fine-tuned explorer (auto pickup):
#      decides whether weights_snake_ft.npz stays.
#   2. kuka7 from-scratch explorer full-split eval (VERDICT item 4 parity).
#   3. refresh the remaining stale sweep/registry GNN rows so data/result.p
#      and assets/benchmarks/*.json agree (per-problem RNG protocol).
#   4. snake7 registry rows re-measured post device-resident-resample.
set -x
cd /root/repo

step() { echo "=== CHAIN STEP: $* ==="; }

step snake_ft_refbudget
timeout 2400 python tools/run_benchmarks.py snake7 250 "--methods=GNN-ref-budget" \
  2>&1 | tail -5

step kuka7_scratch_eval
timeout 2400 python tools/eval_scratch.py assets/weights_jax/weights_kuka_scratch.npz kuka7 1000 \
  2>&1 | tail -5

step refresh_rows
timeout 14400 python tools/refresh_gnn_rows.py \
  gnn:kuka7:Kuka_7D:1000 \
  gnn:kuka13:Kuka_13D:250 \
  gnn:maze3:Maze_3D:1000 \
  gnn:maze2hard:Maze_2D_Hard:1000 \
  sweep:Maze_2D_Normal \
  gnn:maze2easy:Maze_2D_Easy:1000 \
  2>&1 | tail -20

step snake7_rows
timeout 7200 python tools/run_benchmarks.py snake7 250 "--methods=GNN,GNN-batched" \
  2>&1 | tail -5

step done
