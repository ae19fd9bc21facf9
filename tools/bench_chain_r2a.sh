#!/bin/bash
# Round-2 TPU chain A: full-split GNN protocol runs for the envs whose
# numbers round 1 left incomplete (VERDICT item 3).
cd /root/repo
set -x
python tools/run_benchmarks.py maze3 1000 --methods=GNN >> /tmp/bench_r2a.log 2>&1
python tools/run_benchmarks.py maze2hard 1000 --methods=GNN,GNN-batched >> /tmp/bench_r2a.log 2>&1
python tools/run_benchmarks.py ur5 1000 --methods=GNN >> /tmp/bench_r2a.log 2>&1
python tools/run_benchmarks.py kuka13 1000 --methods=GNN >> /tmp/bench_r2a.log 2>&1
echo CHAIN_A_DONE >> /tmp/bench_r2a.log
