#!/bin/bash
cd /root/repo
python tools/run_benchmarks.py kuka14 100 --methods=GNN-p50 >> /tmp/bench_runs3.log 2>&1
python tools/run_benchmarks.py kuka14 100 --methods=GNN-batched >> /tmp/bench_runs3.log 2>&1
echo B3_DONE > /tmp/bench_status.log
