#!/bin/bash
cd /root/repo
python tools/run_benchmarks.py kuka7 1000 --methods=GNN >> /tmp/bench_runs4.log 2>&1
python tools/run_benchmarks.py kuka14 400 --methods=GNN >> /tmp/bench_runs4.log 2>&1
echo B4_DONE > /tmp/bench_status.log
