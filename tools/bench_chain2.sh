#!/bin/bash
cd /root/repo
python tools/run_benchmarks.py maze2easy 1000 --methods=GNN-batched >> /tmp/bench_runs2.log 2>&1
python tools/run_benchmarks.py maze2easy 300 --methods=GNN >> /tmp/bench_runs2.log 2>&1
python tools/run_benchmarks.py kuka7 200 --methods=GNN >> /tmp/bench_runs2.log 2>&1
python tools/run_benchmarks.py kuka14 200 --methods=GNN >> /tmp/bench_runs2.log 2>&1
python tools/run_benchmarks.py kuka13 100 --methods=GNN >> /tmp/bench_runs2.log 2>&1
python tools/run_benchmarks.py ur5 100 --methods=GNN >> /tmp/bench_runs2.log 2>&1
python tools/run_benchmarks.py snake7 100 --methods=GNN >> /tmp/bench_runs2.log 2>&1
python bench.py > /tmp/bench_headline.json 2>/dev/null
echo BENCH2_DONE > /tmp/bench_status.log
