#!/bin/bash
# Round-3 sweep chain, part A: host-only cells (no TPU needed).
cd /root/repo
export JAX_PLATFORMS=cpu
timeout 10800 python tools/grand_sweep.py --envs=Kuka_14D --methods='RRT*,LazySP' >> /tmp/sweep_r3a.log 2>&1
echo "PART_A_DONE rc=$?" >> /tmp/sweep_r3a.log
