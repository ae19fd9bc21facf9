#!/bin/bash
# Round-3 sweep chain, part B: NEXT cells (TPU for the model forwards).
cd /root/repo
timeout 21600 python tools/grand_sweep.py --envs=Kuka_7D,Kuka_13D,Kuka_14D --methods=NEXT >> /tmp/sweep_r3b.log 2>&1
echo "PART_B_DONE rc=$?" >> /tmp/sweep_r3b.log
