#!/bin/bash
# Round-3 sweep chain, part B: NEXT cells. The per-iteration NEXT forwards
# are tiny (attention + MLPs over precomputed problem features) — host-side
# placement beats per-call TPU tunnel RPCs ~3.5x, so these cells run on CPU.
cd /root/repo
export JAX_PLATFORMS=cpu
timeout 18000 python tools/grand_sweep.py --envs=Kuka_7D,Kuka_13D,Kuka_14D --methods=NEXT >> /tmp/sweep_r3b.log 2>&1
echo "PART_B_DONE rc=$?" >> /tmp/sweep_r3b.log
