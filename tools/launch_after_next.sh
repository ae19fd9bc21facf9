#!/bin/bash
# Waits for the NEXT sweep (part B) to finish, then: (1) one timed full
# test-suite run in the clean window (per-test durations for slow-marking),
# (2) the round-3 TPU chain.
cd /root/repo
while ! grep -q PART_B_DONE /tmp/sweep_r3b.log 2>/dev/null; do sleep 60; done
echo "NEXT done at $(date)" > /tmp/launch_r3.log
JAX_PLATFORMS=cpu timeout 1500 python -m pytest tests/ -q -m "" --durations=60 -p no:cacheprovider > /tmp/pytest_timed.log 2>&1
echo "pytest rc=$? at $(date)" >> /tmp/launch_r3.log
bash tools/chain_r3.sh
echo "chain done at $(date)" >> /tmp/launch_r3.log
