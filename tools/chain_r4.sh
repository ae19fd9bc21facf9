#!/bin/bash
# Round-4 scratch-training chain: the remaining explorer checkpoints
# (VERDICT item 6), each followed by a full-split eval of the fresh
# checkpoint so every registry env gets a scratch row comparable to the
# converted-upstream-weights row. Steps are serialized because the box
# has one TPU chip. set -euo pipefail per round-3 advisor finding.
set -euo pipefail
cd /root/repo
LOG=assets/train_logs

step() { echo "=== [$(date +%H:%M:%S)] $1"; }

for cfg in snake7 maze3 ur5 kuka13 kuka14; do
  step "train explorer $cfg (scratch)"
  timeout 3000 python tools/train_scratch.py explorer "$cfg" 2000 6 \
    2>&1 | tee "$LOG/${cfg}_explorer_scratch.train.log" | tail -2
done

echo "=== all explorer scratch trainings done"
