#!/bin/bash
# Round-3 follow-on chain (runs after chain_r3.sh): NEXT from-scratch
# training at reference scale + eval certification, then a smoother
# scratch eval comparison. Same marker protocol as chain_r3.sh.
cd /root/repo
L=/tmp/chain_r3b.log

step() {
  name=$1; shift
  if [ -f "/tmp/r3b_done_$name" ]; then echo "skip $name" >>"$L"; return 0; fi
  echo "=== $name === $(date +%H:%M:%S)" >>"$L"
  if "$@" >>"$L" 2>&1; then
    touch "/tmp/r3b_done_$name"; echo "--- $name OK $(date +%H:%M:%S)" >>"$L"
  else
    echo "--- $name FAILED rc=$? $(date +%H:%M:%S)" >>"$L"
  fi
}

# NEXT from-scratch on maze2 (reference train_next.py protocol, trains on
# problems 0..n-1 of mazes_15_2_3000 — eval split is 2000-3000, disjoint).
# Runs entirely on CPU: the model is tiny and NEXT_plan is host-bound, so
# this never contends with whatever the main chain runs on the one chip.
step train_next_maze2 timeout 18000 env JAX_PLATFORMS=cpu python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
from gnn_motion_planning_tpu.training.next import train_next
train_next(
    "maze2easy", T=500, n_problems=1000, seed=1234,
    model_path="assets/weights_jax/next_2_scratch_r3.npz",
    train_every=200, log_dir="assets/train_logs/maze2_next_scratch",
    from_scratch=True,
)
EOF

step eval_next_scratch env JAX_PLATFORMS=cpu python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, "tools")
from eval_scratch import main_next
main_next("assets/weights_jax/next_2_scratch_r3.npz", "maze2easy", 250)
EOF

echo "CHAIN_R3B_DONE $(date)" >>"$L"
# NOTE: tools/ab_capsule.py (capsule-kernel A/B) needs the real chip —
# run it manually after chain_r3.sh releases the TPU.
