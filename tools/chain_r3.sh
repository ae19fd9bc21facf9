#!/bin/bash
# Round-3 serialized TPU chain: PRM regen (train-split-only), from-scratch
# trainings, full benchmark refresh under the per-problem-RNG protocol,
# strict oracle audits, and the grand-sweep GNN row refresh.
# Resumable: each step leaves a /tmp/r3_done_<name> marker and is skipped
# on re-run. One TPU process at a time (host rule).
cd /root/repo
L=/tmp/chain_r3.log

step() {
  name=$1; shift
  if [ -f "/tmp/r3_done_$name" ]; then echo "skip $name" >>"$L"; return 0; fi
  echo "=== $name === $(date +%H:%M:%S)" >>"$L"
  if "$@" >>"$L" 2>&1; then
    touch "/tmp/r3_done_$name"; echo "--- $name OK $(date +%H:%M:%S)" >>"$L"
  else
    echo "--- $name FAILED rc=$? $(date +%H:%M:%S)" >>"$L"
  fi
}

# 1. PRM training data, train-split-only (kuka7 runs the native host core)
step prm_kuka7 env JAX_PLATFORMS=cpu python tools/generate_prm.py kuka7
step prm_maze2 python tools/generate_prm.py maze2
step prm_maze3 python tools/generate_prm.py maze3

# 2. from-scratch trainings (clean data) + their eval certifications.
# Archive round-2 scratch checkpoints first: they were trained on PRM data
# whose problem cycle included the eval split, and the trainer resumes from
# an existing checkpoint — the round-3 runs must start from fresh init.
step archive_r2_scratch bash -c 'mkdir -p assets/weights_jax/r2_archive && for f in weights_maze_scratch smooth_2d_scratch next_2_scratch; do [ -f assets/weights_jax/$f.npz ] && mv assets/weights_jax/$f.npz assets/weights_jax/r2_archive/; done; true'
step train_expl_maze2 timeout 7200 python tools/train_scratch.py explorer maze2easy 2000 6
step train_expl_kuka7 timeout 9000 python tools/train_scratch.py explorer kuka7 2000 6
step train_smooth_maze3 timeout 7200 python tools/train_scratch.py smoother maze3 400 2 20
step eval_scratch_maze2 python tools/eval_scratch.py assets/weights_jax/weights_maze_scratch.npz maze2easy 1000
step eval_scratch_kuka7 python tools/eval_scratch.py assets/weights_jax/weights_kuka_scratch.npz kuka7 1000

# 3. benchmark refresh (per-problem RNG protocol; maze3 picks up the
#    scratch smoother trained above)
step bench_maze2easy python tools/run_benchmarks.py maze2easy 1000 --methods=GNN,GNN-batched
step bench_maze2hard python tools/run_benchmarks.py maze2hard 1000 --methods=GNN
step bench_maze3 python tools/run_benchmarks.py maze3 1000 --methods=GNN,GNN-batched
step bench_kuka7 python tools/run_benchmarks.py kuka7 1000 --methods=GNN
step bench_kuka13 python tools/run_benchmarks.py kuka13 250 --methods=GNN
step bench_kuka14 python tools/run_benchmarks.py kuka14 400 --methods=GNN,GNN-batched,GNN-p50,GNN-serve
# ur5 moved to a 6-capsule fit (round-3 strict audit): recalibrate first
step calib_ur5 timeout 5400 python tools/calibrate_capsules.py ur5
step bench_ur5 python tools/run_benchmarks.py ur5 1000 --methods=GNN
step bench_snake7 python tools/run_benchmarks.py snake7 250 --methods=GNN,GNN-batched,GNN-ref-budget

# 4. strict capsule-oracle audits at scale
step strict_audits timeout 7200 python tools/strict_verifier.py all 100000

# 5. grand-sweep GNN rows under the new protocol (delete then re-run)
step sweep_gnn_refresh bash -c "python - <<'EOF'
import pickle
d = pickle.load(open('data/result.p','rb'))
for k in [k for k in d if k[1] == 'GNN']:
    del d[k]
pickle.dump(d, open('data/result.p','wb'))
print('cleared', 'GNN cells')
EOF
python tools/grand_sweep.py --methods=GNN"

# 6. pallas A/B on the real chip + headline bench sanity
step ab_pallas python tools/ab_pallas.py
step bench_py python bench.py

echo "CHAIN_R3_DONE $(date)" >>"$L"
