#!/bin/bash
# Round-3 follow-on chain C: runs once chain_r3.sh finishes. Two items were
# queued behind it:
#   1. a CLEAN re-run of the maze2easy scalar GNN row (its first timed run
#      was contended by the r3b CPU training before the babysitter engaged)
#   2. tools/ab_capsule.py — the capsule-kernel A/B needs the real chip
# The r3b chain (CPU NEXT training) is CONTed by the babysitter the moment
# chain_r3 finishes, so this script re-pauses it around its own timed steps
# (single-core host: concurrent CPU work contaminates wall-clock numbers).
cd /root/repo
L=/tmp/chain_r3c.log

step() {
  name=$1; shift
  if [ -f "/tmp/r3c_done_$name" ]; then echo "skip $name" >>"$L"; return 0; fi
  echo "=== $name === $(date +%H:%M:%S)" >>"$L"
  if "$@" >>"$L" 2>&1; then
    touch "/tmp/r3c_done_$name"; echo "--- $name OK $(date +%H:%M:%S)" >>"$L"
  else
    echo "--- $name FAILED rc=$? $(date +%H:%M:%S)" >>"$L"
  fi
}

tree_pids() {
  local p=$1
  echo "$p"
  for c in $(ps -o pid= --ppid "$p" 2>/dev/null); do
    tree_pids "$c"
  done
}

pause_r3b() {
  local pid=$(cat /tmp/chain_r3b.pid 2>/dev/null)
  [ -n "$pid" ] && for p in $(tree_pids "$pid"); do kill -"$1" "$p" 2>/dev/null; done
}

echo "waiting for chain_r3 $(date +%H:%M:%S)" >>"$L"
while ! grep -q CHAIN_R3_DONE /tmp/chain_r3.log 2>/dev/null; do sleep 60; done
echo "chain_r3 done $(date +%H:%M:%S)" >>"$L"

pause_r3b STOP
step bench_maze2easy_clean python tools/run_benchmarks.py maze2easy 1000 --methods=GNN
step ab_capsule timeout 1800 python tools/ab_capsule.py kuka7 ur5
pause_r3b CONT

echo "CHAIN_R3C_DONE $(date)" >>"$L"
