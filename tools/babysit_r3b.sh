#!/bin/bash
# Pause the CPU-only r3b chain (NEXT scratch training) whenever the main
# TPU chain is inside a wall-clock-sensitive step (bench_*, sweep, ab_*,
# bench_py): the host has ONE core, so concurrent host work contaminates
# timed measurements (round-2's ur5 contamination). Resume otherwise.
ROOT_PID=$(cat /tmp/chain_r3b.pid 2>/dev/null)
[ -z "$ROOT_PID" ] && exit 0

tree_pids() {  # $1 = root pid -> echo all descendant pids incl. root
  local p=$1
  echo "$p"
  for c in $(ps -o pid= --ppid "$p" 2>/dev/null); do
    tree_pids "$c"
  done
}

STATE=running
while true; do
  if grep -q CHAIN_R3_DONE /tmp/chain_r3.log 2>/dev/null; then
    # main chain finished: make sure r3b runs, then exit
    for p in $(tree_pids "$ROOT_PID"); do kill -CONT "$p" 2>/dev/null; done
    echo "$(date +%H:%M:%S) chain_r3 done -> CONT and exit" >> /tmp/babysit_r3b.log
    exit 0
  fi
  if ! kill -0 "$ROOT_PID" 2>/dev/null; then
    echo "$(date +%H:%M:%S) r3b finished" >> /tmp/babysit_r3b.log
    exit 0
  fi
  # step markers are "=== <name> === <time>"; run_benchmarks.py also prints
  # "=== <env> / <method> / ... ===" lines, so require the second "===" to
  # sit in field 3 to pick up only real step transitions
  cur=$(awk '$1=="===" && $3=="===" {n=$2} END{print n}' /tmp/chain_r3.log 2>/dev/null)
  case "$cur" in
    bench_*|sweep_gnn_refresh|ab_pallas|calib_ur5|strict_audits)
      # calib/strict aren't timed but run close to their timeouts on the
      # single core; don't halve them
      want=stopped ;;
    *)
      want=running ;;
  esac
  if [ "$want" != "$STATE" ]; then
    if [ "$want" = stopped ]; then
      for p in $(tree_pids "$ROOT_PID"); do kill -STOP "$p" 2>/dev/null; done
    else
      for p in $(tree_pids "$ROOT_PID"); do kill -CONT "$p" 2>/dev/null; done
    fi
    STATE=$want
    echo "$(date +%H:%M:%S) step=$cur -> $STATE" >> /tmp/babysit_r3b.log
  fi
  sleep 45
done
