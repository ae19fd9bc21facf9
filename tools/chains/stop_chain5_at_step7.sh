#!/bin/sh
# Round-5: hand the remaining queue over to the re-prioritized phase-7 spec.
#
# The phase-5 chain (PID $1) loaded its 16-step spec at start; steps 7+ are
# superseded by tools/chains/r5_phase7.json (same jobs, re-ordered so the
# timing-sensitive refreshes/profiles land before the long NEXT training).
# This watcher kills the chain runner the moment it starts step 7 — the
# supervisor then launches phase-7. Guard: only fire once the baseline
# sweep shell (PID $2) has exited, because the supervisor SIGSTOPs the
# sweep for the whole phase-7 run. If the chain reaches step 8 first
# (sweep was still running at the step-7 boundary), fire there instead:
# step 7's artifacts exist then and phase-7 skips nothing of value.
#
# Children are killed by explicit PID walk (ps --ppid), never by pattern.

CHAIN_PID="$1"
SWEEP_PID="$2"
LOG=/root/repo/tools/chains/r5_phase5.json.log

log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/stop_chain5.log; }

kill_chain_tree() {
    KIDS=$(ps -o pid= --ppid "$CHAIN_PID" 2>/dev/null)
    kill "$CHAIN_PID" 2>/dev/null
    sleep 1
    for C in $KIDS; do
        GKIDS=$(ps -o pid= --ppid "$C" 2>/dev/null)
        kill "$C" 2>/dev/null
        for G in $GKIDS; do kill "$G" 2>/dev/null; done
    done
    log "killed chain $CHAIN_PID (children: $KIDS)"
}

log "watcher start: chain=$CHAIN_PID sweep=$SWEEP_PID"
while kill -0 "$CHAIN_PID" 2>/dev/null; do
    SWEEP_DONE=1
    if [ -n "$SWEEP_PID" ] && kill -0 "$SWEEP_PID" 2>/dev/null; then
        SWEEP_DONE=0
    fi
    if grep -q '\[next-kuka7-scratch-eval\] start' "$LOG" 2>/dev/null; then
        kill_chain_tree; break
    fi
    if [ "$SWEEP_DONE" = 1 ] && \
       grep -q '\[next-kuka7-scratch-train\] start' "$LOG" 2>/dev/null; then
        kill_chain_tree; break
    fi
    sleep 20
done
log "watcher exit"
