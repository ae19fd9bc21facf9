#!/bin/sh
# Round-5 job supervisor (survives session recycling; launched with nohup).
#
# Duties:
#  1. Keep the baseline grand-sweep shell (RRT*->BIT*->LazySP, n=1000) running,
#     EXCEPT while the phase-5 chain is inside a timing-sensitive step
#     (published amortized-throughput / profile rows must not see background
#     host load on the single-core host) - then SIGSTOP it, SIGCONT after.
#  2. When the phase-5 chain exits, run the phase-7 follow-up chain.
#
# Args: $1 = PID of the phase-5 chain, $2 = PID of the baseline sweep shell.

CHAIN_PID="$1"
SWEEP_PID="$2"
LOG=/root/repo/tools/chains/r5_phase5.json.log
SENSITIVE='refresh-n1000|profile-batched|batched-refresh'

log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/supervisor_r5.log; }

log "supervisor start: chain=$CHAIN_PID sweep=$SWEEP_PID"
while kill -0 "$CHAIN_PID" 2>/dev/null; do
    # last step-start line that has no matching completion line after it
    CUR=$(grep -o 'step [0-9/]* \[[a-z0-9-]*\] start' "$LOG" 2>/dev/null | tail -1)
    if echo "$CUR" | grep -Eq "$SENSITIVE"; then
        WANT=stop
    else
        WANT=cont
    fi
    if [ -n "$SWEEP_PID" ] && kill -0 "$SWEEP_PID" 2>/dev/null; then
        STATE=$(ps -o stat= -p "$SWEEP_PID" 2>/dev/null | cut -c1)
        if [ "$WANT" = stop ] && [ "$STATE" != T ]; then
            log "pausing sweep for: $CUR"
            kill -STOP "$SWEEP_PID" 2>/dev/null
            for C in $(pgrep -P "$SWEEP_PID" 2>/dev/null); do kill -STOP "$C"; done
        elif [ "$WANT" = cont ] && [ "$STATE" = T ]; then
            log "resuming sweep (step: $CUR)"
            for C in $(pgrep -P "$SWEEP_PID" 2>/dev/null); do kill -CONT "$C"; done
            kill -CONT "$SWEEP_PID" 2>/dev/null
        fi
    fi
    sleep 30
done
log "phase-5 chain exited; pausing sweep and starting phase-7"
# phase-7 has timing-sensitive steps too - hold the sweep while it runs
if [ -n "$SWEEP_PID" ] && kill -0 "$SWEEP_PID" 2>/dev/null; then
    kill -STOP "$SWEEP_PID" 2>/dev/null
    for C in $(pgrep -P "$SWEEP_PID" 2>/dev/null); do kill -STOP "$C"; done
fi
cd /root/repo && python tools/chain.py tools/chains/r5_phase7.json >> /tmp/supervisor_r5.log 2>&1
log "phase-7 chain done; resuming sweep"
if [ -n "$SWEEP_PID" ] && kill -0 "$SWEEP_PID" 2>/dev/null; then
    for C in $(pgrep -P "$SWEEP_PID" 2>/dev/null); do kill -CONT "$C"; done
    kill -CONT "$SWEEP_PID" 2>/dev/null
fi
log "supervisor exit"
