#!/bin/bash
# Final TPU window (after the s5 tail, before the driver's round-end bench):
#   1. dual-encoder device A/B (decides the serving flip)
#   2. bench.py end-to-end verify with the new serving defaults
# Bounded so NOTHING of ours runs when the driver takes the TPU (~20:05).
#
#   setsid nohup scripts/r3_s5_window.sh TAIL_PID > /tmp/r3_window.log 2>&1 &
set -u
TPID=${1:?tail pid}
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
HARD_STOP=$(date -d "20:00" +%s)
log() { echo "[$(date +%H:%M:%S)] $*"; }

while ps -p "$TPID" >/dev/null 2>&1; do
  [ "$(date +%s)" -ge "$(date -d '19:42' +%s)" ] && { log "tail still busy at 19:42 — proceeding anyway is unsafe; waiting"; }
  sleep 30
done
log "tail exited"

left=$(( HARD_STOP - $(date +%s) - 60 ))
if [ "$left" -ge 600 ]; then
  log "dual-encoder A/B (timeout $((left > 900 ? 900 : left))s)"
  timeout $((left > 900 ? 900 : left)) python scripts/diag_decode.py \
    --skip-variants --dual-encoder > /tmp/diag_dual.log 2>&1
  log "A/B rc=$? (log /tmp/diag_dual.log)"
fi

left=$(( HARD_STOP - $(date +%s) - 60 ))
if [ "$left" -ge 300 ]; then
  log "bench verify (timeout ${left}s)"
  timeout "$left" python bench.py > /tmp/bench_verify3.log 2>&1
  log "bench rc=$? (log /tmp/bench_verify3.log)"
fi
log "window complete"
