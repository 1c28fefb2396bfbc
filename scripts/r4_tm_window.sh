#!/bin/bash
# Round-4 clean measurement window: pause the backbone pretrain (SIGSTOP the
# python, NOT the timeout wrapper), run the time-major / kernel A/Bs with all
# executables already in the compile cache (warm passes ran under contention
# first), resume the backbone, and park the evidence under
# docs/demo_evidence_r4/. The pause is bounded: the backbone stage budget has
# ~12 min of slack and its periodic best.msgpack writes make a late timeout
# non-fatal (scripts/r4_queue.sh).
#
#   setsid nohup scripts/r4_tm_window.sh > /tmp/r4_window.log 2>&1 &
set -u
REPO=/root/repo
EV="$REPO/docs/demo_evidence_r4"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p "$EV"
cd "$REPO"
log() { echo "[$(date +%H:%M:%S)] $*"; }

# wait (up to 75 min) for the warm chains to finish compiling
n=0
while [ ! -e /tmp/r4_warm_chain2.done ] && [ $n -lt 75 ]; do
  [ $n -eq 0 ] && log "waiting for warm chains"
  sleep 60; n=$((n+1))
done
log "warm chains done (waited ${n}m)"

# find the RUNNING pretrain python(s) (NOT the timeout wrapper: SIGSTOP on
# the wrapper pauses nothing — the round-3 2.5h lesson; comm must be python).
# STOP only, never kill: fully recoverable even on a stale match.
BB_PIDS=""
for p in $(pgrep -f 'pretrain_backbone.py'); do
  [ "$(ps -o comm= -p "$p" 2>/dev/null)" = python ] && BB_PIDS="$BB_PIDS $p"
done
if [ -n "${BB_PIDS// /}" ]; then
  log "pausing backbone python pid(s)$BB_PIDS"
  kill -STOP $BB_PIDS
  trap 'kill -CONT '"$BB_PIDS"' 2>/dev/null; log "backbone resumed (trap)"' EXIT
  sleep 3
else
  log "no backbone python found - measuring on an idle chip"
fi

log "A/B: layouts (full programs + stages + kernel)"
timeout 900 python scripts/diag_timemajor.py --stages --kernel \
  > "$EV/diag_timemajor_device.jsonl" 2>&1
log "A/B: encode split"
timeout 900 python scripts/diag_encode.py \
  > "$EV/diag_encode_device.jsonl" 2>&1
log "parity: TM serving paths on-chip"
timeout 600 python scripts/check_tm_tpu_parity.py \
  > "$EV/check_tm_tpu_parity.log" 2>&1

# ADVICE r4: use BB_PIDS (the variable actually set above) — the old
# ${BB_PID:-} test was dead code, leaving resume solely to the EXIT trap
# (which a SIGKILL/hard timeout skips, stranding the pretrain SIGSTOPped)
if [ -n "${BB_PIDS// /}" ]; then
  kill -CONT $BB_PIDS 2>/dev/null
  trap - EXIT
  log "backbone resumed"
fi
log "window complete -> $EV"
