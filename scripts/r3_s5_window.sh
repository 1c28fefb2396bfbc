#!/bin/bash
# Final TPU window (after the s5 tail, before the driver's round-end bench):
#   1. protocol-matched EASY control for the hardness study (decorrelate=0,
#      same 512-pair/40-epoch reduced protocol as the hard stage)
#   2. dual-encoder device A/B (decides the serving flip)
#   3. bench.py end-to-end verify with the new serving defaults
# Bounded so NOTHING of ours runs when the driver takes the TPU (~20:05).
#
#   setsid nohup scripts/r3_s5_window.sh TAIL_PID > /tmp/r3_window.log 2>&1 &
set -u
TPID=${1:?tail pid}
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
HARD_STOP=$(date -d "19:55" +%s)
EASY=/root/demo_r3_easy
STATE=/root/demo_r3_state
log() { echo "[$(date +%H:%M:%S)] $*"; }

while ps -p "$TPID" >/dev/null 2>&1; do sleep 30; done
log "tail exited"

# --- easy control at the hard stage's protocol (needs >= 45 min) -------------
left=$(( HARD_STOP - $(date +%s) - 1500 ))   # reserve 25 min for A/B + bench
if [ "$left" -ge 2700 ] && [ ! -e "$STATE/easy.done" ]; then
  mkdir -p "$EASY/backbone"
  cp -n /root/demo_r3/backbone/best.msgpack "$EASY/backbone/best.msgpack"
  log "easy control starting (timeout ${left}s)"
  timeout "$left" python scripts/demo_end_to_end.py --root "$EASY" \
    --pairs 512 --dur-sec 2 --decorrelate 0.0 \
    --codec-epochs 40 --batch 8 --cached-heads --no-plc \
    --cache-file "$EASY/latent_cache.npz" > /tmp/r3_demo_easy.log 2>&1
  rc=$?
  log "easy control rc=$rc"
  [ $rc -eq 0 ] && touch "$STATE/easy.done"
else
  log "skipping easy control (left=${left}s or done)"
fi

# --- dual-encoder A/B ----------------------------------------------------------
left=$(( HARD_STOP - $(date +%s) - 600 ))
if [ "$left" -ge 300 ]; then
  tmo=$(( left > 900 ? 900 : left ))
  log "dual-encoder A/B (timeout ${tmo}s)"
  timeout "$tmo" python scripts/diag_decode.py \
    --skip-variants --dual-encoder > /tmp/diag_dual.log 2>&1
  log "A/B rc=$? (log /tmp/diag_dual.log)"
fi

# --- bench verify ---------------------------------------------------------------
left=$(( HARD_STOP - $(date +%s) - 60 ))
if [ "$left" -ge 300 ]; then
  log "bench verify (timeout ${left}s)"
  timeout "$left" python bench.py > /tmp/bench_verify3.log 2>&1
  log "bench rc=$? (log /tmp/bench_verify3.log)"
fi
log "window complete"
