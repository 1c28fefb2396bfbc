#!/bin/bash
# Session-5 tail: when the main queue (r3_s5_queue.sh) exits, run the
# HARD-corpus head sweep (VERDICT Next #3 second half: does the proposed
# codec still beat the backbone baseline when cross-modal predictability is
# cut to decorrelate=0.75?) in whatever TPU window remains before the
# 19:40 hard deadline. The round-2 committed easy-corpus RD evidence is the
# control; docs/CORPUS_HARDNESS.md §protocol-reduction calibrates the
# reduced 512-pair/40-epoch protocol against the round-2 curves.
#
#   setsid nohup scripts/r3_s5_tail.sh QUEUE_PID > /tmp/r3_tail.log 2>&1 &
set -u
QPID=${1:?queue pid}
REPO=/root/repo
MAIN=/root/demo_r3
ROOT=/root/demo_r3_hard
STATE=/root/demo_r3_state
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
DEADLINE=$(date -d "19:40" +%s)
cd "$REPO"
log() { echo "[$(date +%H:%M:%S)] $*"; }

while ps -p "$QPID" >/dev/null 2>&1; do sleep 60; done
log "main queue exited"

now=$(date +%s); left=$(( DEADLINE - now - 120 ))
if [ "$left" -lt 1800 ]; then
  log "only ${left}s left — not enough for the hard stage; exiting"
  exit 0
fi

[ -e "$STATE/hard.done" ] && { log "hard stage already done"; exit 0; }
mkdir -p "$ROOT/backbone"
cp -n "$MAIN/backbone/best.msgpack" "$ROOT/backbone/best.msgpack"

log "hard stage starting (timeout ${left}s)"
timeout "$left" python scripts/demo_end_to_end.py --root "$ROOT" \
  --pairs 512 --dur-sec 2 --decorrelate 0.75 \
  --codec-epochs 40 --batch 8 --cached-heads --no-plc \
  --cache-file "$ROOT/latent_cache.npz" > /tmp/r3_demo_hard.log 2>&1
rc=$?
log "hard demo rc=$rc"
[ $rc -eq 0 ] && touch "$STATE/hard.done"
