#!/bin/bash
# Session-5 tail v2: the main queue's plc stage trained only the UNIFORM
# model (--plc-category was missing), so decftC/evalC failed on the absent
# run dir. When the main queue exits, run the category chain (train ->
# decoder-FT -> n=150 eval), then the hard-corpus head sweep in whatever
# window remains before the 19:40 hard deadline.
#
#   setsid nohup scripts/r3_s5_tail.sh QUEUE_PID > /tmp/r3_tail.log 2>&1 &
set -u
QPID=${1:?queue pid}
REPO=/root/repo
MAIN=/root/demo_r3
HARD=/root/demo_r3_hard
STATE=/root/demo_r3_state
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
DEADLINE=$(date -d "19:40" +%s)
cd "$REPO"
log() { echo "[$(date +%H:%M:%S)] $*"; }

run_stage() {  # run_stage NAME MAX_TIMEOUT_S LOGFILE CMD...
  local name=$1 tmo=$2 lf=$3; shift 3
  [ -e "$STATE/$name.done" ] && { log "stage $name already done, skip"; return 0; }
  local now left
  now=$(date +%s); left=$(( DEADLINE - now - 120 ))
  [ "$left" -lt 300 ] && { log "deadline: skipping $name"; return 1; }
  [ "$tmo" -gt "$left" ] && tmo=$left
  log "stage $name starting (timeout ${tmo}s, log $lf)"
  timeout "$tmo" "$@" > "$lf" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then
    touch "$STATE/$name.done"; log "stage $name DONE"
  else
    log "stage $name exit rc=$rc (124=timeout) (log: $lf)"
  fi
  return $rc
}

while ps -p "$QPID" >/dev/null 2>&1; do sleep 30; done
log "main queue exited"

# --- category PLC training (the missed stage) --------------------------------
run_stage plcC 5400 /tmp/r3_plcC.log \
  python scripts/demo_end_to_end.py --root "$MAIN" --pairs 1003 --dur-sec 2 \
    --only-plc-category --plc-epochs 45 --plc-latent-epochs 15 --plc-layers 2 \
    --batch 8 --plc-eval-files 40 --cache-file "$MAIN/latent_cache.npz"

# --- category decoder FT ------------------------------------------------------
run_stage decftC2 3600 /tmp/r3_decftC.log \
  python scripts/train_plc_decft.py --run-dir "$MAIN/plc_category" \
    --backbone "$MAIN/backbone/best.msgpack" \
    --audio-dir "$MAIN/corpus/audio" --tact-dir "$MAIN/corpus/tactile" \
    --mode category --epochs 8 --batch 8 --cat-probs 0.2,0.4,0.4

# --- category eval n=150 (stock + FT decoder columns) -------------------------
run_stage evalC2 10800 /tmp/r3_evalC.log \
  python scripts/eval_plc.py --mode category --run-dir "$MAIN/plc_category" \
    --audio-dir "$MAIN/corpus/audio" --tact-dir "$MAIN/corpus/tactile" \
    --backbone "$MAIN/backbone/best.msgpack" --max-files 150

# --- hard-corpus head sweep (VERDICT Next #3 second half) ---------------------
if [ ! -e "$STATE/hard.done" ]; then
  now=$(date +%s); left=$(( DEADLINE - now - 120 ))
  if [ "$left" -ge 1800 ]; then
    mkdir -p "$HARD/backbone"
    cp -n "$MAIN/backbone/best.msgpack" "$HARD/backbone/best.msgpack"
    run_stage hard 10800 /tmp/r3_demo_hard.log \
      python scripts/demo_end_to_end.py --root "$HARD" \
        --pairs 512 --dur-sec 2 --decorrelate 0.75 \
        --codec-epochs 40 --batch 8 --cached-heads --no-plc \
        --cache-file "$HARD/latent_cache.npz"
  else
    log "only ${left}s left — hard stage skipped"
  fi
fi
log "tail complete"
