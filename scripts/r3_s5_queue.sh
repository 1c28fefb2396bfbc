#!/bin/bash
# Round-3 session-5 queue: the backbone is rebuilt (val 0.0864, VQ 8.9b,
# /root/demo_r3/backbone), the relay is up, and ~4.5h of TPU window remain.
# Priority order = round-2 VERDICT Next #4 first (decoder-FT raising the
# PLC category medium/high gains at n=150), then uniform, then the codec
# head sweep if time remains. Serialized — ONE process on the TPU; each
# stage leaves a .done marker so a restarted queue skips completed stages.
#
#   setsid nohup scripts/r3_s5_queue.sh > /tmp/r3_s5.log 2>&1 &
set -u
REPO=/root/repo
ROOT=/root/demo_r3
STATE=/root/demo_r3_state
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
# HARD deadline: the driver runs bench.py on the TPU at round end (~20:05);
# nothing of ours may be running then.
DEADLINE=$(date -d "19:40" +%s)
mkdir -p "$STATE" "$ROOT"
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

# wait for the in-flight decode diag to release the TPU
while [ -f /tmp/diag.pid ] && ps -p "$(cat /tmp/diag.pid)" >/dev/null 2>&1; do
  log "waiting for diag_decode ($(cat /tmp/diag.pid))"; sleep 30
done

[ -f "$ROOT/backbone/best.msgpack" ] || { log "no backbone — abort"; exit 1; }

# --- stage 1: corpus + PLC training, both modes (reuses backbone) -----------
run_stage plc 9000 /tmp/r3_plc.log \
  python scripts/demo_end_to_end.py --root "$ROOT" --pairs 1003 --dur-sec 2 \
    --only-plc --plc-epochs 45 --plc-latent-epochs 15 --plc-layers 2 \
    --batch 8 --plc-eval-files 40 --cache-file "$ROOT/latent_cache.npz"

# --- stage 2: inpainting-decoder FT, category (VERDICT #4 target) ------------
run_stage decftC 3600 /tmp/r3_decftC.log \
  python scripts/train_plc_decft.py --run-dir "$ROOT/plc_category" \
    --backbone "$ROOT/backbone/best.msgpack" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --mode category --epochs 8 --batch 8 --cat-probs 0.2,0.4,0.4

# --- stage 3: category eval n=150 (stock + FT decoder columns) ---------------
run_stage evalC 10800 /tmp/r3_evalC.log \
  python scripts/eval_plc.py --mode category --run-dir "$ROOT/plc_category" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --backbone "$ROOT/backbone/best.msgpack" --max-files 150

# --- stage 4: uniform decoder FT + eval ---------------------------------------
run_stage decftU 3600 /tmp/r3_decftU.log \
  python scripts/train_plc_decft.py --run-dir "$ROOT/plc_uniform" \
    --backbone "$ROOT/backbone/best.msgpack" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --mode uniform --epochs 8 --batch 8

run_stage evalU 7200 /tmp/r3_evalU.log \
  python scripts/eval_plc.py --mode uniform --run-dir "$ROOT/plc_uniform" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --backbone "$ROOT/backbone/best.msgpack" --max-files 150

# --- stage 5 (time permitting): codec head sweep + RD eval --------------------
run_stage heads 10800 /tmp/r3_heads.log \
  python scripts/demo_end_to_end.py --root "$ROOT" --pairs 1003 --dur-sec 2 \
    --codec-epochs 60 --batch 8 --cached-heads --no-plc \
    --cache-file "$ROOT/latent_cache.npz"

log "queue complete"
