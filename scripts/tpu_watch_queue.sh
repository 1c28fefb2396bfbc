#!/bin/bash
# Watch for the TPU tunnel relay and fire the hardware-gated round-3 queue
# the moment it returns (VERDICT Next #1). Detached + restartable: each stage
# leaves a marker in $STATE so a restarted watcher skips completed stages.
#
#   setsid nohup scripts/tpu_watch_queue.sh > /tmp/tpu_watch.log 2>&1 &
#
# Stages (serialized — only ONE process may use the TPU):
#   bench1   bench.py as soon as the relay is up (labeled contended if the
#            CPU eval queue is still running)
#   bench2   clean re-run after the CPU queue finishes (skipped if bench1 ran clean)
#   decftU   inpainting-decoder fine-tune, uniform run (corpus/TPU path)
#   evalU    uniform n=150 re-eval (picks up dec_plc.msgpack automatically)
#   decftC   decoder fine-tune, category run
#   evalC    category n=150 re-eval
# The long backbone-pretrain resume is intentionally NOT here: it is
# open-ended and must not collide with the driver's end-of-round bench.
set -u
REPO=/root/repo
STATE=/root/demo_r3_tpu
EVID=$REPO/docs/demo_evidence_r3
CORPUS_A=/root/demo_r2/corpus/audio
CORPUS_T=/root/demo_r2/corpus/tactile
BB=/root/demo_r2/backbone/best.msgpack
DEADLINE=$(( $(date +%s) + 9*3600 ))   # start no new stage after +9h
mkdir -p "$STATE"
log() { echo "[$(date +%H:%M:%S)] $*"; }

relay_up() { ss -tln 2>/dev/null | grep -qE ':(808|811)[0-9]'; }

device_ok() {
  timeout 240 python -c "import jax; assert jax.devices()" >/dev/null 2>&1
}

wait_for_relay() {
  until relay_up && device_ok; do
    [ "$(date +%s)" -ge "$DEADLINE" ] && { log "deadline hit while waiting"; exit 0; }
    sleep 60
  done
  log "relay is UP and device probe passed"
}

run_stage() {  # run_stage NAME TIMEOUT_S LOGFILE CMD...
  local name=$1 tmo=$2 lf=$3; shift 3
  [ -e "$STATE/$name.done" ] && { log "stage $name already done, skip"; return 0; }
  [ "$(date +%s)" -ge "$DEADLINE" ] && { log "deadline hit before $name"; exit 0; }
  relay_up || { log "relay DOWN before $name — back to waiting"; wait_for_relay; }
  log "stage $name starting (timeout ${tmo}s)"
  timeout "$tmo" "$@" > "$lf" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then
    touch "$STATE/$name.done"; log "stage $name DONE"
  else
    log "stage $name FAILED rc=$rc (log: $lf)"
  fi
  return $rc
}

log "watcher armed (deadline $(date -d @$DEADLINE +%H:%M))"
wait_for_relay

# --- bench as early as possible -------------------------------------------
if [ ! -e "$STATE/bench.done" ]; then
  if pgrep -f "eval_codecs.py" >/dev/null 2>&1; then
    run_stage bench1 2400 /tmp/bench_tpu1.log python "$REPO/bench.py" && \
      cp /tmp/bench_tpu1.log "$EVID/bench_tpu_contended.json.log"
    log "bench1 ran while the CPU eval queue was live — will re-run clean"
    while pgrep -f "eval_codecs.py" >/dev/null 2>&1; do sleep 120; done
    run_stage bench2 2400 /tmp/bench_tpu2.log python "$REPO/bench.py" && \
      { cp /tmp/bench_tpu2.log "$EVID/bench_tpu.json.log"; touch "$STATE/bench.done"; }
  else
    run_stage bench2 2400 /tmp/bench_tpu2.log python "$REPO/bench.py" && \
      { cp /tmp/bench_tpu2.log "$EVID/bench_tpu.json.log"; touch "$STATE/bench.done"; }
  fi
fi

# --- PLC decoder fine-tunes + n=150 re-evals ------------------------------
run_stage decftU 14400 /tmp/decft_uniform_tpu.log \
  python "$REPO/scripts/train_plc_decft.py" \
    --run-dir /root/demo_r2/plc_uniform --backbone "$BB" \
    --audio-dir "$CORPUS_A" --tact-dir "$CORPUS_T" \
    --epochs 10 --batch 8 --pairs 512

run_stage evalU 7200 /tmp/eval_uniform_tpu.log \
  python "$REPO/scripts/eval_plc.py" --mode uniform \
    --run-dir /root/demo_r2/plc_uniform \
    --audio-dir "$CORPUS_A" --tact-dir "$CORPUS_T" \
    --backbone "$BB" --max-files 150
[ -e "$STATE/evalU.done" ] && \
  cp /root/demo_r2/plc_uniform/eval_summary.json \
     "$EVID/plc_uniform_n150_decft_eval_summary.json" 2>/dev/null

run_stage decftC 14400 /tmp/decft_category_tpu.log \
  python "$REPO/scripts/train_plc_decft.py" \
    --run-dir /root/demo_r2/plc_category --backbone "$BB" \
    --audio-dir "$CORPUS_A" --tact-dir "$CORPUS_T" \
    --epochs 10 --batch 8 --pairs 512

run_stage evalC 14400 /tmp/eval_category_tpu.log \
  python "$REPO/scripts/eval_plc.py" --mode category \
    --run-dir /root/demo_r2/plc_category \
    --audio-dir "$CORPUS_A" --tact-dir "$CORPUS_T" \
    --backbone "$BB" --max-files 150
[ -e "$STATE/evalC.done" ] && \
  cp /root/demo_r2/plc_category/eval_cat_summary.json \
     "$EVID/plc_category_n150_decft_eval_cat_summary.json" 2>/dev/null

log "TPU queue complete — backbone pretrain resume is left for the operator"
touch "$STATE/ALL_DONE"
