#!/bin/bash
# Round-5 bonus window (decFT turned out to cost ~6.3 s/epoch on cached
# latents — the 20-epoch time-box was overly conservative): extend the
# uniform decoder FT to 60 epochs, FT the category decoder, re-eval both
# modes at n=150 with the FT decoders. Chip idle well before HARD_STOP.
set -u
REPO=/root/repo
ROOT=/root/demo_r5
EV=$REPO/docs/demo_evidence_r5
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
HARD_STOP=$(date -d 19:25 +%s)
cd "$REPO"
log() { echo "[$(date +%H:%M:%S)] $*"; }
left() { echo $(( HARD_STOP - $(date +%s) )); }
run_b() {
  local tmo=$1 lf=$2; shift 2
  local rem; rem=$(left)
  [ "$rem" -le 60 ] && { log "HARD_STOP: skip $lf"; return 1; }
  [ "$tmo" -gt "$rem" ] && tmo=$rem
  log "start ($lf, timeout ${tmo}s)"
  timeout "$tmo" "$@" > "$lf" 2>&1
  log "done rc=$? ($lf)"
}

# wait for the bench warm-up to free the chip
n=0
while [ ! -e /tmp/r5_queue3.done ] && [ $n -lt 20 ]; do sleep 30; n=$((n+1)); done

run_b 1800 /tmp/r5_decftU60.log \
  python scripts/train_plc_decft.py --run-dir "$ROOT/plc_uniform" \
    --backbone "$ROOT/backbone/best.msgpack" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --mode uniform --epochs 60 --batch 8 --resume

run_b 1800 /tmp/r5_decftC60.log \
  python scripts/train_plc_decft.py --run-dir "$ROOT/plc_category" \
    --backbone "$ROOT/backbone/best.msgpack" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --mode category --epochs 60 --batch 8 --cat-probs 0.2,0.4,0.4

run_b 1500 /tmp/r5_evalU150b.log \
  python scripts/eval_plc.py --mode uniform --run-dir "$ROOT/plc_uniform" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --backbone "$ROOT/backbone/best.msgpack" --max-files 150
[ -f "$ROOT/plc_uniform/eval_summary.json" ] && { mkdir -p "$EV/plc_uniform";
  cp "$ROOT/plc_uniform/eval_summary.json" "$EV/plc_uniform/eval_summary_n150_decft60.json"; }

run_b 2700 /tmp/r5_evalC150.log \
  python scripts/eval_plc.py --mode category --run-dir "$ROOT/plc_category" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --backbone "$ROOT/backbone/best.msgpack" --max-files 150
[ -f "$ROOT/plc_category/eval_cat_summary.json" ] && { mkdir -p "$EV/plc_category";
  cp "$ROOT/plc_category/eval_cat_summary.json" "$EV/plc_category/eval_cat_summary_n150_decft.json"; }

git add -f docs/demo_evidence_r5/ 2>/dev/null
git commit -q -m "round 5: decFT 60-epoch both modes + n=150 evals (FT decoders)" 2>/dev/null || true
log "bonus window complete; chip idle"
touch /tmp/r5_queue4.done
