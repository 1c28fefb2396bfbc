#!/bin/bash
# Round-5 final TPU window (queue2 finished early at 18:14):
#   1. full-program TM A/B on a clean chip — settles the conflicting b1
#      TM-encode evidence (r4 window: tm 1.01 < nch 1.65; r5 contended
#      scan-roll rows: tm worse) with the SERVING-path programs;
#   2. parity gate rerun at the calibrated bound;
#   3. n=150 uniform PLC eval using the freshly FT'd decoder (the
#      round-3-comparable number);
#   4. bench.py warm-up: primes /tmp/jax_cache for the driver bench and
#      validates the budget path on-chip.
set -u
REPO=/root/repo
ROOT=/root/demo_r5
EV=$REPO/docs/demo_evidence_r5
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
HARD_STOP=$(date -d 19:30 +%s)
cd "$REPO"
log() { echo "[$(date +%H:%M:%S)] $*"; }
left() { echo $(( HARD_STOP - $(date +%s) )); }

run_b() {  # run_b TIMEOUT LOG CMD...
  local tmo=$1 lf=$2; shift 2
  local rem; rem=$(left)
  [ "$rem" -le 60 ] && { log "HARD_STOP: skip $lf"; return 1; }
  [ "$tmo" -gt "$rem" ] && tmo=$rem
  log "start ($lf, timeout ${tmo}s)"
  timeout "$tmo" "$@" > "$lf" 2>&1
  log "done rc=$? ($lf)"
}

run_b 900 "$EV/diag_timemajor_full_clean.jsonl" \
  python scripts/diag_timemajor.py
run_b 420 "$EV/check_tm_tpu_parity_v3.log" \
  python scripts/check_tm_tpu_parity.py
git add -f docs/demo_evidence_r5/ 2>/dev/null
git commit -q -m "round 5: clean full-program TM A/B + calibrated parity gate" 2>/dev/null || true

run_b 3300 /tmp/r5_evalU150.log \
  python scripts/eval_plc.py --mode uniform --run-dir "$ROOT/plc_uniform" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --backbone "$ROOT/backbone/best.msgpack" --max-files 150
if [ -f "$ROOT/plc_uniform/eval_summary.json" ]; then
  mkdir -p "$EV/plc_uniform"
  cp "$ROOT/plc_uniform/eval_summary.json" "$EV/plc_uniform/eval_summary_n150_decft.json"
  git add -f docs/demo_evidence_r5/ 2>/dev/null
  git commit -q -m "round 5: n=150 uniform PLC eval with FT decoder" 2>/dev/null || true
fi

run_b 600 /tmp/r5_bench_warm.log python bench.py
log "final window complete; chip idle"
touch /tmp/r5_queue3.done
