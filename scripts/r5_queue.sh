#!/bin/bash
# Round-5 TPU queue — runs AFTER scripts/r5_backbone_resume.sh parks the
# backbone (waits on /tmp/r5_backbone.done). Round-4 lessons baked in:
#   * parking + evidence commits happen per-stage, not all-at-end;
#   * highest-value-first ordering (kernel window before the long demo);
#   * HARD_STOP leaves the chip idle well before the driver bench fires
#     (round 4 lost BENCH_r04 to contention);
#   * every stage is timeout-bounded and logs to its own file.
#
#   setsid nohup scripts/r5_queue.sh > /tmp/r5_queue.log 2>&1 &
set -u
REPO=/root/repo
ROOT=/root/demo_r5
STATE=/root/demo_r5_state
EV=$REPO/docs/demo_evidence_r5
BB=$REPO/artifacts/r5/backbone_best.msgpack
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
HARD_STOP=$(date -d 19:30 +%s)
mkdir -p "$STATE" "$ROOT" "$EV"
cd "$REPO"
log() { echo "[$(date +%H:%M:%S)] $*"; }

left() { echo $(( HARD_STOP - $(date +%s) )); }

run_stage() {  # run_stage NAME TIMEOUT_S LOGFILE CMD...
  local name=$1 tmo=$2 lf=$3; shift 3
  [ -e "$STATE/$name.done" ] && { log "stage $name already done, skip"; return 0; }
  local rem; rem=$(left)
  [ "$rem" -le 120 ] && { log "HARD_STOP: skipping $name"; return 1; }
  [ "$tmo" -gt "$rem" ] && tmo=$rem
  log "stage $name starting (timeout ${tmo}s, log $lf)"
  timeout "$tmo" "$@" > "$lf" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$STATE/$name.done"; log "stage $name DONE";
  else log "stage $name exit rc=$rc (124=timeout) (log: $lf)"; fi
  return $rc
}

commit_ev() {  # commit_ev MESSAGE PATHS...
  local msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg" 2>/dev/null && log "committed: $msg" || log "nothing to commit for: $msg"
}

# ---- wait for the backbone parking ------------------------------------------
n=0
while [ ! -e /tmp/r5_backbone.done ] && [ $n -lt 160 ]; do
  [ $n -eq 0 ] && log "waiting for /tmp/r5_backbone.done"
  sleep 60; n=$((n+1))
done
[ -e /tmp/r5_backbone.done ] || { log "backbone never finished — abort"; exit 1; }
[ -f "$BB" ] || { log "no parked backbone at $BB — abort"; exit 1; }
log "backbone parked ($(du -h "$BB" | cut -f1)); waited ${n}m"
# make sure the pretrain python is really gone before taking the chip
sleep 10
commit_ev "round 5: park resumed backbone artifact (schedule-complete pretrain)" \
  artifacts/r5/backbone_best.msgpack artifacts/r5/vq_counts.msgpack

# ---- stage W: kernel/parity window ------------------------------------------
run_stage parity 900 "$EV/check_tm_tpu_parity.log" \
  python scripts/check_tm_tpu_parity.py
run_stage bisect 1500 "$EV/diag_tm_parity_bisect.jsonl" \
  python scripts/diag_tm_parity_bisect.py --backbone "$BB"
run_stage kernelab 1800 "$EV/diag_timemajor_kernel.jsonl" \
  python scripts/diag_timemajor.py --skip-full --kernel
run_stage encsplit 1500 "$EV/diag_encode_device.jsonl" \
  python scripts/diag_encode.py
commit_ev "round 5: on-chip kernel A/B + TM parity bisect + encode split evidence" \
  docs/demo_evidence_r5/

# ---- stage D: reference-scale demo (n=1003, full 6x3 grid, PLC both modes) --
mkdir -p "$ROOT/backbone"
[ -f "$ROOT/backbone/best.msgpack" ] || cp "$BB" "$ROOT/backbone/best.msgpack"
# the sweep skips finished heads and resumes partial ones, so a timeout is
# recoverable: retry once while time remains (latent cache rebuilds on-device
# in minutes)
for attempt in 1 2; do
  run_stage demo 12600 /tmp/r5_demo_a$attempt.log \
    python scripts/demo_end_to_end.py --root "$ROOT" --pairs 1003 --dur-sec 2 \
      --codec-epochs 60 --plc-epochs 60 --plc-latent-epochs 15 --plc-layers 2 \
      --batch 8 --cached-heads --plc-category \
      --books-grid 1,2,3,4,6,8 --embed-grid 128,256,512 --plc-eval-files 40
  [ -e "$STATE/demo.done" ] && break
  [ "$(left)" -le 2400 ] && break
done
for f in sweep/eval_vs_backbone/eval_all_vs_backbone_rawPSNR_latency.json \
         sweep/sweep_summary.csv plc_uniform/eval_summary.json \
         plc_category/eval_cat_summary.json; do
  [ -f "$ROOT/$f" ] && { mkdir -p "$EV/$(dirname "$f")"; cp "$ROOT/$f" "$EV/$f"; }
done
commit_ev "round 5: n=1003 sweep + PLC demo evidence (round-5 backbone)" \
  docs/demo_evidence_r5/

# ---- stage F: decoder FT (uniform) + n=150 eval ----------------------------
run_stage decftU 4800 /tmp/r5_decft_uniform.log \
  python scripts/train_plc_decft.py --run-dir "$ROOT/plc_uniform" \
    --backbone "$ROOT/backbone/best.msgpack" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --mode uniform --epochs 30 --batch 8
run_stage evalU 4200 /tmp/r5_evalU.log \
  python scripts/eval_plc.py --mode uniform --run-dir "$ROOT/plc_uniform" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --backbone "$ROOT/backbone/best.msgpack" --max-files 150
[ -f "$ROOT/plc_uniform/eval_summary.json" ] && mkdir -p "$EV/plc_uniform" && \
  cp "$ROOT/plc_uniform/eval_summary.json" "$EV/plc_uniform/eval_summary_n150.json" 2>/dev/null
commit_ev "round 5: uniform PLC decoder-FT + n=150 eval" docs/demo_evidence_r5/

# ---- stage C: category decFT + eval (only if time remains) ------------------
if [ "$(left)" -gt 5400 ]; then
  run_stage decftC 4800 /tmp/r5_decft_category.log \
    python scripts/train_plc_decft.py --run-dir "$ROOT/plc_category" \
      --backbone "$ROOT/backbone/best.msgpack" \
      --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
      --mode category --epochs 30 --batch 8 --cat-probs 0.2,0.4,0.4
  run_stage evalC 5400 /tmp/r5_evalC.log \
    python scripts/eval_plc.py --mode category --run-dir "$ROOT/plc_category" \
      --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
      --backbone "$ROOT/backbone/best.msgpack" --max-files 150
  [ -f "$ROOT/plc_category/eval_cat_summary.json" ] && mkdir -p "$EV/plc_category" && \
    cp "$ROOT/plc_category/eval_cat_summary.json" "$EV/plc_category/eval_cat_summary_n150.json" 2>/dev/null
  commit_ev "round 5: category PLC decoder-FT + n=150 eval" docs/demo_evidence_r5/
fi

log "queue complete; chip left idle for the driver bench"
touch /tmp/r5_queue.done
