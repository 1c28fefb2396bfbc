#!/bin/bash
# Round-5 queue v2 — replaces r5_queue.sh after discovering the round-4
# queue's 90-min barrier auto-release had launched a CONCURRENT demo on
# /root/demo_r4 at 13:21 (contending the chip through the kernel window and
# the first 1.5h of the r5 demo; both killed at 16:45). Consequences:
#   * the 18-head sweep no longer fits -> reduced grid 1,2,4,8 x 128,512
#     (full 0.525-5.4 kbps range incl. the reference op-point classes;
#     the 5 finished/partial extra heads on disk get evaluated too);
#   * the kernel-A/B + encode-split timing evidence was taken on a
#     CONTENDED chip -> re-measured in a clean window after the demo;
#   * decFT runs only with whatever time remains before HARD_STOP.
set -u
REPO=/root/repo
ROOT=/root/demo_r5
STATE=/root/demo_r5_state
EV=$REPO/docs/demo_evidence_r5
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
HARD_STOP=$(date -d 19:30 +%s)
mkdir -p "$STATE" "$ROOT" "$EV"
cd "$REPO"
log() { echo "[$(date +%H:%M:%S)] $*"; }
left() { echo $(( HARD_STOP - $(date +%s) )); }

run_stage() {
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

commit_ev() {
  local msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg" 2>/dev/null && log "committed: $msg" || log "nothing to commit for: $msg"
}

# ---- stage demo2: reduced grid, full rate range -----------------------------
run_stage demo2 9000 /tmp/r5_demo2.log \
  python scripts/demo_end_to_end.py --root "$ROOT" --pairs 1003 --dur-sec 2 \
    --codec-epochs 60 --plc-epochs 60 --plc-latent-epochs 15 --plc-layers 2 \
    --batch 8 --cached-heads --plc-category \
    --books-grid 1,2,4,8 --embed-grid 128,512 --plc-eval-files 40
for f in sweep/eval_vs_backbone/eval_all_vs_backbone_rawPSNR_latency.json \
         sweep/sweep_summary.csv plc_uniform/eval_summary.json \
         plc_category/eval_cat_summary.json; do
  [ -f "$ROOT/$f" ] && { mkdir -p "$EV/$(dirname "$f")"; cp "$ROOT/$f" "$EV/$f"; }
done
commit_ev "round 5: n=1003 sweep + PLC demo evidence (round-5 backbone, reduced grid)" \
  docs/demo_evidence_r5/

# ---- clean re-measurement window (the 14:47-14:58 numbers were contended) ---
run_stage units3b 600 "$EV/diag_units3_remeasure.jsonl" \
  python scripts/diag_units3_remeasure.py
run_stage kernelab2 1200 "$EV/diag_timemajor_kernel_clean.jsonl" \
  python scripts/diag_timemajor.py --skip-full --kernel
run_stage encsplit2 900 "$EV/diag_encode_device_clean.jsonl" \
  python scripts/diag_encode.py
run_stage parity2 600 "$EV/check_tm_tpu_parity_v2.log" \
  python scripts/check_tm_tpu_parity.py
commit_ev "round 5: clean-chip kernel A/B + encode split + redefined parity gate" \
  docs/demo_evidence_r5/

# ---- decFT with whatever remains -------------------------------------------
if [ "$(left)" -gt 1500 ]; then
  run_stage decftU $(left) /tmp/r5_decft_uniform.log \
    python scripts/train_plc_decft.py --run-dir "$ROOT/plc_uniform" \
      --backbone "$ROOT/backbone/best.msgpack" \
      --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
      --mode uniform --epochs 20 --batch 8
  commit_ev "round 5: uniform PLC decoder-FT (time-boxed)" docs/demo_evidence_r5/
fi

log "queue2 complete; chip left idle for the driver bench"
touch /tmp/r5_queue2.done
