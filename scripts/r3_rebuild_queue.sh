#!/bin/bash
# Round-3 rebuild queue (session 4): the container reset wiped every trained
# checkpoint outside the repo (/root/demo_r2, /root/demo_r3_*), but the TPU
# relay is back. Rebuild the full model chain on the TPU, serialized (only ONE
# process may use the TPU), each stage leaving a .done marker so a restarted
# queue skips completed stages.
#
#   setsid nohup scripts/r3_rebuild_queue.sh > /tmp/r3_rebuild.log 2>&1 &
#   echo $! > /tmp/r3_rebuild.pid
#
# Stages:
#   probe     5-epoch streaming-pretrain timing probe (sets the epoch budget)
#   backbone  streaming backbone pretrain, time-bounded (~3h)
#   demo      corpus(1003) + latent cache + B{2,6,10}xK128 heads + PLC
#             uniform & category (15 latent + 60 full epochs, 2-layer,
#             mask-embed) + codec eval + reduced PLC eval
#   decftU/C  inpainting-decoder fine-tune on the TPU (corpus re-encode path)
#   evalU/C   n=150 PLC evals (stock + FT decoder columns)
# The hardness stage (train-on-hard) is fired separately once this queue's
# timing is known.
set -u
REPO=/root/repo
ROOT=/root/demo_r3
STATE=/root/demo_r3_state
EVID=$REPO/docs/demo_evidence_r3
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
DEADLINE=$(( $(date +%s) + 9*3600 ))   # no new stage after +9h
mkdir -p "$STATE" "$ROOT"
cd "$REPO"
log() { echo "[$(date +%H:%M:%S)] $*"; }

run_stage() {  # run_stage NAME TIMEOUT_S LOGFILE CMD...
  local name=$1 tmo=$2 lf=$3; shift 3
  [ -e "$STATE/$name.done" ] && { log "stage $name already done, skip"; return 0; }
  [ "$(date +%s)" -ge "$DEADLINE" ] && { log "deadline hit before $name"; exit 0; }
  log "stage $name starting (timeout ${tmo}s, log $lf)"
  timeout "$tmo" "$@" > "$lf" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then
    touch "$STATE/$name.done"; log "stage $name DONE"
  else
    log "stage $name exit rc=$rc (timeout=124) (log: $lf)"
  fi
  return $rc
}

# --- stage 0: wait for any in-flight bench to finish ------------------------
while [ -f /tmp/bench.pid ] && ps -p "$(cat /tmp/bench.pid)" >/dev/null 2>&1; do
  log "waiting for bench ($(cat /tmp/bench.pid)) to finish"; sleep 60
done

# --- stage 1: timing probe ---------------------------------------------------
if [ ! -e "$STATE/probe.done" ]; then
  run_stage probe 2400 /tmp/r3_probe.log \
    python scripts/pretrain_backbone.py --stream 50 --epochs 5 --batch 16 \
      --lr 2e-4 --clip 1.0 --warmup-steps 100 --save-every 100 \
      --out-dir /tmp/r3_probe_bb
fi

# epoch budget: fit the cosine schedule inside ~3h using the probe's s/epoch
BB_SECS=10800
if [ -f /tmp/r3_probe.log ]; then
  EPB=$(python - <<'EOF'
import re
try:
    txt = open('/tmp/r3_probe.log').read()
    ts = [float(m) for m in re.findall(r'\bepoch[^\n]*?(\d+\.\d+)s\b', txt)]
    # use the last-epoch time (first includes compile); floor guard
    per = ts[-1] if ts else 0.0
    import sys
    if per <= 0.1:
        print(600)
    else:
        # 10800s budget minus ~400s compile/val overhead
        print(max(100, min(4000, int(10400 / per))))
except Exception:
    print(600)
EOF
)
else
  EPB=600
fi
log "backbone epoch budget: $EPB (stream 50 steps/epoch)"

# --- stage 2: backbone streaming pretrain ------------------------------------
run_stage backbone $((BB_SECS + 600)) /tmp/r3_backbone.log \
  python scripts/pretrain_backbone.py --stream 50 --epochs "$EPB" --batch 16 \
    --lr 2e-4 --clip 1.0 --warmup-steps 800 --save-every 10 \
    --out-dir "$ROOT/backbone"
[ -f "$ROOT/backbone/best.msgpack" ] || { log "no backbone checkpoint — abort"; exit 1; }

# --- stage 3: demo end-to-end (corpus + cache + heads + PLC + evals) ---------
run_stage demo 14400 /tmp/r3_demo.log \
  python scripts/demo_end_to_end.py --root "$ROOT" --pairs 1003 --dur-sec 2 \
    --codec-epochs 60 --plc-epochs 60 --plc-latent-epochs 15 --plc-layers 2 \
    --batch 8 --cached-heads --plc-category \
    --cache-file "$ROOT/latent_cache.npz" --plc-eval-files 40

# --- stage 4: inpainting-decoder fine-tunes (TPU corpus path) ----------------
run_stage decftU 7200 /tmp/r3_decft_uniform.log \
  python scripts/train_plc_decft.py --run-dir "$ROOT/plc_uniform" \
    --backbone "$ROOT/backbone/best.msgpack" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --mode uniform --epochs 10 --batch 8

run_stage decftC 7200 /tmp/r3_decft_category.log \
  python scripts/train_plc_decft.py --run-dir "$ROOT/plc_category" \
    --backbone "$ROOT/backbone/best.msgpack" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --mode category --epochs 10 --batch 8 --cat-probs 0.2,0.4,0.4

# --- stage 5: n=150 evals (stock + FT decoder columns) -----------------------
run_stage evalU 7200 /tmp/r3_evalU.log \
  python scripts/eval_plc.py --mode uniform --run-dir "$ROOT/plc_uniform" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --backbone "$ROOT/backbone/best.msgpack" --max-files 150

run_stage evalC 10800 /tmp/r3_evalC.log \
  python scripts/eval_plc.py --mode category --run-dir "$ROOT/plc_category" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --backbone "$ROOT/backbone/best.msgpack" --max-files 150

log "queue complete"
