#!/bin/bash
# Round-4 TPU queue: the container reset again wiped every trained checkpoint
# (/root/demo_r3 gone). Rebuild the chain, this round with (a) the proven
# session-5 recipe (lr 1.2e-4 — lr 2e-4 stalls the VQ), (b) periodic
# best.msgpack writes (timeout-safe), (c) the FULL 6x3 sweep grid for the
# reference-scale RD curve (VERDICT r3 task 4), and (d) barrier files between
# long stages so kernel-A/B TPU windows can be taken without contention:
# the queue BLOCKS before demo/decft until /tmp/r4_go_demo, /tmp/r4_go_decft
# exist (touch them to release).
#
#   setsid nohup scripts/r4_queue.sh > /tmp/r4_queue.log 2>&1 &
#   echo $! > /tmp/r4_queue.pid
set -u
REPO=/root/repo
ROOT=/root/demo_r4
STATE=/root/demo_r4_state
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
DEADLINE=$(( $(date +%s) + 10*3600 ))   # no new stage after +10h
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

barrier() {  # barrier FILE — wait (up to 90 min) for a release marker
  local f=$1 n=0
  while [ ! -e "$f" ] && [ $n -lt 90 ]; do
    [ $n -eq 0 ] && log "barrier: waiting for $f"
    sleep 60; n=$((n+1))
  done
  log "barrier $f released (waited ${n}m)"
}

# --- stage 1: timing probe (also warms the remote compile cache) -------------
if [ ! -e "$STATE/probe.done" ]; then
  run_stage probe 2400 /tmp/r4_probe.log \
    python scripts/pretrain_backbone.py --stream 50 --epochs 5 --batch 16 \
      --lr 1.2e-4 --clip 1.0 --warmup-steps 100 --save-every 100 \
      --out-dir /tmp/r4_probe_bb
fi

# epoch budget: fit the cosine schedule inside ~3h using the probe's s/epoch
BB_SECS=10800
if [ -f /tmp/r4_probe.log ]; then
  EPB=$(python - <<'EOF'
import re
try:
    txt = open('/tmp/r4_probe.log').read()
    ts = [float(m) for m in re.findall(r'\|\s*(\d+\.\d+)s\b', txt)]
    per = ts[-1] if ts else 0.0
    if per <= 0.1:
        print(430)
    else:
        print(max(100, min(4000, int(10400 / per))))
except Exception:
    print(430)
EOF
)
else
  EPB=430
fi
log "backbone epoch budget: $EPB (stream 50 steps/epoch)"

# --- stage 2: backbone streaming pretrain (session-5 recipe) ------------------
run_stage backbone $((BB_SECS + 900)) /tmp/r4_backbone.log \
  python scripts/pretrain_backbone.py --stream 50 --epochs "$EPB" --batch 16 \
    --lr 1.2e-4 --clip 1.0 --warmup-steps 800 --save-every 10 \
    --out-dir "$ROOT/backbone"
[ -f "$ROOT/backbone/best.msgpack" ] || { log "no backbone checkpoint — abort"; exit 1; }
# reproducibility (VERDICT r3 item 3): park a copy inside the repo so the
# next container reset cannot wipe the only trained backbone
mkdir -p "$REPO/artifacts/r4"
cp "$ROOT/backbone/best.msgpack" "$REPO/artifacts/r4/backbone_best.msgpack" || true

barrier /tmp/r4_go_demo

# --- stage 3: demo end-to-end, FULL 6x3 grid (corpus + cache + heads + PLC) --
run_stage demo 18000 /tmp/r4_demo.log \
  python scripts/demo_end_to_end.py --root "$ROOT" --pairs 1003 --dur-sec 2 \
    --codec-epochs 60 --plc-epochs 60 --plc-latent-epochs 15 --plc-layers 2 \
    --batch 8 --cached-heads --plc-category \
    --books-grid 1,2,3,4,6,8 --embed-grid 128,256,512 \
    --cache-file "$ROOT/latent_cache.npz" --plc-eval-files 40

barrier /tmp/r4_go_decft

# --- stage 4: inpainting-decoder fine-tunes (run long: r3 never plateaued) ---
run_stage decftU 7200 /tmp/r4_decft_uniform.log \
  python scripts/train_plc_decft.py --run-dir "$ROOT/plc_uniform" \
    --backbone "$ROOT/backbone/best.msgpack" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --mode uniform --epochs 40 --batch 8

run_stage decftC 7200 /tmp/r4_decft_category.log \
  python scripts/train_plc_decft.py --run-dir "$ROOT/plc_category" \
    --backbone "$ROOT/backbone/best.msgpack" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --mode category --epochs 40 --batch 8 --cat-probs 0.2,0.4,0.4

# --- stage 5: n=150 evals (stock + FT decoder columns) ------------------------
run_stage evalU 7200 /tmp/r4_evalU.log \
  python scripts/eval_plc.py --mode uniform --run-dir "$ROOT/plc_uniform" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --backbone "$ROOT/backbone/best.msgpack" --max-files 150

run_stage evalC 10800 /tmp/r4_evalC.log \
  python scripts/eval_plc.py --mode category --run-dir "$ROOT/plc_category" \
    --audio-dir "$ROOT/corpus/audio" --tact-dir "$ROOT/corpus/tactile" \
    --backbone "$ROOT/backbone/best.msgpack" --max-files 150

log "queue complete"
