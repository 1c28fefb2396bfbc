#!/bin/bash
# Round-5 stage 1: resume the r4 backbone pretrain (epoch ~186/502, val 0.103)
# to schedule completion, then IMMEDIATELY park best.msgpack in artifacts/r5
# (VERDICT r4 item 5: parking-first ordering).
set -u
REPO=/root/repo
ROOT=/root/demo_r4
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
cd "$REPO"
echo "[$(date +%H:%M:%S)] backbone resume starting"
timeout 9000 python scripts/pretrain_backbone.py --stream 50 --epochs 502 --batch 16 \
  --lr 1.2e-4 --clip 1.0 --warmup-steps 800 --save-every 10 \
  --out-dir "$ROOT/backbone" --resume "$ROOT/backbone/last.msgpack"
rc=$?
echo "[$(date +%H:%M:%S)] backbone resume rc=$rc"
mkdir -p "$REPO/artifacts/r5"
cp "$ROOT/backbone/best.msgpack" "$REPO/artifacts/r5/backbone_best.msgpack"
cp "$ROOT/backbone/vq_counts.msgpack" "$REPO/artifacts/r5/vq_counts.msgpack" 2>/dev/null || true
touch /tmp/r5_backbone.done
echo "[$(date +%H:%M:%S)] parked into artifacts/r5"
