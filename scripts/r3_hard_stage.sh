#!/bin/bash
# Corpus-hardness stage (round-2 VERDICT Next #3, second half): train the
# SAME head grid on a decorrelate=0.75 corpus with the SAME frozen backbone
# (the reference's frozen-DAC regime) and evaluate RD vs the backbone
# baseline. The main /root/demo_r3 run (decorrelate=0) is the matched easy
# control. Previously TPU-gated (decode in the training loss).
#
#   setsid nohup scripts/r3_hard_stage.sh > /tmp/r3_hard.log 2>&1 &
set -u
REPO=/root/repo
MAIN=/root/demo_r3
ROOT=/root/demo_r3_hard
STATE=/root/demo_r3_state
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
cd "$REPO"
log() { echo "[$(date +%H:%M:%S)] $*"; }

# wait for the main queue's last stage (serialized TPU)
while [ ! -e "$STATE/evalC.done" ]; do sleep 120; done
log "main queue finished — hard stage starting"

mkdir -p "$ROOT/backbone"
cp "$MAIN"/backbone/best.msgpack "$ROOT/backbone/best.msgpack"

# reduced protocol (512 pairs, 40 epochs — val plateaus by ~40 per round-2)
# so the stage fits the round's remaining TPU window; the ordering question
# (does the proposed codec still beat backbone-alone when cross-modal
# predictability is cut?) needs relative RD, not absolute scale
timeout 7200 python scripts/demo_end_to_end.py --root "$ROOT" \
  --pairs 512 --dur-sec 2 --decorrelate 0.75 \
  --codec-epochs 40 --batch 8 --cached-heads --no-plc \
  --cache-file "$ROOT/latent_cache.npz" > /tmp/r3_demo_hard.log 2>&1
rc=$?
log "hard demo rc=$rc"
[ $rc -eq 0 ] && touch "$STATE/hard.done"
