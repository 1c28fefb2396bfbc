#!/bin/bash
# Fires the clean-TPU measurement window the moment the backbone pretrain
# exits, then resumes the rebuild queue (scripts/r3_rebuild_queue.sh picks up
# at the demo stage via the .done markers).
#
#   setsid nohup scripts/r3_postbackbone.sh BACKBONE_PID > /tmp/r3_post.log 2>&1 &
set -u
BB_PID=$1
REPO=/root/repo
STATE=/root/demo_r3_state
EVID=$REPO/docs/demo_evidence_r3
cd "$REPO"
log() { echo "[$(date +%H:%M:%S)] $*"; }

log "waiting for backbone pid $BB_PID"
while kill -0 "$BB_PID" 2>/dev/null; do sleep 30; done
log "backbone exited"
ls -la /root/demo_r3/backbone/ | head
[ -f /root/demo_r3/backbone/best.msgpack ] || { log "NO BACKBONE CKPT"; exit 1; }
touch "$STATE/probe.done" "$STATE/backbone.done"

# clean-TPU window: bench (headline evidence), then the fused-kernel A/B
log "clean bench starting"
timeout 2400 python bench.py > /tmp/bench_clean.log 2>&1
log "bench rc=$? -> saving evidence"
grep -v '^WARNING' /tmp/bench_clean.log > "$EVID/bench_tpu_r3_device.json" || true

log "fused resunit device-time A/B starting"
timeout 3000 python scripts/bench_fused_resunits.py > /tmp/fused_ab.log 2>&1
log "fused A/B rc=$?"

log "resuming rebuild queue"
exec scripts/r3_rebuild_queue.sh
