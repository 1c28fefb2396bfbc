#!/bin/bash
# Relay-recovery watcher (session 4): the tunnel relay half-died mid-backbone
# (listeners 12 -> 6, epoch 42 wedged on a futex). When a fresh-process device
# probe passes again: kill the wedged trainer by EXPLICIT pid, resume the
# backbone pretrain from last.msgpack with the remaining time budget, then
# exec the post-backbone pipeline (clean bench -> fused A/B -> rebuild queue).
#
#   setsid nohup scripts/r3_relay_recover.sh WEDGED_PID > /tmp/r3_recover.log 2>&1 &
set -u
WEDGED=${1:-}
REPO=/root/repo
cd "$REPO"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
log() { echo "[$(date +%H:%M:%S)] $*"; }

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; assert float(jnp.ones((8,8)).sum()) == 64.0" >/dev/null 2>&1
}

log "watching for relay recovery"
until probe; do sleep 90; done
log "relay is BACK (fresh-process probe passed)"

if [ -n "$WEDGED" ] && kill -0 "$WEDGED" 2>/dev/null; then
  log "killing wedged trainer pid $WEDGED"
  kill "$WEDGED" 2>/dev/null; sleep 3
  kill -9 "$WEDGED" 2>/dev/null || true
fi

# remaining budget: stop by 14:30 to leave room for demo + decFT + evals
NOW=$(date +%s)
STOP=$(date -d "14:30" +%s)
BUDGET=$(( STOP - NOW ))
[ "$BUDGET" -lt 900 ] && BUDGET=900
EPOCHS=$(( BUDGET * 95 / 100 / 21 ))
log "resuming backbone: ${BUDGET}s budget, $EPOCHS epochs"
timeout "$BUDGET" python scripts/pretrain_backbone.py --stream 50 \
  --epochs "$EPOCHS" --batch 16 --lr 1.2e-4 --clip 1.0 --warmup-steps 200 \
  --save-every 10 --out-dir /root/demo_r3/backbone \
  --resume /root/demo_r3/backbone/last.msgpack \
  > /tmp/r3_backbone3.log 2>&1
log "backbone resume finished rc=$?"

STATE=/root/demo_r3_state
EVID=$REPO/docs/demo_evidence_r3
[ -f /root/demo_r3/backbone/best.msgpack ] || { log "NO BACKBONE CKPT"; exit 1; }
touch "$STATE/probe.done" "$STATE/backbone.done"

log "clean bench starting"
timeout 2400 python bench.py > /tmp/bench_clean.log 2>&1
log "bench rc=$? -> saving evidence"
grep -v '^WARNING' /tmp/bench_clean.log > "$EVID/bench_tpu_r3_device.json" || true

log "fused resunit device-time A/B starting"
timeout 3000 python scripts/bench_fused_resunits.py > /tmp/fused_ab.log 2>&1
log "fused A/B rc=$?"

log "resuming rebuild queue"
exec scripts/r3_rebuild_queue.sh
