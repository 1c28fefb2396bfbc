#!/bin/bash
# Resume the round-2 streaming backbone pretrain on the TPU (operator-fired:
# open-ended, so it must NOT be auto-queued — it would collide with the
# driver's end-of-round bench). Round-2 recipe flags; resume is safe without
# vq_counts.msgpack (train/pretrain_backbone.py warm-starts counts to +100).
#
#   setsid nohup scripts/fire_pretrain_resume.sh > /tmp/pretrain_r3.log 2>&1 &
#   kill "$(cat /tmp/pretrain_r3.pid)"   # to stop before the round's bench
set -u
HOURS=${1:-3}
cd /root/repo
timeout $((HOURS * 3600)) python scripts/pretrain_backbone.py \
  --stream 50 --epochs 1000 --batch 16 --save-every 10 \
  --lr 1.2e-4 --clip 1.0 --warmup-steps 800 \
  --out-dir /root/demo_full/backbone_r3 \
  --resume /root/demo_full/backbone_r2/last.msgpack &
echo $! > /tmp/pretrain_r3.pid
wait
