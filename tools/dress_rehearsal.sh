#!/bin/bash
# Canonical dress rehearsal (reference /root/reference/train.sh:1-12 recipe):
# 640px, batch 16, -ms + mosaic + EMA, 150 epochs, lr 1e-3 steps 90/120 —
# run as 10-epoch `--resume auto` segments because the dev-tunnel client
# retains every transferred batch's host buffer (~340 MB/min RSS at 640px),
# so one process cannot survive 150 epochs. Each segment boundary is a real
# preemption + full-train-state resume on the chip (PARITY.md "dress
# rehearsal"). Dataset: 20-class synthetic VOC (tools/make_synthetic_data.py
# voc <root> --n 1250 --classes 20).
#
# Usage: bash tools/dress_rehearsal.sh [data_root] [save_root]
set -u
ROOT=${1:-/tmp/dress20}
SAVE=${2:-/tmp/dress_rehearsal}
LOG=$SAVE/segments.log
mkdir -p "$SAVE"
cd "$(dirname "$0")/.."

for seg in $(seq 10 10 150); do
  marker=$SAVE/done_$seg
  [ -f "$marker" ] && continue
  echo "=== segment → epoch $seg  ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  python -m yolo_nano_tpu.cli.train \
    -d voc --root "$ROOT" --voc_sets 2007 --img_size 640 --batch_size 16 \
    --lr 1e-3 --lr_epoch 90 120 --max_epoch "$seg" -ms --mosaic --ema \
    --device_augment --cache_images --bf16 \
    --eval_epoch 10 --eval_size 416 \
    --save_folder "$SAVE/weights" -v dress --seed 1 --resume auto \
    >> "$LOG" 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "segment $seg FAILED rc=$rc" | tee -a "$LOG"
    exit $rc
  fi
  touch "$marker"
done
echo "=== all 150 epochs done ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"

# Final-checkpoint multi-resolution eval (reference README.md:58-60 table
# behavior: one set of weights scored at 320/416/608).
for sz in 320 416 608; do
  echo "=== final eval @$sz ===" | tee -a "$LOG"
  python -m yolo_nano_tpu.cli.eval \
    -d voc --root "$ROOT" --img_size "$sz" \
    --weight "$SAVE/weights/voc/dress/ckpt" --ema \
    >> "$LOG" 2>&1 || echo "eval @$sz failed" | tee -a "$LOG"
done
echo "=== dress rehearsal complete ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
