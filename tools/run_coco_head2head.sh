#!/bin/bash
# COCO-protocol head-to-head (round-4 VERDICT Next #6): torch reference vs
# this framework, both trained on the same synthetic 80-category COCO set
# and both scored by the native AP@[.5:.95] evaluator
# (yolo_nano_tpu/evaluation/coco_eval.py). 3 seeds per side.
#
# Dataset: python tools/make_synthetic_data.py coco /tmp/shapes_coco80 \
#              --n 250 --classes 20 --full_cats --train_frac 0.8
# Usage: bash tools/run_coco_head2head.sh [data_root] [out_dir]
set -u -o pipefail
ROOT=${1:-/tmp/shapes_coco80}
OUT=${2:-/tmp/coco_h2h}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
RESULTS=$OUT/results.jsonl

for seed in 0 1 2; do
  # train and eval are guarded separately: a failed eval must not force a
  # re-train of the (hours-long) seed on the next invocation
  if ! grep -q "\"framework\": \"yolo_nano_tpu\".*\"seed\": $seed" "$RESULTS" 2>/dev/null; then
    CKPT=$OUT/ours_s$seed/coco/h2h/ckpt
    # "completed" = a numeric step subdir exists — orbax creates the ckpt
    # DIRECTORY at trainer startup, so a bare [ -d ] would skip the
    # retrain forever after any interrupted run
    if ! ls "$CKPT" 2>/dev/null | grep -qE '^[0-9]+$'; then
      echo "=== ours seed $seed train ($(date -u +%H:%M:%S)) ==="
      PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python -m yolo_nano_tpu.cli.train -d coco --root "$ROOT" \
          --img_size 160 --eval_size 160 --batch_size 16 --max_epoch 40 \
          --eval_epoch 40 --lr 2e-3 --ema --num_workers 2 --seed "$seed" \
          --save_folder "$OUT/ours_s$seed" -v h2h \
          > "$OUT/ours_s$seed.log" 2>&1 \
          || { echo "ours seed $seed train FAILED"; tail -5 "$OUT/ours_s$seed.log"; exit 1; }
    fi
    echo "=== ours seed $seed eval ($(date -u +%H:%M:%S)) ==="
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      python tools/parity_eval_ours.py --dataset coco --root "$ROOT" \
        --weight "$CKPT" --img_size 160 --ema \
        --seed "$seed" 2>"$OUT/ours_s${seed}_eval.err" | tail -1 >> "$RESULTS" \
        || { echo "ours seed $seed eval FAILED"; tail -5 "$OUT/ours_s${seed}_eval.err"; exit 1; }
  fi
  if ! grep -q "\"framework\": \"reference-torch\".*\"seed\": $seed" "$RESULTS" 2>/dev/null; then
    echo "=== reference seed $seed ($(date -u +%H:%M:%S)) ==="
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      python tools/parity_train_reference_coco.py --root "$ROOT" \
        --img_size 160 --batch_size 16 --epochs 40 --lr 2e-3 --ema \
        --seed "$seed" > "$OUT/ref_s$seed.log" 2>&1 \
        || { echo "reference seed $seed FAILED"; tail -5 "$OUT/ref_s$seed.log"; exit 1; }
    tail -1 "$OUT/ref_s$seed.log" >> "$RESULTS"
  fi
done
echo "=== head-to-head complete ==="
cat "$RESULTS"
