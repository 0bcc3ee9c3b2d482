"""Evaluate one of OUR checkpoints with the same protocol/report format as
tools/parity_train_reference.py — the other half of the head-to-head table.

    python tools/parity_eval_ours.py --root /tmp/shapes_voc \
        --weight /tmp/parity_ours_s0/voc/yolo_nano/ckpt --img_size 160
Prints one JSON line: per-class APs over classes present in the ground truth
and their mean.
"""

import argparse
import json
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--weight", required=True)
    p.add_argument("--img_size", type=int, default=160)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--ema", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=-1, help="label only")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="f32 default: the torch reference side runs f32")
    p.add_argument("--pre_topk", type=int, default=0,
                   help="NMS candidate budget; 0 → unbounded like the "
                        "reference (models/yolo_nano.py:258)")
    p.add_argument("--max_det", type=int, default=128)
    p.add_argument("--dataset", default="voc", choices=["voc", "coco"],
                   help="coco: score with the native AP@[.5:.95] COCOEval "
                        "(the COCO-protocol head-to-head side, pairing "
                        "tools/parity_train_reference_coco.py)")
    args = p.parse_args(argv)

    from yolo_nano_tpu.cli.common import build_config, make_predict_fn
    from yolo_nano_tpu.cli.eval import load_weights
    from yolo_nano_tpu.evaluation.evaluator import COCOEvaluator, VOCEvaluator

    cfg = build_config(args.dataset)
    pre_topk = args.pre_topk or cfg.num_predictions(args.img_size)
    cfg = build_config(args.dataset, nms_pre_topk=pre_topk,
                       max_detections=args.max_det)
    params, stats = load_weights(args.weight, cfg, args.ema)
    predict = make_predict_fn(params, stats, cfg, args.img_size,
                              dtype=args.dtype)

    if args.dataset == "coco":
        ev = COCOEvaluator(args.root, args.img_size,
                           batch_size=args.batch_size, num_workers=2)
        ev.evaluate(predict)
        if not ev.stats:
            # zero detections above threshold: evaluate() returns early with
            # empty stats — a '"stats": {}' line must not be recorded as a
            # completed head-to-head data point (the driver's resume grep
            # would treat the seed as done forever)
            print("no detections above threshold — refusing to record an "
                  "empty result", file=sys.stderr)
            return 1
        print(json.dumps({"framework": "yolo_nano_tpu", "protocol": "coco",
                          "seed": args.seed, "img_size": args.img_size,
                          "stats": {k: round(float(v), 4)
                                    for k, v in ev.stats.items()}}))
        return 0

    ev = VOCEvaluator(args.root, args.img_size, batch_size=args.batch_size,
                      num_workers=2)
    ev.evaluate(predict)
    gt_classes = {o["name"] for recs in ev._gt_cache.values() for o in recs}
    result = {"framework": "yolo_nano_tpu", "seed": args.seed,
              "img_size": args.img_size,
              "aps": {c: round(ev.aps[c], 4) for c in sorted(gt_classes)},
              "present_class_mAP": round(float(np.mean(
                  [ev.aps[c] for c in gt_classes])), 4)}
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
