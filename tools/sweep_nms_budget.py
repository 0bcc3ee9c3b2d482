"""AP vs NMS candidate budget sweep (VERDICT round-1, Weak #2).

The reference keeps EVERY candidate above conf 0.001 in its host NMS
(reference models/yolo_nano.py:258); our on-device NMS is fixed-shape and
truncates to the top `pre_topk` candidates by score before suppression, and
to `max_det` after. This sweep quantifies what that truncation costs in AP on
a trained checkpoint at eval thresholds, which is the number that decides the
defaults.

    python tools/sweep_nms_budget.py --root /tmp/shapes_coco \
        --artifact assets/bench_coco416 [--img_size 416]

Prints one JSON line per (pre_topk, max_det) point: AP, AP50, AR100, and the
mean/max candidate count above conf (the load actually entering NMS).
"""

import argparse
import json

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--artifact", default="assets/bench_coco416")
    p.add_argument("--img_size", type=int, default=416)
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--conf_thresh", type=float, default=0.001)
    p.add_argument("--pre_topk", nargs="+", type=int,
                   default=[256, 512, 1024, 2048],
                   help="0 → all N predictions: note the [B,K,K] suppression "
                        "matrix makes true-unbounded infeasible at batch "
                        "(58 GB at N=10647, B=128) — a budget ≥ the max "
                        "candidate count (reported first) IS unbounded")
    p.add_argument("--max_det", nargs="+", type=int, default=[100, 128, 300])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from yolo_nano_tpu.config import YoloNanoConfig
    from yolo_nano_tpu.evaluation.evaluator import COCOEvaluator
    from yolo_nano_tpu.models.yolo_nano import (forward_features,
                                                init_yolo_nano,
                                                scores_from_features)
    from yolo_nano_tpu.serving import load_artifact_config
    from yolo_nano_tpu.utils.checkpoint import load_params
    from yolo_nano_tpu.utils.fuse_bn import empty_stats_like, fold_bn

    base_cfg, meta = load_artifact_config(args.artifact,
                                          conf_thresh=args.conf_thresh)
    raw = dict(meta["config"])
    raw["anchors"] = base_cfg.anchors
    raw["strides"] = base_cfg.strides
    raw["conf_thresh"] = args.conf_thresh
    p0, s0 = init_yolo_nano(jax.random.key(0), base_cfg)
    params = load_params(f"{args.artifact}/params", fold_bn(p0, s0))
    stats = empty_stats_like(params)
    n_total = base_cfg.num_predictions(args.img_size)

    # candidate-count diagnostic: how many predictions clear conf_thresh
    @jax.jit
    def count_cands(x):
        conf_pred, cls_pred, _, _ = forward_features(params, stats, x,
                                                     base_cfg, train=False)
        score, _ = scores_from_features(conf_pred, cls_pred)
        # >= matches the NMS filter (reference models/yolo_nano.py:258)
        return jnp.sum(score >= args.conf_thresh, axis=1)

    from yolo_nano_tpu.data.loader import EvalLoader

    probe = COCOEvaluator(args.root, args.img_size,
                          batch_size=args.batch_size)
    counts = []
    for images, metas in EvalLoader(probe.dataset, args.img_size,
                                    args.batch_size, 2):
        # the last batch is padded by repeating the final image; metas has
        # one entry per REAL image — trim so duplicates don't skew the stats
        counts.extend(np.asarray(count_cands(images))[:len(metas)].tolist())
    cand = {"mean": round(float(np.mean(counts)), 1),
            "max": int(np.max(counts)), "n_total": n_total}
    print(json.dumps({"candidates_above_conf": cand}), flush=True)

    from yolo_nano_tpu.cli.common import make_predict_fn

    for pre_topk in args.pre_topk:
        pt = n_total if pre_topk == 0 else pre_topk
        for max_det in args.max_det:
            cfg = YoloNanoConfig(**dict(raw, nms_pre_topk=pt,
                                        max_detections=max_det))
            predict = make_predict_fn(params, stats, cfg, args.img_size,
                                      fold=False, dtype="float32")
            ev = COCOEvaluator(args.root, args.img_size,
                               batch_size=args.batch_size)
            ev.evaluate(predict)
            print(json.dumps({
                "pre_topk": pt, "max_det": max_det,
                "AP": round(ev.stats["AP"], 4),
                "AP50": round(ev.stats["AP50"], 4),
                "AR100": round(ev.stats["AR100"], 4),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
