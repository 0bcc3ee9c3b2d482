"""Benchmark driver (reference benchmark.py capability): FLOPs/params report
plus wall-clock throughput/latency over COCO-val images (synthetic fallback
when no dataset is present), conv-BN fused, decode+NMS included.

    python -m yolo_nano_tpu.cli.benchmark --root /data/COCO --img_size 416 \
        [--weight ckpt] [--batch_size N] [--no_fuse]

Defaults are the measured serving operating point: batch from the autotune
table (assets/autotune_batch.json via serving.optimal_batch — 128 at every
swept resolution) and the serving NMS budget (--pre_topk 128, DESIGN §9).

Timing protocol notes (vs reference benchmark.py:62-82): the reference times
single images with cuda-sync brackets; here batches are timed with a host
fetch of the final detections — on tunneled TPU platforms block_until_ready
can ack before remote execution finishes, so the fetch IS the sync.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="YOLO-Nano-TPU benchmark")
    p.add_argument("--root", default=None, help="COCO root (optional)")
    p.add_argument("--weight", default=None)
    p.add_argument("--img_size", default=416, type=int)
    p.add_argument("--batch_size", default=None, type=int,
                   help="default: the autotuned throughput optimum for "
                        "(backbone, img_size) from assets/autotune_batch"
                        ".json (serving.optimal_batch), else 128")
    p.add_argument("--iters", default=30, type=int)
    p.add_argument("--conf_thresh", default=0.1, type=float)
    p.add_argument("--nms_thresh", default=0.45, type=float)
    p.add_argument("--pre_topk", default=128, type=int,
                   help="NMS candidate budget. Default = the serving budget "
                        "(128): exact whenever the above-threshold load "
                        "stays below it — measured max 10/img at conf 0.1 "
                        "— and +6.6%% img/s over the eval-strict 512 "
                        "(DESIGN §9). Raise toward 512 for conf ≤0.001.")
    p.add_argument("--backbone", default="1.0x")
    p.add_argument("--no_fuse", action="store_true", default=False)
    p.add_argument("--reference_protocol", action="store_true", default=False,
                   help="also time the reference's own protocol: batch 1, "
                        "per-image sync (benchmark.py:45-82; first 2 iters "
                        "excluded). NOTE: on tunneled devices this measures "
                        "round-trip latency, not chip throughput")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.batch_size is None:
        from yolo_nano_tpu.serving import optimal_batch

        args.batch_size = optimal_batch(args.img_size, args.backbone)
    from yolo_nano_tpu.utils.compile_cache import enable as _cc_enable
    _cc_enable()  # persistent XLA cache: remote-TPU compiles are 1-4 min
    import jax
    import jax.numpy as jnp

    from yolo_nano_tpu.cli.common import build_config, make_predict_fn
    from yolo_nano_tpu.models.yolo_nano import init_yolo_nano
    from yolo_nano_tpu.utils.flops import flops_and_params

    cfg = build_config("coco", backbone=args.backbone,
                       conf_thresh=args.conf_thresh,
                       nms_thresh=args.nms_thresh,
                       nms_pre_topk=args.pre_topk)
    if args.weight:
        from yolo_nano_tpu.cli.eval import load_weights

        params, stats = load_weights(args.weight, cfg, use_ema=False)
    else:
        params, stats = init_yolo_nano(jax.random.key(0), cfg)

    flops_and_params(params, stats, cfg, args.img_size)
    predict_fn = make_predict_fn(params, stats, cfg, args.img_size,
                                 fold=not args.no_fuse, dtype=args.dtype)

    # input batches: real COCO-val letterboxed images when available
    # (reference benchmark.py:45-61), synthetic otherwise. The timed loop
    # cycles a bounded set of device-resident batches (≤2 GB of HBM): parking
    # all 2002 images on device would pin ~10 GB at 640px, while transferring
    # per iteration would time the host link instead of the chip.
    batch_bytes = args.batch_size * args.img_size * args.img_size * 3 * 4
    max_dev_batches = max(1, int(2e9 // batch_bytes))
    batches = []
    if args.root:
        from yolo_nano_tpu.data.coco import COCODataset
        from yolo_nano_tpu.data.loader import EvalLoader

        ds = COCODataset(args.root, image_set="val2017", augment=False)
        loader = EvalLoader(ds, args.img_size, args.batch_size)
        for images, _ in loader:
            batches.append(jnp.asarray(images))
            if (len(batches) >= max_dev_batches
                    or len(batches) * args.batch_size >= 2002):
                break
    else:
        rng = np.random.default_rng(0)
        batches = [jnp.asarray(rng.uniform(
            -2, 2, (args.batch_size, args.img_size, args.img_size, 3)),
            jnp.float32)]

    # measure the above-threshold candidate load so pre_topk truncation is
    # detectable instead of silent (crowded real images at low conf can
    # exceed the serving budget; synthetic/random inputs rarely do)
    from yolo_nano_tpu.models.yolo_nano import (forward_features,
                                                scores_from_features)

    @jax.jit
    def count_candidates(x):
        conf_p, cls_p, _, _ = forward_features(
            params, stats, x.astype(getattr(jnp, args.dtype)), cfg,
            train=False)
        score, _ = scores_from_features(conf_p, cls_p)
        return jnp.sum(score > args.conf_thresh, axis=tuple(
            range(1, score.ndim)))
    cand_max = int(max(np.asarray(count_candidates(b)).max()
                       for b in batches))
    if cand_max >= args.pre_topk:
        print(f"WARNING: above-threshold candidate load (max {cand_max}/img)"
              f" reaches --pre_topk {args.pre_topk}: NMS candidates are "
              f"TRUNCATED — numbers are not comparable to the reference "
              f"protocol; raise --pre_topk", flush=True)

    out = predict_fn(batches[0])
    np.asarray(out[1])  # compile + warmup

    n_img = 0
    t0 = time.perf_counter()
    for it in range(args.iters):
        out = predict_fn(batches[it % len(batches)])
        n_img += batches[it % len(batches)].shape[0]
    np.asarray(out[1])
    dt = time.perf_counter() - t0

    # single-batch p50 latency (decode+NMS included)
    lats = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(predict_fn(batches[0])[1])
        lats.append(time.perf_counter() - t0)
    p50 = float(np.median(lats))

    if args.reference_protocol:
        single_fn = make_predict_fn(params, stats, cfg, args.img_size,
                                    fold=not args.no_fuse, dtype=args.dtype)
        one = batches[0][:1]
        np.asarray(single_fn(one)[1])
        times = []
        for i in range(102):
            t0 = time.perf_counter()
            np.asarray(single_fn(one)[1])
            if i >= 2:  # reference benchmark.py:78 warmup exclusion
                times.append(time.perf_counter() - t0)
        print(f"reference protocol (batch 1, per-image sync): "
              f"{1.0 / np.mean(times):.1f} FPS, "
              f"p50 {np.median(times) * 1e3:.2f} ms/img")

    fps = n_img / dt
    print(f"FPS: {fps:.1f} img/s (batch {args.batch_size})")
    print(f"p50 batch latency: {p50 * 1e3:.2f} ms "
          f"({p50 * 1e3 / args.batch_size:.3f} ms/img)")
    print(json.dumps({"metric": "coco_eval_images_per_sec_per_chip",
                      "value": round(fps, 1), "unit": "img/s",
                      "p50_batch_ms": round(p50 * 1e3, 2),
                      "candidates_max": cand_max,
                      "pre_topk": args.pre_topk}))


if __name__ == "__main__":
    main()
