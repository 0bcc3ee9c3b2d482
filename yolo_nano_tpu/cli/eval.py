"""Evaluation driver (reference eval.py capability).

    python -m yolo_nano_tpu.cli.eval -d voc --root /data/VOCdevkit \
        --weight weights/voc/yolo_nano/ckpt --img_size 416

Fixes vs the reference: --conf_thresh/--nms_thresh are honored (the reference
parses them and never passes them to the model, eval.py:27-30,115), and --tta
actually runs (the reference builds the TTA object and never calls it,
eval.py:132)."""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="YOLO-Nano-TPU evaluation")
    p.add_argument("-d", "--dataset", default="voc",
                   choices=["voc", "coco-val", "coco-test"])
    p.add_argument("--root", default="/data")
    p.add_argument("--weight", required=True,
                   help="orbax checkpoint dir (train state or params-only)")
    p.add_argument("--img_size", default=416, type=int)
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--conf_thresh", default=0.001, type=float)
    p.add_argument("--nms_thresh", default=0.50, type=float)
    p.add_argument("--diou_nms", action="store_true", default=False)
    p.add_argument("--pre_topk", default=512, type=int,
                   help="candidates entering NMS per image")
    p.add_argument("--max_det", default=128, type=int,
                   help="final detections per image")
    p.add_argument("--backbone", default="1.0x")
    p.add_argument("--ema", action="store_true", default=False,
                   help="evaluate the EMA weights from a train checkpoint")
    p.add_argument("--tta", action="store_true", default=False)
    p.add_argument("--dump_dets", default=None, metavar="DIR",
                   help="write detection artifacts for error analysis: VOC → "
                        "per-class VOCdevkit results .txt + detections.pkl "
                        "(reference vocapi_evaluator.py:91-92,142-157); "
                        "COCO → results json (val and test-dev)")
    return p.parse_args(argv)


def load_weights(weight_dir: str, cfg, use_ema: bool):
    """Restore (params, stats) from a full-train-state checkpoint dir or a
    params-only export."""
    import jax

    from yolo_nano_tpu.models.yolo_nano import init_yolo_nano
    from yolo_nano_tpu.train.schedule import warmup_step_schedule
    from yolo_nano_tpu.train.state import create_train_state, make_optimizer
    from yolo_nano_tpu.utils.checkpoint import CheckpointManager

    params, stats = init_yolo_nano(jax.random.key(0), cfg)
    tx = make_optimizer(warmup_step_schedule(1e-3, 1))
    template = create_train_state(params, stats, tx, use_ema=True)
    mgr = CheckpointManager(weight_dir)
    try:
        state = mgr.restore(template)
    except Exception:
        template = create_train_state(params, stats, tx, use_ema=False)
        state = CheckpointManager(weight_dir).restore(template)
    if use_ema:
        if state.ema_params is None:
            raise SystemExit(
                "--ema requested but the checkpoint carries no EMA state "
                "(was training run without --ema?); drop --ema to evaluate "
                "the raw weights")
        return state.ema_params, state.ema_stats
    return state.params, state.stats


def main(argv=None):
    args = parse_args(argv)
    from yolo_nano_tpu.utils.compile_cache import enable as _cc_enable
    _cc_enable()  # persistent XLA cache: remote-TPU compiles are 1-4 min
    from yolo_nano_tpu.cli.common import build_config, make_predict_fn
    from yolo_nano_tpu.evaluation.evaluator import COCOEvaluator, VOCEvaluator

    dataset_key = "voc" if args.dataset == "voc" else "coco"
    cfg = build_config(dataset_key, backbone=args.backbone,
                       conf_thresh=args.conf_thresh,
                       nms_thresh=args.nms_thresh, diou_nms=args.diou_nms,
                       nms_pre_topk=args.pre_topk,
                       max_detections=args.max_det)
    params, stats = load_weights(args.weight, cfg, args.ema)

    if args.tta:
        from yolo_nano_tpu.utils.tta import make_tta_predict

        predict_fn = make_tta_predict(params, stats, cfg,
                                      nms_thresh=args.nms_thresh)
    else:
        predict_fn = make_predict_fn(params, stats, cfg, args.img_size)

    if args.dataset == "voc":
        ev = VOCEvaluator(args.root, args.img_size,
                          batch_size=args.batch_size,
                          num_workers=args.num_workers, display=True,
                          dump_dir=args.dump_dets)
        ev.evaluate(predict_fn)
    else:
        import os

        dump_path = (os.path.join(args.dump_dets, "coco_results.json")
                     if args.dump_dets else None)
        ev = COCOEvaluator(args.root, args.img_size,
                           image_set=("test2017" if args.dataset ==
                                      "coco-test" else "val2017"),
                           batch_size=args.batch_size,
                           num_workers=args.num_workers,
                           testset=args.dataset == "coco-test",
                           dump_path=dump_path)
        ap50, ap = ev.evaluate(predict_fn)
        print(f"ap50_95 : {ap}")
        print(f"ap50 : {ap50}")


if __name__ == "__main__":
    main()
