"""Visualization driver (reference test.py capability): run detection over a
dataset split, draw boxes, save JPEGs to det_results/, optional TTA.

    python -m yolo_nano_tpu.cli.test -d voc --root /data/VOCdevkit \
        --weight weights/voc/yolo_nano/ckpt --img_size 416 --num_images 20
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="YOLO-Nano-TPU visualization")
    p.add_argument("-d", "--dataset", default="voc", choices=["voc", "coco"])
    p.add_argument("--root", default="/data")
    p.add_argument("--weight", required=True)
    p.add_argument("--img_size", default=416, type=int)
    p.add_argument("--conf_thresh", default=0.1, type=float)
    p.add_argument("--nms_thresh", default=0.50, type=float)
    p.add_argument("--vis_thresh", default=0.3, type=float)
    p.add_argument("--num_images", default=100, type=int)
    p.add_argument("--save_folder", default="det_results/", type=str)
    p.add_argument("--backbone", default="1.0x")
    p.add_argument("--ema", action="store_true", default=False)
    p.add_argument("--tta", action="store_true", default=False)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from yolo_nano_tpu.utils.compile_cache import enable as _cc_enable
    _cc_enable()  # persistent XLA cache: remote-TPU compiles are 1-4 min
    import cv2

    from yolo_nano_tpu.cli.common import (
        build_config,
        class_names_for,
        draw_detections,
        make_predict_fn,
    )
    from yolo_nano_tpu.cli.eval import load_weights
    from yolo_nano_tpu.data.transforms import letterbox_undo, val_transform

    cfg = build_config("voc" if args.dataset == "voc" else "coco",
                       backbone=args.backbone, conf_thresh=args.conf_thresh,
                       nms_thresh=args.nms_thresh)
    params, stats = load_weights(args.weight, cfg, args.ema)
    if args.tta:
        from yolo_nano_tpu.utils.tta import make_tta_predict

        predict_fn = make_tta_predict(params, stats, cfg)
    else:
        predict_fn = make_predict_fn(params, stats, cfg, args.img_size)
    names = class_names_for(args.dataset)

    if args.dataset == "voc":
        from yolo_nano_tpu.data.voc import VOCDataset

        ds = VOCDataset(args.root, image_sets=[("2007", "test")],
                        augment=False)
    else:
        from yolo_nano_tpu.data.coco import COCODataset

        ds = COCODataset(args.root, image_set="val2017", augment=False)

    os.makedirs(args.save_folder, exist_ok=True)
    n = min(args.num_images, len(ds))
    for i in range(n):
        img_bgr, img_id = ds.pull_image(i)
        h, w = img_bgr.shape[:2]
        x, scale, offset = val_transform(img_bgr, args.img_size)
        boxes, scores, classes, valid = (np.asarray(t) for t in
                                         predict_fn(x[None]))
        v = valid[0]
        b = letterbox_undo(boxes[0][v], scale, offset, w, h)
        out = draw_detections(img_bgr, b, scores[0][v], classes[0][v], names,
                              args.vis_thresh)
        cv2.imwrite(os.path.join(args.save_folder, f"{i:06d}.jpg"), out)
        if i % 20 == 0:
            print(f"[test {i}/{n}]")
    print(f"saved {n} visualizations to {args.save_folder}")


if __name__ == "__main__":
    main()
