"""Demo driver: image / video / camera inference with drawing (the working
version of reference demo.py's intent — the reference script crashes on its
own transform unpacking and kwargs, demo.py:101,135,176,242-243; capability
parity means the three input modes, not the bugs).

    python -m yolo_nano_tpu.cli.demo --mode image --path img.jpg --weight ...
    python -m yolo_nano_tpu.cli.demo --mode video --path in.mp4 --weight ...
    python -m yolo_nano_tpu.cli.demo --mode camera --weight ...
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="YOLO-Nano-TPU demo")
    p.add_argument("--mode", default="image",
                   choices=["image", "video", "camera"])
    p.add_argument("--path", default=None,
                   help="image file/dir or video file")
    p.add_argument("--weight", required=True)
    p.add_argument("-d", "--dataset", default="coco", choices=["voc", "coco"])
    p.add_argument("--img_size", default=416, type=int)
    p.add_argument("--conf_thresh", default=0.35, type=float)
    p.add_argument("--nms_thresh", default=0.50, type=float)
    p.add_argument("--vis_thresh", default=0.35, type=float)
    p.add_argument("--path_to_save", default="det_results/demo/", type=str)
    p.add_argument("--show", action="store_true", default=False)
    p.add_argument("--backbone", default="1.0x")
    return p.parse_args(argv)


def _detect_frame(frame_bgr, predict_fn, img_size, names, vis_thresh):
    from yolo_nano_tpu.cli.common import draw_detections
    from yolo_nano_tpu.data.transforms import letterbox_undo, val_transform

    h, w = frame_bgr.shape[:2]
    x, scale, offset = val_transform(frame_bgr, img_size)
    boxes, scores, classes, valid = (np.asarray(t) for t in
                                     predict_fn(x[None]))
    v = valid[0]
    b = letterbox_undo(boxes[0][v], scale, offset, w, h)
    return draw_detections(frame_bgr, b, scores[0][v], classes[0][v], names,
                           vis_thresh)


def main(argv=None):
    args = parse_args(argv)
    from yolo_nano_tpu.utils.compile_cache import enable as _cc_enable
    _cc_enable()  # persistent XLA cache: remote-TPU compiles are 1-4 min
    import cv2

    from yolo_nano_tpu.cli.common import (
        build_config,
        class_names_for,
        make_predict_fn,
    )
    from yolo_nano_tpu.cli.eval import load_weights

    cfg = build_config(args.dataset, backbone=args.backbone,
                       conf_thresh=args.conf_thresh,
                       nms_thresh=args.nms_thresh)
    params, stats = load_weights(args.weight, cfg, use_ema=False)
    predict_fn = make_predict_fn(params, stats, cfg, args.img_size)
    names = class_names_for(args.dataset)
    os.makedirs(args.path_to_save, exist_ok=True)

    if args.mode in ("image", "video") and not args.path:
        raise SystemExit(f"--path is required for --mode {args.mode} "
                         "(an image file/directory or a video file)")

    if args.mode == "image":
        paths = ([os.path.join(args.path, f) for f in os.listdir(args.path)]
                 if os.path.isdir(args.path) else [args.path])
        for i, pth in enumerate(sorted(paths)):
            img = cv2.imread(pth)
            if img is None:
                continue
            out = _detect_frame(img, predict_fn, args.img_size, names,
                                args.vis_thresh)
            dst = os.path.join(args.path_to_save, os.path.basename(pth))
            cv2.imwrite(dst, out)
            if args.show:
                cv2.imshow("detection", out)
                cv2.waitKey(0)
            print(f"[{i + 1}/{len(paths)}] → {dst}")
        return

    # streaming modes run the same compiled batch-1 graph every frame
    # (fixed shape → fixed latency); per-frame wall time (preprocess +
    # predict + draw) is reported as p50/p99 at the end
    import time

    cap = cv2.VideoCapture(0 if args.mode == "camera" else args.path)
    writer = None
    idx = 0
    frame_times = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        t0 = time.perf_counter()
        out = _detect_frame(frame, predict_fn, args.img_size, names,
                            args.vis_thresh)
        frame_times.append(time.perf_counter() - t0)
        if args.mode == "video":
            if writer is None:
                fps = cap.get(cv2.CAP_PROP_FPS) or 30
                writer = cv2.VideoWriter(
                    os.path.join(args.path_to_save, "demo_out.avi"),
                    cv2.VideoWriter_fourcc(*"XVID"), fps,
                    (out.shape[1], out.shape[0]))
            writer.write(out)
        if args.show:
            cv2.imshow("detection", out)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
        idx += 1
        if idx % 50 == 0:
            recent = frame_times[-50:]
            print(f"processed {idx} frames "
                  f"({1.0 / float(np.mean(recent)):.1f} FPS recent)")
    cap.release()
    if writer is not None:
        writer.release()
        print(f"wrote {os.path.join(args.path_to_save, 'demo_out.avi')}")
    if len(frame_times) > 1:
        lat = np.asarray(frame_times[1:]) * 1e3  # first frame = compile
        print(f"frame latency: p50 {np.percentile(lat, 50):.1f} ms / "
              f"p99 {np.percentile(lat, 99):.1f} ms "
              f"({1e3 / float(np.mean(lat)):.1f} FPS sustained)")


if __name__ == "__main__":
    main()
