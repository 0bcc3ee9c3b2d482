"""Host input-pipeline throughput: the numbers behind DESIGN §8.1/§8.2.

Measures the DetectionLoader alone (no device work): warm-epoch img/s for a
given dataset/config. Run on an otherwise-idle machine.

    python tools/bench_loader.py --root /tmp/shapes_big --img_size 640 \
        [--device_augment] [--cache_images] [--worker_mode thread] \
        [--batch_size 32] [--num_workers 4] [--epochs 2]

The first epoch fills caches; the LAST epoch's rate is reported.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--img_size", default=640, type=int)
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--worker_mode", default="thread",
                   choices=["thread", "process"])
    p.add_argument("--cache_images", action="store_true")
    p.add_argument("--device_augment", action="store_true")
    p.add_argument("--mosaic", action="store_true")
    p.add_argument("--epochs", default=2, type=int)
    args = p.parse_args(argv)

    from yolo_nano_tpu.data.loader import DetectionLoader
    from yolo_nano_tpu.data.voc import VOCDataset

    ds = VOCDataset(args.root, img_size=args.img_size,
                    image_sets=[("2007", "trainval")], mosaic=args.mosaic)
    if args.device_augment:
        ds.device_augment = True
    if args.cache_images:
        ds.enable_image_cache()
    loader = DetectionLoader(ds, args.batch_size,
                             num_workers=args.num_workers,
                             worker_mode=args.worker_mode, seed=0)
    n = dt = 0
    for _ in range(max(args.epochs, 1)):
        t0 = time.time()
        n = sum(batch[0].shape[0] for batch in loader)
        dt = time.time() - t0
    print(json.dumps({
        "img_per_sec_warm_epoch": round(n / dt, 1),
        "images": n, "seconds": round(dt, 2),
        "mode": ("device_augment" if args.device_augment else "host_augment")
                + ("+cache" if args.cache_images else "")
                + f"+{args.worker_mode}",
        "img_size": args.img_size, "batch_size": args.batch_size,
        "num_workers": args.num_workers}))


if __name__ == "__main__":
    main()
