"""Train the ACTUAL torch reference on a (synthetic) VOC dataset, then score
it with OUR evaluator — the head-to-head half of the training-parity story.

This is a thin driver over reference components, mirroring the reference
training loop semantics (reference train.py:180-235: SGD momentum 0.9 /
wd 5e-4, (ni/nw)^4 warmup then step decay, host multi_gt_creator per iter,
loss inside model.forward). The canonical-recipe axes are all available and
each one drives the reference's OWN implementation:
  --ema          → reference ModelEMA shadow (utils/misc.py:67-86)
  --mosaic       → reference VOCDetection(mosaic=True) 4-image mosaic with
                   ColorTransforms for mosaic samples (data/voc.py:140-220)
  --multi_scale LO HI → every 10 iters train_size = randint(LO, HI-1)·32,
                   model.set_grid + bilinear F.interpolate, gt built at the
                   new size (train.py:202-212; exclusive-high bound so the
                   size set matches our cli/train.py --multi_scale_range)
The trained torch model is wrapped in a predict_fn adapter and evaluated with
yolo_nano_tpu's VOCEvaluator, so both frameworks' final numbers come from the
SAME metric code on the SAME data.

Usage:
    python tools/parity_train_reference.py --root /tmp/shapes_voc \
        --img_size 160 --batch_size 16 --epochs 40 --lr 2e-3 --seed 0
Prints one JSON line with per-class APs and mAP over present classes.
"""

import argparse
import json
import os
import random
import sys

import numpy as np

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")


def _load_reference_tools():
    """Load the reference's top-level tools.py under a non-colliding module
    name: `import tools` would resolve to THIS repo's tools/ package whenever
    it is already in sys.modules (e.g. `python -m tools.<script>`)."""
    import importlib.util

    path = os.path.join(REFERENCE, "tools.py")
    spec = importlib.util.spec_from_file_location("_reference_tools", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_reference_tools"] = mod
    spec.loader.exec_module(mod)
    return mod


def torch_predict_adapter(model, max_det=128):
    """Wrap the reference eval branch (batch-size-1, host numpy postprocess,
    reference models/yolo_nano.py:361-376) in our predict_fn contract:
    images [B,S,S,3] normalized → (boxes [B,D,4] letterbox-normalized corners,
    scores, classes, valid)."""
    import torch

    def predict(images):
        b = images.shape[0]
        boxes = np.zeros((b, max_det, 4), np.float32)
        scores = np.zeros((b, max_det), np.float32)
        classes = np.zeros((b, max_det), np.int32)
        valid = np.zeros((b, max_det), bool)
        with torch.no_grad():
            for bi in range(b):
                x = torch.from_numpy(
                    np.ascontiguousarray(images[bi:bi + 1].transpose(
                        0, 3, 1, 2)))
                bbs, scs, cls_inds = model(x)
                n = min(len(scs), max_det)
                order = np.argsort(-scs)[:n]
                boxes[bi, :n] = bbs[order]
                scores[bi, :n] = scs[order]
                classes[bi, :n] = cls_inds[order]
                valid[bi, :n] = True
        return boxes, scores, classes, valid

    return predict


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--img_size", type=int, default=160)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--wp_epoch", type=int, default=2)
    p.add_argument("--lr_epoch", nargs="+", type=int, default=[1000])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ema", action="store_true", default=False,
                   help="track + evaluate the reference ModelEMA shadow "
                        "(reference utils/misc.py:67-86), matching our "
                        "--ema side")
    p.add_argument("--mosaic", action="store_true", default=False,
                   help="reference 4-image mosaic augmentation with p=0.5 "
                        "(data/voc.py:140-220)")
    p.add_argument("--multi_scale", nargs=2, type=int, default=None,
                   metavar=("LO", "HI"),
                   help="multi-scale training: every 10 iters draw "
                        "train_size = randint(LO, HI-1)*32 (reference "
                        "train.py:202-212 semantics; exclusive-high to "
                        "match cli/train.py --multi_scale_range)")
    p.add_argument("--save", default=None, help="optional .pth output")
    args = p.parse_args(argv)

    sys.path.insert(0, REFERENCE)
    import torch
    import torch.utils.model_zoo as model_zoo

    # zero egress: the reference downloads ImageNet weights when
    # trainable=True (backbone/shufflenetv2.py:177-180); train from scratch
    # on both sides instead
    model_zoo.load_url = lambda *a, **k: {}
    if not hasattr(np, "int"):  # reference postprocess uses np.int (removed
        np.int = int            # in numpy>=1.24, models/yolo_nano.py:264)

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    random.seed(args.seed)

    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        ref_tools = _load_reference_tools()
        from data.config import MULTI_ANCHOR_SIZE
        from data.transforms import ColorTransforms, TrainTransforms
        from data.voc import VOCDetection
        from models.yolo_nano import YOLONano
        from utils.misc import ModelEMA, detection_collate

        model = YOLONano(device="cpu", input_size=args.img_size,
                         num_classes=20, trainable=True,
                         anchor_size=MULTI_ANCHOR_SIZE)
    finally:
        os.chdir(cwd)
    ema = ModelEMA(model) if args.ema else None

    dataset = VOCDetection(data_dir=args.root, img_size=args.img_size,
                           image_sets=[("2007", "trainval")],
                           transform=TrainTransforms(args.img_size),
                           color_augment=ColorTransforms(args.img_size),
                           mosaic=args.mosaic)
    loader = torch.utils.data.DataLoader(
        dataset, batch_size=args.batch_size, shuffle=True, num_workers=0,
        collate_fn=detection_collate, drop_last=False,
        generator=torch.Generator().manual_seed(args.seed))

    model.train()
    optimizer = torch.optim.SGD(model.parameters(), lr=args.lr,
                                momentum=0.9, weight_decay=5e-4)
    epoch_size = len(loader)
    anchors = model.anchor_size.view(-1, 2).tolist()

    base_lr = tmp_lr = args.lr
    last_total = None
    train_size = args.img_size
    for epoch in range(args.epochs):
        if epoch in args.lr_epoch:
            tmp_lr = tmp_lr * 0.1
            for g in optimizer.param_groups:
                g["lr"] = tmp_lr
        for it, (images, targets) in enumerate(loader):
            ni = it + epoch * epoch_size
            # (ni/nw)^4 warmup, reference train.py:190-199
            if epoch < args.wp_epoch:
                nw = args.wp_epoch * epoch_size
                lr = base_lr * pow(ni * 1.0 / nw, 4)
                for g in optimizer.param_groups:
                    g["lr"] = lr
            elif epoch == args.wp_epoch and it == 0:
                for g in optimizer.param_groups:
                    g["lr"] = tmp_lr
            # multi-scale trick, reference train.py:202-208
            if args.multi_scale is not None:
                if it % 10 == 0 and it > 0:
                    lo, hi = args.multi_scale
                    train_size = random.randint(lo, hi - 1) * 32
                    model.set_grid(train_size)
                if train_size != images.shape[-1]:
                    images = torch.nn.functional.interpolate(
                        images, size=train_size, mode="bilinear",
                        align_corners=False)
            targets = [lab.tolist() for lab in targets]
            targets = ref_tools.multi_gt_creator(train_size,
                                                 model.stride, targets,
                                                 anchor_size=anchors)
            conf_l, cls_l, bbox_l, iou_l = model(images, target=targets)
            total = conf_l + cls_l + bbox_l + iou_l
            if torch.isnan(total):
                continue
            total.backward()
            optimizer.step()
            optimizer.zero_grad()
            if ema is not None:
                ema.update(model)      # reference train.py:234-235
            last_total = float(total)
        if last_total is None:
            raise SystemExit("dataset produced no training batches — check "
                             "--root / split files")
        print(f"[ref epoch {epoch + 1}/{args.epochs}] "
              f"total {last_total:.3f}", flush=True)

    # evaluate with OUR evaluator — same metric code as our runs
    if ema is not None:
        model = ema.ema               # reference eval-at-EMA semantics
    if args.save:                     # save the weights actually evaluated
        torch.save(model.state_dict(), args.save)
    model.trainable = False
    model.set_grid(args.img_size)
    model.eval()
    from yolo_nano_tpu.data.voc import VOC_CLASSES
    from yolo_nano_tpu.evaluation.evaluator import VOCEvaluator

    ev = VOCEvaluator(args.root, args.img_size, batch_size=args.batch_size,
                      num_workers=2)
    ev.evaluate(torch_predict_adapter(model))
    # mAP over classes that actually have ground truth (absent classes can
    # still attract false positives and score 0, polluting the mean)
    gt_classes = {o["name"] for recs in ev._gt_cache.values() for o in recs}
    result = {"framework": "reference-torch", "seed": args.seed,
              "ema": bool(args.ema),
              "epochs": args.epochs, "img_size": args.img_size,
              "aps": {c: round(ev.aps[c], 4) for c in sorted(gt_classes)},
              "present_class_mAP": round(float(np.mean(
                  [ev.aps[c] for c in gt_classes])), 4)}
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
