"""Train the ACTUAL torch reference in its 80-class COCO configuration on a
synthetic COCO-format dataset, then score it with OUR native COCOEval — the
COCO-protocol half of the head-to-head story (round-4 VERDICT Next #6).

All prior head-to-heads were VOC-protocol; this one validates the COCO
anchor table (reference data/config.py:15-17), the 80-class loss path, and
the native AP@[.5:.95] evaluator (yolo_nano_tpu/evaluation/coco_eval.py)
end-to-end against the reference, the same way VOC was.

The training loop mirrors the reference semantics exactly like
tools/parity_train_reference.py does for VOC (reference train.py:180-235).
The reference's own COCODataset drives data loading (reference
data/coco.py:36-259); pycocotools is not installed in this image, so a
minimal in-repo shim of the 5 APIs the reference touches (COCO/getImgIds/
getCatIds/getAnnIds/loadAnns) is injected first — the reference code runs
unmodified.

Usage (dataset from: python tools/make_synthetic_data.py coco <root>
       --n 250 --classes 20 --full_cats):
    python tools/parity_train_reference_coco.py --root /tmp/shapes_coco80 \
        --img_size 160 --batch_size 16 --epochs 40 --lr 2e-3 --seed 0
Prints one JSON line with the native COCOEval stats (AP, AP50, AP75, ...).
"""

import argparse
import json
import os
import random
import sys
import types

import numpy as np

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # allow `python tools/parity_train_reference_coco.py`
    sys.path.insert(0, REPO)


def install_pycocotools_shim():
    """Provide the 5 pycocotools.coco.COCO methods the reference dataset
    calls (reference data/coco.py:64-87,241-242) over the plain instances
    json. Independent implementation of the public COCO-API surface."""

    class COCO:
        def __init__(self, annotation_file):
            with open(annotation_file) as f:
                blob = json.load(f)
            self.imgs = {im["id"]: im for im in blob.get("images", [])}
            self.anns = {a["id"]: a for a in blob.get("annotations", [])}
            self.cats = {c["id"]: c for c in blob.get("categories", [])}
            self._by_img = {}
            for a in blob.get("annotations", []):
                self._by_img.setdefault(a["image_id"], []).append(a)

        def getImgIds(self):
            return list(self.imgs)

        def getCatIds(self):
            return list(self.cats)

        def getAnnIds(self, imgIds=None, iscrowd=None):
            img_ids = imgIds if imgIds else list(self.imgs)
            out = []
            for i in img_ids:
                for a in self._by_img.get(i, []):
                    if iscrowd is None or bool(a.get("iscrowd", 0)) == iscrowd:
                        out.append(a["id"])
            return out

        def loadAnns(self, ids):
            return [self.anns[i] for i in ids]

    pkg = types.ModuleType("pycocotools")
    sub = types.ModuleType("pycocotools.coco")
    sub.COCO = COCO
    pkg.coco = sub
    sys.modules.setdefault("pycocotools", pkg)
    sys.modules["pycocotools.coco"] = sub


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
    p.add_argument("--ema", action="store_true", default=False)
    p.add_argument("--save", default=None, help="optional .pth output")
    args = p.parse_args(argv)

    install_pycocotools_shim()
    # load OUR helper module under a non-colliding name: the name `tools`
    # is contested from both sides — the reference ships a top-level
    # tools.py MODULE (so `from tools.… import …` breaks once REFERENCE is
    # on sys.path), while importing our tools/ PACKAGE would poison
    # sys.modules for the reference model's own `import tools`
    # (models/yolo_nano.py calls tools.iou_score). importlib sidesteps both.
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ours_parity_voc",
        os.path.join(REPO, "tools", "parity_train_reference.py"))
    helper = importlib.util.module_from_spec(spec)
    sys.modules["_ours_parity_voc"] = helper
    spec.loader.exec_module(helper)
    _load_reference_tools = helper._load_reference_tools
    torch_predict_adapter = helper.torch_predict_adapter

    sys.path.insert(0, REFERENCE)
    import torch
    import torch.utils.model_zoo as model_zoo

    model_zoo.load_url = lambda *a, **k: {}  # zero egress (shufflenetv2:177)
    if not hasattr(np, "int"):
        np.int = int  # reference postprocess np.int (yolo_nano.py:264)

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    random.seed(args.seed)

    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        ref_tools = _load_reference_tools()
        from data.coco import COCODataset
        from data.config import MULTI_ANCHOR_SIZE_COCO
        from data.transforms import ColorTransforms, TrainTransforms
        from models.yolo_nano import YOLONano
        from utils.misc import ModelEMA, detection_collate

        model = YOLONano(device="cpu", input_size=args.img_size,
                         num_classes=80, trainable=True,
                         anchor_size=MULTI_ANCHOR_SIZE_COCO)
    finally:
        os.chdir(cwd)
    ema = ModelEMA(model) if args.ema else None

    dataset = COCODataset(data_dir=args.root, img_size=args.img_size,
                          image_set="train2017",
                          transform=TrainTransforms(args.img_size),
                          color_augment=ColorTransforms(args.img_size),
                          mosaic=False)
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
    for epoch in range(args.epochs):
        if epoch in args.lr_epoch:
            tmp_lr = tmp_lr * 0.1
            for g in optimizer.param_groups:
                g["lr"] = tmp_lr
        for it, (images, targets) in enumerate(loader):
            ni = it + epoch * epoch_size
            if epoch < args.wp_epoch:  # (ni/nw)^4, reference train.py:190-199
                nw = args.wp_epoch * epoch_size
                lr = base_lr * pow(ni * 1.0 / nw, 4)
                for g in optimizer.param_groups:
                    g["lr"] = lr
            elif epoch == args.wp_epoch and it == 0:
                for g in optimizer.param_groups:
                    g["lr"] = tmp_lr
            targets = [lab.tolist() for lab in targets]
            targets = ref_tools.multi_gt_creator(args.img_size, model.stride,
                                                 targets,
                                                 anchor_size=anchors)
            conf_l, cls_l, bbox_l, iou_l = model(images, target=targets)
            total = conf_l + cls_l + bbox_l + iou_l
            if torch.isnan(total):
                continue
            total.backward()
            optimizer.step()
            optimizer.zero_grad()
            if ema is not None:
                ema.update(model)
            last_total = float(total)
        if last_total is None:
            raise SystemExit("dataset produced no training batches")
        print(f"[ref-coco epoch {epoch + 1}/{args.epochs}] "
              f"total {last_total:.3f}", flush=True)

    if ema is not None:
        model = ema.ema
    if args.save:
        torch.save(model.state_dict(), args.save)
    model.trainable = False
    model.set_grid(args.img_size)
    model.eval()

    # score with OUR native COCO evaluator — both frameworks' numbers come
    # from the same AP@[.5:.95] metric code on the same data
    from yolo_nano_tpu.evaluation.evaluator import COCOEvaluator

    ev = COCOEvaluator(args.root, args.img_size,
                       batch_size=args.batch_size, num_workers=2)
    ap50, ap = ev.evaluate(torch_predict_adapter(model))
    print(json.dumps({"framework": "reference-torch", "protocol": "coco",
                      "seed": args.seed, "ema": bool(args.ema),
                      "epochs": args.epochs, "img_size": args.img_size,
                      "stats": {k: round(float(v), 4)
                                for k, v in ev.stats.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
