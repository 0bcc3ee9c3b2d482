"""Generate synthetic shape-detection datasets (VOC-format or COCO-format).

Zero-egress environments have no real VOC/COCO; every end-to-end validation
run in this repo (training CLIs, evaluators, parity-vs-reference training,
NMS-budget sweeps) uses these procedurally rendered scenes instead: colored
shapes (red circle / green rectangle / blue triangle) on blurred noise
backgrounds, with exact box annotations.

Class mapping (same recipe round 1 trained its checkpoints on):
    circle   → VOC "aeroplane" / COCO category 1 ("person")
    rectangle→ VOC "bicycle"   / COCO category 3 ("car")
    triangle → VOC "bird"      / COCO category 7 ("train")
With --classes 6 (round-3 full-recipe head-to-head sets) three harder,
non-square classes join:
    ellipse  → VOC "boat"      / COCO category 2 ("bicycle")
    cross    → VOC "bottle"    / COCO category 5 ("airplane")
    ring     → VOC "bus"       / COCO category 9 ("boat")

Usage:
    python tools/make_synthetic_data.py voc  /tmp/shapes_voc  --n 200
    python tools/make_synthetic_data.py voc  /tmp/shapes6 --n 625 --classes 6
    python tools/make_synthetic_data.py coco /tmp/shapes_coco --n 80
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

VOC_SHAPE_CLASSES = ("aeroplane", "bicycle", "bird", "boat", "bottle", "bus")
COCO_SHAPE_CATS = (1, 3, 7, 2, 5, 9)
COCO_SHAPE_NAMES = ("person", "car", "train", "bicycle", "airplane", "boat")

# --classes 20 (the full-VOC dress-rehearsal sets, round 4): class =
# (shape, color-group) pair — the 6 shapes x 4 color groups, first 20 kept.
# Group 0 keeps each shape's original color; groups 1-3 recolor (near-black
# / near-white / orange), all distinguishable from the 60-190 gray noise
# background, so the model must use shape AND color to classify.
VOC_CLASSES_20 = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor")
COCO_SHAPE_CATS_20 = (1, 3, 7, 2, 5, 9, 4, 6, 8, 10,
                      11, 13, 14, 15, 16, 17, 18, 19, 20, 21)
_COLOR_GROUPS = (None, (25, 25, 25), (245, 245, 245), (30, 140, 250))


def draw_shape(img, cls: int, x1: int, y1: int, x2: int, y2: int,
               color=None) -> None:
    import cv2

    cx, cy = (x1 + x2) // 2, (y1 + y2) // 2
    if cls == 0:
        cv2.circle(img, (cx, cy), (x2 - x1) // 2, color or (40, 40, 220), -1)
    elif cls == 1:
        cv2.rectangle(img, (x1, y1), (x2, y2), color or (60, 200, 60), -1)
    elif cls == 2:
        pts = np.array([[cx, y1], [x1, y2], [x2, y2]])
        cv2.fillPoly(img, [pts], color or (220, 80, 40))
    elif cls == 3:
        cv2.ellipse(img, (cx, cy), ((x2 - x1) // 2, (y2 - y1) // 2), 0,
                    0, 360, color or (50, 200, 230), -1)
    elif cls == 4:
        tx = max((x2 - x1) // 3, 2)
        ty = max((y2 - y1) // 3, 2)
        cv2.rectangle(img, (x1, cy - ty // 2), (x2, cy + ty // 2),
                      color or (200, 60, 200), -1)
        cv2.rectangle(img, (cx - tx // 2, y1), (cx + tx // 2, y2),
                      color or (200, 60, 200), -1)
    else:
        r = min(x2 - x1, y2 - y1) // 2
        cv2.circle(img, (cx, cy), r, color or (210, 190, 40),
                   thickness=max(r // 3, 3))


def render_scene(rng, min_h=240, max_h=400, min_w=280, max_w=480,
                 max_objs=3, min_size=40, max_size=90, n_classes=3):
    """One scene → (img BGR uint8, [(cls_idx, x1, y1, x2, y2), ...]).

    n_classes=3 keeps the historical RNG stream (square boxes only);
    classes ≥3 draw a separate height, so their boxes are non-square."""
    import cv2

    h = int(rng.integers(min_h, max_h))
    w = int(rng.integers(min_w, max_w))
    img = rng.integers(60, 190, (h, w, 3), dtype=np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 2)
    objs = []
    for _ in range(int(rng.integers(1, max_objs + 1))):
        s = int(rng.integers(min_size, max_size))
        x1 = int(rng.integers(2, w - s - 2))
        y1 = int(rng.integers(2, h - s - 2))
        cls = int(rng.integers(n_classes))
        shape, color = cls, None
        if n_classes > 6:  # (shape, color-group) grid — see _COLOR_GROUPS
            shape, color = cls % 6, _COLOR_GROUPS[cls // 6]
        sh = s
        if shape >= 3:  # non-square box: height drawn independently
            sh = int(rng.integers(min_size, max_size))
            sh = min(sh, h - y1 - 3)
        draw_shape(img, shape, x1, y1, x1 + s, y1 + sh, color=color)
        objs.append((cls, x1, y1, x1 + s, y1 + sh))
    return img, objs


def make_voc(out_root: str, n: int = 200, train_frac: float = 0.8,
             seed: int = 42, classes: int = 3, max_objs: int = 3) -> None:
    import cv2

    root = os.path.join(out_root, "VOC2007")
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    rng = np.random.default_rng(seed)
    n_train = int(n * train_frac)
    names_tr, names_te = [], []
    for i in range(n):
        name = f"s{i:05d}"
        (names_tr if i < n_train else names_te).append(name)
        img, objs = render_scene(rng, n_classes=classes, max_objs=max_objs)
        h, w = img.shape[:2]
        cv2.imwrite(os.path.join(root, "JPEGImages", f"{name}.jpg"), img)
        name_tab = VOC_CLASSES_20 if classes > 6 else VOC_SHAPE_CLASSES
        xo = "".join(
            f"<object><name>{name_tab[c]}</name>"
            f"<difficult>0</difficult><bndbox><xmin>{a}</xmin>"
            f"<ymin>{b}</ymin><xmax>{cc}</xmax><ymax>{d}</ymax>"
            f"</bndbox></object>" for c, a, b, cc, d in objs)
        with open(os.path.join(root, "Annotations", f"{name}.xml"), "w") as f:
            f.write(f"<annotation><size><width>{w}</width>"
                    f"<height>{h}</height></size>{xo}</annotation>")
    sets = os.path.join(root, "ImageSets", "Main")
    with open(os.path.join(sets, "trainval.txt"), "w") as f:
        f.write("\n".join(names_tr) + "\n")
    with open(os.path.join(sets, "test.txt"), "w") as f:
        f.write("\n".join(names_te) + "\n")
    print(f"VOC shapes: {len(names_tr)} train / {len(names_te)} test "
          f"→ {out_root}")


# the standard 80 COCO detection category ids (1..90 minus the 10 unused
# slots) — declared in full by --full_cats so an 80-class model/evaluator
# run sees the real category table even though only the shape classes carry
# annotations (reference class_ids = sorted(getCatIds()), data/coco.py:67)
COCO_80_CAT_IDS = tuple(
    i for i in range(1, 91)
    if i not in (12, 26, 29, 30, 45, 66, 68, 69, 71, 83))


def make_coco(out_root: str, n: int = 80, train_frac: float = 0.75,
              seed: int = 7, classes: int = 3, max_objs: int = 3,
              full_cats: bool = False) -> None:
    import cv2

    os.makedirs(os.path.join(out_root, "annotations"), exist_ok=True)
    rng = np.random.default_rng(seed)
    n_train = int(n * train_frac)
    splits = (("train2017", 0, n_train), ("val2017", n_train, n))
    for split, lo, hi in splits:
        os.makedirs(os.path.join(out_root, split), exist_ok=True)
        images, anns = [], []
        aid = 1
        for i in range(lo, hi):
            img, objs = render_scene(rng, min_h=240, max_h=360,
                                     min_w=280, max_w=420,
                                     n_classes=classes, max_objs=max_objs)
            h, w = img.shape[:2]
            name = f"{i + 1:012}.jpg"
            cat_tab = COCO_SHAPE_CATS_20 if classes > 6 else COCO_SHAPE_CATS
            for cls, x1, y1, x2, y2 in objs:
                bw, bh = x2 - x1, y2 - y1
                anns.append({"id": aid, "image_id": i + 1,
                             "category_id": cat_tab[cls],
                             "bbox": [x1, y1, bw, bh], "area": bw * bh,
                             "iscrowd": 0})
                aid += 1
            cv2.imwrite(os.path.join(out_root, split, name), img)
            images.append({"id": i + 1, "file_name": name,
                           "width": w, "height": h})
        if full_cats:
            cats = [{"id": c, "name": f"cat{c}"} for c in COCO_80_CAT_IDS]
        elif classes > 6:
            cats = [{"id": c, "name": f"shape{j}"}
                    for j, c in enumerate(COCO_SHAPE_CATS_20)]
        else:
            cats = [{"id": c, "name": nm} for c, nm in
                    zip(COCO_SHAPE_CATS, COCO_SHAPE_NAMES)]
        blob = {"images": images, "annotations": anns,
                "categories": cats}
        with open(os.path.join(out_root, "annotations",
                               f"instances_{split}.json"), "w") as f:
            json.dump(blob, f)
        print(f"COCO shapes {split}: {hi - lo} images, {len(anns)} boxes")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("format", choices=["voc", "coco"])
    p.add_argument("out_root")
    p.add_argument("--n", type=int, default=None, help="total images")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--train_frac", type=float, default=None)
    p.add_argument("--classes", type=int, default=None, choices=[*range(1, 7), 20],
                   help="number of shape classes (default 3; 6 adds "
                        "non-square ellipse/cross/ring; 20 = the full-VOC "
                        "shape x color-group grid)")
    p.add_argument("--max_objs", type=int, default=None)
    p.add_argument("--full_cats", action="store_true", default=None,
                   help="(coco) declare ALL 80 standard COCO categories in "
                        "the instances json, so models/evaluators run the "
                        "real 80-class path (shapes annotate a subset)")
    args = p.parse_args(argv)
    if args.full_cats and args.format != "coco":
        p.error("--full_cats only applies to the coco format")
    kw = {k: v for k, v in (("n", args.n), ("seed", args.seed),
                            ("train_frac", args.train_frac),
                            ("classes", args.classes),
                            ("max_objs", args.max_objs),
                            ("full_cats", args.full_cats))
          if v is not None}
    (make_voc if args.format == "voc" else make_coco)(args.out_root, **kw)


if __name__ == "__main__":
    main()
