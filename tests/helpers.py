"""Shared test utilities."""

import numpy as np


def make_synthetic_voc(root, n_images=6, classes=("dog", "car", "person"),
                       seed=0, splits=("trainval", "test"),
                       deterministic_boxes=False):
    """Build a tiny on-disk VOC2007 dataset (white rectangles as objects).

    Returns (root_str, {name: (objs, w, h)}) where
    objs = [(cls, x1, y1, x2, y2), ...].
    """
    import cv2

    d = root / "VOC2007"
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        (d / sub).mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    names, gts = [], {}
    for i in range(n_images):
        name = f"im{i:04d}"
        names.append(name)
        if deterministic_boxes:
            h, w = 240, 320
        else:
            h, w = int(rng.integers(200, 400)), int(rng.integers(200, 400))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        objs = []
        for _ in range(1 if deterministic_boxes else int(rng.integers(1, 4))):
            if deterministic_boxes:
                x1, y1 = 40 + 10 * i, 30
                x2, y2 = x1 + 80, y1 + 100
            else:
                x1 = int(rng.integers(2, w - 80))
                y1 = int(rng.integers(2, h - 80))
                x2 = x1 + int(rng.integers(40, 78))
                y2 = y1 + int(rng.integers(40, 78))
            cls = classes[int(rng.integers(len(classes)))]
            cv2.rectangle(img, (x1, y1), (x2, y2), (255, 255, 255), -1)
            objs.append((cls, x1, y1, x2, y2))
        gts[name] = (objs, w, h)
        cv2.imwrite(str(d / "JPEGImages" / f"{name}.jpg"), img)
        xml_objs = "".join(
            f"<object><name>{c}</name><difficult>0</difficult><bndbox>"
            f"<xmin>{a}</xmin><ymin>{b}</ymin><xmax>{cc}</xmax>"
            f"<ymax>{dd}</ymax></bndbox></object>"
            for c, a, b, cc, dd in objs)
        (d / "Annotations" / f"{name}.xml").write_text(
            f"<annotation><size><width>{w}</width><height>{h}</height>"
            f"</size>{xml_objs}</annotation>")
    for split in splits:
        (d / "ImageSets" / "Main" / f"{split}.txt").write_text(
            "\n".join(names) + "\n")
    return str(root), gts
