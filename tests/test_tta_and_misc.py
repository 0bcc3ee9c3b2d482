"""TTA flip-merge consistency, EvalLoader final-batch padding, config
override plumbing."""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_nano_tpu.config import YoloNanoConfig
from yolo_nano_tpu.models.yolo_nano import init_yolo_nano


def test_tta_is_flip_equivariant():
    """TTA(image) and TTA(flipped image) must produce mirrored detections:
    the multi-scale+flip ensemble is symmetric under horizontal flip."""
    from yolo_nano_tpu.utils.tta import make_tta_predict

    cfg = YoloNanoConfig(num_classes=20, nms_pre_topk=64, max_detections=8,
                         conf_thresh=0.0)
    params, stats = init_yolo_nano(jax.random.key(0), cfg)
    tta = make_tta_predict(params, stats, cfg, scale_range=(64, 64, 32))
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))
    b1, s1, c1, v1 = (np.asarray(t) for t in tta(x))
    b2, s2, c2, v2 = (np.asarray(t) for t in tta(x[:, :, ::-1, :]))
    # mirror the second result back
    b2m = np.stack([1 - b2[..., 2], b2[..., 1], 1 - b2[..., 0], b2[..., 3]],
                   -1)
    np.testing.assert_allclose(np.sort(s1[v1]), np.sort(s2[v2]), rtol=1e-3,
                               atol=1e-4)
    # same top box location (order can differ on near-ties)
    top1 = b1[0, np.argmax(s1[0])]
    top2 = b2m[0, np.argmax(s2[0])]
    np.testing.assert_allclose(top1, top2, atol=5e-3)


def test_tta_cross_scale_merge_matches_greedy_oracle():
    """The TTA merge stage — concatenate every view's post-NMS survivors,
    then ONE cross-view per-class greedy NMS at the merge threshold
    (reference utils/misc.py:133-141; utils/tta.py merge = the identical
    batched_nms_scored call) — must equal a sequential numpy oracle.

    Synthetic per-view survivors with well-separated scores (an end-to-end
    variant through the real model is numerically ill-posed: the same
    object seen at two scales produces near-tie scores whose greedy
    keep/suppress decision flips on ~1e-6 fused-graph wiggle; the TTA
    h2h tool covers that path statistically instead). Views carry heavy
    cross-view duplicates — the case the merge exists for."""
    from yolo_nano_tpu.ops.nms import batched_nms_scored

    rng = np.random.default_rng(11)
    b, views, per_view, max_det, thresh = 2, 6, 8, 16, 0.4
    n = views * per_view
    # distinct, well-separated scores (≥1e-3 gaps) → unambiguous ordering
    base = rng.permutation(n * 2)[:n] * 1e-3 + 0.05
    scores = np.stack([base, np.roll(base, 7)]).astype(np.float32)
    classes = rng.integers(0, 3, (b, n)).astype(np.int32)
    valid = rng.random((b, n)) < 0.8
    # duplicate clusters: each view re-detects ~the same objects with jitter
    centers = rng.uniform(0.2, 0.8, (b, per_view, 2))
    sizes = rng.uniform(0.1, 0.25, (b, per_view, 2))
    boxes = np.zeros((b, n, 4), np.float32)
    for v in range(views):
        jit = rng.normal(0, 0.01, (b, per_view, 2))
        c, s = centers + jit, sizes * (1 + rng.normal(0, 0.05,
                                                      (b, per_view, 2)))
        sl = slice(v * per_view, (v + 1) * per_view)
        boxes[:, sl, :2] = c - s / 2
        boxes[:, sl, 2:] = c + s / 2
        classes[:, sl] = classes[:, :per_view]  # same object → same class
    merged_scores = np.where(valid, scores, -1.0).astype(np.float32)

    got = [np.asarray(t) for t in batched_nms_scored(
        jnp.asarray(boxes), jnp.asarray(merged_scores),
        jnp.asarray(classes), conf_thresh=1e-3, iou_thresh=thresh,
        pre_topk=n, max_det=max_det, diou=False)]

    def greedy(bi):
        order = np.argsort(-merged_scores[bi], kind="stable")
        kept = []
        for j in order:
            if merged_scores[bi, j] < 1e-3:
                continue
            ok = True
            for k in kept:
                if classes[bi, k] != classes[bi, j]:
                    continue
                x1 = max(boxes[bi, j, 0], boxes[bi, k, 0])
                y1 = max(boxes[bi, j, 1], boxes[bi, k, 1])
                x2 = min(boxes[bi, j, 2], boxes[bi, k, 2])
                y2 = min(boxes[bi, j, 3], boxes[bi, k, 3])
                inter = max(x2 - x1, 0) * max(y2 - y1, 0)
                ua = (np.prod(boxes[bi, j, 2:] - boxes[bi, j, :2])
                      + np.prod(boxes[bi, k, 2:] - boxes[bi, k, :2]) - inter)
                if ua > 0 and inter / ua > thresh:
                    ok = False
                    break
            if ok:
                kept.append(j)
        return kept[:max_det]

    for bi in range(b):
        want = greedy(bi)
        kept_idx = np.where(got[3][bi])[0]
        assert len(kept_idx) == len(want), (len(kept_idx), len(want))
        np.testing.assert_allclose(
            got[1][bi][kept_idx], merged_scores[bi][want], rtol=1e-6)
        np.testing.assert_array_equal(
            got[2][bi][kept_idx], classes[bi][want])
        np.testing.assert_allclose(
            got[0][bi][kept_idx], boxes[bi][want], atol=1e-6)


def test_eval_loader_pads_final_batch(tmp_path):
    import cv2

    from yolo_nano_tpu.data.loader import EvalLoader
    from yolo_nano_tpu.data.voc import VOCDataset

    d = tmp_path / "VOC2007"
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        (d / sub).mkdir(parents=True)
    names = []
    for i in range(5):  # 5 images, batch 4 → final batch has 1 real image
        name = f"p{i}"
        names.append(name)
        cv2.imwrite(str(d / "JPEGImages" / f"{name}.jpg"),
                    np.full((100, 100, 3), i * 40, np.uint8))
        (d / "Annotations" / f"{name}.xml").write_text(
            "<annotation><object><name>cat</name><difficult>0</difficult>"
            "<bndbox><xmin>10</xmin><ymin>10</ymin><xmax>50</xmax>"
            "<ymax>50</ymax></bndbox></object></annotation>")
    (d / "ImageSets" / "Main" / "test.txt").write_text("\n".join(names))
    ds = VOCDataset(str(tmp_path), image_sets=[("2007", "test")],
                    augment=False)
    loader = EvalLoader(ds, img_size=64, batch_size=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    imgs0, metas0 = batches[0]
    imgs1, metas1 = batches[1]
    assert imgs0.shape == imgs1.shape == (4, 64, 64, 3)  # fixed shapes
    assert len(metas0) == 4 and len(metas1) == 1          # real-image metas
    total_ids = {m["id"][1] for m in metas0} | {m["id"][1] for m in metas1}
    assert total_ids == set(names)


def test_build_config_override_plumbing():
    from yolo_nano_tpu.cli.common import build_config

    cfg = build_config("coco", conf_thresh=0.2, nms_thresh=0.6,
                       diou_nms=True, nms_pre_topk=99, max_detections=7)
    assert cfg.num_classes == 80
    assert cfg.conf_thresh == 0.2 and cfg.nms_thresh == 0.6
    assert cfg.diou_nms and cfg.nms_pre_topk == 99
    assert cfg.max_detections == 7
    # dataclass is hashable → usable as jit static argument
    hash(cfg)


def test_class_names_for_coco_has_80_entries():
    from yolo_nano_tpu.cli.common import class_names_for

    names = class_names_for("coco")
    assert len(names) == 80
    assert names[0] == "person"
    assert "background" not in names
