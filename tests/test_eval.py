"""Evaluation metric tests: hand-computed AP cases, protocol semantics
(difficult/duplicate/crowd handling), and end-to-end evaluator runs on
synthetic datasets with a perfect-oracle predict function."""

import json

import numpy as np
import pytest

from yolo_nano_tpu.evaluation.coco_eval import COCOEval
from yolo_nano_tpu.evaluation.voc_eval import voc_ap, voc_eval_class


def test_voc_ap_11point_hand_computed():
    # one TP then one FP over npos=1: rec=[1,1], prec=[1,0.5]
    rec = np.array([1.0, 1.0])
    prec = np.array([1.0, 0.5])
    # 11-pt: all recall thresholds ≤ 1 → max prec at rec≥t is 1.0 → AP=1.0
    assert voc_ap(rec, prec, True) == pytest.approx(1.0)
    # AUC metric: envelope → 1.0 at the single recall step
    assert voc_ap(rec, prec, False) == pytest.approx(1.0)
    # half recall: rec=[0.5], prec=[1.0] → 11pt = 6/11
    assert voc_ap(np.array([0.5]), np.array([1.0]), True) == \
        pytest.approx(6 / 11)


def test_voc_eval_class_duplicate_and_difficult():
    gt = {
        "im1": {"bbox": np.array([[10, 10, 50, 50]]),
                "difficult": np.array([False])},
        "im2": {"bbox": np.array([[10, 10, 50, 50]]),
                "difficult": np.array([True])},
    }
    dets = [
        ("im1", 0.9, np.array([9, 9, 49, 49])),    # TP
        ("im1", 0.8, np.array([11, 11, 51, 51])),  # duplicate → FP
        ("im2", 0.7, np.array([9, 9, 49, 49])),    # difficult → neither
        ("im1", 0.6, np.array([200, 200, 250, 250])),  # FP
    ]
    rec, prec, ap = voc_eval_class(dets, gt)
    # npos = 1 (difficult excluded); TP at rank0 → rec hits 1.0 immediately
    assert rec[-1] == pytest.approx(1.0)
    assert ap == pytest.approx(1.0)


def test_voc_eval_class_no_detections():
    gt = {"im1": {"bbox": np.array([[0, 0, 10, 10]]),
                  "difficult": np.array([False])}}
    _, _, ap = voc_eval_class([], gt)
    assert ap == -1.0


def _coco_gt(img, cat, x, y, w, h, ann_id, iscrowd=0):
    return {"image_id": img, "category_id": cat, "bbox": [x, y, w, h],
            "area": w * h, "iscrowd": iscrowd, "id": ann_id}


def _coco_dt(img, cat, x, y, w, h, score):
    return {"image_id": img, "category_id": cat, "bbox": [x, y, w, h],
            "score": score}


def test_coco_eval_perfect_detections():
    gts = [_coco_gt(1, 1, 10, 10, 40, 40, 1),
           _coco_gt(1, 1, 100, 100, 40, 40, 2),
           _coco_gt(2, 1, 20, 20, 60, 60, 3)]
    dts = [_coco_dt(1, 1, 10, 10, 40, 40, 0.9),
           _coco_dt(1, 1, 100, 100, 40, 40, 0.8),
           _coco_dt(2, 1, 20, 20, 60, 60, 0.95)]
    ev = COCOEval(gts, [1, 2], [1])
    stats = ev.evaluate(dts, verbose=False)
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AR100"] == pytest.approx(1.0)
    # all three gts are "medium" area (32²..96²)
    assert stats["APm"] == pytest.approx(1.0)
    assert stats["APs"] == -1.0  # no small gt → unmeasured


def test_coco_eval_iou_threshold_sweep():
    """A det with IoU 0.6 vs gt: counts at thresholds ≤ 0.55, misses above."""
    gts = [_coco_gt(1, 1, 0, 0, 100, 100, 1)]
    # shifted box with IoU = (100-25)²/(2·100²−75²) vs [0,0,100,100]:
    # inter = 75·75 = 5625, union = 20000−5625 = 14375 → IoU ≈ 0.391
    dts = [_coco_dt(1, 1, 25, 25, 100, 100, 0.9)]
    stats = COCOEval(gts, [1], [1]).evaluate(dts, verbose=False)
    assert stats["AP50"] == pytest.approx(0.0)
    # det [0,0,90,100] vs gt [0,0,100,100]: IoU = 9000/10000 = 0.90
    dts = [_coco_dt(1, 1, 0, 0, 90, 100, 0.9)]
    stats = COCOEval(gts, [1], [1]).evaluate(dts, verbose=False)
    # matches at thresholds 0.50..0.90 (9 of 10), misses only 0.95
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AP"] == pytest.approx(0.9)


def test_coco_eval_crowd_not_penalized():
    gts = [_coco_gt(1, 1, 0, 0, 100, 100, 1, iscrowd=1),
           _coco_gt(1, 1, 300, 300, 50, 50, 2)]
    dts = [_coco_dt(1, 1, 10, 10, 50, 50, 0.9),   # inside crowd → ignored
           _coco_dt(1, 1, 300, 300, 50, 50, 0.8)]  # TP on the real gt
    stats = COCOEval(gts, [1], [1]).evaluate(dts, verbose=False)
    assert stats["AP"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# end-to-end: synthetic datasets + oracle predictions
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def synthetic_voc(tmp_path_factory):
    from tests.helpers import make_synthetic_voc

    return make_synthetic_voc(tmp_path_factory.mktemp("vocdev"),
                              splits=("test",))


def _oracle_predict_factory(dataset, img_size, class_names, max_det=16):
    """predict_fn that returns each image's ground truth, perfectly."""
    from yolo_nano_tpu.evaluation.evaluator import parse_rec_raw

    state = {"cursor": 0}

    def predict(images):
        b = images.shape[0]
        boxes = np.zeros((b, max_det, 4), np.float32)
        scores = np.zeros((b, max_det), np.float32)
        classes = np.zeros((b, max_det), np.int32)
        valid = np.zeros((b, max_det), bool)
        for bi in range(b):
            idx = state["cursor"] + bi
            if idx >= len(dataset):
                continue
            img_id = dataset.ids[idx]
            recs = parse_rec_raw(dataset._anno_path(img_id))
            img, _ = dataset.pull_image(idx)
            h, w = img.shape[:2]
            from yolo_nano_tpu.data.transforms import resize_letterbox

            _, _, scale, offset = resize_letterbox(img, img_size)
            for mi, o in enumerate(recs[:max_det]):
                bb = np.array(o["bbox"], np.float32)
                pct = bb / np.array([w, h, w, h], np.float32)
                boxes[bi, mi] = pct * scale + offset
                scores[bi, mi] = 0.9
                classes[bi, mi] = class_names.index(o["name"])
                valid[bi, mi] = True
        state["cursor"] += b
        return boxes, scores, classes, valid

    return predict


def test_voc_evaluator_oracle_predictions_reach_full_map(synthetic_voc):
    from yolo_nano_tpu.data.voc import VOC_CLASSES
    from yolo_nano_tpu.evaluation.evaluator import VOCEvaluator

    root, _ = synthetic_voc
    ev = VOCEvaluator(root, img_size=128, set_type="test", batch_size=4,
                      num_workers=2)
    predict = _oracle_predict_factory(ev.dataset, 128, list(VOC_CLASSES))
    m = ev.evaluate(predict)
    # classes present in the data score a perfect AP; absent classes carry the
    # reference's -1 sentinel into the mean (vocapi_evaluator.py:333-336), so
    # mAP over 20 classes with 3 present = (3·1 + 17·(−1))/20 = −0.7
    for cls in ("dog", "car", "person"):
        assert ev.aps[cls] == pytest.approx(1.0, abs=1e-6)
    assert m == pytest.approx((3 - 17) / 20)
    # gt_npos separates "absent class" from "failed class": a spurious
    # detection for a no-gt class scores AP 0.0 under the reference
    # protocol, so ap >= 0 alone cannot identify present classes
    for cls in VOC_CLASSES:
        expected_present = cls in ("dog", "car", "person")
        assert (ev.gt_npos[cls] > 0) == expected_present


@pytest.fixture(scope="module")
def synthetic_coco(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("coco")
    (root / "annotations").mkdir()
    (root / "val2017").mkdir()
    rng = np.random.default_rng(1)
    images, anns = [], []
    ann_id = 1
    for img_id in range(1, 6):
        h, w = int(rng.integers(200, 320)), int(rng.integers(200, 320))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        name = f"{img_id:012}.jpg"
        cv2.imwrite(str(root / "val2017" / name), img)
        images.append({"id": img_id, "file_name": name,
                       "width": w, "height": h})
        for _ in range(int(rng.integers(1, 3))):
            bw, bh = int(rng.integers(40, 90)), int(rng.integers(40, 90))
            x = int(rng.integers(0, w - bw))
            y = int(rng.integers(0, h - bh))
            anns.append({"id": ann_id, "image_id": img_id,
                         "category_id": int(rng.choice([1, 3, 7])),
                         "bbox": [x, y, bw, bh], "area": bw * bh,
                         "iscrowd": 0})
            ann_id += 1
    blob = {"images": images, "annotations": anns,
            "categories": [{"id": 1, "name": "person"},
                           {"id": 3, "name": "car"},
                           {"id": 7, "name": "train"}]}
    with open(root / "annotations" / "instances_val2017.json", "w") as f:
        json.dump(blob, f)
    return str(root)


def test_coco_evaluator_oracle_predictions(synthetic_coco):
    from yolo_nano_tpu.data.transforms import resize_letterbox
    from yolo_nano_tpu.evaluation.evaluator import COCOEvaluator

    ev = COCOEvaluator(synthetic_coco, img_size=128, batch_size=4,
                       num_workers=2)
    ds = ev.dataset
    state = {"cursor": 0}

    def predict(images):
        b = images.shape[0]
        max_det = 16
        boxes = np.zeros((b, max_det, 4), np.float32)
        scores = np.zeros((b, max_det), np.float32)
        classes = np.zeros((b, max_det), np.int32)
        valid = np.zeros((b, max_det), bool)
        for bi in range(b):
            idx = state["cursor"] + bi
            if idx >= len(ds):
                continue
            img_id = ds.ids[idx]
            img, _ = ds.pull_image(idx)
            h, w = img.shape[:2]
            _, _, scale, offset = resize_letterbox(img, 128)
            for mi, a in enumerate(ds._anns.get(img_id, ())[:max_det]):
                x, y, bw, bh = a["bbox"]
                pct = np.array([x, y, x + bw, y + bh], np.float32) / \
                    np.array([w, h, w, h], np.float32)
                boxes[bi, mi] = pct * scale + offset
                scores[bi, mi] = 0.9
                classes[bi, mi] = ds.class_ids.index(a["category_id"])
                valid[bi, mi] = True
        state["cursor"] += b
        return boxes, scores, classes, valid

    ap50, ap = ev.evaluate(predict)
    assert ap50 == pytest.approx(1.0, abs=1e-6)
    assert ap > 0.95  # tiny letterbox rounding can shave the top thresholds


def test_voc_evaluator_dump_artifacts(synthetic_voc, tmp_path):
    """--dump_dets artifacts: VOCdevkit-style per-class .txt (1-based coords)
    + detections.pkl (reference vocapi_evaluator.py:91-92,142-157)."""
    import os
    import pickle

    from yolo_nano_tpu.data.voc import VOC_CLASSES
    from yolo_nano_tpu.evaluation.evaluator import VOCEvaluator

    root, gts = synthetic_voc
    dump = str(tmp_path / "dets")
    ev = VOCEvaluator(root, img_size=128, set_type="test", batch_size=4,
                      num_workers=2, dump_dir=dump)
    predict = _oracle_predict_factory(ev.dataset, 128, list(VOC_CLASSES))
    ev.evaluate(predict)

    with open(os.path.join(dump, "detections.pkl"), "rb") as f:
        all_boxes = pickle.load(f)
    assert set(all_boxes) == set(VOC_CLASSES)
    n_txt_dets = 0
    for cls in VOC_CLASSES:
        path = os.path.join(dump, "results", f"det_test_{cls}.txt")
        assert os.path.exists(path)
        for ln in open(path):
            name, score, x1, y1, x2, y2 = ln.split()
            n_txt_dets += 1
            assert name in gts and 0.0 < float(score) <= 1.0
            # 1-based coords round-trip back to ~the gt box (oracle preds)
            match = any(abs(float(x1) - 1 - gx1) < 3 and
                        abs(float(y2) - 1 - gy2) < 3
                        for c, gx1, gy1, gx2, gy2 in gts[name][0]
                        if c == cls)
            assert match
    total_gt = sum(len(objs) for objs, _, _ in gts.values())
    assert n_txt_dets == total_gt


def test_coco_evaluator_dump_json(synthetic_coco, tmp_path):
    from yolo_nano_tpu.evaluation.evaluator import COCOEvaluator

    dump = str(tmp_path / "out" / "coco_results.json")
    ev = COCOEvaluator(synthetic_coco, img_size=128, batch_size=4,
                       num_workers=2, dump_path=dump)
    # reuse the oracle from the test above via a fresh evaluator dataset
    ds = ev.dataset
    from yolo_nano_tpu.data.transforms import resize_letterbox

    def predict(images, _state={"cursor": 0}):
        b = images.shape[0]
        boxes = np.zeros((b, 16, 4), np.float32)
        scores = np.zeros((b, 16), np.float32)
        classes = np.zeros((b, 16), np.int32)
        valid = np.zeros((b, 16), bool)
        for bi in range(b):
            idx = _state["cursor"] + bi
            if idx >= len(ds):
                continue
            img_id = ds.ids[idx]
            img, _ = ds.pull_image(idx)
            h, w = img.shape[:2]
            _, _, scale, offset = resize_letterbox(img, 128)
            for mi, a in enumerate(ds._anns.get(img_id, ())[:16]):
                x, y, bw, bh = a["bbox"]
                pct = np.array([x, y, x + bw, y + bh], np.float32) / \
                    np.array([w, h, w, h], np.float32)
                boxes[bi, mi] = pct * scale + offset
                scores[bi, mi] = 0.9
                classes[bi, mi] = ds.class_ids.index(a["category_id"])
                valid[bi, mi] = True
        _state["cursor"] += b
        return boxes, scores, classes, valid

    ap50, _ = ev.evaluate(predict)
    assert ap50 == pytest.approx(1.0, abs=1e-6)
    results = json.load(open(dump))
    assert len(results) == sum(len(v) for v in ds._anns.values())
    for r in results:
        assert set(r) == {"image_id", "category_id", "bbox", "score"}
        assert r["category_id"] in ds.class_ids
