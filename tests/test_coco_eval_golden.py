"""Hand-computed golden fixtures for the native COCOEval — the adversarial
edges a randomized property test may under-sample (round-2 VERDICT #9):
exact score ties (stable mergesort ordering is part of the protocol),
maxDets=1 ordering, crowd + area-range interplay, and categories that have
detections but no ground truth anywhere.

Every expected value below is derived by hand in the comments, and each
fixture is also cross-checked against the independent brute-force
implementation from test_coco_eval_property. Reference semantics:
pycocotools COCOeval as invoked by evaluator/cocoapi_evaluator.py:117-121.
"""

import pytest

from tests.test_coco_eval_property import brute_force_stats
from yolo_nano_tpu.evaluation.coco_eval import COCOEval


def _gt(i, img, cat, bbox, crowd=0, area=None):
    return {"id": i, "image_id": img, "category_id": cat, "bbox": bbox,
            "area": bbox[2] * bbox[3] if area is None else area,
            "iscrowd": crowd}


def _dt(img, cat, bbox, score):
    return {"image_id": img, "category_id": cat, "bbox": bbox,
            "score": score}


def _check(gts, dts, image_ids, cat_ids, expect):
    got = COCOEval(gts, image_ids, cat_ids).evaluate(dts, verbose=False)
    brute = brute_force_stats(gts, dts, image_ids, cat_ids)
    for k, v in brute.items():
        assert got[k] == pytest.approx(v, abs=1e-12), (k, got[k], v)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, abs=1e-12), (k, got[k], v)
    return got


def test_exact_score_tie_insertion_order_decides_ap():
    """Two detections with IDENTICAL scores, one TP one FP, one gt.

    The protocol sorts by -score with a STABLE sort, so insertion order
    breaks the tie. TP listed first: PR walk is TP(p=1, r=1) then
    FP(p=.5, r=1) → envelope 1.0 at every sampled recall → AP 1.0.
    FP listed first: FP(p=0, r=0) then TP(p=.5, r=1) → envelope 0.5
    → AP 0.5. An unstable sort would make this flaky."""
    gts = [_gt(1, 1, 1, [0.0, 0.0, 10.0, 10.0])]
    tp = _dt(1, 1, [0.0, 0.0, 10.0, 10.0], 0.5)   # IoU 1.0 at every thr
    fp = _dt(1, 1, [300.0, 300.0, 10.0, 10.0], 0.5)
    _check(gts, [tp, fp], [1], [1],
           {"AP": 1.0, "AP50": 1.0, "AP75": 1.0, "AR100": 1.0})
    _check(gts, [fp, tp], [1], [1],
           {"AP": 0.5, "AP50": 0.5, "AP75": 0.5, "AR100": 1.0})


def test_maxdets_1_keeps_highest_score_not_best_match():
    """maxDets truncation happens on the SCORE-sorted list before matching:
    a high-score FP crowds out the low-score TP at maxDets=1.

    AR1: only the 0.9 FP survives → recall 0. AR10: both survive → the 0.3
    TP matches → recall 1. AP@maxDets=100: walk is FP(p=0) then
    TP(p=.5, r=1) → 0.5."""
    gts = [_gt(1, 1, 1, [0.0, 0.0, 20.0, 20.0])]
    dts = [_dt(1, 1, [200.0, 200.0, 20.0, 20.0], 0.9),   # FP, higher score
           _dt(1, 1, [0.0, 0.0, 20.0, 20.0], 0.3)]       # TP, lower score
    _check(gts, dts, [1], [1],
           {"AR1": 0.0, "AR10": 1.0, "AR100": 1.0, "AP": 0.5})


def test_crowd_and_area_range_interplay():
    """One small real gt (10×10, area 100) + one large CROWD gt (200×200).

    Crowd gts are ignore-matched with IoU = inter/det_area, can absorb
    MULTIPLE detections, and never count toward npig. Detections d1/d3 sit
    fully inside the crowd (crowd-IoU 1.0) → matched-ignored at every
    threshold; d2 is exact on the real gt → TP. So:
      all:   npig=1 (real gt), TP only → AP 1.0;
      small: real gt in range (100 < 32²), crowd out of range AND crowd
             → still npig=1 → APs 1.0. d1/d3 (400 ≤ 32²) stay ignored via
             their crowd match, not counted as small-range FPs;
      large: real gt out of range, crowd ignored → npig=0 → unmeasured −1."""
    gts = [_gt(1, 1, 1, [0.0, 0.0, 10.0, 10.0]),
           _gt(2, 1, 1, [50.0, 50.0, 200.0, 200.0], crowd=1)]
    dts = [_dt(1, 1, [60.0, 60.0, 20.0, 20.0], 0.9),    # inside crowd
           _dt(1, 1, [0.0, 0.0, 10.0, 10.0], 0.8),      # TP on real gt
           _dt(1, 1, [100.0, 100.0, 20.0, 20.0], 0.7)]  # also inside crowd
    _check(gts, dts, [1], [1],
           {"AP": 1.0, "APs": 1.0, "APm": -1.0, "APl": -1.0,
            "AR100": 1.0, "ARs": 1.0, "ARl": -1.0})


def test_gt_area_field_overrides_wh_for_range_gating():
    """The gt 'area' field (segmentation area in real COCO) — not w·h —
    decides the range. A 100×100 box with area=500 is SMALL: its cell is
    measured in the small range and unmeasured in medium/large."""
    gts = [_gt(1, 1, 1, [0.0, 0.0, 100.0, 100.0], area=500.0)]
    dts = [_dt(1, 1, [0.0, 0.0, 100.0, 100.0], 0.9)]
    # small range: gt counted; the det (d_area 10000) matches it → TP
    _check(gts, dts, [1], [1],
           {"AP": 1.0, "APs": 1.0, "APm": -1.0, "APl": -1.0})


def test_detection_only_category_is_unmeasured_not_zero():
    """A category with detections but NO ground truth anywhere contributes
    npig=0 cells, which stay at −1 and are EXCLUDED from the category mean —
    they must not drag AP toward zero (cocoapi_evaluator.py:117-121
    delegates exactly this averaging to COCOeval)."""
    gts = [_gt(1, 1, 1, [0.0, 0.0, 50.0, 50.0])]
    dts = [_dt(1, 1, [0.0, 0.0, 50.0, 50.0], 0.9),
           _dt(1, 2, [10.0, 10.0, 30.0, 30.0], 0.95),   # cat 2: no gt
           _dt(2, 2, [0.0, 0.0, 40.0, 40.0], 0.8)]
    got = _check(gts, dts, [1, 2], [1, 2],
                 {"AP": 1.0, "AP50": 1.0, "AR100": 1.0})
    # sanity: removing the gt-less category changes nothing
    alone = COCOEval(gts, [1, 2], [1]).evaluate(
        [d for d in dts if d["category_id"] == 1], verbose=False)
    assert got["AP"] == alone["AP"]


def test_equal_iou_gt_tie_breaks_to_later_index():
    """Two gts tie on IoU for the first detection: the greedy scan's
    `< best: continue` lets an EQUAL IoU update the match, so the LATER
    gt index wins the tie (pycocotools semantics; a plain argmax would
    keep the first and silently free the wrong gt for the next det).

    gt0=[0,0,10,10], gt1=[2,0,10,10]; det0=[1,0,10,10] has IoU 90/110
    (~0.818) vs BOTH; det1=[2,0,10,10] has IoU 1.0 vs gt1, 80/120
    (~0.667) vs gt0. Correct (later-index) matching: det0→gt1, then
    det1 falls back to gt0 — a TP only while 0.667 clears the threshold.
    First-index matching would instead leave gt1 free and score det1 as
    a perfect TP through thr 0.80, inflating AP.
      thr .50-.65 (4): TP,TP → AP 1.0
      thr .70-.80 (3): TP,FP → envelope 1.0 up to recall .5 → 51/101
      thr .85-.95 (3): FP,TP → 0.5 up to recall .5 → 25.5/101
      AP = (4 + 3·51/101 + 3·25.5/101) / 10"""
    gts = [_gt(1, 1, 1, [0.0, 0.0, 10.0, 10.0]),
           _gt(2, 1, 1, [2.0, 0.0, 10.0, 10.0])]
    dts = [_dt(1, 1, [1.0, 0.0, 10.0, 10.0], 0.9),
           _dt(1, 1, [2.0, 0.0, 10.0, 10.0], 0.8)]
    _check(gts, dts, [1], [1],
           {"AP": (4 + 3 * 51 / 101 + 3 * 25.5 / 101) / 10})


def test_tie_ordering_across_images_follows_image_id_order():
    """Equal scores on DIFFERENT images: the global mergesort preserves the
    per-image concatenation order (image_ids order). img 1 holds the FP,
    img 2 the TP; with ids [1, 2] the FP is walked first → AP 0.5 (same
    math as the in-image tie), with ids [2, 1] the TP first → AP 1.0."""
    gts = [_gt(1, 2, 1, [0.0, 0.0, 10.0, 10.0])]
    dts = [_dt(1, 1, [0.0, 0.0, 10.0, 10.0], 0.6),     # FP (img 1 has no gt)
           _dt(2, 1, [0.0, 0.0, 10.0, 10.0], 0.6)]     # TP
    _check(gts, dts, [1, 2], [1], {"AP": 0.5})
    _check(gts, dts, [2, 1], [1], {"AP": 1.0})
