"""Property test for the native COCOEval against an independent brute-force
implementation of the COCO bbox protocol.

The reference delegates the metric of record to pycocotools' COCOeval
(reference evaluator/cocoapi_evaluator.py:117-128) — unavailable in this
image. evaluation/coco_eval.py reimplements it natively; a silent matching
bug there would corrupt every COCO number this project publishes. This file
re-derives the protocol a second time, directly from its definition, sharing
NO code with the library version (pure-python loops, per-configuration
rematching instead of shared match tables), and asserts all 12 stats agree on
randomized corpora with the nasty cases: crowd gts, gt `area` fields that
disagree with w·h, area-range boundary boxes, >100 detections per image,
duplicate scores (tie-break order is part of the protocol), detections on
unknown images, and images with gts but no detections.
"""

import numpy as np
import pytest

from yolo_nano_tpu.evaluation.coco_eval import COCOEval

# ---------------------------------------------------------------------------
# independent brute-force implementation (definition-first, no shared code)
# ---------------------------------------------------------------------------

_THRS = [0.5 + 0.05 * i for i in range(10)]
# the 101-point recall grid is np.linspace in the protocol definition
# (pycocotools Params.setDetParams); its values differ from i/100 by 1 ULP
# at some points (e.g. index 35 → 0.35000000000000003), and that ULP decides
# whether an exact-recall cutoff is interpolated or zeroed
_RECS = [float(x) for x in np.linspace(0.0, 1.0, 101)]
_AREAS = [("all", 0.0, 1e10), ("small", 0.0, 32.0 ** 2),
          ("medium", 32.0 ** 2, 96.0 ** 2), ("large", 96.0 ** 2, 1e10)]
_MDS = [1, 10, 100]


def _iou_one(det, gt, crowd):
    dx, dy, dw, dh = det
    gx, gy, gw, gh = gt
    iw = min(dx + dw, gx + gw) - max(dx, gx)
    ih = min(dy + dh, gy + gh) - max(dy, gy)
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    union = dw * dh if crowd else dw * dh + gw * gh - inter
    return inter / union if union > 0 else 0.0


def _match_image(dets, gts, thr, a_lo, a_hi):
    """Greedy COCO matching for one (image, category, iou-thr, area-range).

    dets: [(score, bbox)], already score-sorted and maxDet-truncated.
    gts:  [(bbox, area, iscrowd)].
    Returns (per-det tp flags, per-det ignore flags, n_non_ignored_gt).
    """
    g_ig = [bool(crowd) or area < a_lo or area > a_hi
            for _, area, crowd in gts]
    # matching visits non-ignored gts first, original order within each group
    order = [i for i in range(len(gts)) if not g_ig[i]] + \
            [i for i in range(len(gts)) if g_ig[i]]
    taken = [False] * len(gts)
    tp, dt_ig = [], []
    for score, dbox in dets:
        best = min(thr, 1 - 1e-10)
        best_g = -1
        for gj in order:
            crowd = bool(gts[gj][2])
            if taken[gj] and not crowd:
                continue
            if best_g > -1 and not g_ig[best_g] and g_ig[gj]:
                break  # a real match is locked in; rest are ignored gts
            iou = _iou_one(dbox, gts[gj][0], crowd)
            if iou < best:
                continue
            best = iou
            best_g = gj
        if best_g == -1:
            d_area = dbox[2] * dbox[3]
            tp.append(False)
            dt_ig.append(d_area < a_lo or d_area > a_hi)
        else:
            taken[best_g] = True
            tp.append(not g_ig[best_g])
            dt_ig.append(g_ig[best_g])
    return tp, dt_ig, sum(1 for x in g_ig if not x)


def brute_force_stats(gt_anns, detections, image_ids, cat_ids):
    gts_by = {}
    for g in gt_anns:
        gts_by.setdefault((g["image_id"], g["category_id"]), []).append(
            (tuple(g["bbox"]), g["area"], g.get("iscrowd", 0)))
    dts_by = {}
    for d in detections:
        dts_by.setdefault((d["image_id"], d["category_id"]), []).append(
            (d["score"], tuple(d["bbox"])))

    # precision[(ti, ki, ai, mi)] → list of 101 interpolated precisions
    precision, recall = {}, {}
    for ki, cat in enumerate(cat_ids):
        # score-sorted (stable), truncated to the largest maxDet, per image
        img_dets = {}
        for img in image_ids:
            ds = dts_by.get((img, cat), [])
            ds = sorted(ds, key=lambda t: -t[0])[:max(_MDS)]
            img_dets[img] = ds
        for ai, (_, a_lo, a_hi) in enumerate(_AREAS):
            for mi, md in enumerate(_MDS):
                for ti, thr in enumerate(_THRS):
                    entries = []  # (score, seq, tp, ignore), seq = global order
                    npig = 0
                    seq = 0
                    for img in image_ids:
                        gt = gts_by.get((img, cat), [])
                        dt = img_dets[img][:md]
                        if not gt and not dt:
                            continue
                        tp, dig, n = _match_image(dt, gt, thr, a_lo, a_hi)
                        npig += n
                        for (score, _), t, ig in zip(dt, tp, dig):
                            entries.append((score, seq, t, ig))
                            seq += 1
                    if npig == 0:
                        continue  # this cell stays unmeasured (-1)
                    entries.sort(key=lambda e: (-e[0], e[1]))
                    tps = fps = 0
                    rc, pr = [], []
                    for score, _, t, ig in entries:
                        if ig:
                            continue
                        tps += 1 if t else 0
                        fps += 0 if t else 1
                        rc.append(tps / npig)
                        pr.append(tps / (tps + fps))
                    recall[(ti, ki, ai, mi)] = rc[-1] if rc else 0.0
                    for i in range(len(pr) - 2, -1, -1):
                        pr[i] = max(pr[i], pr[i + 1])
                    q = []
                    for r_thr in _RECS:
                        idx = next((i for i, r in enumerate(rc)
                                    if r >= r_thr), None)
                        q.append(pr[idx] if idx is not None else 0.0)
                    precision[(ti, ki, ai, mi)] = q

    def ap(t_sel=None, area="all", md=100):
        ai = [a[0] for a in _AREAS].index(area)
        mi = _MDS.index(md)
        vals = [v for (ti, ki, a_i, m_i), qs in precision.items()
                if a_i == ai and m_i == mi and
                (t_sel is None or abs(_THRS[ti] - t_sel) < 1e-9)
                for v in qs]
        return float(np.mean(vals)) if vals else -1.0

    def ar(area="all", md=100):
        ai = [a[0] for a in _AREAS].index(area)
        mi = _MDS.index(md)
        vals = [v for (ti, ki, a_i, m_i), v in recall.items()
                if a_i == ai and m_i == mi]
        return float(np.mean(vals)) if vals else -1.0

    return {
        "AP": ap(), "AP50": ap(0.5), "AP75": ap(0.75),
        "APs": ap(area="small"), "APm": ap(area="medium"),
        "APl": ap(area="large"),
        "AR1": ar(md=1), "AR10": ar(md=10), "AR100": ar(md=100),
        "ARs": ar(area="small"), "ARm": ar(area="medium"),
        "ARl": ar(area="large"),
    }


# ---------------------------------------------------------------------------
# randomized corpora
# ---------------------------------------------------------------------------

def _random_corpus(seed, n_img=24, cats=(1, 3, 7)):
    rng = np.random.default_rng(seed)
    # non-contiguous, shuffled image ids
    image_ids = list(rng.permutation(np.arange(1, n_img * 3, 3))[:n_img])
    image_ids = [int(i) for i in image_ids]
    gts, dts = [], []
    ann_id = 1
    for img in image_ids:
        for cat in cats:
            for _ in range(int(rng.integers(0, 4))):
                # log-uniform sides span small/medium/large; some sit exactly
                # on the 32²/96² boundaries
                if rng.random() < 0.15:
                    w = h = float(rng.choice([32.0, 96.0]))
                else:
                    w = float(np.exp(rng.uniform(np.log(2), np.log(220))))
                    h = float(np.exp(rng.uniform(np.log(2), np.log(220))))
                x = float(rng.uniform(0, 400))
                y = float(rng.uniform(0, 400))
                # gt 'area' is a first-class field (segmentation area in real
                # COCO) and may disagree with w·h — the protocol uses it
                area = w * h * float(rng.uniform(0.6, 1.1)) \
                    if rng.random() < 0.3 else w * h
                gt = {"id": ann_id, "image_id": img, "category_id": int(cat),
                      "bbox": [x, y, w, h], "area": area,
                      "iscrowd": int(rng.random() < 0.15)}
                gts.append(gt)
                ann_id += 1
                # detections near this gt: duplicates, jitter, score ties
                for _ in range(int(rng.integers(0, 3))):
                    jit = rng.normal(0, 0.15 * max(w, h), 4)
                    bb = [x + jit[0], y + jit[1],
                          max(0.5, w + jit[2]), max(0.5, h + jit[3])]
                    score = float(rng.uniform(0.05, 1.0))
                    if rng.random() < 0.5:
                        score = round(score, 1)  # force duplicate scores
                    dts.append({"image_id": img, "category_id": int(cat),
                                "bbox": bb, "score": score})
        # random false positives
        for _ in range(int(rng.integers(0, 5))):
            s = float(np.exp(rng.uniform(np.log(2), np.log(220))))
            dts.append({"image_id": img,
                        "category_id": int(rng.choice(cats)),
                        "bbox": [float(rng.uniform(0, 400)),
                                 float(rng.uniform(0, 400)), s, s],
                        "score": round(float(rng.uniform(0.05, 1.0)), 1)})
    # one flooded image: >100 detections exercises maxDet truncation
    flood_img = image_ids[0]
    for i in range(120):
        dts.append({"image_id": flood_img, "category_id": int(cats[0]),
                    "bbox": [float(rng.uniform(0, 400)),
                             float(rng.uniform(0, 400)), 20.0, 20.0],
                    "score": round(float(rng.uniform(0.0, 1.0)), 1)})
    # detections on an image id outside the eval set must be ignored
    dts.append({"image_id": 999983, "category_id": int(cats[0]),
                "bbox": [0.0, 0.0, 50.0, 50.0], "score": 0.99})
    return gts, dts, image_ids, list(cats)


@pytest.mark.parametrize("seed", range(20))
def test_coco_eval_matches_brute_force(seed):
    gts, dts, image_ids, cat_ids = _random_corpus(seed)
    got = COCOEval(gts, image_ids, cat_ids).evaluate(dts, verbose=False)
    want = brute_force_stats(gts, dts, image_ids, cat_ids)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), \
            f"seed {seed}: {k} diverged {got[k]} vs {want[k]}"


def test_coco_eval_brute_force_empty_and_degenerate():
    # no detections at all → AP 0 (measured cells), not -1
    gts = [{"id": 1, "image_id": 1, "category_id": 1,
            "bbox": [0, 0, 50, 50], "area": 2500, "iscrowd": 0}]
    got = COCOEval(gts, [1], [1]).evaluate([], verbose=False)
    want = brute_force_stats(gts, [], [1], [1])
    assert got == pytest.approx(want)
    assert got["AP"] == 0.0 and got["APs"] == -1.0
    # only crowd gt → every cell unmeasured
    gts = [{"id": 1, "image_id": 1, "category_id": 1,
            "bbox": [0, 0, 50, 50], "area": 2500, "iscrowd": 1}]
    dts = [{"image_id": 1, "category_id": 1, "bbox": [0, 0, 50, 50],
            "score": 0.9}]
    got = COCOEval(gts, [1], [1]).evaluate(dts, verbose=False)
    want = brute_force_stats(gts, dts, [1], [1])
    assert got == pytest.approx(want)
    assert got["AP"] == -1.0
