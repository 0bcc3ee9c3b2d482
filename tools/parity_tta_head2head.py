"""TTA head-to-head: the reference `TestTimeAugmentation` vs our
`utils/tta.py` on IDENTICAL weights and the same val split.

One of our trained checkpoints is converted into the reference's own torch
model (tools/parity_check_reference.py::build_state_dict — the tested
ours→torch mapping), then four evaluations run, all scored by THIS repo's
VOCEvaluator:

    reference  no-TTA      (models/yolo_nano.py:361-376 eval branch)
    reference  TTA         (utils/misc.py:90-148: multi-scale + hflip,
                            merged cross-scale NMS @ 0.4)
    ours       no-TTA      (models/yolo_nano.py::predict)
    ours       TTA         (utils/tta.py — same scales, same merge thresh)

Besides the four mAPs (and the two TTA deltas), the merged TTA detections
of both frameworks are matched per image (greedy best-IoU, same class,
score ≥ 0.1) and the match rate / mean IoU / mean |Δscore| are reported —
the detection-level agreement VERDICT round 2 Missing #3 asked for.

Usage:
    python tools/parity_tta_head2head.py --root /tmp/shapes6 \
        --weight /tmp/h2h/ours_s0/voc/yolo_nano/ckpt --ema \
        --img_size 256 --scale_range 192 320 32
Prints one JSON line.
"""

import argparse
import json
import os
import sys

import numpy as np

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")


def torch_tta_adapter(model, tta, max_det=256):
    """Per-image reference TTA loop (reference test.py:125-126 pattern) in
    our predict_fn contract."""
    import torch

    def predict(images):
        b = images.shape[0]
        boxes = np.zeros((b, max_det, 4), np.float32)
        scores = np.zeros((b, max_det), np.float32)
        classes = np.zeros((b, max_det), np.int32)
        valid = np.zeros((b, max_det), bool)
        with torch.no_grad():
            for bi in range(b):
                x = torch.from_numpy(np.ascontiguousarray(
                    images[bi:bi + 1].transpose(0, 3, 1, 2)))
                bbs, scs, cls_inds = tta(x, model)
                n = min(len(scs), max_det)
                order = np.argsort(-scs)[:n]
                boxes[bi, :n] = bbs[order]
                scores[bi, :n] = scs[order]
                classes[bi, :n] = np.asarray(cls_inds)[order]
                valid[bi, :n] = True
        return boxes, scores, classes, valid

    return predict


def collect_detections(predict_fn, root, img_size, batch_size=16):
    """Run a predict_fn over the val split → ({index: (boxes, scores,
    classes)}, evaluator) — the evaluator has already computed its APs."""
    from yolo_nano_tpu.evaluation.evaluator import VOCEvaluator

    ev = VOCEvaluator(root, img_size, batch_size=batch_size, num_workers=2)
    per_image = {}

    def tee(images):
        out = predict_fn(images)
        b, s, c, v = [np.asarray(t) for t in out]
        start = len(per_image)
        for bi in range(b.shape[0]):
            per_image[start + bi] = (b[bi], s[bi], c[bi], v[bi])
        return out

    ev.evaluate(tee)
    gt_classes = {o["name"] for recs in ev._gt_cache.values() for o in recs}
    mAP = float(np.mean([ev.aps[c] for c in gt_classes]))
    # drop the final-batch padding rows (EvalLoader repeats the last image
    # to keep fixed shapes; metas — and the gt cache — cover real images only)
    n_real = len(ev._gt_cache)
    per_image = {k: v for k, v in per_image.items() if k < n_real}
    return per_image, round(mAP, 4)


def match_detections(a, b, score_min=0.1, iou_min=0.5):
    """Greedy best-IoU same-class matching between two frameworks' merged
    detections on one image. Returns (n_a, n_b, n_matched, ious, dscores)."""
    ab, asc, acl, av = a
    bb, bsc, bcl, bv = b
    ka = np.where(av & (asc >= score_min))[0]
    kb = np.where(bv & (bsc >= score_min))[0]
    used = np.zeros(len(kb), bool)
    ious, dscores = [], []
    for i in ka:
        best, best_j = 0.0, -1
        for jj, j in enumerate(kb):
            if used[jj] or acl[i] != bcl[j]:
                continue
            x1 = max(ab[i, 0], bb[j, 0])
            y1 = max(ab[i, 1], bb[j, 1])
            x2 = min(ab[i, 2], bb[j, 2])
            y2 = min(ab[i, 3], bb[j, 3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            ua = ((ab[i, 2] - ab[i, 0]) * (ab[i, 3] - ab[i, 1])
                  + (bb[j, 2] - bb[j, 0]) * (bb[j, 3] - bb[j, 1]) - inter)
            iou = inter / ua if ua > 0 else 0.0
            if iou > best:
                best, best_j = iou, jj
        if best >= iou_min and best_j >= 0:
            used[best_j] = True
            ious.append(best)
            dscores.append(abs(float(asc[i]) - float(bsc[kb[best_j]])))
    return len(ka), len(kb), len(ious), ious, dscores


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--weight", required=True, help="our checkpoint dir")
    p.add_argument("--ema", action="store_true", default=False)
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--scale_range", nargs=3, type=int, default=[192, 320, 32],
                   metavar=("LO", "HI", "STEP"),
                   help="TTA scales lo..hi inclusive (reference "
                        "utils/misc.py:95 semantics, scaled to the dataset)")
    p.add_argument("--nms_thresh", type=float, default=0.4,
                   help="TTA merge NMS threshold (reference default, "
                        "utils/misc.py:92)")
    p.add_argument("--batch_size", type=int, default=16)
    args = p.parse_args(argv)

    # import OUR tools package before the reference lands on sys.path —
    # /root/reference/tools.py shadows it otherwise
    from tools.parity_check_reference import build_state_dict
    from tools.parity_train_reference import torch_predict_adapter
    from yolo_nano_tpu.cli.common import build_config, make_predict_fn
    from yolo_nano_tpu.cli.eval import load_weights
    from yolo_nano_tpu.config import MULTI_ANCHOR_SIZE
    from yolo_nano_tpu.utils.tta import make_tta_predict

    sys.path.insert(0, REFERENCE)
    import torch

    import jax  # noqa: F401  (device init before torch threads)

    if not hasattr(np, "int"):  # reference TTA uses np.int (utils/misc.py:133)
        np.int = int

    cfg = build_config("voc", nms_pre_topk=512, max_detections=128)
    params, stats = load_weights(args.weight, cfg, args.ema)

    # ---- torch reference carrying OUR weights
    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        from models.yolo_nano import YOLONano
        from utils.misc import TestTimeAugmentation

        ref = YOLONano(device="cpu", input_size=args.img_size,
                       num_classes=20, trainable=False,
                       anchor_size=MULTI_ANCHOR_SIZE)
    finally:
        os.chdir(cwd)
    missing, unexpected = ref.load_state_dict(
        build_state_dict(params, stats, cfg), strict=False)
    assert not unexpected, unexpected[:5]
    bad = [m for m in missing if "num_batches_tracked" not in m]
    assert not bad, bad[:5]
    ref.eval()
    lo, hi, step = args.scale_range
    ref_tta = TestTimeAugmentation(num_classes=20,
                                   nms_thresh=args.nms_thresh,
                                   scale_range=[lo, hi, step])

    results = {}
    _, results["ref_mAP"] = collect_detections(
        torch_predict_adapter(ref), args.root, args.img_size,
        args.batch_size)
    ref_dets, results["ref_tta_mAP"] = collect_detections(
        torch_tta_adapter(ref, ref_tta), args.root, args.img_size,
        args.batch_size)

    # ---- ours on the same weights
    plain = make_predict_fn(params, stats, cfg, args.img_size,
                            dtype="float32")
    _, results["ours_mAP"] = collect_detections(
        plain, args.root, args.img_size, args.batch_size)
    # cfg.compute_dtype defaults to float32 — same precision as the torch side
    ours_tta = make_tta_predict(params, stats, cfg,
                                scale_range=(lo, hi, step),
                                nms_thresh=args.nms_thresh)
    ours_dets, results["ours_tta_mAP"] = collect_detections(
        ours_tta, args.root, args.img_size, args.batch_size)

    # ---- detection-level agreement of the two merged TTA outputs
    tot_a = tot_b = tot_m = 0
    all_ious, all_ds = [], []
    for idx in ref_dets:
        na, nb, nm, ious, ds = match_detections(ref_dets[idx],
                                                ours_dets[idx])
        tot_a += na
        tot_b += nb
        tot_m += nm
        all_ious += ious
        all_ds += ds
    results.update(
        tta_delta_ref=round(results["ref_tta_mAP"] - results["ref_mAP"], 4),
        tta_delta_ours=round(results["ours_tta_mAP"] - results["ours_mAP"],
                             4),
        dets_ref=tot_a, dets_ours=tot_b, dets_matched=tot_m,
        match_rate=round(tot_m / max(tot_a, 1), 4),
        matched_mean_iou=round(float(np.mean(all_ious)), 4)
        if all_ious else None,
        matched_mean_abs_dscore=round(float(np.mean(all_ds)), 4)
        if all_ds else None,
        scales=list(range(lo, hi + 1, step)), nms_thresh=args.nms_thresh)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
