"""Target-assignment vs the sequential oracle; NMS vs a brute-force oracle."""

import jax.numpy as jnp
import numpy as np

from yolo_nano_tpu.config import YoloNanoConfig
from yolo_nano_tpu.losses.targets import build_targets, build_targets_numpy
from yolo_nano_tpu.ops.nms import batched_nms


def _random_gt(rng, b, m, num_classes):
    x1 = rng.uniform(0, 0.8, (b, m))
    y1 = rng.uniform(0, 0.8, (b, m))
    w = rng.uniform(0.02, 0.5, (b, m))
    h = rng.uniform(0.02, 0.5, (b, m))
    boxes = np.stack([x1, y1, np.minimum(x1 + w, 1.0),
                      np.minimum(y1 + h, 1.0)], -1).astype(np.float32)
    labels = rng.integers(0, num_classes, (b, m)).astype(np.int32)
    # pad a couple of rows
    labels[:, -1] = -1
    return boxes, labels


def test_build_targets_matches_numpy_oracle():
    cfg = YoloNanoConfig(num_classes=20)
    rng = np.random.default_rng(0)
    boxes, labels = _random_gt(rng, 4, 8, 20)
    got = np.asarray(build_targets(jnp.asarray(boxes), jnp.asarray(labels),
                                   cfg, 128))
    want = build_targets_numpy(boxes, labels, cfg, 128)
    # collisions between different gts can differ in tie-breaking; require
    # agreement on ≥ 99% of rows and exact agreement when no collision exists
    agree = np.isclose(got, want, rtol=1e-4, atol=1e-5).all(-1)
    assert agree.mean() > 0.999, agree.mean()
    # positives present
    assert (want[..., 0] == 1).sum() > 0
    assert (got[..., 0] == 1).sum() == (want[..., 0] == 1).sum()


def test_build_targets_ignore_semantics():
    """A gt overlapping several anchors: exactly one positive, the other
    above-threshold anchors become ignore rows (tools.py:163-211)."""
    cfg = YoloNanoConfig(num_classes=20)
    # big centered box — overlaps several of the large anchors at 512 scale
    boxes = jnp.asarray([[[0.2, 0.2, 0.8, 0.8]]])
    labels = jnp.asarray([[5]], jnp.int32)
    t = np.asarray(build_targets(boxes, labels, cfg, 512))
    assert (t[..., 0] == 1).sum() == 1
    assert (t[..., 0] == -1).sum() >= 1
    pos = t[t[..., 0] == 1][0]
    assert pos[1] == 5
    assert 0 <= pos[2] < 1 and 0 <= pos[3] < 1  # tx, ty are cell offsets
    np.testing.assert_allclose(pos[7:], [0.2, 0.2, 0.8, 0.8], rtol=1e-5)


def _nms_oracle(boxes, scores, cls, conf_thresh, iou_thresh):
    """Brute-force per-class greedy NMS (reference models/yolo_nano.py:159-279)."""
    keep_flags = []
    order_all = []
    sel = scores >= conf_thresh
    idx = np.nonzero(sel)[0]
    kept = []
    for c in np.unique(cls[idx]):
        cidx = idx[cls[idx] == c]
        order = cidx[np.argsort(-scores[cidx], kind="stable")]
        while len(order):
            i = order[0]
            kept.append(i)
            rest = order[1:]
            xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
            yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
            xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
            yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
            inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
            area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            area_r = (boxes[rest, 2] - boxes[rest, 0]) * \
                (boxes[rest, 3] - boxes[rest, 1])
            iou = inter / (area_i + area_r - inter + 1e-20)
            order = rest[iou <= iou_thresh]
    return set(kept)


def test_batched_nms_matches_oracle():
    rng = np.random.default_rng(1)
    n, c = 200, 5
    boxes = np.zeros((n, 4), np.float32)
    xy = rng.uniform(0.05, 0.8, (n, 2))
    wh = rng.uniform(0.05, 0.3, (n, 2))
    boxes[:, :2] = xy
    boxes[:, 2:] = np.minimum(xy + wh, 1.0)
    class_scores = rng.uniform(0, 1, (n, c)).astype(np.float32)

    out_boxes, out_scores, out_cls, out_valid = batched_nms(
        jnp.asarray(boxes[None]), jnp.asarray(class_scores[None]),
        conf_thresh=0.3, iou_thresh=0.5, pre_topk=200, max_det=200)

    cls = class_scores.argmax(1)
    score = class_scores.max(1)
    want = _nms_oracle(boxes, score, cls, 0.3, 0.5)

    got_valid = np.asarray(out_valid[0])
    got_scores = np.asarray(out_scores[0])[got_valid]
    got_boxes = np.asarray(out_boxes[0])[got_valid]
    assert len(got_scores) == len(want)
    want_scores = np.sort(score[sorted(want)])[::-1]
    np.testing.assert_allclose(np.sort(got_scores)[::-1], want_scores,
                               rtol=1e-6)
    want_boxes = boxes[sorted(want, key=lambda i: -score[i])]
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-6)


def test_batched_nms_diou_runs():
    rng = np.random.default_rng(2)
    boxes = rng.uniform(0, 1, (2, 50, 4)).astype(np.float32)
    boxes = np.concatenate([np.minimum(boxes[..., :2], boxes[..., 2:]),
                            np.maximum(boxes[..., :2], boxes[..., 2:])], -1)
    scores = rng.uniform(0, 1, (2, 50, 3)).astype(np.float32)
    out = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                      conf_thresh=0.2, iou_thresh=0.5, pre_topk=50,
                      max_det=10, diou=True)
    assert out[0].shape == (2, 10, 4)


def test_batched_nms_empty_input():
    boxes = jnp.zeros((1, 20, 4))
    scores = jnp.zeros((1, 20, 3))
    b, s, c, v = batched_nms(boxes, scores, conf_thresh=0.5, iou_thresh=0.5,
                             pre_topk=20, max_det=5)
    assert not bool(np.asarray(v).any())
