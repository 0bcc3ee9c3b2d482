"""On-device, batched, fixed-shape non-maximum suppression.

The reference runs NMS as a per-class python/numpy greedy loop on the host at
batch size 1 (reference models/yolo_nano.py:159-279) — its inference hot spot.
Here the whole postprocess (class argmax → confidence filter → per-class
greedy NMS → top-k selection) is one fixed-shape XLA program:

  * candidates are cut to `pre_topk` by score (lax.top_k — O(N log N) on VPU);
  * per-class separation uses the coordinate-offset trick (shift each box by
    class_id · offset, so cross-class IoU is exactly 0 — one NMS pass replaces
    the reference's per-class loop, models/yolo_nano.py:264-272);
  * greedy suppression is a K-step lax.fori_loop over a precomputed K×K IoU
    matrix — identical keep-set to the reference's sequential algorithm;
  * vmap over the batch: every image in a batch is processed in parallel on
    device, replacing the reference's hard batch-size-1 assumption
    (models/yolo_nano.py:365).

Outputs are fixed-size (max_det) with an explicit validity mask, so the same
compiled graph serves any image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _pairwise_iou(boxes):
    """IoU matrix [K,K] for corner boxes, reference formula
    (models/yolo_nano.py:166-183: areas without +1, intersection clamped ≥0)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(xx2 - xx1, 0) * jnp.maximum(yy2 - yy1, 0)
    return inter / (area[:, None] + area[None, :] - inter + 1e-20)


def _pairwise_diou_penalty(boxes):
    """DIoU distance penalty d²/c² (reference models/yolo_nano.py:216-235)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    d2 = (cx[:, None] - cx[None, :]) ** 2 + (cy[:, None] - cy[None, :]) ** 2
    ex1 = jnp.minimum(x1[:, None], x1[None, :])
    ey1 = jnp.minimum(y1[:, None], y1[None, :])
    ex2 = jnp.maximum(x2[:, None], x2[None, :])
    ey2 = jnp.maximum(y2[:, None], y2[None, :])
    c2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
    return d2 / (c2 + 1e-20)


def nms_greedy(boxes, valid, iou_thresh: float, diou: bool = False):
    """Greedy NMS over K candidates ALREADY SORTED by descending score →
    keep mask [K]. Rank is the array order itself (scores are not needed);
    `valid` masks padding / below-threshold entries.

    Implementation: fixpoint ("Jacobi") iteration of
        keep_i = valid_i ∧ ¬∃ j<i : keep_j ∧ ovr(j,i) > thresh
    Each sweep is one K×K masked matvec on the VPU; the iteration provably
    reaches the sequential-greedy solution because the settled prefix grows
    every sweep (index 0 settles after sweep 1, and index i settles once all
    j<i it depends on have). Suppression-chain depth bounds the sweep count —
    in practice 2-5 — so this replaces the O(K)-step sequential loop the
    reference runs per class on the host (models/yolo_nano.py:159-188) with a
    handful of vector ops. Exactness vs the sequential oracle is pinned by
    tests/test_targets_and_nms.py.
    """
    k = boxes.shape[0]
    ovr = _pairwise_iou(boxes)
    if diou:
        ovr = ovr - _pairwise_diou_penalty(boxes)
    idx = jnp.arange(k)
    # sup[j, i] = True when a kept j would suppress i (strictly lower-scored)
    sup = (ovr > iou_thresh) & (idx[:, None] < idx[None, :])
    # bf16 matvec is exact here: entries are 0/1, the MXU accumulates f32,
    # and only suppressed = (count > 0) is consumed — any nonzero count stays
    # nonzero through the bf16 output cast. Halves the K×K sweep traffic.
    supf = sup.astype(jnp.bfloat16)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < k)

    def body(state):
        keep, _, it = state
        suppressed = (keep.astype(jnp.bfloat16) @ supf) > 0
        return jnp.logical_and(valid, jnp.logical_not(suppressed)), keep, it + 1

    keep0 = valid
    keep, _, _ = lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.zeros((), jnp.int32)))
    return keep


@functools.partial(
    jax.jit,
    static_argnames=("conf_thresh", "iou_thresh", "pre_topk", "max_det",
                     "diou", "class_offset"),
)
def batched_nms(boxes, class_scores, *, conf_thresh: float = 0.001,
                iou_thresh: float = 0.50, pre_topk: int = 512,
                max_det: int = 128, diou: bool = False,
                class_offset: float = 4.0):
    """Full reference postprocess (models/yolo_nano.py:245-279), batched on device.

    Args:
      boxes:        [B, N, 4] corner boxes (normalized to [0,1] in the
                    reference pipeline; any consistent scale ≤ class_offset works).
      class_scores: [B, N, C] per-class confidences (softmax(cls)·sigmoid(obj)).
    Returns:
      boxes [B, max_det, 4], scores [B, max_det], classes [B, max_det] int32,
      valid [B, max_det] bool — score-sorted, padded with zeros/False.
    """
    class_scores = class_scores.astype(jnp.float32)
    cls = jnp.argmax(class_scores, axis=2)                 # :253
    score = jnp.max(class_scores, axis=2)
    return batched_nms_scored(boxes, score, cls, conf_thresh=conf_thresh,
                              iou_thresh=iou_thresh, pre_topk=pre_topk,
                              max_det=max_det, diou=diou,
                              class_offset=class_offset)


@functools.partial(
    jax.jit,
    static_argnames=("conf_thresh", "iou_thresh", "pre_topk", "max_det",
                     "diou", "class_offset"),
)
def batched_nms_scored(boxes, score, cls, *, conf_thresh: float = 0.001,
                       iou_thresh: float = 0.50, pre_topk: int = 512,
                       max_det: int = 128, diou: bool = False,
                       class_offset: float = 4.0):
    """batched_nms with the per-box (max score, argmax class) already reduced —
    lets callers avoid materializing the [B, N, C] score matrix (the softmax
    max can be computed as exp(max − logsumexp) · obj in O(N))."""
    boxes = boxes.astype(jnp.float32)
    score = score.astype(jnp.float32)
    # small inputs (low resolutions) can have fewer candidates than the budget
    pre_topk = min(pre_topk, boxes.shape[1])

    ranked = jnp.where(score >= conf_thresh, score, -1.0)   # :258
    top_score, idx = lax.top_k(ranked, pre_topk)
    top_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    top_cls = jnp.take_along_axis(cls, idx, axis=1)
    return nms_on_candidates(top_boxes, top_score, top_cls,
                             iou_thresh=iou_thresh, max_det=max_det,
                             diou=diou, class_offset=class_offset)


@functools.partial(
    jax.jit,
    static_argnames=("iou_thresh", "max_det", "diou", "class_offset"),
)
def nms_on_candidates(top_boxes, top_score, top_cls, *,
                      iou_thresh: float = 0.50, max_det: int = 128,
                      diou: bool = False, class_offset: float = 4.0):
    """Greedy per-class NMS on K candidates already score-sorted descending
    (entries with top_score < 0 are padding/filtered). Lets callers run the
    confidence filter + top-k on scores FIRST and decode only the K
    surviving boxes (models.yolo_nano.predict does) — identical results,
    ~20× fewer boxes decoded.

    top_boxes [B,K,4], top_score [B,K], top_cls [B,K] →
    boxes [B,max_det,4], scores, classes, valid (score-sorted, zero-padded).
    """
    top_boxes = top_boxes.astype(jnp.float32)
    top_score = top_score.astype(jnp.float32)
    max_det_out = max_det
    max_det = min(max_det, top_boxes.shape[1])

    def single(top_boxes, top_score, top_cls):
        top_valid = top_score >= 0
        # per-class NMS via class-offset coordinates
        shifted = top_boxes + (top_cls[:, None] * class_offset).astype(
            top_boxes.dtype)
        keep = nms_greedy(shifted, top_valid, iou_thresh, diou=diou)
        final_rank = jnp.where(keep, top_score, -1.0)
        out_score, oidx = lax.top_k(final_rank, max_det)
        out_valid = out_score >= 0
        zero = jnp.zeros((), jnp.float32)
        return (jnp.where(out_valid[:, None], top_boxes[oidx], zero),
                jnp.where(out_valid, out_score, zero),
                jnp.where(out_valid, top_cls[oidx], 0).astype(jnp.int32),
                out_valid)

    out = jax.vmap(single)(top_boxes, top_score, top_cls)
    if max_det < max_det_out:  # keep the promised fixed output shape
        pad = max_det_out - max_det
        out = tuple(jnp.pad(t, ((0, 0), (0, pad)) + ((0, 0),) * (t.ndim - 2))
                    for t in out)
    return out
