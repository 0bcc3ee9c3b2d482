"""Anchor target assignment, vectorized for device execution.

The reference builds targets with a per-ground-truth python/numpy loop on the
host every training step (multi_gt_creator, reference tools.py:97-216) — it is
the host-side hot spot of the training loop (train.py:212). Here the same
assignment runs as fixed-shape XLA inside the jitted train step:

  * ground truths are padded to MAX_BOXES per image (label -1 = padding);
  * each gt's wh-IoU against all 9 anchors is one batched computation
    (tools.py:127-129 semantics: centered-box IoU = min(w)·min(h) overlap);
  * the best anchor gets a positive assignment; other anchors above
    IGNORE_THRESH get obj=-1/weight=-1 "ignore" rows (tools.py:134-211);
  * writes are scatters into the flat [N, 11] target tensor with an overflow
    dump row for invalid/out-of-bounds indices.

Write order is: all ignore rows first, then all positive rows — so a positive
always beats an ignore on collision. The reference interleaves writes in gt
order, which can differ on the (rare) multi-gt collision; within training
noise. Positive/positive collisions resolve to an arbitrary contender (the
reference keeps the last gt in list order).

Target row layout (11 ch, tools.py:108):
  [obj, cls, tx, ty, tw, th, weight, x1, y1, x2, y2]   (boxes normalized)
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from yolo_nano_tpu.config import YoloNanoConfig


def _level_layout(cfg: YoloNanoConfig, input_size: int):
    """Static per-level (offset, grid_w) tables for flat indexing."""
    a = cfg.num_anchors_per_level
    offsets, widths = [], []
    off = 0
    for s in cfg.strides:
        g = input_size // s
        offsets.append(off)
        widths.append(g)
        off += g * g * a
    return np.asarray(offsets, np.int32), np.asarray(widths, np.int32), off


def _wh_iou(bw, bh, anchors):
    """IoU of (bw,bh) vs each anchor, both centered at the origin
    (reference tools.py:37-75 reduces to min-overlap for centered boxes)."""
    inter = jnp.minimum(bw[..., None], anchors[:, 0]) * \
        jnp.minimum(bh[..., None], anchors[:, 1])
    union = bw[..., None] * bh[..., None] + \
        anchors[:, 0] * anchors[:, 1] - inter + 1e-20
    return inter / union


@functools.partial(jax.jit, static_argnames=("cfg", "input_size"))
def build_targets(gt_boxes, gt_labels, cfg: YoloNanoConfig, input_size: int):
    """gt_boxes [B,M,4] normalized x1y1x2y2, gt_labels [B,M] int (-1 padding)
    → target tensor [B, N, 11] with N = cfg.num_predictions(input_size)."""
    a = cfg.num_anchors_per_level
    anchors = jnp.asarray(cfg.anchors, jnp.float32)           # [9,2] pixels
    strides = jnp.asarray(cfg.strides, jnp.float32)
    offsets_np, widths_np, n = _level_layout(cfg, input_size)
    offsets = jnp.asarray(offsets_np)
    widths = jnp.asarray(widths_np)

    def single(boxes, labels):
        m = boxes.shape[0]
        x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
        cx = (x1 + x2) / 2 * input_size                       # tools.py:117-120
        cy = (y1 + y2) / 2 * input_size
        bw = (x2 - x1) * input_size
        bh = (y2 - y1) * input_size
        valid = (labels >= 0) & (bw >= 1.0) & (bh >= 1.0)     # tools.py:122

        iou = _wh_iou(bw, bh, anchors)                        # [M, 9]
        over = iou > cfg.ignore_thresh                        # tools.py:132
        best = jnp.argmax(iou, axis=1)                        # tools.py:136/170

        # geometry of every (gt, anchor) pairing
        k = jnp.arange(len(cfg.anchors))                      # [9]
        lvl = k // a                                          # scale index
        s = strides[lvl]                                      # [9]
        gx = jnp.floor(cx[:, None] / s).astype(jnp.int32)     # [M, 9]
        gy = jnp.floor(cy[:, None] / s).astype(jnp.int32)
        g = widths[lvl][None, :]
        in_bounds = (gx < g) & (gy < g) & (gx >= 0) & (gy >= 0)
        flat = offsets[lvl][None, :] + (gy * g + gx) * a + (k % a)[None, :]

        dump = n  # overflow row for masked writes
        target = jnp.zeros((n + 1, 11), jnp.float32)

        # --- ignore rows: above-threshold anchors that are not the best
        ign = over & (k[None, :] != best[:, None]) & valid[:, None] & in_bounds
        ign_idx = jnp.where(ign, flat, dump).reshape(-1)
        ign_row = jnp.zeros((11,), jnp.float32).at[0].set(-1.0).at[6].set(-1.0)
        target = target.at[ign_idx].set(ign_row)              # tools.py:210-211

        # --- positive rows: the best anchor of each valid gt
        bi = jnp.take_along_axis(flat, best[:, None], 1)[:, 0]
        b_ok = jnp.take_along_axis(in_bounds, best[:, None], 1)[:, 0] & valid
        pos_idx = jnp.where(b_ok, bi, dump)
        pw = anchors[best, 0]
        ph = anchors[best, 1]
        sb = strides[best // a]
        tx = cx / sb - jnp.floor(cx / sb)                     # tools.py:150-151
        ty = cy / sb - jnp.floor(cy / sb)
        tw = jnp.log(jnp.maximum(bw, 1e-9) / pw)              # tools.py:152-153
        th = jnp.log(jnp.maximum(bh, 1e-9) / ph)
        weight = 2.0 - (bw / input_size) * (bh / input_size)  # tools.py:154
        rows = jnp.stack(
            [jnp.ones((m,)), labels.astype(jnp.float32), tx, ty, tw, th,
             weight, x1, y1, x2, y2], axis=1)                 # tools.py:157-161
        target = target.at[pos_idx].set(rows)
        return target[:n]

    return jax.vmap(single)(gt_boxes.astype(jnp.float32), gt_labels)


# ---------------------------------------------------------------------------
# numpy oracle — sequential semantics for tests, mirrors tools.py:97-216
# ---------------------------------------------------------------------------

def build_targets_numpy(gt_boxes, gt_labels, cfg: YoloNanoConfig,
                        input_size: int):
    """Slow sequential reference (same write order as reference tools.py) used
    as the test oracle for `build_targets`."""
    b, m = gt_labels.shape
    a = cfg.num_anchors_per_level
    anchors = np.asarray(cfg.anchors, np.float64)
    per_level = [np.zeros((b, input_size // s, input_size // s, a, 11))
                 for s in cfg.strides]
    for bi in range(b):
        for mi in range(m):
            if gt_labels[bi, mi] < 0:
                continue
            x1, y1, x2, y2 = gt_boxes[bi, mi]
            cx = (x2 + x1) / 2 * input_size
            cy = (y2 + y1) / 2 * input_size
            bw = (x2 - x1) * input_size
            bh = (y2 - y1) * input_size
            if bw < 1.0 or bh < 1.0:
                continue
            inter = np.minimum(bw, anchors[:, 0]) * np.minimum(bh, anchors[:, 1])
            iou = inter / (bw * bh + anchors[:, 0] * anchors[:, 1]
                           - inter + 1e-20)
            over = iou > cfg.ignore_thresh
            best = int(np.argmax(iou))
            assign = [best] if not over.any() else list(np.nonzero(over)[0])
            if over.any() and best not in assign:
                assign.append(best)
            for k in assign if over.any() else [best]:
                li, ab = k // a, k % a
                s = cfg.strides[li]
                gx, gy = int(cx / s), int(cy / s)
                gt = per_level[li]
                if not (0 <= gy < gt.shape[1] and 0 <= gx < gt.shape[2]):
                    continue
                if k == best:
                    tx = cx / s - gx
                    ty = cy / s - gy
                    tw = np.log(bw / anchors[k, 0])
                    th = np.log(bh / anchors[k, 1])
                    w = 2.0 - (bw / input_size) * (bh / input_size)
                    gt[bi, gy, gx, ab] = [1.0, gt_labels[bi, mi], tx, ty,
                                          tw, th, w, x1, y1, x2, y2]
                else:
                    gt[bi, gy, gx, ab, 0] = -1.0
                    gt[bi, gy, gx, ab, 6] = -1.0
    flat = [g.reshape(b, -1, 11) for g in per_level]
    return np.concatenate(flat, 1).astype(np.float32)
