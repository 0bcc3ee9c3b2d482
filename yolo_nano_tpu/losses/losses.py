"""Detection losses — exact semantics of reference tools.py:12-34, 236-276.

Four scalars, each summed and divided by batch size:
  * conf: sigmoid-MSE objectness, weight 5 on positives / 1 on negatives,
    cells with obj == -1 ignored (MSEWithLogitsLoss, tools.py:12-34). The
    positive target is the (stop-gradient) IoU between the decoded prediction
    and its ground-truth box.
  * cls: softmax cross-entropy over positive cells (tools.py:266).
  * bbox: BCE-with-logits on (tx,ty) + MSE on (tw,th), both scaled by the
    small-box weight 2-w·h and masked to positives (tools.py:269-271).
  * iou: SmoothL1(pred IoU, positive mask) over ALL cells (tools.py:274) —
    note this one is NOT masked; it pushes background boxes toward IoU 0 and
    carries gradient through the box decode.

Label layout [B, N, 8]: [conf(=IoU), obj, cls, tx, ty, tw, th, weight]
(reference models/yolo_nano.py:347 concat + tools.py:252-257).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bce_with_logits(x, y):
    """Numerically stable binary cross-entropy with logits (torch formula)."""
    return jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _smooth_l1(x, y):
    """torch SmoothL1 (beta=1): 0.5·d² if |d|<1 else |d|-0.5."""
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def detection_loss(pred_conf, pred_cls, pred_txtytwth, pred_iou, label):
    """Args: pred_conf [B,N,1], pred_cls [B,N,C], pred_txtytwth [B,N,4],
    pred_iou [B,N,1], label [B,N,8]. Returns (conf, cls, bbox, iou) scalars."""
    b = pred_conf.shape[0]
    pred_conf = pred_conf[..., 0]
    pred_txty = pred_txtytwth[..., :2]
    pred_twth = pred_txtytwth[..., 2:]
    pred_iou = pred_iou[..., 0]

    gt_conf = label[..., 0]
    gt_obj = label[..., 1]
    gt_cls = label[..., 2].astype(jnp.int32)
    gt_txty = label[..., 3:5]
    gt_twth = label[..., 5:7]
    gt_weight = label[..., 7]
    gt_mask = (gt_obj > 0.0).astype(jnp.float32)

    # objectness (MSEWithLogitsLoss, tools.py:17-31)
    conf = jax.nn.sigmoid(pred_conf)
    pos = (gt_obj == 1.0).astype(jnp.float32)
    neg = (gt_obj == 0.0).astype(jnp.float32)
    conf_loss = jnp.sum(5.0 * pos * jnp.square(conf - gt_conf)
                        + neg * jnp.square(conf)) / b

    # class CE over positives (tools.py:266)
    logp = jax.nn.log_softmax(pred_cls, axis=-1)
    ce = -jnp.take_along_axis(logp, gt_cls[..., None], axis=-1)[..., 0]
    cls_loss = jnp.sum(ce * gt_mask) / b

    # box regression (tools.py:269-271)
    txty_loss = jnp.sum(
        jnp.sum(_bce_with_logits(pred_txty, gt_txty), -1)
        * gt_weight * gt_mask) / b
    twth_loss = jnp.sum(
        jnp.sum(jnp.square(pred_twth - gt_twth), -1)
        * gt_weight * gt_mask) / b
    bbox_loss = txty_loss + twth_loss

    # IoU-aware objectness regression (tools.py:274), unmasked by design
    iou_loss = jnp.sum(_smooth_l1(pred_iou, gt_mask)) / b

    return conf_loss, cls_loss, bbox_loss, iou_loss
