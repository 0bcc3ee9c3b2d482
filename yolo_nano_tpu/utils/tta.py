"""Test-time augmentation: multi-scale + horizontal-flip inference with a
merged cross-scale NMS (reference utils/misc.py:90-148).

TPU redesign: each scale is its own compiled predict graph (grids are
trace-time constants — no set_grid mutation), the flip runs batched on device,
and the merged per-class NMS across all scales reuses the fixed-shape
on-device batched_nms instead of the reference's host numpy loop (:133-141).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from yolo_nano_tpu.config import YoloNanoConfig
from yolo_nano_tpu.ops.nms import batched_nms


def make_tta_predict(params, stats, cfg: YoloNanoConfig,
                     scale_range: Tuple[int, int, int] = (320, 640, 32),
                     nms_thresh: float = 0.4) -> Callable:
    """Returns predict_fn(images [B,S,S,3]) → (boxes, scores, classes, valid)
    with multi-scale + flip TTA merged by a final per-class NMS."""
    from yolo_nano_tpu.models.yolo_nano import forward_features
    from yolo_nano_tpu.ops.decode import decode_boxes, make_grids

    scales = list(range(scale_range[0], scale_range[1] + 1, scale_range[2]))

    def raw_predict(images, size: int):
        """Per-scale raw (boxes [B,N,4] normalized, scores [B,N,C])."""
        conf, cls, txtytwth, _ = forward_features(params, stats, images, cfg,
                                                  train=False)
        grids = make_grids(cfg, size)
        obj = jax.nn.sigmoid(conf.astype(jnp.float32))
        boxes = jnp.clip(decode_boxes(txtytwth.astype(jnp.float32),
                                      grids) / size, 0.0, 1.0)
        scores = jax.nn.softmax(cls.astype(jnp.float32), -1) * obj
        return boxes, scores

    @jax.jit
    def tta(images):
        all_boxes, all_scores = [], []
        for s in scales:
            xs = images if images.shape[1] == s else jax.image.resize(
                images, (images.shape[0], s, s, images.shape[3]), "bilinear")
            b, sc = raw_predict(xs, s)
            all_boxes.append(b)
            all_scores.append(sc)
            # horizontal flip (reference utils/misc.py:120-125)
            bf, scf = raw_predict(xs[:, :, ::-1, :], s)
            bf = jnp.stack([1.0 - bf[..., 2], bf[..., 1],
                            1.0 - bf[..., 0], bf[..., 3]], -1)
            all_boxes.append(bf)
            all_scores.append(scf)
        boxes = jnp.concatenate(all_boxes, 1)
        scores = jnp.concatenate(all_scores, 1)
        return batched_nms(boxes, scores, conf_thresh=cfg.conf_thresh,
                           iou_thresh=nms_thresh,
                           pre_topk=cfg.nms_pre_topk,
                           max_det=cfg.max_detections, diou=cfg.diou_nms)

    return tta
