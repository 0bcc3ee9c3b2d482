"""Test-time augmentation: multi-scale + horizontal-flip inference with a
merged cross-scale NMS (reference utils/misc.py:90-148).

Structure matches the reference: each view (scale × flip) runs the FULL
single-view postprocess including per-class NMS (the reference calls
`model(x)` per view, which returns post-NMS detections, utils/misc.py:113-125),
then the per-view survivors are merged and suppressed once more
(:133-141). Running NMS per view keeps each view's candidate budget intact —
merging raw candidates first would let near-duplicate boxes from the ~22
views crowd out the tail of the per-view top-k.

TPU redesign: every view is part of ONE jitted program with params as
arguments (recompile-free across checkpoints/EMA swaps); the merge NMS is the
same fixed-shape batched_nms_scored.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from yolo_nano_tpu.config import YoloNanoConfig


@functools.lru_cache(maxsize=None)
def _tta_jit(cfg: YoloNanoConfig, scales: Tuple[int, ...],
             nms_thresh: float):
    from yolo_nano_tpu.models.yolo_nano import predict
    from yolo_nano_tpu.ops.nms import batched_nms_scored

    def tta(params, stats, images):
        all_boxes, all_scores, all_cls, all_valid = [], [], [], []
        for s in scales:
            xs = images if images.shape[1] == s else jax.image.resize(
                images, (images.shape[0], s, s, images.shape[3]), "bilinear")
            for flip in (False, True):
                xv = xs[:, :, ::-1, :] if flip else xs
                b, sc, cl, v = predict(params, stats, xv, cfg, s)
                if flip:  # mirror boxes back (reference utils/misc.py:120-125)
                    b = jnp.stack([1.0 - b[..., 2], b[..., 1],
                                   1.0 - b[..., 0], b[..., 3]], -1)
                all_boxes.append(b)
                all_scores.append(sc)
                all_cls.append(cl)
                all_valid.append(v)
        boxes = jnp.concatenate(all_boxes, 1)
        score = jnp.where(jnp.concatenate(all_valid, 1),
                          jnp.concatenate(all_scores, 1), -1.0)
        cls = jnp.concatenate(all_cls, 1)
        # merged cross-view NMS over the per-view survivors (:133-141);
        # budget covers every surviving candidate
        return batched_nms_scored(
            boxes, score, cls, conf_thresh=cfg.conf_thresh,
            iou_thresh=nms_thresh, pre_topk=boxes.shape[1],
            max_det=cfg.max_detections, diou=cfg.diou_nms)

    return jax.jit(tta)


def make_tta_predict(params, stats, cfg: YoloNanoConfig,
                     scale_range: Tuple[int, int, int] = (320, 640, 32),
                     nms_thresh: Optional[float] = None) -> Callable:
    """Returns predict_fn(images [B,S,S,3]) → (boxes, scores, classes, valid)
    with multi-scale + flip TTA. nms_thresh defaults to cfg.nms_thresh (the
    reference's TTA default of 0.4 is the caller's choice, not baked in)."""
    scales = tuple(range(scale_range[0], scale_range[1] + 1, scale_range[2]))
    thresh = cfg.nms_thresh if nms_thresh is None else nms_thresh
    jitted = _tta_jit(cfg, scales, thresh)

    def fn(images):
        return jitted(params, stats, jnp.asarray(images))

    return fn
