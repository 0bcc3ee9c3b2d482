"""YOLO-Nano detector: ShuffleNetV2 backbone + FPN/PAN neck + 3-level head.

Capability parity with reference models/yolo_nano.py, redesigned TPU-first:

  * pure functions over parameter pytrees; grids are trace-time constants
    (no `set_grid` module state, reference :86-117);
  * the eval path (`predict`) is fully batched and stays on device through
    decode + NMS (the reference hops to host numpy at batch 1, :361-376);
  * the train path (`loss_forward`) consumes a *device-side* target tensor
    (built by yolo_nano_tpu.losses.targets, replacing the host-numpy
    multi_gt_creator loop, reference tools.py:97-216).

Head channel layout matches the reference split (:308-330): per level the
A·(1+C+4) output channels are [conf ×A | (classes ×C) anchor-major | txtytwth
×4 anchor-major]; levels are concatenated HW-major, so prediction row
n = level_offset + cell·A + anchor.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp

from yolo_nano_tpu.config import YoloNanoConfig
from yolo_nano_tpu.ops.decode import decode_boxes, make_grids
from yolo_nano_tpu.ops.nn import (
    conv_bn,
    downsample2x_nearest,
    init_bn,
    init_conv,
    upsample2x_nearest,
)
from yolo_nano_tpu.models.shufflenetv2 import init_shufflenetv2, shufflenetv2_apply


def _init_conv_block(key, k, cin, cout, groups=1):
    """reference utils/modules.py:8-18 `Conv`: Conv2d(bias=True)+BN+LeakyReLU.
    BN bias starts at 0 (torch default — the reference's custom 1e-4 init
    applies to backbone modules only)."""
    p = init_conv(key, k, k, cin, cout, groups=groups, bias=True)
    bn_p, bn_s = init_bn(cout, bias_init=0.0)
    p.update(bn_p)
    return p, bn_s


def _init_head(key, c, out_ch, num_anchors):
    """One detection head: dw3×3 → 1×1 → dw3×3 → 1×1 (all Conv blocks) → plain
    1×1 conv with bias (reference models/yolo_nano.py:50-70). The objectness
    slots of the final bias start at -log((1-0.01)/0.01) (:77-83)."""
    keys = jax.random.split(key, 5)
    p, s = {}, {}
    p["dw0"], s["dw0"] = _init_conv_block(keys[0], 3, c, c, groups=c)
    p["pw0"], s["pw0"] = _init_conv_block(keys[1], 1, c, c)
    p["dw1"], s["dw1"] = _init_conv_block(keys[2], 3, c, c, groups=c)
    p["pw1"], s["pw1"] = _init_conv_block(keys[3], 1, c, c)
    final = init_conv(keys[4], 1, 1, c, out_ch, bias=True)
    bias_value = -math.log((1.0 - 0.01) / 0.01)
    final["b"] = final["b"].at[:num_anchors].set(bias_value)
    p["out"] = final
    return p, s


def init_yolo_nano(key, cfg: YoloNanoConfig):
    """Returns (params, stats) pytrees for the full detector."""
    if cfg.backbone not in ("0.5x", "1.0x", "1.5x", "2.0x"):
        raise ValueError(f"unsupported backbone {cfg.backbone!r}")
    keys = jax.random.split(key, 11)
    bb_p, bb_s = init_shufflenetv2(keys[0], cfg.backbone)
    c3, c4, c5 = cfg.backbone_channels[1:4]
    nc = cfg.neck_channels
    params = {"backbone": bb_p}
    stats = {"backbone": bb_s}
    # FPN+PAN laterals and smooths (reference models/yolo_nano.py:40-47)
    for i, cin in enumerate((c3, c4, c5)):
        params[f"lateral{i}"], stats[f"lateral{i}"] = _init_conv_block(
            keys[1 + i], 1, cin, nc)
    for i in range(4):
        params[f"smooth{i}"], stats[f"smooth{i}"] = _init_conv_block(
            keys[4 + i], 3, nc, nc)
    for i in range(3):
        params[f"head{i}"], stats[f"head{i}"] = _init_head(
            keys[8 + i], nc, cfg.head_out_channels, cfg.num_anchors_per_level)
    return params, stats


def _head_apply(x, p, s, train):
    folded = "scale" not in p["dw0"]  # BN already folded (inference path)
    if folded and not train:
        from yolo_nano_tpu.ops.pallas.fused_conv import (
            fused_dw_pw,
            pallas_enabled,
        )

        if pallas_enabled():
            # dw→pw pairs as single Pallas kernels: the depthwise
            # intermediate never leaves VMEM
            y = fused_dw_pw(x, p["dw0"]["w"][:, :, 0, :], p["dw0"]["b"],
                            p["pw0"]["w"][0, 0], p["pw0"]["b"])
            y = fused_dw_pw(y, p["dw1"]["w"][:, :, 0, :], p["dw1"]["b"],
                            p["pw1"]["w"][0, 0], p["pw1"]["b"])
            y, _ = conv_bn(y, p["out"], None, train=False)
            return y, {}
    new_s = {}
    y, new_s["dw0"] = conv_bn(x, p["dw0"], s["dw0"], groups=x.shape[-1],
                              act="leaky", train=train)
    y, new_s["pw0"] = conv_bn(y, p["pw0"], s["pw0"], act="leaky", train=train)
    y, new_s["dw1"] = conv_bn(y, p["dw1"], s["dw1"], groups=y.shape[-1],
                              act="leaky", train=train)
    y, new_s["pw1"] = conv_bn(y, p["pw1"], s["pw1"], act="leaky", train=train)
    y, _ = conv_bn(y, p["out"], None, train=False)  # plain conv, no BN
    return y, new_s


def forward_features(params, stats, x, cfg: YoloNanoConfig,
                     train: bool = False):
    """x [B,H,W,3] → (conf [B,N,1], cls [B,N,C], txtytwth [B,ΣHW,A,4], stats).

    Mirrors reference forward (models/yolo_nano.py:282-330): backbone → FPN
    top-down → PAN bottom-up → per-level heads → flatten+split+concat.
    """
    a = cfg.num_anchors_per_level
    c = cfg.num_classes
    (c3, c4, c5), bb_stats = shufflenetv2_apply(
        params["backbone"], stats["backbone"], x, train)
    new_stats = {"backbone": bb_stats}

    p3, new_stats["lateral0"] = conv_bn(c3, params["lateral0"],
                                        stats["lateral0"], act="leaky",
                                        train=train)
    p4, new_stats["lateral1"] = conv_bn(c4, params["lateral1"],
                                        stats["lateral1"], act="leaky",
                                        train=train)
    p5, new_stats["lateral2"] = conv_bn(c5, params["lateral2"],
                                        stats["lateral2"], act="leaky",
                                        train=train)
    # FPN top-down (reference :291-292)
    p4, new_stats["smooth0"] = conv_bn(p4 + upsample2x_nearest(p5),
                                       params["smooth0"], stats["smooth0"],
                                       act="leaky", train=train)
    p3, new_stats["smooth1"] = conv_bn(p3 + upsample2x_nearest(p4),
                                       params["smooth1"], stats["smooth1"],
                                       act="leaky", train=train)
    # PAN bottom-up (reference :295-296)
    p4, new_stats["smooth2"] = conv_bn(p4 + downsample2x_nearest(p3),
                                       params["smooth2"], stats["smooth2"],
                                       act="leaky", train=train)
    p5, new_stats["smooth3"] = conv_bn(p5 + downsample2x_nearest(p4),
                                       params["smooth3"], stats["smooth3"],
                                       act="leaky", train=train)

    confs, clss, boxes = [], [], []
    for i, feat in enumerate((p3, p4, p5)):
        pred, new_stats[f"head{i}"] = _head_apply(
            feat, params[f"head{i}"], stats[f"head{i}"], train)
        b, h, w, ch = pred.shape
        pred = pred.reshape(b, h * w, ch)
        # channel split per reference :316-320 (anchor-major class block)
        confs.append(pred[..., :a].reshape(b, h * w * a, 1))
        clss.append(pred[..., a:(1 + c) * a].reshape(b, h * w * a, c))
        boxes.append(pred[..., (1 + c) * a:].reshape(b, h * w, a, 4))
    conf_pred = jnp.concatenate(confs, 1)
    cls_pred = jnp.concatenate(clss, 1)
    txtytwth_pred = jnp.concatenate(boxes, 1)
    return conf_pred, cls_pred, txtytwth_pred, new_stats


def scores_from_features(conf_pred, cls_pred):
    """Head outputs → (score [B,N], cls [B,N] int32).

    score = max_c softmax(cls)·sigmoid(obj) = exp(max − logsumexp)·obj —
    computed without materializing the [B, N, C] softmax (reference
    :365-367 semantics). (A per-level pre-concat reduction variant measured
    SLOWER — 17.9 vs 17.4 ms/batch-128 on v5e — XLA already fuses this
    concat+reduce well.)"""
    obj = jax.nn.sigmoid(conf_pred.astype(jnp.float32))[..., 0]   # :365
    logits = cls_pred.astype(jnp.float32)
    m = jnp.max(logits, axis=-1)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[..., None]), axis=-1))
    score = jnp.exp(m - lse) * obj
    cls = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return score, cls


def postprocess_scored(txtytwth_pred, score, cls, cfg: YoloNanoConfig,
                       input_size: int):
    """Scored predictions → fixed-shape detections: confidence filter +
    top-k on SCORES first (reference :258 semantics), decode only the K
    survivors (per-candidate decode math is identical, so results are
    bit-equal to decode-all — test-pinned), then per-class greedy NMS."""
    from yolo_nano_tpu.ops.decode import decode_boxes_gathered
    from yolo_nano_tpu.ops.nms import nms_on_candidates

    b, n = score.shape
    k = min(cfg.nms_pre_topk, n)
    ranked = jnp.where(score >= cfg.conf_thresh, score, -1.0)
    top_score, idx = jax.lax.top_k(ranked, k)
    txty_k = jnp.take_along_axis(
        txtytwth_pred.astype(jnp.float32).reshape(b, n, 4),
        idx[..., None], axis=1)
    top_boxes = jnp.clip(
        decode_boxes_gathered(txty_k, idx, cfg, input_size) / input_size,
        0.0, 1.0)                                                 # :366
    top_cls = jnp.take_along_axis(cls, idx, axis=1)
    return nms_on_candidates(
        top_boxes, top_score, top_cls,
        iou_thresh=cfg.nms_thresh, max_det=cfg.max_detections,
        diou=cfg.diou_nms)


def predict(params, stats, x, cfg: YoloNanoConfig, input_size: int):
    """Batched inference: images → fixed-shape detections, entirely on device.

    Replaces the reference eval branch + host postprocess
    (models/yolo_nano.py:361-376, :245-279). Returns
    (boxes [B,D,4] normalized x1y1x2y2, scores [B,D], classes [B,D], valid [B,D]).
    """
    conf_pred, cls_pred, txtytwth_pred, _ = forward_features(
        params, stats, x, cfg, train=False)
    score, cls = scores_from_features(conf_pred, cls_pred)
    return postprocess_scored(txtytwth_pred, score, cls, cfg, input_size)


def iou_score(boxes_a, boxes_b):
    """Elementwise IoU of corner boxes [..., 4] (reference tools.py:219-233:
    intersection only counts when tl<br on both axes; tiny eps guards the
    0-area/0-area case that the reference leaves to its NaN-skip)."""
    tl = jnp.maximum(boxes_a[..., :2], boxes_b[..., :2])
    br = jnp.minimum(boxes_a[..., 2:], boxes_b[..., 2:])
    area_a = jnp.prod(boxes_a[..., 2:] - boxes_a[..., :2], -1)
    area_b = jnp.prod(boxes_b[..., 2:] - boxes_b[..., :2], -1)
    en = jnp.all(tl < br, axis=-1).astype(boxes_a.dtype)
    area_i = jnp.prod(br - tl, -1) * en
    return area_i / (area_a + area_b - area_i + 1e-14)


def loss_forward(params, stats, x, target, cfg: YoloNanoConfig,
                 input_size: int, train: bool = True):
    """Training forward: features → decode → IoU-as-confidence-label → losses.

    `target` is the [B, N, 11] assignment tensor
    ([obj, cls, tx, ty, tw, th, weight, x1, y1, x2, y2], built on device by
    losses.targets.build_targets — same layout as reference tools.py:108).
    Mirrors the reference train branch (models/yolo_nano.py:333-358).
    Returns ((conf_loss, cls_loss, bbox_loss, iou_loss), new_stats).
    """
    from yolo_nano_tpu.losses.losses import detection_loss

    conf_pred, cls_pred, txtytwth_pred, new_stats = forward_features(
        params, stats, x, cfg, train=train)
    b = x.shape[0]
    grids = make_grids(cfg, input_size)
    boxes = decode_boxes(txtytwth_pred.astype(jnp.float32),
                         grids) / input_size          # [B, N, 4], :336
    iou = iou_score(boxes, target[..., 7:11])[..., None]  # [B, N, 1], :339
    gt_conf = jax.lax.stop_gradient(iou)                  # :342-343
    label = jnp.concatenate([gt_conf, target[..., :7]], -1)  # :347
    n = boxes.shape[1]
    losses = detection_loss(
        conf_pred.astype(jnp.float32), cls_pred.astype(jnp.float32),
        txtytwth_pred.astype(jnp.float32).reshape(b, n, 4), iou, label)
    return losses, new_stats
