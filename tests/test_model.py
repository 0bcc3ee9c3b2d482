"""Model-level tests: shapes, parameter counts vs the reference channel tables,
decode round-trip, BN folding equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_nano_tpu.config import YoloNanoConfig
from yolo_nano_tpu.models.shufflenetv2 import init_shufflenetv2, shufflenetv2_apply
from yolo_nano_tpu.models.yolo_nano import (
    forward_features,
    init_yolo_nano,
    loss_forward,
    predict,
)
from yolo_nano_tpu.ops.decode import decode_boxes, make_grids
from yolo_nano_tpu.ops.nn import count_params
from yolo_nano_tpu.utils.fuse_bn import fold_bn


@pytest.mark.parametrize("size,chans", [("0.5x", (48, 96, 192)),
                                        ("1.0x", (116, 232, 464))])
def test_backbone_shapes(size, chans):
    params, stats = init_shufflenetv2(jax.random.key(0), size)
    x = jnp.zeros((2, 64, 64, 3))
    (c3, c4, c5), _ = shufflenetv2_apply(params, stats, x)
    assert c3.shape == (2, 8, 8, chans[0])
    assert c4.shape == (2, 4, 4, chans[1])
    assert c5.shape == (2, 2, 2, chans[2])


def test_backbone_param_count_matches_analytic():
    """Exact param count derived independently from the architecture spec
    (reference backbone/shufflenetv2.py:31-63,90,95-102): conv weights +
    BN (scale, bias) per unit."""
    from yolo_nano_tpu.config import SHUFFLENETV2_CHANNELS, SHUFFLENETV2_REPEATS

    def unit(k, cin, cout, groups=1):  # conv(no bias) + bn
        return k * k * (cin // groups) * cout + 2 * cout

    def block(cin, cout, stride):
        br = cout // 2
        n = 0
        if stride == 2:
            n += unit(3, cin, cin, cin) + unit(1, cin, br)  # branch1
            b2_in = cin
        else:
            b2_in = br
        n += unit(1, b2_in, br) + unit(3, br, br, br) + unit(1, br, br)
        return n

    for size in ("0.5x", "1.0x"):
        ch = SHUFFLENETV2_CHANNELS[size]
        want = unit(3, 3, ch[0])
        cin = ch[0]
        for reps, cout in zip(SHUFFLENETV2_REPEATS, ch[1:4]):
            want += block(cin, cout, 2)
            want += (reps - 1) * block(cout, cout, 1)
            cin = cout
        params, _ = init_shufflenetv2(jax.random.key(0), size)
        assert count_params(params) == want, size


def test_detector_param_count_matches_reference_exactly():
    """The instantiated reference YOLONano (80 classes, 1.0x) has exactly
    1,326,305 parameters (measured once from reference models/yolo_nano.py;
    the README's 1.86M at README.md:10 quotes the successor repo's model).
    Ours must match parameter-for-parameter."""
    cfg = YoloNanoConfig(num_classes=80, backbone="1.0x")
    params, _ = init_yolo_nano(jax.random.key(0), cfg)
    assert count_params(params) == 1_326_305


def test_forward_shapes_and_dtype():
    cfg = YoloNanoConfig(num_classes=20)
    params, stats = init_yolo_nano(jax.random.key(0), cfg)
    x = jnp.zeros((2, 64, 64, 3))
    conf, cls, txtytwth, _ = forward_features(params, stats, x, cfg)
    n_cells = cfg.num_cells(64)
    n = cfg.num_predictions(64)
    assert conf.shape == (2, n, 1)
    assert cls.shape == (2, n, 20)
    assert txtytwth.shape == (2, n_cells, 3, 4)


def test_decode_round_trip():
    """Encoding a box with the reference target math (tools.py:150-153) then
    decoding (models/yolo_nano.py:129-132) must recover it."""
    cfg = YoloNanoConfig()
    size = 64
    grids = make_grids(cfg, size)
    # ground truth box: center (33.0, 17.0), w=40, h=24 at level 0 (stride 8)
    cx, cy, w, h = 33.0, 17.0, 40.0, 24.0
    s = 8
    gx, gy = int(cx / s), int(cy / s)
    aw, ah = cfg.anchors[1]
    tx, ty = cx / s - gx, cy / s - gy
    tw, th = np.log(w / aw), np.log(h / ah)

    def logit(p):
        return np.log(p / (1 - p))

    n_cells = cfg.num_cells(size)
    t = np.zeros((1, n_cells, 3, 4), np.float32)
    cell = gy * (size // s) + gx
    t[0, cell, 1] = [logit(tx), logit(ty), tw, th]
    boxes = np.asarray(decode_boxes(jnp.asarray(t), grids))
    got = boxes[0, cell * 3 + 1]
    np.testing.assert_allclose(
        got, [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], rtol=1e-5)


def test_fold_bn_equivalence():
    """Folded inference params must reproduce unfolded eval outputs
    (reference utils/fuse_conv_bn.py:14-22 math)."""
    cfg = YoloNanoConfig(num_classes=20)
    key = jax.random.key(1)
    params, stats = init_yolo_nano(key, cfg)
    # give BN stats non-trivial values
    stats = jax.tree.map(
        lambda v: v + 0.3 * jax.random.normal(jax.random.key(2), v.shape) ** 2,
        stats)
    x = jax.random.normal(jax.random.key(3), (2, 64, 64, 3))
    ref = forward_features(params, stats, x, cfg, train=False)
    folded = fold_bn(params, stats)
    from yolo_nano_tpu.utils.fuse_bn import empty_stats_like

    got = forward_features(folded, empty_stats_like(folded), x, cfg,
                           train=False)
    for r, g in zip(ref[:3], got[:3]):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=2e-3, atol=2e-4)


def test_predict_runs_and_returns_fixed_shapes():
    cfg = YoloNanoConfig(num_classes=20, nms_pre_topk=64, max_detections=16)
    params, stats = init_yolo_nano(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    boxes, scores, classes, valid = predict(params, stats, x, cfg, 64)
    assert boxes.shape == (2, 16, 4)
    assert scores.shape == classes.shape == valid.shape == (2, 16)
    assert np.all(np.asarray(boxes) >= 0) and np.all(np.asarray(boxes) <= 1)


def test_loss_forward_finite_and_differentiable():
    cfg = YoloNanoConfig(num_classes=20)
    params, stats = init_yolo_nano(jax.random.key(0), cfg)
    from yolo_nano_tpu.losses.targets import build_targets

    boxes = jnp.asarray([[[0.1, 0.1, 0.5, 0.6], [0.4, 0.3, 0.9, 0.95]]])
    labels = jnp.asarray([[3, 11]], jnp.int32)
    target = build_targets(boxes, labels, cfg, 64)
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))

    def total(p):
        (c, cl, bb, io), _ = loss_forward(p, stats, x, target, cfg, 64)
        return c + cl + bb + io

    val, grad = jax.value_and_grad(total)(params)
    assert np.isfinite(float(val))
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grad))
    assert np.isfinite(gnorm) and gnorm > 0



def test_predict_decode_after_topk_bit_equals_decode_all():
    """predict() filters + top-ks on scores before decoding (20× fewer boxes
    decoded); results must be bit-identical to the decode-everything path."""
    from yolo_nano_tpu.ops.nms import batched_nms_scored

    cfg = YoloNanoConfig(num_classes=20, conf_thresh=0.05)
    params, stats = init_yolo_nano(jax.random.key(7), cfg)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))

    got = predict(params, stats, x, cfg, 64)

    conf, cls_p, txty, _ = forward_features(params, stats, x, cfg,
                                            train=False)
    grids = make_grids(cfg, 64)
    obj = jax.nn.sigmoid(conf.astype(jnp.float32))[..., 0]
    boxes = jnp.clip(decode_boxes(txty.astype(jnp.float32), grids) / 64,
                     0.0, 1.0)
    logits = cls_p.astype(jnp.float32)
    m = jnp.max(logits, -1)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[..., None]), -1))
    want = batched_nms_scored(boxes, jnp.exp(m - lse) * obj,
                              jnp.argmax(logits, -1),
                              conf_thresh=cfg.conf_thresh,
                              iou_thresh=cfg.nms_thresh,
                              pre_topk=cfg.nms_pre_topk,
                              max_det=cfg.max_detections, diou=cfg.diou_nms)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
