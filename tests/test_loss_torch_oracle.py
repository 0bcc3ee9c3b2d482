"""Loss semantics pinned against a torch implementation of the reference
formulas (tools.py:12-34,236-276) on random inputs."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from yolo_nano_tpu.losses.losses import detection_loss


def _torch_reference_loss(pred_conf, pred_cls, pred_txtytwth, pred_iou,
                          label):
    """Direct transcription of the reference's loss math (tools.py:236-276)."""
    pred_conf = torch.from_numpy(pred_conf)[:, :, 0]
    pred_cls = torch.from_numpy(pred_cls).permute(0, 2, 1)
    t = torch.from_numpy(pred_txtytwth)
    pred_txty, pred_twth = t[:, :, :2], t[:, :, 2:]
    pred_iou = torch.from_numpy(pred_iou)[:, :, 0]
    label = torch.from_numpy(label)

    gt_conf = label[:, :, 0].float()
    gt_obj = label[:, :, 1].float()
    gt_cls = label[:, :, 2].long()
    gt_txty = label[:, :, 3:5].float()
    gt_twth = label[:, :, 5:7].float()
    gt_weight = label[:, :, 7].float()
    gt_mask = (gt_obj > 0.0).float()

    b = pred_conf.size(0)
    inputs = torch.sigmoid(pred_conf)
    pos = (gt_obj == 1.0).float()
    neg = (gt_obj == 0.0).float()
    conf_loss = torch.sum(5.0 * pos * (inputs - gt_conf) ** 2
                          + neg * inputs ** 2) / b
    cls_loss = torch.sum(
        nn.CrossEntropyLoss(reduction="none")(pred_cls, gt_cls) * gt_mask) / b
    txty = torch.sum(torch.sum(nn.BCEWithLogitsLoss(reduction="none")(
        pred_txty, gt_txty), -1) * gt_weight * gt_mask) / b
    twth = torch.sum(torch.sum(nn.MSELoss(reduction="none")(
        pred_twth, gt_twth), -1) * gt_weight * gt_mask) / b
    iou_loss = torch.sum(nn.SmoothL1Loss(reduction="none")(
        pred_iou, gt_mask)) / b
    return (float(conf_loss), float(cls_loss), float(txty + twth),
            float(iou_loss))


def test_detection_loss_matches_torch_oracle():
    rng = np.random.default_rng(0)
    b, n, c = 3, 50, 20
    pred_conf = rng.normal(0, 2, (b, n, 1)).astype(np.float32)
    pred_cls = rng.normal(0, 2, (b, n, c)).astype(np.float32)
    pred_box = rng.normal(0, 1, (b, n, 4)).astype(np.float32)
    pred_iou = rng.uniform(0, 1, (b, n, 1)).astype(np.float32)

    label = np.zeros((b, n, 8), np.float32)
    obj = rng.choice([-1.0, 0.0, 1.0], (b, n), p=[0.1, 0.7, 0.2])
    label[:, :, 1] = obj
    label[:, :, 0] = rng.uniform(0, 1, (b, n)) * (obj == 1.0)
    label[:, :, 2] = rng.integers(0, c, (b, n))
    label[:, :, 3:5] = rng.uniform(0, 1, (b, n, 2))
    label[:, :, 5:7] = rng.normal(0, 1, (b, n, 2))
    label[:, :, 7] = rng.uniform(1, 2, (b, n)) * (obj == 1.0)

    got = detection_loss(jnp.asarray(pred_conf), jnp.asarray(pred_cls),
                         jnp.asarray(pred_box), jnp.asarray(pred_iou),
                         jnp.asarray(label))
    want = _torch_reference_loss(pred_conf, pred_cls, pred_box, pred_iou,
                                 label)
    for g, w, name in zip(got, want, ("conf", "cls", "bbox", "iou")):
        np.testing.assert_allclose(float(g), w, rtol=2e-5, err_msg=name)


def test_detector_05x_builds_and_runs():
    import jax

    from yolo_nano_tpu.config import YoloNanoConfig
    from yolo_nano_tpu.models.yolo_nano import forward_features, init_yolo_nano

    cfg = YoloNanoConfig(num_classes=20, backbone="0.5x")
    params, stats = init_yolo_nano(jax.random.key(0), cfg)
    x = jnp.zeros((1, 64, 64, 3))
    conf, cls, txty, _ = forward_features(params, stats, x, cfg)
    assert conf.shape == (1, cfg.num_predictions(64), 1)
