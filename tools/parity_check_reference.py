"""Dev-only activation parity check against the reference implementation.

Loads OUR randomly-initialized parameters into the reference PyTorch model
(via a name-mapped state_dict), runs both on the same input, and compares the
raw head outputs (conf/cls/txtytwth) and decoded boxes. Any architectural
drift — padding, channel-shuffle order, activation placement, head channel
layout — shows up as a mismatch here long before it would show up as an mAP
gap after days of training.

Requires /root/reference on disk (the public repo); skips gracefully
otherwise. This is a checker, not a dependency: nothing in the framework
imports it.

Run: python tools/parity_check_reference.py
"""

import os
import sys

import numpy as np

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")


def build_state_dict(params, stats, cfg):
    """Map our pytree → reference state_dict names (torch OIHW tensors)."""
    import torch

    sd = {}

    def w(t):  # HWIO → OIHW
        return torch.from_numpy(np.asarray(t).transpose(3, 2, 0, 1).copy())

    def v(t):
        return torch.from_numpy(np.asarray(t).copy())

    def put_convbn(prefix_conv, prefix_bn, p, s):
        sd[f"{prefix_conv}.weight"] = w(p["w"])
        if "b" in p:
            sd[f"{prefix_conv}.bias"] = v(p["b"])
        sd[f"{prefix_bn}.weight"] = v(p["scale"])
        sd[f"{prefix_bn}.bias"] = v(p["bias"])
        sd[f"{prefix_bn}.running_mean"] = v(s["mean"])
        sd[f"{prefix_bn}.running_var"] = v(s["var"])

    bb_p, bb_s = params["backbone"], stats["backbone"]
    put_convbn("backbone.conv1.0", "backbone.conv1.1", bb_p["conv1"],
               bb_s["conv1"])
    for si in (2, 3, 4):
        for bi, (bp, bs) in enumerate(zip(bb_p[f"stage{si}"],
                                          bb_s[f"stage{si}"])):
            base = f"backbone.stage{si}.{bi}"
            if "branch1" in bp:
                put_convbn(f"{base}.branch1.0", f"{base}.branch1.1",
                           bp["branch1"]["dw"], bs["branch1"]["dw"])
                put_convbn(f"{base}.branch1.2", f"{base}.branch1.3",
                           bp["branch1"]["pw"], bs["branch1"]["pw"])
            put_convbn(f"{base}.branch2.0", f"{base}.branch2.1",
                       bp["branch2"]["pw1"], bs["branch2"]["pw1"])
            put_convbn(f"{base}.branch2.3", f"{base}.branch2.4",
                       bp["branch2"]["dw"], bs["branch2"]["dw"])
            put_convbn(f"{base}.branch2.5", f"{base}.branch2.6",
                       bp["branch2"]["pw2"], bs["branch2"]["pw2"])

    for i in range(3):
        put_convbn(f"conv1x1_{i}.convs.0", f"conv1x1_{i}.convs.1",
                   params[f"lateral{i}"], stats[f"lateral{i}"])
    for i in range(4):
        put_convbn(f"smooth_{i}.convs.0", f"smooth_{i}.convs.1",
                   params[f"smooth{i}"], stats[f"smooth{i}"])
    for hi in range(3):
        hp, hs = params[f"head{hi}"], stats[f"head{hi}"]
        base = f"head_det_{hi + 1}"
        for li, key in enumerate(("dw0", "pw0", "dw1", "pw1")):
            put_convbn(f"{base}.{li}.convs.0", f"{base}.{li}.convs.1",
                       hp[key], hs[key])
        sd[f"{base}.4.weight"] = w(hp["out"]["w"])
        sd[f"{base}.4.bias"] = v(hp["out"]["b"])
    return sd


def main():
    if not os.path.isdir(REFERENCE):
        print("reference not available — skipping parity check")
        return 0
    sys.path.insert(0, REFERENCE)
    import torch

    import jax
    import jax.numpy as jnp

    from yolo_nano_tpu.config import MULTI_ANCHOR_SIZE, YoloNanoConfig
    from yolo_nano_tpu.models.yolo_nano import forward_features, init_yolo_nano
    from yolo_nano_tpu.ops.decode import decode_boxes, make_grids

    size = 128
    cfg = YoloNanoConfig(num_classes=20, anchors=MULTI_ANCHOR_SIZE)
    params, stats = init_yolo_nano(jax.random.key(7), cfg)
    # randomize BN stats so folding/normalization paths are exercised
    stats = jax.tree.map(
        lambda t: t + jnp.abs(0.2 * jax.random.normal(jax.random.key(3),
                                                      t.shape)), stats)

    cwd = os.getcwd()
    os.chdir(REFERENCE)  # reference imports are repo-root relative
    try:
        from models.yolo_nano import YOLONano

        ref = YOLONano(device="cpu", input_size=size, num_classes=20,
                       trainable=False, anchor_size=MULTI_ANCHOR_SIZE)
    finally:
        os.chdir(cwd)
    missing, unexpected = ref.load_state_dict(
        build_state_dict(params, stats, cfg), strict=False)
    assert not unexpected, f"unexpected keys: {unexpected[:5]}"
    print(f"state_dict loaded; {len(missing)} reference keys left at init "
          f"(expected: num_batches_tracked only)")
    bad = [m for m in missing if "num_batches_tracked" not in m]
    assert not bad, f"missing real params: {bad[:5]}"
    ref.eval()

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32)

    conf, cls, txty, _ = forward_features(params, stats, jnp.asarray(x), cfg,
                                          train=False)
    grids = make_grids(cfg, size)
    boxes = np.asarray(decode_boxes(txty, grids)) / size

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        c3, c4, c5 = ref.backbone(xt)
        p3 = ref.conv1x1_0(c3)
        p4 = ref.conv1x1_1(c4)
        p5 = ref.conv1x1_2(c5)
        import torch.nn.functional as F

        p4 = ref.smooth_0(p4 + F.interpolate(p5, scale_factor=2.0))
        p3 = ref.smooth_1(p3 + F.interpolate(p4, scale_factor=2.0))
        p4 = ref.smooth_2(p4 + F.interpolate(p3, scale_factor=0.5))
        p5 = ref.smooth_3(p5 + F.interpolate(p4, scale_factor=0.5))
        preds = [ref.head_det_1(p3), ref.head_det_2(p4), ref.head_det_3(p5)]
        tc, tcl, tt = [], [], []
        a, ncls = 3, 20
        for pred in preds:
            b_, abc, h_, w_ = pred.size()
            pred = pred.permute(0, 2, 3, 1).contiguous().view(b_, h_ * w_, abc)
            tc.append(pred[:, :, :a].contiguous().view(b_, h_ * w_ * a, 1))
            tcl.append(pred[:, :, a:(1 + ncls) * a].contiguous().view(
                b_, h_ * w_ * a, ncls))
            tt.append(pred[:, :, (1 + ncls) * a:].contiguous())
        conf_t = torch.cat(tc, 1).numpy()
        cls_t = torch.cat(tcl, 1).numpy()
        txty_t = torch.cat(tt, 1).view(1, -1, a, 4)
        boxes_t = (ref.decode_boxes(txty_t) / size).numpy()

    for name, ours, theirs in (
            ("conf", np.asarray(conf), conf_t),
            ("cls", np.asarray(cls), cls_t),
            ("txtytwth", np.asarray(txty).reshape(1, -1, 4),
             np.asarray(txty_t).reshape(1, -1, 4)),
            ("decoded boxes", boxes.reshape(1, -1, 4),
             boxes_t.reshape(1, -1, 4))):
        diff = np.abs(ours - theirs).max()
        rel = diff / (np.abs(theirs).max() + 1e-9)
        status = "OK " if rel < 2e-2 else "FAIL"
        print(f"[{status}] {name:14s} max|Δ|={diff:.3e}  rel={rel:.3e}")
        if rel >= 2e-2:
            return 1
    print("parity check PASSED")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
