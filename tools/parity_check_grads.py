"""Dev-only one-step GRADIENT parity check vs the reference.

The strongest trainability evidence short of a full training run: identical
weights + identical batch through the reference's train-branch loss path
(reference models/yolo_nano.py:333-358 → tools.py:236-276, torch autograd)
and through ours (losses.detection_loss via models.loss_forward, jax.grad),
then compare

  * the four loss scalars,
  * every parameter's gradient tensor elementwise (name-mapped, layout
    aligned via the same HWIO→OIHW transform the activation checker uses),
  * the global gradient L2 norm.

Both sides run f32, train-mode BatchNorm (batch statistics). Requires
/root/reference; skips gracefully otherwise.

Run: python tools/parity_check_grads.py
"""

import os
import sys

import numpy as np

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")


def _load_reference_tools():
    """Load the reference's top-level tools.py under a non-colliding module
    name: `import tools` would resolve to THIS repo's tools/ package whenever
    it is already in sys.modules (e.g. `python -m tools.<script>`)."""
    import importlib.util

    path = os.path.join(REFERENCE, "tools.py")
    spec = importlib.util.spec_from_file_location("_reference_tools", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_reference_tools"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    if not os.path.isdir(REFERENCE):
        print("reference not available — skipping")
        return 0
    # import OUR helper before the reference lands on sys.path (the
    # reference's tools.py shadows this directory's package name)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parity_check_reference import build_state_dict

    sys.path.insert(0, REFERENCE)
    import torch

    # the reference downloads ImageNet weights when trainable=True
    # (backbone/shufflenetv2.py:177-180) — zero egress here, and we overwrite
    # every weight anyway, so neutralize the fetch
    import torch.utils.model_zoo as model_zoo

    model_zoo.load_url = lambda *a, **k: {}

    import jax
    import jax.numpy as jnp

    # parity needs f32-strict convs: the default precision lowers conv
    # matmuls to a fast reduced-precision path (measured 1.4e-2 max error on
    # the CPU backend; bf16 passes on TPU) — torch CPU is f32 throughout
    jax.config.update("jax_default_matmul_precision", "highest")

    from yolo_nano_tpu.config import MULTI_ANCHOR_SIZE, YoloNanoConfig
    from yolo_nano_tpu.losses.targets import build_targets
    from yolo_nano_tpu.models.yolo_nano import init_yolo_nano, loss_forward

    size, b, m = 160, 4, 5
    cfg = YoloNanoConfig(num_classes=20, anchors=MULTI_ANCHOR_SIZE)
    params, stats = init_yolo_nano(jax.random.key(7), cfg)
    stats = jax.tree.map(
        lambda t: t + jnp.abs(0.2 * jax.random.normal(jax.random.key(3),
                                                      t.shape)), stats)

    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (b, size, size, 3)).astype(np.float32)
    x1 = rng.uniform(0, 0.6, (b, m))
    y1 = rng.uniform(0, 0.6, (b, m))
    w = rng.uniform(0.05, 0.4, (b, m))
    h = rng.uniform(0.05, 0.4, (b, m))
    boxes = np.stack([x1, y1, np.minimum(x1 + w, 1.0),
                      np.minimum(y1 + h, 1.0)], -1).astype(np.float32)
    labels = rng.integers(0, 20, (b, m)).astype(np.int32)
    labels[:, -1] = -1  # padding row

    # ---- ours: losses + grads -------------------------------------------
    targets = build_targets(jnp.asarray(boxes), jnp.asarray(labels), cfg,
                            size)

    def loss_fn(p):
        (conf_l, cls_l, bbox_l, iou_l), _ = loss_forward(
            p, stats, jnp.asarray(images), targets, cfg, size, train=True)
        return conf_l + cls_l + bbox_l + iou_l, (conf_l, cls_l, bbox_l,
                                                 iou_l)

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    losses = [float(v) for v in losses]

    # ---- reference: losses + grads, f32 AND f64 --------------------------
    # the f64 run is the ground truth; the f32 run calibrates how much error
    # torch's own single-precision autograd accrues on this graph — our f32
    # gradients are held to that same bar (BN-bias gradients are huge
    # cancelling reductions where ANY f32 implementation loses ~2 digits)
    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        ref_tools = _load_reference_tools()
        from models.yolo_nano import YOLONano
    finally:
        os.chdir(cwd)

    label_lists = [
        [[*boxes[i, j], float(labels[i, j])] for j in range(m)
         if labels[i, j] >= 0]
        for i in range(b)
    ]
    target_t = ref_tools.multi_gt_creator(
        size, [8, 16, 32], label_lists,
        anchor_size=list(map(list, MULTI_ANCHOR_SIZE)))
    xt = torch.from_numpy(images.transpose(0, 3, 1, 2))

    def reference_run(dtype):
        os.chdir(REFERENCE)
        try:
            ref = YOLONano(device="cpu", input_size=size, num_classes=20,
                           trainable=True, anchor_size=MULTI_ANCHOR_SIZE)
        finally:
            os.chdir(cwd)
        missing, unexpected = ref.load_state_dict(
            build_state_dict(params, stats, cfg), strict=False)
        assert not unexpected and not [k for k in missing
                                       if "num_batches_tracked" not in k]
        ref = ref.to(dtype)
        ref.train()
        ls = ref(xt.to(dtype), target=target_t.to(dtype))
        sum(ls).backward()
        return ([float(v) for v in ls],
                {k: p.grad.double().numpy()
                 for k, p in ref.named_parameters() if p.grad is not None})

    ref_losses, ref_grads = reference_run(torch.float32)
    _, ref_grads64 = reference_run(torch.float64)

    ok = True
    print("losses (ours vs reference):")
    for name, a, c in zip(("conf", "cls", "bbox", "iou"), losses,
                          ref_losses):
        rel = abs(a - c) / (abs(c) + 1e-9)
        status = "OK " if rel < 1e-3 else "FAIL"
        ok &= rel < 1e-3
        print(f"  [{status}] {name:5s} ours={a:.6f} ref={c:.6f} rel={rel:.2e}")

    # grads: map our grad pytree through the same name/layout mapping as the
    # weights — build_state_dict only reads w/scale/bias (+ mean/var from a
    # zero stats tree we don't compare)
    zero_stats = jax.tree.map(np.zeros_like, stats)
    grad_sd = build_state_dict(grads, zero_stats, cfg)
    missing_g = [k for k in ref_grads if k not in grad_sd]
    assert not missing_g, f"unmapped reference grads: {missing_g[:5]}"

    global_max = max(float(np.abs(g).max()) for g in ref_grads64.values())
    worst = ("", 0.0)
    our_sq = ref_sq = 0.0
    for k, g_true in ref_grads64.items():
        g_f32 = ref_grads[k]
        g_our = np.asarray(grad_sd[k], np.float64)
        our_sq += float((g_our ** 2).sum())
        ref_sq += float((g_f32 ** 2).sum())
        # our f32 error vs the f64 truth, measured in units of torch's own
        # f32 error on the same tensor (floored at 1e-6 of the global scale
        # so exactly-reproduced tensors don't divide by ~0)
        err_ours = np.abs(g_our - g_true).max()
        err_ref = max(np.abs(g_f32 - g_true).max(), 1e-6 * global_max)
        ratio = float(err_ours / err_ref)
        if ratio > worst[1]:
            worst = (k, ratio)
    gn_our, gn_ref = np.sqrt(our_sq), np.sqrt(ref_sq)
    gn_rel = abs(gn_our - gn_ref) / (gn_ref + 1e-12)
    n = len(ref_grads)
    print(f"gradients: {n} tensors, ours-vs-f64-truth measured in units of "
          f"torch's own f32-vs-f64 error")
    print(f"  worst error ratio: {worst[1]:.2f}x ({worst[0]})")
    print(f"  global grad L2: ours={gn_our:.6f} ref={gn_ref:.6f} "
          f"rel={gn_rel:.2e}")
    ok &= worst[1] < 3.0 and gn_rel < 1e-3
    print("grad parity PASSED" if ok else "grad parity FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
