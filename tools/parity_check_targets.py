"""Dev-only parity check: our target assignment vs the reference's
multi_gt_creator (reference tools.py:97-216) on random ground truth.

Compares three implementations on identical inputs:
  1. reference tools.multi_gt_creator (host numpy, run from /root/reference)
  2. our sequential numpy oracle (losses/targets.py::build_targets_numpy)
  3. our vectorized device version (losses/targets.py::build_targets)

Requires /root/reference; skips gracefully otherwise.
Run: python tools/parity_check_targets.py
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
    sys.path.insert(0, REFERENCE)
    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        ref_tools = _load_reference_tools()
    finally:
        os.chdir(cwd)

    import jax.numpy as jnp

    from yolo_nano_tpu.config import MULTI_ANCHOR_SIZE, YoloNanoConfig
    from yolo_nano_tpu.losses.targets import build_targets, build_targets_numpy

    cfg = YoloNanoConfig(num_classes=20, anchors=MULTI_ANCHOR_SIZE)
    size = 416
    rng = np.random.default_rng(0)
    b, m = 8, 6
    x1 = rng.uniform(0, 0.7, (b, m))
    y1 = rng.uniform(0, 0.7, (b, m))
    w = rng.uniform(0.01, 0.6, (b, m))
    h = rng.uniform(0.01, 0.6, (b, m))
    boxes = np.stack([x1, y1, np.minimum(x1 + w, 1.0),
                      np.minimum(y1 + h, 1.0)], -1).astype(np.float32)
    labels = rng.integers(0, 20, (b, m)).astype(np.int32)
    labels[:, -1] = -1  # padding row

    # reference wants per-image python lists [x1,y1,x2,y2,cls]
    label_lists = [
        [[*boxes[i, j], float(labels[i, j])] for j in range(m)
         if labels[i, j] >= 0]
        for i in range(b)
    ]
    ref = ref_tools.multi_gt_creator(size, [8, 16, 32], label_lists,
                                     anchor_size=list(map(list,
                                                          MULTI_ANCHOR_SIZE))
                                     ).numpy()
    oracle = build_targets_numpy(boxes, labels, cfg, size)
    device = np.asarray(build_targets(jnp.asarray(boxes),
                                      jnp.asarray(labels), cfg, size))

    for name, got in (("numpy oracle", oracle), ("device", device)):
        # assignment channels (obj, cls, gt box) must match EXACTLY — any
        # mis-placed positive/ignore is a bug. Float-computed channels get a
        # small f32 tolerance: tx/ty/tw/th (2:6, f32 device vs f64 reference,
        # measured divergence ≤7e-5) and the 2−w·h weight (channel 6, which
        # differs by 1 ULP between CPU and TPU backends — demanding
        # bit-exactness there made this gate backend-dependent).
        assign_exact = np.array_equal(got[..., :2], ref[..., :2]) and \
            np.array_equal(got[..., 7:], ref[..., 7:])
        txty_ok = np.allclose(got[..., 2:4], ref[..., 2:4], atol=1e-5)
        twth_ok = np.allclose(got[..., 4:6], ref[..., 4:6], atol=2e-4)
        weight_ok = np.allclose(got[..., 6], ref[..., 6], atol=1e-5)
        same = np.isclose(got, ref, rtol=1e-4, atol=2e-4).all(-1)
        frac = same.mean()
        pos_ref = int((ref[..., 0] == 1).sum())
        pos_got = int((got[..., 0] == 1).sum())
        ign_ref = int((ref[..., 0] == -1).sum())
        ign_got = int((got[..., 0] == -1).sum())
        status = "OK " if (assign_exact and txty_ok and twth_ok
                           and weight_ok) else "FAIL"
        print(f"[{status}] {name:12s}: rows equal {frac:.6f}  "
              f"positives {pos_got}/{pos_ref}  ignores {ign_got}/{ign_ref}")
        if status == "FAIL":
            bad = np.argwhere(~same)[:5]
            for bi, ni in bad:
                print("  ref:", np.round(ref[bi, ni], 3),
                      "\n  got:", np.round(got[bi, ni], 3))
            return 1
    print("targets parity PASSED")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
