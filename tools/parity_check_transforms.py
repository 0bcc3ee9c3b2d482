"""Dev-only parity check: our val preprocessing vs the reference's
ValTransforms (reference data/transforms.py:445-458) on random images.

The eval protocol depends on byte-exact preprocessing: letterbox geometry,
mean-pad value, normalization constants, BGR→RGB ordering, and the
scale/offset used for the box undo. Requires /root/reference; skips otherwise.

Run: python tools/parity_check_transforms.py
"""

import os
import sys

import numpy as np

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")


def main():
    if not os.path.isdir(REFERENCE):
        print("reference not available — skipping")
        return 0
    sys.path.insert(0, REFERENCE)
    from data.transforms import ValTransforms  # reference

    from yolo_nano_tpu.data.transforms import val_transform

    rng = np.random.default_rng(0)
    worst = 0.0
    for size in (320, 416, 608):
        ref_tf = ValTransforms(size)
        for shape in ((240, 320), (400, 300), (333, 333), (127, 451)):
            img = rng.integers(0, 255, (*shape, 3), dtype=np.uint8)
            ref_img, _, _, ref_scale, ref_offset = ref_tf(img)
            ref_img = ref_img.numpy().transpose(1, 2, 0)  # CHW RGB → HWC
            got_img, got_scale, got_offset = val_transform(img, size)
            d_img = float(np.abs(got_img - ref_img).max())
            d_geo = float(max(np.abs(np.ravel(got_scale)
                                     - np.ravel(ref_scale)).max(),
                              np.abs(np.ravel(got_offset)
                                     - np.ravel(ref_offset)).max()))
            worst = max(worst, d_img, d_geo)
            status = "OK " if d_img < 1e-4 and d_geo < 1e-7 else "FAIL"
            print(f"[{status}] size {size} shape {shape}: "
                  f"img max|Δ|={d_img:.2e} geo max|Δ|={d_geo:.2e}")
            if status == "FAIL":
                return 1
    print(f"val-transform parity PASSED (worst Δ {worst:.2e})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
