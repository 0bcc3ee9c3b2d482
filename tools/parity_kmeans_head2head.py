"""Dev-only parity check: our anchor k-means vs the reference's
`anchor_box_kmeans` (reference kmeans_anchor.py:126-165, k-means++ init
:58-92, IoU distance :35-55) on the same synthetic gt-box population.

The reference module calls parse_args() at import time and slurps VOC+COCO,
so we exec just its algorithm section (Box/iou/init_centroids/do_kmeans/
anchor_box_kmeans) and feed both sides an identical mixture-of-clusters wh
sample.  k-means++ seeding is stochastic and the two RNG streams cannot be
aligned, so the comparison is restart-best vs restart-best:

  - converged mean-IoU (the objective) must agree within tolerance;
  - the area-sorted centroid sets must match pairwise within rel tolerance.

Requires /root/reference; skips gracefully otherwise.
Run: python tools/parity_kmeans_head2head.py
"""

import io
import os
import sys
from contextlib import redirect_stdout

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")


def _load_reference_kmeans():
    """Exec only the algorithm part of reference kmeans_anchor.py (from
    `class Box` up to the __main__ block), skipping its import-time
    parse_args() and dataset loads."""
    path = os.path.join(REFERENCE, "kmeans_anchor.py")
    with open(path) as f:
        src = f.read()
    start = src.index("class Box")
    end = src.index('if __name__ == "__main__"')
    ns = {"np": np, "random": __import__("random")}
    exec(compile(src[start:end], path, "exec"), ns)
    return ns


def ref_kmeans(ns, wh: np.ndarray, k: int, seed: int):
    """Run the reference anchor_box_kmeans on [N,2] wh, return
    (area-sorted centroids [k,2], mean IoU under the reference's own iou)."""
    np.random.seed(seed)
    ns["random"].seed(seed)
    boxes = [ns["Box"](0, 0, float(w), float(h)) for w, h in wh]
    with redirect_stdout(io.StringIO()):  # reference prints per iteration
        cents = ns["anchor_box_kmeans"](boxes, k, 1e-6, 1000, plus=True)
    c = np.asarray([[b.w, b.h] for b in cents])
    c = c[np.argsort(c[:, 0] * c[:, 1])]
    ious = np.asarray([[ns["iou"](b, ct) for ct in cents] for b in boxes])
    return c, float(ious.max(axis=1).mean())


def sample_population(rng: np.random.Generator, n: int = 4000) -> np.ndarray:
    """Mixture of 9 lognormal (w,h) clusters shaped like detection gt
    (areas spanning ~8px..~300px at a 416 scale, varied aspect ratios)."""
    means = np.asarray([[10, 14], [24, 30], [33, 70], [61, 48], [70, 160],
                        [120, 96], [128, 253], [240, 160], [300, 300]],
                       np.float64)
    comp = rng.integers(0, len(means), n)
    wh = means[comp] * np.exp(rng.normal(0.0, 0.18, (n, 2)))
    return np.clip(wh, 2.0, 416.0)


def main():
    if not os.path.isdir(REFERENCE):
        print("reference not available — skipping")
        return 0
    ns = _load_reference_kmeans()

    from yolo_nano_tpu.cli.kmeans_anchor import anchor_kmeans, wh_iou

    wh = sample_population(np.random.default_rng(0))
    k, restarts = 9, 5

    ref_best = max((ref_kmeans(ns, wh, k, seed) for seed in range(restarts)),
                   key=lambda t: t[1])
    ours_best = max((anchor_kmeans(wh, k, seed=seed)
                     for seed in range(restarts)), key=lambda t: t[1])

    # re-score the reference's centroids with OUR iou to rule out metric
    # drift between the two IoU implementations
    ref_c, ref_miou = ref_best
    ours_c, ours_miou = ours_best
    ref_miou_ours_metric = float(wh_iou(wh, ref_c).max(axis=1).mean())

    d_obj = abs(ours_miou - ref_miou_ours_metric)
    rel = np.abs(ours_c - ref_c) / ref_c
    print(f"boxes: {len(wh)}  k={k}  restarts={restarts}")
    print(f"reference best mean-IoU: {ref_miou:.4f} "
          f"(= {ref_miou_ours_metric:.4f} under our IoU)")
    print(f"ours      best mean-IoU: {ours_miou:.4f}")
    print(f"|objective delta|: {d_obj:.4f}")
    print("area-sorted centroids (reference vs ours):")
    for rc, oc in zip(ref_c, ours_c):
        print(f"  [{rc[0]:7.2f} {rc[1]:7.2f}]  vs  "
              f"[{oc[0]:7.2f} {oc[1]:7.2f}]")
    print(f"max centroid rel delta: {rel.max():.4f}")

    ok = d_obj < 0.005 and rel.max() < 0.05
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
