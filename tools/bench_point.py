"""One (backbone, size, batch) inference-throughput point on the real chip.

    python tools/bench_point.py 1.0x 416 128          # trained weights if
    python tools/bench_point.py 0.5x 416 128          # the artifact matches

Single compile per process (the remote-compile worker is crash-prone on
repeated large compiles — verify skill notes); the README/DESIGN throughput
tables are reproduced by running one point per invocation. Uses the trained
bench artifact for the backbone when one ships (1.0x: assets/bench_coco416,
0.5x: assets/bench_coco416_05x), random init otherwise; timing is
host-fetch-bracketed (block_until_ready alone lies on tunneled platforms).
Measures at the SERVING operating point (conf 0.1, nms_pre_topk 128 —
DESIGN §9); points must run on an otherwise-idle machine (a concurrent
pytest run once inflated a point 2.3×).
"""

import json
import sys
import time

import numpy as np


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    backbone, size, batch = argv[0], int(argv[1]), int(argv[2])

    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))  # repo root, for `import bench`
    import jax
    import jax.numpy as jnp

    from yolo_nano_tpu.utils.compile_cache import enable as _cc_enable
    _cc_enable()  # repeat sweeps of the same point hit the persistent cache

    from bench import load_model, render_inputs
    from yolo_nano_tpu.config import MULTI_ANCHOR_SIZE_COCO, YoloNanoConfig
    from yolo_nano_tpu.models.yolo_nano import init_yolo_nano, predict
    from yolo_nano_tpu.utils.fuse_bn import empty_stats_like, fold_bn

    overrides = dict(conf_thresh=0.1, nms_thresh=0.45,
                     compute_dtype="bfloat16", nms_pre_topk=128)
    artifact = {"1.0x": "assets/bench_coco416",
                "0.5x": "assets/bench_coco416_05x"}.get(backbone)
    if artifact:  # resolve against the repo root, not the CWD — running the
        # tool from elsewhere must not silently fall back to random init
        artifact = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), artifact)
    if artifact and os.path.isdir(artifact):
        import bench
        bench.ARTIFACT = os.path.abspath(artifact)  # per-backbone artifact;
        # its config.json carries the matching backbone/anchors
        folded, fstats, cfg, kind = load_model(overrides)
    else:
        cfg = YoloNanoConfig(num_classes=80, backbone=backbone,
                             anchors=MULTI_ANCHOR_SIZE_COCO, **overrides)
        p, s = init_yolo_nano(jax.random.key(0), cfg)
        folded = jax.tree.map(lambda x: x.astype(jnp.bfloat16), fold_bn(p, s))
        fstats = empty_stats_like(folded)
        kind = "random"
        print(f"WARNING: no trained artifact at {artifact} — timing RANDOM "
              f"init weights (different NMS candidate load than the "
              f"published tables)", file=sys.stderr)

    images = jnp.asarray(render_inputs(batch, size, seed=0), jnp.bfloat16)

    @jax.jit
    def step(p, x):
        return predict(p, fstats, x, cfg, size)

    out = step(folded, images)
    np.asarray(out[1])
    iters = 30
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(folded, images)
        np.asarray(out[1])
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"backbone": backbone, "size": size, "batch": batch,
                      "weights": kind,
                      "batch_ms": round(best / iters * 1e3, 2),
                      "img_per_s": round(batch * iters / best, 1)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
