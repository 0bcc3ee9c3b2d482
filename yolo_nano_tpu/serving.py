"""One-call loader for exported serving artifacts (see cli/export.py)."""

from __future__ import annotations

import json
import os
from typing import Callable


def load_artifact_config(artifact_dir: str, **overrides):
    """Parse an artifact's config.json → (YoloNanoConfig, meta dict).

    The single place that normalizes the JSON lists back to the tuples the
    frozen dataclass expects — bench.py, tools/sweep_nms_budget.py and
    load_predictor all load artifacts through here."""
    from yolo_nano_tpu.config import YoloNanoConfig

    with open(os.path.join(os.path.expanduser(artifact_dir),
                           "config.json")) as f:
        meta = json.load(f)
    raw = dict(meta["config"])
    raw["anchors"] = tuple(tuple(a) for a in raw["anchors"])
    raw["strides"] = tuple(raw["strides"])
    raw.update(overrides)
    return YoloNanoConfig(**raw), meta


_AUTOTUNE_TABLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "autotune_batch.json")


def optimal_batch(img_size: int, backbone: str = "1.0x",
                  default: int = 128, table_path: str | None = None) -> int:
    """Measured throughput-optimal serving batch for (backbone, resolution),
    from the autotune table tools/autotune_batch.py writes
    (assets/autotune_batch.json). Falls back to `default` when the shape was
    never swept (128 — the measured 416 optimum, docs/DESIGN.md §7.1).
    Unknown sizes use the nearest swept resolution. `table_path` points at a
    deployment-specific table (e.g. re-swept on different TPU hardware)."""
    path = table_path or _AUTOTUNE_TABLE
    if not os.path.exists(path):
        return default
    with open(path) as f:
        best = json.load(f).get("best", {})
    sizes = sorted({int(k.split("/")[1]) for k in best
                    if k.startswith(f"{backbone}/")})
    if not sizes:
        return default
    nearest = min(sizes, key=lambda s: abs(s - img_size))
    return int(best[f"{backbone}/{nearest}"]["batch"])


def default_buckets(img_size: int, backbone: str = "1.0x",
                    table_path: str | None = None):
    """Batch-bucket ladder for ragged serving traffic, topped by the
    autotuned optimum: small buckets bound padding waste for light traffic,
    the top bucket maximizes throughput for bulk traffic."""
    top = optimal_batch(img_size, backbone, table_path=table_path)
    ladder = [b for b in (1, 8, 32) if b < top]
    return tuple(ladder + [top])


def bucket_batches(predict_fn: Callable, buckets, img_shape=None,
                   warmup: bool = False) -> Callable:
    """Wrap a fixed-shape predict_fn so ANY batch size is served by a
    BOUNDED set of compiled graphs: the batch is zero-padded up to the
    smallest bucket that fits (padded rows are sliced off the outputs —
    per-image results are unchanged), and batches larger than the biggest
    bucket are processed in max-bucket chunks. All chunks are dispatched
    before any result is fetched, so multi-chunk requests keep the device
    busy (same dispatch/fetch overlap as evaluation._run_batched).

    Production rationale: every distinct batch size is its own XLA
    compilation (~tens of seconds on a cold program); serving traffic with
    ragged batch sizes must not compile per size. Padding is also FASTER
    than some native sizes on v5e — XLA has a tiling cliff at batch 192
    (44.5 ms) where padding to the 256 graph runs in 40.9 ms
    (docs/DESIGN.md §7.1).

    warmup=True (needs img_shape, e.g. (416, 416, 3)): compile every bucket
    now, at wrap time, instead of lazily on the first live request of each
    size — the load stalls once so the serving path never does."""
    import numpy as np

    buckets = tuple(sorted(set(int(b) for b in buckets)))
    if not buckets or buckets[0] < 1:
        raise ValueError(f"buckets must be positive ints, got {buckets!r}")
    biggest = buckets[-1]

    def dispatch(chunk):
        """→ (async predict output, real batch size)."""
        b = chunk.shape[0]
        bucket = next(k for k in buckets if k >= b)
        if bucket != b:
            chunk = np.asarray(chunk)
            pad = np.zeros((bucket - b,) + chunk.shape[1:], chunk.dtype)
            chunk = np.concatenate([chunk, pad], axis=0)
        return predict_fn(chunk), b

    def wrapped(images):
        n = images.shape[0]
        if n == 0:
            raise ValueError("bucket_batches: empty batch (n=0) — nothing "
                             "to dispatch")
        pending = [dispatch(images[lo:lo + biggest])
                   for lo in range(0, n, biggest)]
        parts = [[np.asarray(t)[:b] for t in out] for out, b in pending]
        if len(parts) == 1:
            return tuple(parts[0])
        return tuple(np.concatenate([p[i] for p in parts], axis=0)
                     for i in range(len(parts[0])))

    if warmup:
        if img_shape is None:
            raise ValueError("warmup=True requires img_shape")
        for k in buckets:
            wrapped(np.zeros((k,) + tuple(img_shape), np.float32))
    return wrapped


def load_predictor(artifact_dir: str, mesh=None,
                   prefer_params: bool = False,
                   batch_buckets=None,
                   conf_thresh: float | None = None,
                   nms_thresh: float | None = None,
                   diou_nms: bool | None = None,
                   pre_topk: int | None = None,
                   max_det: int | None = None) -> Callable:
    """Load an exported artifact → predict_fn(images) → (boxes, scores,
    classes, valid). `images`: [B, S, S, 3] float32 RGB, normalized like
    data.transforms.val_transform output. Pass a mesh for multi-chip
    batch-sharded serving.

    If the artifact carries a serialized `predict.stablehlo` graph
    (cli/export.py default), that replays directly — no model code in the
    load path, any batch size (symbolic dim). The parameter path is used
    when the file is absent, `prefer_params=True`, or a mesh is given (the
    serialized graph is single-device).

    conf_thresh / nms_thresh / diou_nms / pre_topk / max_det override the
    thresholds the artifact was exported with. The serialized stablehlo
    graph bakes them in (it replays verbatim), so ANY override routes the
    load through the parameter path automatically — same weights, freshly
    traced postprocess. Note max_det/pre_topk change the fixed output
    shapes.

    batch_buckets (e.g. (1, 8, 32, 128), or "auto" for the measured ladder
    from assets/autotune_batch.json via `default_buckets`): serve ragged
    batch sizes from a bounded compiled-graph set via zero-padding, every
    bucket compiled at load time — see `bucket_batches`. With a mesh, every
    bucket must be divisible by the mesh size (batches are sharded on
    axis 0)."""
    import jax.numpy as jnp

    from yolo_nano_tpu.cli.common import make_predict_fn
    from yolo_nano_tpu.models.yolo_nano import init_yolo_nano
    from yolo_nano_tpu.utils.checkpoint import load_params
    from yolo_nano_tpu.utils.fuse_bn import empty_stats_like, fold_bn

    # "~/artifacts/..." comes in verbatim from Python callers (no shell
    # expansion) — expand it here so runbook-style paths just work
    artifact_dir = os.path.expanduser(artifact_dir)
    overrides = {k: v for k, v in (
        ("conf_thresh", conf_thresh), ("nms_thresh", nms_thresh),
        ("diou_nms", diou_nms), ("nms_pre_topk", pre_topk),
        ("max_detections", max_det)) if v is not None}
    if overrides:
        # the stablehlo graph replays its baked thresholds verbatim —
        # overrides force the re-traced parameter path
        prefer_params = True
        if not os.path.isdir(os.path.join(artifact_dir, "params")):
            raise ValueError(
                f"threshold overrides {sorted(overrides)} need the "
                f"parameter path, but {artifact_dir} has no params/ dir — "
                "re-export the artifact (cli/export.py always writes "
                "params/), or drop the overrides to replay the baked "
                "stablehlo graph")

    cfg, meta = load_artifact_config(artifact_dir, **overrides)
    img_shape = (meta["img_size"], meta["img_size"], 3)
    if batch_buckets == "auto":
        # autotuned ladder for this artifact's (backbone, resolution)
        batch_buckets = default_buckets(meta["img_size"], cfg.backbone)
    if batch_buckets and mesh is not None:
        n_dev = len(mesh.devices.flat)
        bad = [b for b in batch_buckets if b % n_dev]
        if bad:
            raise ValueError(
                f"batch_buckets {bad} not divisible by the {n_dev}-device "
                "mesh — sharded batches must split evenly over axis 0")

    hlo_path = os.path.join(artifact_dir, "predict.stablehlo")
    if os.path.exists(hlo_path) and not prefer_params and mesh is None:
        import jax
        import jax.export as jex

        with open(hlo_path, "rb") as f:
            exported = jex.deserialize(f.read())
        call = jax.jit(exported.call)
        fn = lambda images: call(jnp.asarray(images, jnp.float32))  # noqa: E731
        return bucket_batches(fn, batch_buckets, img_shape,
                              warmup=True) if batch_buckets else fn

    # template with the exported (folded, cast) structure
    import jax

    p0, s0 = init_yolo_nano(jax.random.key(0), cfg)
    template = fold_bn(p0, s0)
    if meta["dtype"] == "bfloat16":
        from yolo_nano_tpu.utils.fuse_bn import cast_f32_to_bf16

        template = cast_f32_to_bf16(template)
    params = load_params(os.path.join(artifact_dir, "params"), template)
    stats = empty_stats_like(params)
    fn = make_predict_fn(params, stats, cfg, meta["img_size"],
                         fold=False, dtype=meta["dtype"], mesh=mesh)
    return bucket_batches(fn, batch_buckets, img_shape,
                          warmup=True) if batch_buckets else fn
