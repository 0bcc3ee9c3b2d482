"""Shared CLI plumbing: dataset-specific configs, predict-fn builders,
box drawing (reference test.py:50-92 capability)."""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import numpy as np

from yolo_nano_tpu.config import (
    MULTI_ANCHOR_SIZE,
    MULTI_ANCHOR_SIZE_COCO,
    YoloNanoConfig,
)
from yolo_nano_tpu.data.coco import COCO_CLASS_LABELS
from yolo_nano_tpu.data.voc import VOC_CLASSES


_EVAL_BARRIER_COUNTER = [0]


def _next_eval_barrier() -> int:
    """Monotone counter for eval compile-barrier tags. Control flow is
    lockstep across controllers (same eval epochs in the same order), so
    the same count is reached everywhere and the tags rendezvous."""
    _EVAL_BARRIER_COUNTER[0] += 1
    return _EVAL_BARRIER_COUNTER[0]


def build_config(dataset: str, backbone: str = "1.0x",
                 conf_thresh: float = 0.001, nms_thresh: float = 0.50,
                 diou_nms: bool = False, **overrides) -> YoloNanoConfig:
    """One source of truth for per-dataset model config (the reference
    duplicates this switch in every script, e.g. train.py:282-321,
    eval.py:84-101 — with threshold flags that were parsed but ignored;
    here they are honored)."""
    if dataset == "voc":
        base = dict(num_classes=20, anchors=MULTI_ANCHOR_SIZE)
    elif dataset.startswith("coco"):
        base = dict(num_classes=80, anchors=MULTI_ANCHOR_SIZE_COCO)
    else:
        raise ValueError(f"unknown dataset {dataset!r}")
    base.update(backbone=backbone, conf_thresh=conf_thresh,
                nms_thresh=nms_thresh, diou_nms=diou_nms, **overrides)
    return YoloNanoConfig(**base)


def class_names_for(dataset: str) -> Sequence[str]:
    if dataset == "voc":
        return VOC_CLASSES
    # contiguous 80-class index → display name, via the one shared
    # kept-category table (data/coco.py — same sorted-id mapping
    # COCODataset derives from the annotation file at runtime)
    from yolo_nano_tpu.data.coco import COCO_80_CAT_IDS

    return [COCO_CLASS_LABELS[c] for c in COCO_80_CAT_IDS]


@functools.lru_cache(maxsize=None)
def _predict_jit(cfg: YoloNanoConfig, input_size: int, bf16: bool):
    """One compiled predict core per (config, resolution, dtype) — params are
    jit ARGUMENTS, so rebuilding a predict fn with fresh weights (e.g. the
    training eval hook every N epochs) reuses the compilation."""
    import jax
    import jax.numpy as jnp

    from yolo_nano_tpu.models.yolo_nano import predict

    def core(params, stats, images):
        x = images.astype(jnp.bfloat16) if bf16 else images
        return predict(params, stats, x, cfg, input_size)

    return jax.jit(core)


@functools.lru_cache(maxsize=None)
def _sharded_predict_jit(cfg: YoloNanoConfig, input_size: int, bf16: bool,
                         mesh, replicated_out: bool):
    """Mesh twin of _predict_jit: params/stats are replicated jit ARGUMENTS
    (not baked constants), so the training eval hook's per-epoch
    make_predict_fn calls reuse ONE compilation per (config, resolution,
    dtype, mesh) instead of re-tracing a weights-as-constants graph every
    eval epoch — on a remote TPU backend that re-trace costs minutes."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yolo_nano_tpu.models.yolo_nano import predict

    data = NamedSharding(mesh, P(mesh.axis_names))
    repl = NamedSharding(mesh, P())

    def core(params, stats, images):
        x = images.astype(jnp.bfloat16) if bf16 else images
        return predict(params, stats, x, cfg, input_size)

    return jax.jit(core, in_shardings=(repl, repl, data),
                   out_shardings=repl if replicated_out else data)


# multi-controller mode: one AOT-compiled executable per key, compiled
# through the compile-then-barrier discipline exactly once (an AOT
# .lower().compile() bypasses the jit object's in-process cache, so the
# executable itself must be memoized to keep later eval epochs barrier- and
# compile-free)
_MP_COMPILED: dict = {}


def make_predict_fn(params, stats, cfg: YoloNanoConfig, input_size: int,
                    fold: bool = True, dtype: str = "bfloat16",
                    mesh=None, process_shard=None,
                    local_rows: bool = False) -> Callable:
    """Compiled batched inference closure: images → detections.
    Applies conv-BN folding at build time (the reference folds only in
    benchmark.py:140-141; here it is the default serving path).

    With `mesh`, inference fans out across the data-parallel mesh: the batch
    shards on axis 0 (must divide the mesh size), params replicate, and the
    fixed-shape detections come back batch-sharded — multi-chip batched eval
    with zero model changes.

    With `process_shard=(process_id, process_count)` (multi-controller mode;
    requires `mesh` spanning all processes' devices), the closure takes the
    FULL global host batch on every process, materializes only this
    process's rows (jax.make_array_from_process_local_data), and returns
    fully-REPLICATED detections so every controller can fetch them — the
    evaluators then run in lockstep on identical results.

    local_rows=True (with process_shard): the closure takes ONLY this
    process's rows [B/count, S, S, 3] directly — paired with
    EvalLoader(process_shard=…), which decodes just those rows, so eval
    host IO is O(dataset/hosts) instead of O(dataset) per host."""
    import jax
    import jax.numpy as jnp

    from yolo_nano_tpu.utils.fuse_bn import empty_stats_like, fold_bn

    if fold:
        params = fold_bn(params, stats)
        stats = empty_stats_like(params)
    if dtype == "bfloat16":
        from yolo_nano_tpu.utils.fuse_bn import cast_f32_to_bf16

        params = cast_f32_to_bf16(params)

    if local_rows and process_shard is None:
        raise ValueError("local_rows=True only makes sense with "
                         "process_shard (multi-controller mode)")
    if mesh is None:
        if process_shard is not None:
            raise ValueError("process_shard needs a global mesh")
        jitted = _predict_jit(cfg, input_size, dtype == "bfloat16")
        # pin the weights on device ONCE: numpy jit arguments (e.g. an
        # orbax-restored tree on the fold=False serving path) are
        # re-uploaded host→device on EVERY call otherwise
        params = jax.device_put(params)
        stats = jax.device_put(stats)

        def fn(images):
            return jitted(params, stats, jnp.asarray(images))

        return fn

    from jax.sharding import NamedSharding, PartitionSpec as P

    # batch sharded over ALL mesh axes — works for 1-D ("data",) and 2-D
    # multi-slice ("dcn","data") meshes alike; params/stats ride as
    # replicated jit arguments so every eval epoch reuses one compilation
    data = NamedSharding(mesh, P(mesh.axis_names))
    bf16 = dtype == "bfloat16"
    sharded_jit = _sharded_predict_jit(cfg, input_size, bf16, mesh,
                                       process_shard is not None)

    if process_shard is None:
        # pin the weights to the replicated layout ONCE at build time —
        # host/single-device params fed straight to the jit would be
        # re-broadcast over the mesh on every call
        repl = NamedSharding(mesh, P())
        params = jax.device_put(params, repl)
        stats = jax.device_put(stats, repl)

        def sharded(images):
            return sharded_jit(params, stats,
                               jax.device_put(jnp.asarray(images), data))

        return sharded

    pid, count = process_shard

    # the AOT executable below is strict about input shardings: params may
    # arrive as host numpy (eval CLI checkpoint load) or as train-state
    # arrays — pin them to the replicated layout the executable was
    # lowered with (cheap: ~5 MB for this model, once per eval epoch)
    from yolo_nano_tpu.parallel.multiprocess import replicate_tree

    params = replicate_tree(mesh, params)
    stats = replicate_tree(mesh, stats)

    # compile-then-barrier on the first batch EVER for this key: every
    # controller finishes XLA compilation before any controller executes
    # (first execution lazily initializes cross-host comm contexts under
    # short hardcoded timeouts, and compile latency is asymmetric across
    # controllers — see parallel.multiprocess.compile_barrier). The AOT
    # executable is memoized in _MP_COMPILED, so later eval epochs rebuild
    # only this closure (fresh params), never the compilation; the barrier
    # tag carries a process-lockstep counter to stay unique regardless.
    def run_jit(x):
        # AOT executables are shape/structure-strict: the batch shape/dtype
        # AND the weight-tree structure (fold=True fuses BN, changing the
        # pytree) belong in the key — two predict fns differing in either
        # must each get their own compilation, as plain jit would
        mp_key = (cfg, input_size, bf16, mesh, x.shape, str(x.dtype),
                  jax.tree.structure((params, stats)))
        exe = _MP_COMPILED.get(mp_key)
        if exe is None:
            from yolo_nano_tpu.parallel.multiprocess import compile_barrier

            exe = sharded_jit.lower(params, stats, x).compile()
            compile_barrier(f"eval{input_size}:{_next_eval_barrier()}")
            _MP_COMPILED[mp_key] = exe
        return exe(params, stats, x)

    if local_rows:
        def sharded_mp_local(local):
            local = np.ascontiguousarray(np.asarray(local))
            x = jax.make_array_from_process_local_data(data, local)
            return run_jit(x)

        return sharded_mp_local

    def sharded_mp(images):
        images = np.asarray(images)
        if images.shape[0] % count:
            raise ValueError(
                f"global eval batch {images.shape[0]} must divide over "
                f"{count} processes")
        per = images.shape[0] // count
        local = np.ascontiguousarray(images[pid * per:(pid + 1) * per])
        x = jax.make_array_from_process_local_data(data, local)
        return run_jit(x)

    return sharded_mp


def draw_detections(img_bgr: np.ndarray, boxes: np.ndarray,
                    scores: np.ndarray, classes: np.ndarray,
                    class_names: Sequence[str],
                    vis_thresh: float = 0.3) -> np.ndarray:
    """Draw boxes+labels on a BGR image (reference test.py:50-92)."""
    import cv2

    rng = np.random.default_rng(0)
    colors = rng.integers(0, 255, (len(class_names), 3)).tolist()
    out = img_bgr.copy()
    for b, s, c in zip(boxes, scores, classes):
        if s < vis_thresh:
            continue
        c = int(c)
        x1, y1, x2, y2 = (int(v) for v in b)
        color = tuple(int(v) for v in colors[c % len(colors)])
        cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
        label = f"{class_names[c]}: {s:.2f}"
        th = max(y1 - 6, 10)
        cv2.putText(out, label, (x1, th), cv2.FONT_HERSHEY_SIMPLEX, 0.4,
                    color, 1, lineType=cv2.LINE_AA)
    return out
