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

    with open(os.path.join(artifact_dir, "config.json")) as f:
        meta = json.load(f)
    raw = dict(meta["config"])
    raw["anchors"] = tuple(tuple(a) for a in raw["anchors"])
    raw["strides"] = tuple(raw["strides"])
    raw.update(overrides)
    return YoloNanoConfig(**raw), meta


def load_predictor(artifact_dir: str, mesh=None,
                   prefer_params: bool = False) -> Callable:
    """Load an exported artifact → predict_fn(images) → (boxes, scores,
    classes, valid). `images`: [B, S, S, 3] float32 RGB, normalized like
    data.transforms.val_transform output. Pass a mesh for multi-chip
    batch-sharded serving.

    If the artifact carries a serialized `predict.stablehlo` graph
    (cli/export.py default), that replays directly — no model code in the
    load path, any batch size (symbolic dim). The parameter path is used
    when the file is absent, `prefer_params=True`, or a mesh is given (the
    serialized graph is single-device)."""
    import jax.numpy as jnp

    from yolo_nano_tpu.cli.common import make_predict_fn
    from yolo_nano_tpu.models.yolo_nano import init_yolo_nano
    from yolo_nano_tpu.utils.checkpoint import load_params
    from yolo_nano_tpu.utils.fuse_bn import empty_stats_like, fold_bn

    cfg, meta = load_artifact_config(artifact_dir)

    hlo_path = os.path.join(artifact_dir, "predict.stablehlo")
    if os.path.exists(hlo_path) and not prefer_params and mesh is None:
        import jax
        import jax.export as jex

        with open(hlo_path, "rb") as f:
            exported = jex.deserialize(f.read())
        call = jax.jit(exported.call)
        return lambda images: call(jnp.asarray(images, jnp.float32))

    # template with the exported (folded, cast) structure
    import jax

    p0, s0 = init_yolo_nano(jax.random.key(0), cfg)
    template = fold_bn(p0, s0)
    if meta["dtype"] == "bfloat16":
        from yolo_nano_tpu.utils.fuse_bn import cast_f32_to_bf16

        template = cast_f32_to_bf16(template)
    params = load_params(os.path.join(artifact_dir, "params"), template)
    stats = empty_stats_like(params)
    return make_predict_fn(params, stats, cfg, meta["img_size"],
                           fold=False, dtype=meta["dtype"], mesh=mesh)
