"""Serving export: fold BN, cast, and write a self-contained deploy artifact.

The reference's deploy artifact is a raw state_dict .pth that still needs the
model code, thresholds, and fusion applied at load (reference eval.py/test.py
rebuild everything per script). Here the artifact is a directory with the
folded parameters plus the full config, loadable with one call:

    python -m yolo_nano_tpu.cli.export --weight weights/voc/yolo_nano/ckpt \
        --out serving/yolo_nano_voc --img_size 416 [--ema] [--dtype bfloat16]

    from yolo_nano_tpu.serving import load_predictor
    predict = load_predictor("serving/yolo_nano_voc")
    boxes, scores, classes, valid = predict(images)   # [B,416,416,3] RGB norm.

By default the artifact also contains `predict.stablehlo`: the whole serving
graph (forward + decode + NMS, weights baked in) serialized with `jax.export`
— symbolic batch dimension, lowered for both cpu and tpu. That file is the
version-stable deployment format: it replays through any future JAX/XLA
runtime without this package's model code (`load_predictor` prefers it; pass
`prefer_params=True` or a mesh for the parameter path)."""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="YOLO-Nano-TPU serving export")
    p.add_argument("--weight", required=True, help="train checkpoint dir")
    p.add_argument("--out", required=True, help="output artifact directory")
    p.add_argument("-d", "--dataset", default="voc", choices=["voc", "coco"])
    p.add_argument("--img_size", default=416, type=int)
    p.add_argument("--backbone", default="1.0x")
    p.add_argument("--conf_thresh", default=0.001, type=float)
    p.add_argument("--nms_thresh", default=0.50, type=float)
    p.add_argument("--ema", action="store_true", default=False)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--no_stablehlo", action="store_true", default=False,
                   help="skip the serialized jax.export graph (orbax params "
                        "+ config only)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from yolo_nano_tpu.utils.compile_cache import enable as _cc_enable
    _cc_enable()  # persistent XLA cache: remote-TPU compiles are 1-4 min
    import jax
    import jax.numpy as jnp

    from yolo_nano_tpu.cli.common import build_config
    from yolo_nano_tpu.cli.eval import load_weights
    from yolo_nano_tpu.utils.checkpoint import save_params
    from yolo_nano_tpu.utils.fuse_bn import fold_bn

    cfg = build_config(args.dataset, backbone=args.backbone,
                       conf_thresh=args.conf_thresh,
                       nms_thresh=args.nms_thresh)
    params, stats = load_weights(args.weight, cfg, args.ema)
    folded = fold_bn(params, stats)
    if args.dtype == "bfloat16":
        from yolo_nano_tpu.utils.fuse_bn import cast_f32_to_bf16

        folded = cast_f32_to_bf16(folded)

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    save_params(os.path.join(out, "params"), folded)
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump({
            "config": {k: (list(v) if isinstance(v, tuple) else v)
                       for k, v in dataclasses.asdict(cfg).items()},
            "img_size": args.img_size,
            "dtype": args.dtype,
            "folded": True,
            "dataset": args.dataset,
            "stablehlo": not args.no_stablehlo,
        }, f, indent=2)

    if not args.no_stablehlo:
        import jax.export as jex

        from yolo_nano_tpu.models.yolo_nano import predict
        from yolo_nano_tpu.utils.fuse_bn import empty_stats_like

        run_params = folded
        if args.dtype == "bfloat16":
            run_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16), folded)
        fstats = empty_stats_like(run_params)

        def fn(images):
            if args.dtype == "bfloat16":
                images = images.astype(jnp.bfloat16)
            return predict(run_params, fstats, images, cfg, args.img_size)

        spec = jax.ShapeDtypeStruct(
            jex.symbolic_shape(f"b, {args.img_size}, {args.img_size}, 3"),
            jnp.float32)
        exported = jex.export(jax.jit(fn), platforms=["cpu", "tpu"])(spec)
        with open(os.path.join(out, "predict.stablehlo"), "wb") as f:
            f.write(exported.serialize())
    print(f"exported serving artifact → {out}")


if __name__ == "__main__":
    main()
