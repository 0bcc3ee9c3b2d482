"""Convert torchvision ShuffleNetV2 ImageNet weights → our backbone pytree.

The reference loads ImageNet-pretrained ShuffleNetV2 from the torchvision
model zoo at train start (reference backbone/shufflenetv2.py:170-182,
strict=False so only the trunk loads). This environment has no network
egress, so the conversion is offline: download shufflenetv2_x{0.5,1.0}-*.pth
elsewhere, then

    python tools/convert_torch_shufflenetv2.py x1.pth out_dir --size 1.0x

and pass `--pretrained out_dir` to cli.train. Mapping is the inverse of
tools/parity_check_reference.py (OIHW→HWIO, torch BN → our scale/bias +
mean/var stats).
"""

from __future__ import annotations

import argparse

import numpy as np


def convert(state_dict, model_size: str = "1.0x"):
    """torch state_dict (torchvision shufflenet_v2 naming: conv1/stage2..4)
    → (backbone_params, backbone_stats) pytrees. model_size validates the
    checkpoint's channel widths against the expected variant."""
    from yolo_nano_tpu.config import SHUFFLENETV2_CHANNELS, SHUFFLENETV2_REPEATS

    expect_stem = SHUFFLENETV2_CHANNELS[model_size][0]
    got_stem = np.asarray(state_dict["conv1.0.weight"]).shape[0]
    if got_stem != expect_stem:
        raise ValueError(f"checkpoint stem has {got_stem} channels; "
                         f"--size {model_size} expects {expect_stem}")
    # the stem is 24ch for every variant — the stage widths are what
    # actually distinguish 0.5x/1.0x/1.5x/2.0x checkpoints
    for si in (2, 3, 4):
        expect = SHUFFLENETV2_CHANNELS[model_size][si - 1] // 2
        got = np.asarray(state_dict[f"stage{si}.0.branch2.0.weight"]).shape[0]
        if got != expect:
            raise ValueError(
                f"checkpoint stage{si} branch width {got} != {expect}; "
                f"this is not a {model_size} checkpoint")

    def w(key):  # OIHW → HWIO
        return np.ascontiguousarray(
            np.asarray(state_dict[key]).transpose(2, 3, 1, 0))

    def v(key):
        return np.asarray(state_dict[key])

    def unit(conv_key, bn_key):
        p = {"w": w(conv_key + ".weight"),
             "scale": v(bn_key + ".weight"), "bias": v(bn_key + ".bias")}
        s = {"mean": v(bn_key + ".running_mean"),
             "var": v(bn_key + ".running_var")}
        return p, s

    params, stats = {}, {}
    params["conv1"], stats["conv1"] = unit("conv1.0", "conv1.1")
    for si, repeats in zip((2, 3, 4), SHUFFLENETV2_REPEATS):
        blocks_p, blocks_s = [], []
        for bi in range(repeats):
            base = f"stage{si}.{bi}"
            bp, bs = {}, {}
            if bi == 0:  # stride-2 block has branch1
                d_p, d_s = unit(f"{base}.branch1.0", f"{base}.branch1.1")
                p_p, p_s = unit(f"{base}.branch1.2", f"{base}.branch1.3")
                bp["branch1"] = {"dw": d_p, "pw": p_p}
                bs["branch1"] = {"dw": d_s, "pw": p_s}
            p1, s1 = unit(f"{base}.branch2.0", f"{base}.branch2.1")
            d2, ds2 = unit(f"{base}.branch2.3", f"{base}.branch2.4")
            p2, s2 = unit(f"{base}.branch2.5", f"{base}.branch2.6")
            bp["branch2"] = {"pw1": p1, "dw": d2, "pw2": p2}
            bs["branch2"] = {"pw1": s1, "dw": ds2, "pw2": s2}
            blocks_p.append(bp)
            blocks_s.append(bs)
        params[f"stage{si}"] = blocks_p
        stats[f"stage{si}"] = blocks_s
    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pth", help="torchvision shufflenetv2 .pth file")
    ap.add_argument("out", help="output orbax checkpoint dir")
    ap.add_argument("--size", default="1.0x")
    args = ap.parse_args()

    import torch

    sd = torch.load(args.pth, map_location="cpu")
    sd = {k: t.numpy() for k, t in sd.items() if hasattr(t, "numpy")}
    params, stats = convert(sd, args.size)

    import jax

    # sanity: structure must match a fresh init
    from yolo_nano_tpu.models.shufflenetv2 import init_shufflenetv2

    ref_p, ref_s = init_shufflenetv2(jax.random.key(0), args.size)
    for got, want, name in ((params, ref_p, "params"), (stats, ref_s,
                                                        "stats")):
        gs = jax.tree.map(lambda x: x.shape, got)
        ws = jax.tree.map(lambda x: x.shape, want)
        assert gs == ws, f"{name} structure mismatch"

    from yolo_nano_tpu.utils.checkpoint import save_params

    save_params(args.out, {"params": params, "stats": stats})
    print(f"wrote backbone checkpoint to {args.out}")


if __name__ == "__main__":
    main()
