"""FLOPs / parameter reporting via XLA cost analysis.

The reference profiles with thop over a random input (reference
utils/com_flops_params.py:5-11, printed at train start train.py:142 and in
benchmark.py:42). Here the numbers come from the compiled XLA executable
itself — the exact graph that runs, after fusion and BN folding.

Note on conventions: thop counts one multiply-accumulate as 1 FLOP; XLA
counts 2. `flops_and_params` reports both so the reference's "1.65 GFLOPs"
style figure is directly comparable.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from yolo_nano_tpu.config import YoloNanoConfig
from yolo_nano_tpu.ops.nn import count_params


def flops_and_params(params, stats, cfg: YoloNanoConfig, input_size: int,
                     batch: int = 1) -> Tuple[float, float, int]:
    """Returns (xla_gflops_per_image, thop_style_gmacs_per_image, n_params)
    for the inference forward pass (no postprocess, like the reference)."""
    from yolo_nano_tpu.models.yolo_nano import forward_features

    def fwd(p, x):
        return forward_features(p, stats, x, cfg, train=False)[:3]

    x = jnp.zeros((batch, input_size, input_size, 3), jnp.float32)
    compiled = jax.jit(fwd).lower(params, x).compile()
    analysis = compiled.cost_analysis()
    if "flops" not in analysis:
        print("FLOPs: unavailable (backend reports no cost analysis)")
        return float("nan"), float("nan"), count_params(params)
    total = float(analysis["flops"])
    per_image = total / batch
    n = count_params(params)
    gflops = per_image / 1e9
    print(f"FLOPs (XLA, x2 MAC) : {gflops:.2f} G")
    print(f"GMACs (thop-style)  : {gflops / 2:.2f} G")
    print(f"Params              : {n / 1e6:.2f} M")
    return gflops, gflops / 2, n
