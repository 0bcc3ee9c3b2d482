"""Conv+BN folding as a parameter-pytree transform.

The reference folds BatchNorm into the preceding conv by walking nn.Module
children and replacing layers (reference utils/fuse_conv_bn.py:25-53). Here a
conv+BN unit is just a dict {'w', ('b',) 'scale', 'bias'} with running stats
{'mean', 'var'}, so folding is a pure function producing an inference
parameter tree:

    w' = w · γ/√(σ²+ε)          (per output channel)
    b' = (b − μ) · γ/√(σ²+ε) + β    (reference utils/fuse_conv_bn.py:14-22)

The folded tree feeds the SAME apply functions (ops.nn.conv_bn dispatches on
the presence of 'scale'), so the serving graph is the training graph minus the
normalization ops — XLA then fuses the per-channel bias into the conv epilogue.
"""

from __future__ import annotations

import jax.numpy as jnp

from yolo_nano_tpu.ops.nn import BN_EPS


def _fold_unit(p, s):
    factor = p["scale"] / jnp.sqrt(s["var"] + BN_EPS)
    w = p["w"] * factor  # broadcast over (kh, kw, cin/g, cout)
    b = p.get("b", jnp.zeros_like(s["mean"]))
    b = (b - s["mean"]) * factor + p["bias"]
    return {"w": w, "b": b}


def fold_bn(params, stats):
    """Recursively fold every conv+BN unit; returns (folded_params, stats=None
    placeholderless tree) usable with train=False applies."""
    if isinstance(params, dict):
        if "w" in params and "scale" in params:
            return _fold_unit(params, stats)
        if "w" in params:  # plain conv (no BN), e.g. head output layer
            return dict(params)
        return {k: fold_bn(params[k], stats.get(k) if stats else None)
                for k in params}
    if isinstance(params, (list, tuple)):
        return [fold_bn(p, s) for p, s in zip(params, stats)]
    return params


def cast_f32_to_bf16(tree):
    """Cast every float32 leaf to bfloat16 (exporter and loader must agree —
    this is the single definition both use)."""
    import jax

    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        tree)


def empty_stats_like(folded):
    """A stats tree of `None`s structurally compatible with folded params for
    apply functions that index stats by key."""
    if isinstance(folded, dict):
        if "w" in folded:
            return None
        return {k: empty_stats_like(v) for k, v in folded.items()}
    if isinstance(folded, list):
        return [empty_stats_like(v) for v in folded]
    return None
