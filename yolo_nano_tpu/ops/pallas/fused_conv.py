"""Pallas TPU kernel: fused depthwise-3×3 → activation → pointwise-1×1 →
activation.

This is the hot composite of the detection heads (two dw→pw pairs per head,
reference models/yolo_nano.py:50-70) and the tail of every ShuffleV2 branch2
(dw → pw2, reference backbone/shufflenetv2.py:58-62). As separate XLA convs
the depthwise output round-trips HBM ([B,H,W,C] per pair — ~66 MB per level-0
head pair at batch 128); fused, it lives in VMEM:

  HBM → VMEM: input tile + weights
  VPU:        9 shifted multiply-accumulates (the depthwise conv) + bias + act
  MXU:        (H·W, C) × (C, C_out) pointwise matmul, f32 accumulate
  VMEM → HBM: output tile only

One grid instance per batch image; a whole 52×52×96 bf16 level fits VMEM
(~0.5 MB), so no spatial halo exchange is needed. Used on the folded
(inference) parameter path — training keeps separate convs so BatchNorm sees
the un-fused activations.

The pure-XLA `fused_dw_pw_reference` is both the CPU fallback and the test
oracle (tests/test_pallas.py compares them in interpret mode).

MEASURED (v5e-1, batch 128 @416, full predict): XLA separate convs
16.6 ms/batch (7.7k img/s) vs this kernel in the heads 20.8 ms/batch
(6.1k img/s) — XLA's native conv pipeline beats the hand-fused kernel for
these small-channel shapes (C=96 < 128 lanes, per-image grid instances too
small to hide DMA). Default therefore OFF (`set_pallas_enabled(True)` to
opt in); kept as correct, tested infrastructure for future shapes where
fusion wins (e.g. larger batch-tiled variants).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_PALLAS_ENABLED = False  # see MEASURED note above


def pallas_enabled() -> bool:
    return _PALLAS_ENABLED and jax.default_backend() == "tpu"


def set_pallas_enabled(value: bool) -> None:
    global _PALLAS_ENABLED
    _PALLAS_ENABLED = value


def _act(x, kind: Optional[str]):
    if kind is None:
        return x
    if kind == "relu":
        return jnp.maximum(x, 0)
    if kind == "leaky":
        return jnp.where(x >= 0, x, 0.1 * x)
    raise ValueError(kind)


def fused_dw_pw_reference(x, dw_w, dw_b, pw_w, pw_b, *, act_mid="leaky",
                          act_out="leaky"):
    """XLA oracle: depthwise3×3(p=1) + bias + act, then 1×1 + bias + act.
    dw_w: [3,3,C]; pw_w: [C,Cout]."""
    from yolo_nano_tpu.ops.nn import conv2d

    c = x.shape[-1]
    y = conv2d(x, dw_w[:, :, None, :], groups=c)
    y = _act(y + dw_b.astype(y.dtype), act_mid)
    y = conv2d(y, pw_w[None, None], groups=1)
    return _act(y + pw_b.astype(y.dtype), act_out)


def _kernel(x_ref, dww_ref, dwb_ref, pww_ref, pwb_ref, out_ref, *,
            act_mid, act_out, h, w):
    x = x_ref[0].astype(jnp.float32)                  # [H, W, C]
    # SAME padding applied in VMEM — no HBM-side pad materialization
    x = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((h, w, x.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc += x[dy:dy + h, dx:dx + w, :] * dww_ref[dy, dx, :]
    acc += dwb_ref[:]
    mid = _act(acc, act_mid)
    # matmul in the pointwise weights' dtype: bf16 models hit the MXU fast
    # path, f32 models keep full precision (matching the non-Pallas path)
    y = jax.lax.dot_general(
        mid.reshape(h * w, -1).astype(pww_ref.dtype), pww_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = _act(y + pwb_ref[:], act_out)
    out_ref[0] = y.reshape(h, w, -1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act_mid", "act_out",
                                             "interpret"))
def fused_dw_pw(x, dw_w, dw_b, pw_w, pw_b, *, act_mid="leaky",
                act_out="leaky", interpret=False):
    """Fused dw3×3+act → pw1×1+act. x: [B,H,W,C] → [B,H,W,Cout]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    cout = pw_w.shape[-1]
    kern = functools.partial(_kernel, act_mid=act_mid, act_out=act_out,
                             h=h, w=w)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw_w [3,3,C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw_b [C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pw_w [C,Cout]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pw_b [Cout]
        ],
        out_specs=pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, dw_w.astype(jnp.float32), dw_b.astype(jnp.float32),
      pw_w.astype(x.dtype), pw_b.astype(jnp.float32))
