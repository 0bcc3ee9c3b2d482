"""Core NHWC neural-net primitives as pure functions over parameter pytrees.

TPU-first design notes:
  * NHWC activations / HWIO weights — the native TPU conv layout; XLA tiles
    these straight onto the MXU.
  * Explicit torch-style padding (pad = (k-1)//2 both sides) rather than XLA
    "SAME": for stride-2 convs on even sizes "SAME" pads (0,1) while the
    reference pads (1,1) (reference backbone/shufflenetv2.py:110), which shifts
    every downsample window by one pixel. Matching padding keeps receptive
    fields identical so accuracy parity is a training question only.
  * BatchNorm is functional: `params` hold (scale, bias), a parallel `stats`
    tree holds (mean, var). In training, batch statistics are computed with
    jnp.mean over the (sharded) batch — under pjit/GSPMD this compiles to a
    cross-chip psum over ICI, i.e. sync-BN for free.
  * Convs accumulate in float32 (`preferred_element_type`) even when
    activations are bfloat16.

A conv+BN unit is the dict  {'w': (kh,kw,Cin/g,Cout) [, 'b': (Cout,)],
'scale': (Cout,), 'bias': (Cout,)}  with stats  {'mean': (Cout,), 'var': (Cout,)}.
`fold_bn` (yolo_nano_tpu/utils/fuse_bn.py) rewrites such units to pure
{'w','b'} at inference — the reference does this as an nn.Module surgery pass
(reference utils/fuse_conv_bn.py:25-53); here it is a pytree transform.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BN_EPS = 1e-5        # torch BatchNorm2d default, used by reference
BN_MOMENTUM = 0.1    # torch default: new = (1-m)*old + m*batch


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def _kaiming_uniform(key, shape, fan_in):
    """He-uniform with a=sqrt(5) as in torch's default Conv2d init."""
    gain = math.sqrt(2.0 / (1 + 5.0))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_conv(key, kh: int, kw: int, cin: int, cout: int, groups: int = 1,
              bias: bool = False, std: Optional[float] = None):
    """Init a conv weight (HWIO, I = cin/groups).

    std=None → torch-default kaiming-uniform; std=float → normal(0, std)
    (the reference backbone uses normal(0, 1/fan_in),
    reference backbone/shufflenetv2.py:138).
    """
    wkey, bkey = jax.random.split(key)
    shape = (kh, kw, cin // groups, cout)
    fan_in = kh * kw * (cin // groups)
    if std is None:
        w = _kaiming_uniform(wkey, shape, fan_in)
    else:
        w = std * jax.random.normal(wkey, shape, jnp.float32)
    p = {"w": w}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(bkey, (cout,), jnp.float32, -bound, bound)
    return p


def init_bn(cout: int, bias_init: float = 1e-4):
    """BN params + stats: scale=1, mean=0, var=1. bias_init defaults to the
    reference backbone's custom scheme (1e-4, backbone/shufflenetv2.py:141-145);
    neck/head Conv blocks pass 0.0 (torch BatchNorm2d default — the reference's
    _initialize_weights only walks backbone modules)."""
    params = {"scale": jnp.ones((cout,), jnp.float32),
              "bias": jnp.full((cout,), bias_init, jnp.float32)}
    stats = {"mean": jnp.zeros((cout,), jnp.float32),
             "var": jnp.ones((cout,), jnp.float32)}
    return params, stats


def init_conv_bn(key, kh, kw, cin, cout, groups: int = 1,
                 std: Optional[float] = None):
    """Conv(bias=False) + BN unit."""
    p = init_conv(key, kh, kw, cin, cout, groups=groups, bias=False, std=std)
    bn_p, bn_s = init_bn(cout)
    p.update(bn_p)
    return p, bn_s


# ---------------------------------------------------------------------------
# forward primitives
# ---------------------------------------------------------------------------

def conv2d(x, w, *, stride: int = 1, padding: Optional[int] = None,
           groups: int = 1, dilation: int = 1):
    """NHWC conv with torch-style symmetric padding (default (k-1)//2·dilation)."""
    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        padding = ((kh - 1) // 2) * dilation
    # NOTE: no preferred_element_type — the TPU MXU accumulates bf16 convs in
    # f32 natively, and requesting an f32 output breaks the conv transpose
    # rule under bf16 activations (mixed-dtype cotangent).
    return lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def leaky_relu(x, negative_slope: float = 0.1):
    return jnp.where(x >= 0, x, negative_slope * x)


def _activate(x, act: Optional[str]):
    if act is None:
        return x
    if act == "relu":
        return jnp.maximum(x, 0)
    if act == "leaky":
        # reference utils/modules.py:14 LeakyReLU(0.1)
        return leaky_relu(x, 0.1)
    raise ValueError(f"unknown activation {act!r}")


def _batch_norm(x, p, stats, train: bool):
    """Returns (y, new_stats). Stats math matches torch: normalize with biased
    batch var, update running var with the unbiased estimate."""
    if not train:
        mean, var = stats["mean"], stats["var"]
        inv = lax.rsqrt(var + BN_EPS) * p["scale"]
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) \
            + p["bias"].astype(x.dtype)
        return y, stats
    xf = x.astype(jnp.float32)
    # global mean over (N,H,W): with N sharded over the mesh this lowers to a
    # psum over ICI — sync-BN across the data-parallel group.
    mean = jnp.mean(xf, axis=(0, 1, 2))
    # two-pass variance: the one-pass E[x²]−E[x]² form cancels catastrophically
    # in f32 (a channel with |mean|/σ ≳ 2^12 goes negative → rsqrt NaN)
    var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
    n = x.shape[0] * x.shape[1] * x.shape[2]
    unbiased = var * (n / max(n - 1, 1))
    new_stats = {
        "mean": (1 - BN_MOMENTUM) * stats["mean"] + BN_MOMENTUM * mean,
        "var": (1 - BN_MOMENTUM) * stats["var"] + BN_MOMENTUM * unbiased,
    }
    inv = lax.rsqrt(var + BN_EPS) * p["scale"]
    y = (xf - mean) * inv + p["bias"]
    return y.astype(x.dtype), new_stats


def conv_bn(x, p, stats, *, stride: int = 1, groups: int = 1,
            act: Optional[str] = None, train: bool = False,
            padding: Optional[int] = None):
    """Conv → (BN if present in `p`) → activation.

    Works on both unfolded units ({'w','scale','bias'} + stats) and folded
    inference units ({'w','b'}, stats=None): one code path for train and for
    the BN-folded serving graph.
    """
    y = conv2d(x, p["w"], stride=stride, padding=padding, groups=groups)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    if "scale" in p:
        y, stats = _batch_norm(y, p, stats, train)
    return _activate(y, act), stats


def max_pool_3x3_s2(x):
    """3×3 stride-2 max-pool, pad 1 (reference backbone/shufflenetv2.py:116).

    Init must be exactly -inf (the max identity) — JAX's reduce_window-max
    autodiff rule only recognizes the identity init, and -inf is representable
    in bf16, so this differentiates under bf16 activations too."""
    return lax.reduce_window(
        x, -jnp.inf,
        lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def channel_shuffle(x, groups: int):
    """ShuffleNet channel shuffle on NHWC (reference backbone/shufflenetv2.py:14-28).

    Pure reshape+transpose — XLA folds it into the surrounding convs' layouts.
    Channel mapping matches torch's NCHW view(g, C/g).transpose:
    out[..., j*g + i] = in[..., i*(C/g) + j].
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


def upsample2x_nearest(x):
    """Nearest 2× upsample = repeat each pixel 2×2 (torch F.interpolate
    scale_factor=2 nearest, reference models/yolo_nano.py:291-292)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def downsample2x_nearest(x):
    """Nearest 0.5× downsample = take every other pixel (torch nearest picks
    in[2i], reference models/yolo_nano.py:295-296)."""
    return x[:, ::2, ::2, :]


# ---------------------------------------------------------------------------
# host-side helpers
# ---------------------------------------------------------------------------

def count_params(tree) -> int:
    return int(sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(tree)))
