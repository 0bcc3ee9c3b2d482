"""ShuffleNetV2 backbone, functional NHWC/JAX.

Capabilities match reference backbone/shufflenetv2.py: sizes 0.5x/1.0x/1.5x/2.0x
(channel tables :95-102), stem 3×3/s2 conv-BN-ReLU (:109-113) + 3×3/s2 maxpool
(:116), stages 2/3/4 with repeats (4,8,4) (:90), returning the stage-2/3/4
feature maps (strides 8/16/32) for the detection neck (:157-167).

Weight init follows the reference scheme (backbone/shufflenetv2.py:131-154):
conv weights ~ N(0, 1/(cin/groups)), BN scale 1 / bias 1e-4.

Params are nested dicts (pytrees); a structurally parallel `stats` tree carries
BatchNorm running statistics. All applies are pure: (params, stats, x, train)
→ (features, new_stats).
"""

from __future__ import annotations

from typing import Tuple

import jax

from yolo_nano_tpu.config import SHUFFLENETV2_CHANNELS, SHUFFLENETV2_REPEATS
from yolo_nano_tpu.ops.nn import (
    channel_shuffle,
    conv_bn,
    init_conv_bn,
    max_pool_3x3_s2,
)


def _init_unit(key, kh, cin, cout, groups=1):
    """Conv-BN unit with reference init std 1/(cin/groups)
    (torch weight shape[1], backbone/shufflenetv2.py:138)."""
    return init_conv_bn(key, kh, kh, cin, cout, groups=groups,
                        std=1.0 / (cin // groups))


def _init_block(key, cin, cout, stride):
    """ShuffleV2Block params (reference backbone/shufflenetv2.py:31-63)."""
    branch = cout // 2
    keys = jax.random.split(key, 5)
    p, s = {}, {}
    if stride > 1:
        # branch1: depthwise 3×3/s → BN → 1×1 → BN → ReLU (:43-49)
        d_p, d_s = _init_unit(keys[0], 3, cin, cin, groups=cin)
        w_p, w_s = _init_unit(keys[1], 1, cin, branch)
        p["branch1"] = {"dw": d_p, "pw": w_p}
        s["branch1"] = {"dw": d_s, "pw": w_s}
        b2_in = cin
    else:
        b2_in = branch
    # branch2: 1×1 → BN → ReLU → dw3×3/s → BN → 1×1 → BN → ReLU (:53-63)
    p1_p, p1_s = _init_unit(keys[2], 1, b2_in, branch)
    d_p, d_s = _init_unit(keys[3], 3, branch, branch, groups=branch)
    p2_p, p2_s = _init_unit(keys[4], 1, branch, branch)
    p["branch2"] = {"pw1": p1_p, "dw": d_p, "pw2": p2_p}
    s["branch2"] = {"pw1": p1_s, "dw": d_s, "pw2": p2_s}
    return p, s, stride


def init_shufflenetv2(key, model_size: str = "1.0x"):
    """Returns (params, stats). Output channels of stages 2/3/4 are
    SHUFFLENETV2_CHANNELS[model_size][1:4]."""
    channels = SHUFFLENETV2_CHANNELS[model_size]
    keys = jax.random.split(key, 4)
    stem_p, stem_s = _init_unit(keys[0], 3, 3, channels[0])
    params = {"conv1": stem_p}
    stats = {"conv1": stem_s}
    cin = channels[0]
    for si, (repeats, cout) in enumerate(
            zip(SHUFFLENETV2_REPEATS, channels[1:4])):
        name = f"stage{si + 2}"
        bkeys = jax.random.split(keys[si + 1], repeats)
        blocks_p, blocks_s = [], []
        for bi in range(repeats):
            bp, bs, _ = _init_block(bkeys[bi], cin if bi == 0 else cout,
                                    cout, 2 if bi == 0 else 1)
            blocks_p.append(bp)
            blocks_s.append(bs)
        params[name] = blocks_p
        stats[name] = blocks_s
        cin = cout
    return params, stats


def _branch2(x, p, s, stride, train):
    y, s1 = conv_bn(x, p["pw1"], s["pw1"], act="relu", train=train)
    y, s2 = conv_bn(y, p["dw"], s["dw"], stride=stride,
                    groups=y.shape[-1], act=None, train=train)
    y, s3 = conv_bn(y, p["pw2"], s["pw2"], act="relu", train=train)
    return y, {"pw1": s1, "dw": s2, "pw2": s3}


def _block_apply(x, p, s, train):
    """reference backbone/shufflenetv2.py:69-78."""
    import jax.numpy as jnp

    if "branch1" not in p:  # stride 1: channel split, identity left branch
        c = x.shape[-1] // 2
        x1, x2 = x[..., :c], x[..., c:]
        y2, s2 = _branch2(x2, p["branch2"], s["branch2"], 1, train)
        out = jnp.concatenate([x1, y2], -1)
        new_s = {"branch2": s2}
    else:  # stride 2: two downsampling branches
        b1, sb1d = conv_bn(x, p["branch1"]["dw"], s["branch1"]["dw"],
                           stride=2, groups=x.shape[-1], act=None, train=train)
        b1, sb1p = conv_bn(b1, p["branch1"]["pw"], s["branch1"]["pw"],
                           act="relu", train=train)
        y2, s2 = _branch2(x, p["branch2"], s["branch2"], 2, train)
        out = jnp.concatenate([b1, y2], -1)
        new_s = {"branch1": {"dw": sb1d, "pw": sb1p}, "branch2": s2}
    return channel_shuffle(out, 2), new_s


def shufflenetv2_apply(params, stats, x, train: bool = False
                       ) -> Tuple[Tuple, dict]:
    """x: [B,H,W,3] NHWC → ((c3, c4, c5), new_stats) at strides (8, 16, 32)."""
    y, s_conv1 = conv_bn(x, params["conv1"], stats["conv1"], stride=2,
                         act="relu", train=train)
    y = max_pool_3x3_s2(y)
    new_stats = {"conv1": s_conv1}
    feats = []
    for si in (2, 3, 4):
        name = f"stage{si}"
        stage_stats = []
        for bp, bs in zip(params[name], stats[name]):
            y, ns = _block_apply(y, bp, bs, train)
            stage_stats.append(ns)
        new_stats[name] = stage_stats
        feats.append(y)
    return tuple(feats), new_stats
