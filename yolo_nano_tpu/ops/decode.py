"""Grid/anchor construction and box decoding.

The reference caches grid tensors as module state and mutates them on
resolution change (`set_grid`, reference models/yolo_nano.py:86-117). Here the
grids are *trace-time constants*: `make_grids(cfg, input_size)` is pure numpy
evaluated while tracing, so each (resolution, batch) bucket compiles to an XLA
graph with the constants baked in — no device-side state, no host sync.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from yolo_nano_tpu.config import YoloNanoConfig


class Grids(NamedTuple):
    """Flattened multi-level grid constants (HW-major, level-concatenated).

    grid_xy:   (ΣHW, 1, 2) float32 — cell top-left indices (x, y)
    stride:    (ΣHW, 1, 1) float32 — stride of the level each cell belongs to
    anchor_wh: (ΣHW, A, 2) float32 — anchor sizes in pixels

    Matches reference create_grid (models/yolo_nano.py:86-112).
    """

    grid_xy: np.ndarray
    stride: np.ndarray
    anchor_wh: np.ndarray


def make_grids(cfg: YoloNanoConfig, input_size: int) -> Grids:
    anchors = np.asarray(cfg.anchors, np.float32).reshape(
        len(cfg.strides), cfg.num_anchors_per_level, 2)
    gxy, gs, gwh = [], [], []
    for li, s in enumerate(cfg.strides):
        hs = ws = input_size // s
        ys, xs = np.meshgrid(np.arange(hs), np.arange(ws), indexing="ij")
        xy = np.stack([xs, ys], -1).reshape(hs * ws, 1, 2).astype(np.float32)
        gxy.append(xy)
        gs.append(np.full((hs * ws, 1, 1), s, np.float32))
        gwh.append(np.broadcast_to(anchors[li], (hs * ws,
                                                 cfg.num_anchors_per_level, 2)))
    return Grids(np.concatenate(gxy, 0), np.concatenate(gs, 0),
                 np.concatenate(gwh, 0))


def decode_xywh(txtytwth, grids: Grids):
    """[B, ΣHW, A, 4] (tx,ty,tw,th) → [B, ΣHW·A, 4] (cx,cy,w,h) in pixels.

    cxcy = (sigmoid(txty) + grid) · stride;  wh = exp(twth) · anchor
    (reference models/yolo_nano.py:120-136 — the code uses plain sigmoid, the
    stale comment at :127 notwithstanding).
    """
    import jax

    b, hw, a, _ = txtytwth.shape
    # jax.nn.sigmoid (not a hand-rolled 1/(1+exp(-x))): the library version
    # has a safe custom JVP — the naive form produces NaN gradients for
    # logits below ~-88 and would poison training through the IoU loss
    xy = (jax.nn.sigmoid(txtytwth[..., :2]) + grids.grid_xy) * grids.stride
    wh = jnp.exp(txtytwth[..., 2:]) * grids.anchor_wh
    return jnp.concatenate([xy, wh], -1).reshape(b, hw * a, 4)


def decode_boxes(txtytwth, grids: Grids):
    """[B, ΣHW, A, 4] → [B, ΣHW·A, 4] corner boxes (x1,y1,x2,y2) in pixels
    (reference models/yolo_nano.py:139-156)."""
    xywh = decode_xywh(txtytwth, grids)
    half = xywh[..., 2:] / 2
    return jnp.concatenate([xywh[..., :2] - half, xywh[..., :2] + half], -1)


def decode_boxes_gathered(txtytwth_k, idx, cfg: YoloNanoConfig,
                          input_size: int):
    """Decode only selected candidates: bit-identical to `decode_boxes(...)`
    gathered at flat indices, ~20× less decode work at a 512-of-10,647 NMS
    budget (decode after top-k instead of before).

    The per-candidate grid values (cell x/y, stride, anchor) are computed
    ARITHMETICALLY from the flat index — TPU gathers from the Grids tables
    measure slower than decoding everything, but the grid layout is pure
    integer structure: level by boundary compare, cell x/y by div/mod, and
    the 9-row anchor table via a one-hot matmul.

    txtytwth_k [B, K, 4] — raw head outputs already gathered at `idx`;
    idx [B, K] int — flat candidate index n = cell·A + anchor (HW-major,
    level-concatenated — the forward_features layout).
    Returns [B, K, 4] corner boxes in pixels.
    """
    import jax

    a = cfg.num_anchors_per_level
    cell = idx // a
    anchor = idx % a
    widths = [input_size // s for s in cfg.strides]
    offsets = np.cumsum([0] + [w * w for w in widths])

    level = jnp.zeros_like(cell)
    for li in range(1, len(widths)):
        level = jnp.where(cell >= offsets[li], li, level)

    def select_by_level(values, dtype):
        out = jnp.full_like(level, values[-1]).astype(dtype)
        for li in range(len(values) - 2, -1, -1):
            out = jnp.where(level == li, dtype(values[li]), out)
        return out

    stride = select_by_level(cfg.strides, jnp.float32)[..., None]
    w_l = select_by_level(widths, jnp.int32)
    c_in = cell - select_by_level(offsets[:-1], jnp.int32)
    gxy = jnp.stack([(c_in % w_l), (c_in // w_l)],
                    -1).astype(jnp.float32)                  # (x, y)
    # anchor (w, h) by select chain over the L·A-row table — bit-exact,
    # unlike a one-hot matmul (TPU f32 matmul precision) or a gather (slow)
    anchors = np.asarray(cfg.anchors, np.float32)            # [L·A, 2]
    flat = level * a + anchor
    awh = jnp.full(flat.shape + (2,), anchors[-1])
    for ai in range(anchors.shape[0] - 2, -1, -1):
        awh = jnp.where((flat == ai)[..., None], anchors[ai], awh)

    xy = (jax.nn.sigmoid(txtytwth_k[..., :2]) + gxy) * stride
    wh = jnp.exp(txtytwth_k[..., 2:]) * awh
    half = wh / 2
    return jnp.concatenate([xy - half, xy + half], -1)
