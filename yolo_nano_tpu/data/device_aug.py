"""In-graph (on-device) training augmentation: the full SSD chain as batched
XLA ops inside the jitted train step.

Motivation (DESIGN §8): the device consumes 289–460 img/s/chip while the
host augmentation chain delivers ~30 img/s/core — on small hosts training is
host-bound. The torch reference cannot move augmentation off the host (its
chain is cv2/numpy per image, reference data/transforms.py:402-420); here the
same chain — photometric distort, min-IoU SSD crop, mirror, letterbox,
normalize — is re-designed as fixed-shape batched tensor ops, so host workers
only decode + letterbox to a fixed base canvas and ship **uint8** (4× less
host→device traffic than f32). Augmentation then costs device-side elementwise
work that is negligible next to the conv stack.

Distribution parity with the host chain (data/transforms.py):
  * photometric: identical op order, coin flips and factor ranges
    (brightness ±32 p=.5; contrast ×U(.5,1.5) p=.5 before/after HSV with a
    p=.5 order coin; saturation ×U(.5,1.5) p=.5; hue ±18° p=.5 — reference
    transforms.py:144-226,369-391). HSV round trip matches cv2's float32
    full-range convention (H∈[0,360), S∈[0,1], V∈[0,255]); like the
    reference, values are NOT clipped back to [0,255].
  * SSD crop: rects are sampled inside the *image region* of the base
    canvas. The letterbox is an aspect-preserving uniform scale, so uniform
    sampling in region coordinates is distribution-identical to the
    reference's sampling in native pixels, and IoUs/aspect ratios are
    invariant under the map. The accept condition is the reference's
    byte-for-byte (`overlap.min() < min_iou and max_iou < overlap.max()` →
    reject; ≥1 box center strictly inside; h/w ∈ (0.5, 2)); the unbounded
    retry loop becomes a fixed R×T candidate grid scanned in order
    (R=16 mode rounds × T=32 trials). Identity-exit tails differ: the
    reference loop's ONLY identity exit is drawing mode None — it retries
    crop modes forever (reference transforms.py:256 `while True`) — whereas
    ours additionally falls back to identity when all R×T candidates are
    rejected, probability ≤(5/6)^16≈5%, reached only on images where
    nearly every crop is rejected (crowded scenes — pinned by the
    crowded-gt distribution test in tests/test_device_aug.py).
  * known deviations (documented, all sub-pixel or resampling-level): crop
    rect coords are float (host truncates to int pixels); the output
    letterbox centers with float precision (host uses integer //2); pixels
    pass through TWO bilinear resamples (native→base canvas on host,
    canvas→output on device) where the host chain has one.

Everything is fixed-shape: images [B,S0,S0,3] uint8 BGR in, [B,S,S,3]
compute-dtype RGB out; boxes stay [B,M,4] with label −1 marking dropped
rows. RNG is `jax.random` keyed per (step, item).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# BGR-ordered, matching data/transforms.py:31-32 (reference transforms.py:403)
_MEAN = (0.406, 0.456, 0.485)
_STD = (0.225, 0.224, 0.229)

# SSD crop modes (reference transforms.py:244-253): min_iou per mode; mode 0
# is the no-crop exit; max_iou is +inf for every mode the reference ships.
_MODE_MIN_IOU = (-jnp.inf, 0.1, 0.3, 0.7, 0.9, -jnp.inf)
_MODE_MAX_IOU = (jnp.inf,) * 6


# ---------------------------------------------------------------------------
# HSV round trip — cv2 float32 full-range convention
# ---------------------------------------------------------------------------

def bgr_to_hsv(img):
    """[..., 3] float BGR (0..255) → HSV with H∈[0,360), S∈[0,1], V∈[0,255]
    (cv2.cvtColor float32 convention)."""
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        v == r, 60.0 * (g - b) / safe_c,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe_c,
                  240.0 + 60.0 * (r - g) / safe_c))
    h = jnp.where(c > 0, h, 0.0)
    h = jnp.where(h < 0, h + 360.0, h)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_bgr(hsv):
    """Inverse of bgr_to_hsv; defined (like cv2) for S outside [0,1] — the
    saturation jitter can push S to 1.5 and the reference never clips."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    hp = h / 60.0
    i = jnp.floor(hp).astype(jnp.int32) % 6
    f = hp - jnp.floor(hp)
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    # sector table: r,g,b per i ∈ 0..5
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([b, g, r], axis=-1)


# ---------------------------------------------------------------------------
# photometric distort (reference transforms.py:369-391)
# ---------------------------------------------------------------------------

def photometric_distort(img, d):
    """img: [S0,S0,3] f32 BGR 0..255. d: this item's draw dict (see
    sample_draws). Brightness, then contrast either before or after the HSV
    saturation/hue pair — exactly the host chain's coin structure."""
    img = img + jnp.where(d["bri_coin"], d["bri_delta"], 0.0)

    def contrast(x):
        return x * jnp.where(d["con_coin"], d["con_f"], 1.0)

    img = jnp.where(d["order_coin"], contrast(img), img)
    hsv = bgr_to_hsv(img)
    s = hsv[..., 1] * jnp.where(d["sat_coin"], d["sat_f"], 1.0)
    h = hsv[..., 0] + jnp.where(d["hue_coin"], d["hue_delta"], 0.0)
    h = jnp.where(h > 360.0, h - 360.0, h)
    h = jnp.where(h < 0.0, h + 360.0, h)
    img = hsv_to_bgr(jnp.stack([h, s, hsv[..., 2]], axis=-1))
    img = jnp.where(d["order_coin"], img, contrast(img))
    return img


# ---------------------------------------------------------------------------
# SSD min-IoU crop sampling (reference transforms.py:228-330)
# ---------------------------------------------------------------------------

def sample_crop(d, boxes, labels, region, base_size):
    """Pick the crop rect for one item.

    d: draw dict with fields mode [R] int, u_w/u_h/u_l/u_t [R,T] uniforms.
    boxes [M,4] normalized canvas coords, labels [M] (−1 pad), region [4]
    normalized (the canvas area covered by real image). Returns
    (rect [4] canvas-normalized, identity bool): identity means "no crop" —
    the caller letterboxes the full region.
    """
    valid = labels >= 0                                     # [M]
    rw = region[2] - region[0]
    rh = region[3] - region[1]
    # candidate rects, normalized canvas coords ([R,T])
    w = (0.3 + 0.7 * d["u_w"]) * rw
    h = (0.3 + 0.7 * d["u_h"]) * rh
    left = region[0] + d["u_l"] * (rw - w)
    top = region[1] + d["u_t"] * (rh - h)
    rect = jnp.stack([left, top, left + w, top + h], axis=-1)   # [R,T,4]
    # aspect in native pixels == aspect in canvas pixels (uniform scale)
    ratio = (h * base_size) / (w * base_size)
    aspect_ok = (ratio >= 0.5) & (ratio <= 2.0)
    # IoU of every valid box against every candidate
    bx = boxes[None, None]                                   # [1,1,M,4]
    rc = rect[:, :, None]                                    # [R,T,1,4]
    tl = jnp.maximum(bx[..., :2], rc[..., :2])
    br = jnp.minimum(bx[..., 2:], rc[..., 2:])
    inter = jnp.prod(jnp.clip(br - tl, 0.0, None), axis=-1)  # [R,T,M]
    area_b = jnp.prod(bx[..., 2:] - bx[..., :2], axis=-1)
    area_r = jnp.prod(rc[..., 2:] - rc[..., :2], axis=-1)
    union = area_b + area_r - inter
    iou = inter / jnp.where(union > 0, union, 1.0)
    omin = jnp.min(jnp.where(valid[None, None], iou, jnp.inf), axis=-1)
    omax = jnp.max(jnp.where(valid[None, None], iou, -jnp.inf), axis=-1)
    min_iou = jnp.asarray(_MODE_MIN_IOU)[d["mode"]][:, None]  # [R,1]
    max_iou = jnp.asarray(_MODE_MAX_IOU)[d["mode"]][:, None]
    # reference accept condition verbatim (transforms.py:290): reject iff
    # overlap.min() < min_iou AND max_iou < overlap.max(). max_iou = +inf
    # for every shipped mode, so with the reference's modes IoU never
    # rejects (the SSD-legacy `and`-for-`or` quirk the host chain also
    # keeps, data/transforms.py:18-20) — the table form stays live for
    # custom modes with finite max_iou.
    iou_ok = ~((omin < min_iou) & (omax > max_iou))
    # ≥1 valid box center strictly inside
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    cin = ((rect[:, :, None, 0] < cx) & (rect[:, :, None, 1] < cy)
           & (rect[:, :, None, 2] > cx) & (rect[:, :, None, 3] > cy))
    center_ok = jnp.any(cin & valid[None, None], axis=-1)    # [R,T]
    ok = aspect_ok & iou_ok & center_ok & (d["mode"] != 0)[:, None]
    # first terminating round: mode-0 exit or any accepted trial
    round_exit = d["mode"] == 0
    round_hit = jnp.any(ok, axis=-1)
    term = round_exit | round_hit                            # [R]
    any_term = jnp.any(term)
    r_star = jnp.argmax(term)
    exit_identity = round_exit[r_star] | ~any_term | (jnp.sum(valid) == 0)
    t_star = jnp.argmax(ok[r_star])
    chosen = rect[r_star, t_star]
    return jnp.where(exit_identity, region, chosen), exit_identity


# ---------------------------------------------------------------------------
# letterbox affine: crop rect of the base canvas → out_size square
# ---------------------------------------------------------------------------

def _letterbox_params(rect, base_size, out_size):
    """rect [4] canvas-normalized → (scale [2] yx, translation [2] yx,
    bounds [4] = output-pixel rect covered by image). Matches host
    resize_letterbox geometry (aspect-preserving, centered, mean pad) with
    float centering."""
    cw = (rect[2] - rect[0]) * base_size
    ch = (rect[3] - rect[1]) * base_size
    s = out_size / jnp.maximum(cw, ch)
    ow = s * cw
    oh = s * ch
    ox0 = (out_size - ow) * 0.5
    oy0 = (out_size - oh) * 0.5
    # scale_and_translate convention (verified vs cv2.resize):
    # x_in = (x_out + 0.5 - t) / s − 0.5  ⇒  t = ox0 − s·x0
    tx = ox0 - s * rect[0] * base_size
    ty = oy0 - s * rect[1] * base_size
    return (jnp.stack([s, s]), jnp.stack([ty, tx]),
            jnp.stack([ox0, oy0, ox0 + ow, oy0 + oh]))


def crop_letterbox_image(img, rect, out_size, pad_bgr):
    """img [S0,S0,3] f32 → [S,S,3] f32: the rect region letterboxed into the
    output square, mean-filled outside."""
    base_size = img.shape[0]
    scale, trans, bounds = _letterbox_params(rect, base_size, out_size)
    out = jax.image.scale_and_translate(
        img, (out_size, out_size, img.shape[2]), (0, 1), scale, trans,
        "linear", antialias=False)
    xs = jnp.arange(out_size, dtype=jnp.float32) + 0.5
    inside = ((xs[None, :] > bounds[0]) & (xs[None, :] < bounds[2])
              & (xs[:, None] > bounds[1]) & (xs[:, None] < bounds[3]))
    return jnp.where(inside[..., None], out, pad_bgr)


def crop_letterbox_boxes(boxes, labels, rect, identity):
    """Map normalized canvas boxes through the crop+letterbox; drop (label→−1)
    boxes whose center is outside the crop (host rule; identity keeps all).
    Output coords are normalized to the output square, so the mapping is
    x' = x·sc + t with sc = 1/max(rect_w, rect_h) and t centering the crop —
    the box-space twin of _letterbox_params."""
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    cin = ((rect[0] < cx) & (rect[1] < cy) & (rect[2] > cx) & (rect[3] > cy))
    keep = (labels >= 0) & (identity | cin)
    clipped = jnp.concatenate([
        jnp.maximum(boxes[:, :2], rect[:2]), jnp.minimum(boxes[:, 2:],
                                                         rect[2:])], axis=1)
    rw = rect[2] - rect[0]
    rh = rect[3] - rect[1]
    sc = 1.0 / jnp.maximum(rw, rh)
    t = jnp.stack([(1.0 - rw * sc) * 0.5 - rect[0] * sc,
                   (1.0 - rh * sc) * 0.5 - rect[1] * sc])
    mapped = clipped * sc + jnp.concatenate([t, t])
    new_boxes = jnp.where(keep[:, None], mapped, 0.0)
    new_labels = jnp.where(keep, labels, -1)
    return new_boxes.astype(boxes.dtype), new_labels


# ---------------------------------------------------------------------------
# in-graph 4-tile mosaic (reference data/voc.py:140-211) from base canvases
# ---------------------------------------------------------------------------

def compose_mosaic(idx, d, images_u8, boxes, labels, regions, out_size: int,
                   pad_bgr):
    """Compose one mosaic for batch item `idx` entirely on device.

    The reference builds a 2S×2S canvas from 4 native images scaled by
    r = S/max(h,w), then resizes it to S (ColorTransforms). Here each tile
    is drawn from ANOTHER ROW of the current batch: the cached letterboxed
    canvas already holds the image at scale S0/max(h,w) inside its region
    rect, so the tile's mosaic footprint is exactly half the region rect —
    each tile maps canvas-region → out with a constant 0.5 relative scale,
    one affine resample per tile, composed directly at out_size (the 2S
    canvas ≡ the unit square of the output).

    Documented deviations from the host path (A/B'd in PARITY.md):
      * tiles are the item plus 3 distinct random rows of the shuffled
        batch, not 3 draws from the whole dataset (marginally uniform over
        the dataset across epochs; in-batch mosaic);
      * float sub-pixel geometry (host truncates center/tile sizes to int);
      * ONE resample canvas→out instead of the host's native→2S→S0→out two
        (fewer, not more, interpolation passes than the reference).

    Returns (image [S,S,3] f32 BGR, boxes [M,4], labels [M]) — the merged
    gt of all 4 tiles, clipped to the canvas (reference voc.py:207-209),
    compacted valid-first into the item's M slots.
    """
    batch, m = labels.shape
    base_size = images_u8.shape[1]
    tiles = jnp.concatenate([idx[None], (idx + 1 + d["mos_tiles"]) % batch])
    # mosaic center: U(S/2, 3S/2) on the 2S canvas → U(0.25, 0.75) normalized
    # (reference voc.py:158)
    cx = 0.25 + 0.5 * d["mos_cx"]
    cy = 0.25 + 0.5 * d["mos_cy"]

    s = out_size / (2.0 * base_size)  # constant: half the region scale
    img_out = jnp.broadcast_to(pad_bgr, (out_size, out_size, 3))
    out_boxes, out_labels = [], []
    xs = jnp.arange(out_size, dtype=jnp.float32) + 0.5
    for t in range(4):
        ti = tiles[t]
        reg = regions[ti, :4]
        tw = (reg[2] - reg[0]) * 0.5  # tile footprint, out-normalized
        th = (reg[3] - reg[1]) * 0.5
        # unclipped destination rect per quadrant (reference voc.py:39-54
        # here == mosaic.py:39-54): anchored at the center point
        dx0 = cx - tw if t in (0, 2) else cx
        dy0 = cy - th if t in (0, 1) else cy
        rect = jnp.stack([dx0, dy0, dx0 + tw, dy0 + th])
        # scale_and_translate: x_in = (x_out + 0.5 - t)/s − 0.5 with
        # t = S·(d0 − reg0/2) (derived from region→dest affine, both axes)
        trans = jnp.stack([out_size * (dy0 - reg[1] * 0.5),
                           out_size * (dx0 - reg[0] * 0.5)])
        tile = jax.image.scale_and_translate(
            images_u8[ti].astype(jnp.float32),
            (out_size, out_size, 3), (0, 1), jnp.stack([s, s]), trans,
            "linear", antialias=False)
        inside = ((xs[None, :] > rect[0] * out_size)
                  & (xs[None, :] < rect[2] * out_size)
                  & (xs[:, None] > rect[1] * out_size)
                  & (xs[:, None] < rect[3] * out_size))
        img_out = jnp.where(inside[..., None], tile, img_out)
        # boxes: canvas-normalized → out-normalized through the same affine
        bx = boxes[ti]
        mapped = jnp.concatenate(
            [(bx[:, 0:1] - reg[0]) * 0.5 + dx0,
             (bx[:, 1:2] - reg[1]) * 0.5 + dy0,
             (bx[:, 2:3] - reg[0]) * 0.5 + dx0,
             (bx[:, 3:4] - reg[1]) * 0.5 + dy0], axis=1)
        out_boxes.append(jnp.clip(mapped, 0.0, 1.0))  # voc.py:207-209
        out_labels.append(labels[ti])
    all_bx = jnp.concatenate(out_boxes, 0)            # [4M, 4]
    all_lb = jnp.concatenate(out_labels, 0)           # [4M]
    order = jnp.argsort(all_lb < 0, stable=True)      # valid rows first
    keep = order[:m]
    return img_out, all_bx[keep], all_lb[keep]


# ---------------------------------------------------------------------------
# draws + the batched pipeline
# ---------------------------------------------------------------------------

def sample_draws(key, batch: int, rounds: int = 16, trials: int = 32,
                 mosaic: bool = False):
    """All randomness for one batch, as a dict of arrays with leading dim B.
    Separated from apply_augment so tests can inject handcrafted draws.
    With mosaic=True, adds the mosaic coin (p=0.5, reference voc.py:216),
    the 3 distinct other-row tile offsets, and the mosaic center."""
    ks = jax.random.split(key, 19 if mosaic else 15)
    u = functools.partial(jax.random.uniform, shape=(batch,))
    coin = lambda k: jax.random.bernoulli(k, 0.5, (batch,))  # noqa: E731
    draws = {
        "bri_coin": coin(ks[0]),
        "bri_delta": u(ks[1], minval=-32.0, maxval=32.0),
        "order_coin": coin(ks[2]),
        "con_coin": coin(ks[3]),
        "con_f": u(ks[4], minval=0.5, maxval=1.5),
        "sat_coin": coin(ks[5]),
        "sat_f": u(ks[6], minval=0.5, maxval=1.5),
        "hue_coin": coin(ks[7]),
        "hue_delta": u(ks[8], minval=-18.0, maxval=18.0),
        "mode": jax.random.randint(ks[9], (batch, rounds), 0, 6),
        "u_w": jax.random.uniform(ks[10], (batch, rounds, trials)),
        "u_h": jax.random.uniform(ks[11], (batch, rounds, trials)),
        "u_l": jax.random.uniform(ks[12], (batch, rounds, trials)),
        "u_t": jax.random.uniform(ks[13], (batch, rounds, trials)),
        "mirror": coin(ks[14]),
    }
    if mosaic:
        # 3 distinct offsets into the other batch-1 rows: j = (i+1+off) % B
        if batch >= 4:
            tiles = jax.vmap(lambda k: jax.random.choice(
                k, batch - 1, (3,), replace=False))(
                jax.random.split(ks[16], batch))
        else:  # degenerate tiny batches (tests/dryruns): allow repeats
            tiles = jax.random.randint(ks[16], (batch, 3), 0,
                                       max(batch - 1, 1))
        draws.update({
            "mos_coin": coin(ks[15]),
            "mos_tiles": tiles,
            "mos_cx": u(ks[17]),
            "mos_cy": u(ks[18]),
        })
    return draws


def apply_augment(images_u8, boxes, labels, regions, draws, out_size: int,
                  out_dtype=jnp.float32, mosaic: bool = False):
    """The pure batched pipeline (all randomness pre-drawn).

    images_u8 [B,S0,S0,3] uint8 BGR base canvases; boxes [B,M,4] normalized
    canvas coords; labels [B,M] int32 (−1 pad); regions [B,5] = normalized
    image-region rect + crop_allowed flag (0 disables the SSD crop).
    Returns (images [B,S,S,3] out_dtype RGB normalized, boxes [B,M,4],
    labels [B,M]).

    mosaic=True (draws from sample_draws(..., mosaic=True)): with p=0.5 per
    item the output is instead a 4-tile in-graph mosaic (compose_mosaic)
    followed by the crop-free color chain — photometric, mirror, normalize —
    exactly the reference's mosaic branch structure (ColorTransforms,
    data/voc.py:216-222) with the composition itself moved on device.
    """
    if regions.ndim != 2 or regions.shape[-1] != 5:
        raise ValueError(
            f"regions must be [B,5] (rect + crop_allowed flag, the loader's "
            f"device-mode contract), got {regions.shape}")
    base_size = images_u8.shape[1]
    pad_bgr = jnp.asarray(_MEAN, jnp.float32) * 255.0

    def one(i, d):
        img_u8, bx, lb, reg = images_u8[i], boxes[i], labels[i], regions[i]
        img = photometric_distort(img_u8.astype(jnp.float32), d)
        rect, identity = sample_crop(d, bx, lb, reg[:4], base_size)
        identity = identity | (reg[4] == 0)
        rect = jnp.where(reg[4] == 0, reg[:4], rect)
        out = crop_letterbox_image(img, rect, out_size, pad_bgr)
        nb, nl = crop_letterbox_boxes(bx, lb, rect, identity)
        if mosaic:
            m_img, m_bx, m_lb = compose_mosaic(
                i, d, images_u8, boxes, labels, regions, out_size, pad_bgr)
            # one photometric draw on the COMPOSED image, like the
            # reference's single ColorTransforms pass over the 2S canvas
            m_img = photometric_distort(m_img, d)
            use = d["mos_coin"]
            out = jnp.where(use, m_img, out)
            nb = jnp.where(use, m_bx, nb)
            nl = jnp.where(use, m_lb, nl)
        # mirror (reference transforms.py:333-340)
        out = jnp.where(d["mirror"], out[:, ::-1], out)
        flipped = jnp.concatenate(
            [1.0 - nb[:, 2:3], nb[:, 1:2], 1.0 - nb[:, 0:1], nb[:, 3:4]],
            axis=1)
        nb = jnp.where(d["mirror"], jnp.where((nl >= 0)[:, None], flipped,
                                              0.0), nb)
        return out, nb, nl

    imgs, nboxes, nlabels = jax.vmap(one)(
        jnp.arange(images_u8.shape[0]), draws)
    # normalize in BGR then flip to RGB (host _normalize_to_rgb,
    # reference transforms.py:59-70,394-398)
    mean = jnp.asarray(_MEAN, jnp.float32)
    std = jnp.asarray(_STD, jnp.float32)
    imgs = (imgs / 255.0 - mean) / std
    imgs = imgs[..., ::-1]
    return imgs.astype(out_dtype), nboxes, nlabels


def make_augment_fn(out_size: int, rounds: int = 16, trials: int = 32,
                    out_dtype=jnp.float32, mosaic: bool = False):
    """→ augment(images_u8, boxes, labels, regions, key) for composition into
    the train step (train.train_step.make_train_step(augment=...)).
    mosaic=True folds the 4-tile mosaic into the graph too (compose_mosaic):
    the host then always ships plain per-index canvases — the canvas cache
    stays fully effective with mosaic on."""

    def augment(images_u8, boxes, labels, regions, key):
        draws = sample_draws(key, images_u8.shape[0], rounds, trials,
                             mosaic=mosaic)
        return apply_augment(images_u8, boxes, labels, regions, draws,
                             out_size, out_dtype, mosaic=mosaic)

    return augment
