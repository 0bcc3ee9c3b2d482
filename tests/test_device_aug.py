"""In-graph augmentation (data/device_aug.py) tests.

Strategy: the pipeline factors as pure-math pieces (HSV round trip, the
crop/letterbox affine, box mapping) that are pinned against cv2 / the host
numpy chain exactly, plus the random sampler whose every output must satisfy
the reference's accept constraints (transforms.py:228-330), plus end-to-end
jit/determinism/train-step integration.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from yolo_nano_tpu.data.device_aug import (
    apply_augment,
    bgr_to_hsv,
    crop_letterbox_boxes,
    crop_letterbox_image,
    hsv_to_bgr,
    make_augment_fn,
    photometric_distort,
    sample_crop,
    sample_draws,
)
from yolo_nano_tpu.data.transforms import IMAGE_MEAN, IMAGE_STD


def _no_op_draws(batch, rounds=4, trials=4, **over):
    """Draw dict that makes the pipeline the identity (mode-0 exit, no
    photometric coins, no mirror); individual fields overridable."""
    d = {
        "bri_coin": np.zeros(batch, bool),
        "bri_delta": np.zeros(batch, np.float32),
        "order_coin": np.zeros(batch, bool),
        "con_coin": np.zeros(batch, bool),
        "con_f": np.ones(batch, np.float32),
        "sat_coin": np.zeros(batch, bool),
        "sat_f": np.ones(batch, np.float32),
        "hue_coin": np.zeros(batch, bool),
        "hue_delta": np.zeros(batch, np.float32),
        "mode": np.zeros((batch, rounds), np.int32),  # mode 0 = no-crop exit
        "u_w": np.full((batch, rounds, trials), 0.5, np.float32),
        "u_h": np.full((batch, rounds, trials), 0.5, np.float32),
        "u_l": np.full((batch, rounds, trials), 0.5, np.float32),
        "u_t": np.full((batch, rounds, trials), 0.5, np.float32),
        "mirror": np.zeros(batch, bool),
    }
    d.update(over)
    return {k: jnp.asarray(v) for k, v in d.items()}


def _norm_rgb(img_bgr_u8):
    img = img_bgr_u8.astype(np.float32) / 255.0
    img = (img - IMAGE_MEAN) / IMAGE_STD
    return img[..., ::-1]


def test_hsv_matches_cv2_float_convention():
    rng = np.random.default_rng(0)
    px = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    hsv_cv = cv2.cvtColor(px, cv2.COLOR_BGR2HSV)
    np.testing.assert_allclose(np.asarray(bgr_to_hsv(jnp.asarray(px))),
                               hsv_cv, atol=1e-3)
    np.testing.assert_allclose(np.asarray(hsv_to_bgr(jnp.asarray(hsv_cv))),
                               cv2.cvtColor(hsv_cv, cv2.COLOR_HSV2BGR),
                               atol=1e-3)
    # the saturation jitter can push S past 1 — cv2 extrapolates, so must we
    hsv_s = hsv_cv.copy()
    hsv_s[..., 1] *= 1.5
    np.testing.assert_allclose(np.asarray(hsv_to_bgr(jnp.asarray(hsv_s))),
                               cv2.cvtColor(hsv_s, cv2.COLOR_HSV2BGR),
                               atol=1e-3)


def test_photometric_matches_cv2_chain():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (24, 24, 3)).astype(np.float32)
    d = {k: v[0] for k, v in _no_op_draws(1).items()}
    d.update(bri_coin=jnp.asarray(True), bri_delta=jnp.asarray(-20.0),
             con_coin=jnp.asarray(True), con_f=jnp.asarray(1.3),
             sat_coin=jnp.asarray(True), sat_f=jnp.asarray(0.7),
             hue_coin=jnp.asarray(True), hue_delta=jnp.asarray(15.0),
             order_coin=jnp.asarray(False))  # contrast AFTER the HSV pair
    got = np.asarray(photometric_distort(jnp.asarray(img), d))
    # host chain with the same factors (reference transforms.py:369-391)
    exp = img - 20.0
    hsv = cv2.cvtColor(exp, cv2.COLOR_BGR2HSV)
    hsv[:, :, 1] *= 0.7
    hsv[:, :, 0] += 15.0
    hsv[:, :, 0][hsv[:, :, 0] > 360.0] -= 360.0
    hsv[:, :, 0][hsv[:, :, 0] < 0.0] += 360.0
    exp = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR) * 1.3
    np.testing.assert_allclose(got, exp, atol=1e-2)


def test_identity_draws_reproduce_val_normalization():
    rng = np.random.default_rng(2)
    size = 32
    img = rng.integers(0, 255, (2, size, size, 3), dtype=np.uint8)
    boxes = np.tile(np.asarray([[0.2, 0.3, 0.6, 0.7]], np.float32), (2, 1, 1))
    labels = np.ones((2, 1), np.int32)
    regions = np.tile(np.asarray([0, 0, 1, 1, 1], np.float32), (2, 1))
    out, ob, ol = apply_augment(jnp.asarray(img), jnp.asarray(boxes),
                                jnp.asarray(labels), jnp.asarray(regions),
                                _no_op_draws(2), out_size=size)
    np.testing.assert_allclose(np.asarray(out), _norm_rgb(img), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ob), boxes, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ol), labels)


def test_crop_letterbox_matches_host_oracle():
    """A handcrafted int-aligned crop: device affine output == cv2 crop +
    host resize_letterbox (interior pixels; the ≤1-px border ring differs by
    design — scale_and_translate samples real neighbors where cv2 clamps)."""
    from yolo_nano_tpu.data.transforms import resize_letterbox

    rng = np.random.default_rng(3)
    base, out_size = 64, 48
    img = rng.uniform(0, 255, (base, base, 3)).astype(np.float32)
    x0, y0, x1, y1 = 8, 16, 56, 40  # 48×24 crop, aspect 0.5 (legal)
    rect = jnp.asarray([x0 / base, y0 / base, x1 / base, y1 / base])
    pad = jnp.asarray(IMAGE_MEAN, jnp.float32) * 255.0
    got = np.asarray(crop_letterbox_image(jnp.asarray(img), rect, out_size,
                                          pad))
    exp, _, _, _ = resize_letterbox(img[y0:y1, x0:x1], out_size)
    # image-covered rows: crop is 48 wide × 24 high → letterboxed to 48×24
    # centered vertically at rows 12..36
    inner = (slice(14, 34), slice(2, 46))
    np.testing.assert_allclose(got[inner], exp[inner], atol=0.51)
    # mean padding outside (float-exact on device, up to uint8 on host)
    np.testing.assert_allclose(
        got[:11], np.broadcast_to(np.asarray(pad), got[:11].shape), atol=1e-4)

    # box mapping through the same rect is exact math
    boxes = jnp.asarray([[20 / 64, 20 / 64, 40 / 64, 36 / 64],
                         [0.0, 0.0, 0.1, 0.1]])   # second center outside
    labels = jnp.asarray([3, 5], jnp.int32)
    nb, nl = crop_letterbox_boxes(boxes, labels, rect,
                                  identity=jnp.asarray(False))
    assert int(nl[0]) == 3 and int(nl[1]) == -1
    # crop frame: (20-8)/48, (20-16)/48·(24/48 scale into centered band)
    sc = 1.0 / max((x1 - x0) / base, (y1 - y0) / base)
    tx = (1 - (x1 - x0) / base * sc) / 2 - x0 / base * sc
    ty = (1 - (y1 - y0) / base * sc) / 2 - y0 / base * sc
    exp_box = np.asarray([20 / 64 * sc + tx, 20 / 64 * sc + ty,
                          40 / 64 * sc + tx, 36 / 64 * sc + ty])
    np.testing.assert_allclose(np.asarray(nb[0]), exp_box, atol=1e-6)


def test_sampled_crops_satisfy_reference_constraints():
    """Every non-identity rect the sampler returns must obey the reference's
    rules: inside the region, w/h ∈ [0.3,1]·region, aspect ∈ [0.5,2], and at
    least one valid box center strictly inside (transforms.py:228-330)."""
    boxes = jnp.asarray([[0.1, 0.2, 0.45, 0.6], [0.5, 0.5, 0.9, 0.95],
                         [0.0, 0.0, 0.0, 0.0]])
    labels = jnp.asarray([1, 2, -1], jnp.int32)
    region = jnp.asarray([0.0, 0.1, 1.0, 0.9])  # landscape letterbox
    centers = np.asarray([[0.275, 0.4], [0.7, 0.725]])
    n_identity = 0
    for seed in range(64):
        draws = sample_draws(jax.random.key(seed), 1)
        d = {k: v[0] for k, v in draws.items()}
        rect, identity = jax.jit(sample_crop, static_argnums=4)(
            d, boxes, labels, region, 64)
        rect = np.asarray(rect)
        if bool(identity):
            n_identity += 1
            np.testing.assert_allclose(rect, np.asarray(region))
            continue
        r = np.asarray(region)
        assert rect[0] >= r[0] - 1e-6 and rect[1] >= r[1] - 1e-6
        assert rect[2] <= r[2] + 1e-6 and rect[3] <= r[3] + 1e-6
        w, h = rect[2] - rect[0], rect[3] - rect[1]
        assert 0.3 * (r[2] - r[0]) - 1e-6 <= w <= (r[2] - r[0]) + 1e-6
        assert 0.3 * (r[3] - r[1]) - 1e-6 <= h <= (r[3] - r[1]) + 1e-6
        assert 0.5 - 1e-6 <= h / w <= 2.0 + 1e-6
        inside = ((rect[0] < centers[:, 0]) & (rect[1] < centers[:, 1])
                  & (rect[2] > centers[:, 0]) & (rect[3] > centers[:, 1]))
        assert inside.any()
    # mode 0 is drawn with p=1/6 per round: identity must occur but not
    # dominate (loose bounds; 64 seeds)
    assert 1 <= n_identity <= 40


def test_crop_distribution_matches_host_sampler():
    """Statistical head-to-head against the HOST chain's numpy sampler
    (data/transforms.py::random_sample_crop) on identical ground truth:
    identity rate, mean normalized crop area, and kept-box rate must agree.
    The samplers share structure (mode rounds × trials, same accept rules) —
    only trial counts and RNG differ, so rates match within sampling noise."""
    from yolo_nano_tpu.data.transforms import random_sample_crop

    n = 300
    W = H = 320
    img = np.zeros((H, W, 3), np.float32)
    abs_boxes = np.asarray([[40, 60, 140, 180], [180, 200, 290, 300]],
                           np.float32)
    labels_np = np.asarray([1, 2], np.int64)
    h_ident = h_area = h_kept = 0.0
    for seed in range(n):
        rng = np.random.default_rng(seed)
        out, ob, ol = random_sample_crop(img, abs_boxes, labels_np, rng)
        if out.shape == img.shape:
            h_ident += 1
            h_area += 1.0
            h_kept += 2
        else:
            h_area += out.shape[0] * out.shape[1] / (H * W)
            h_kept += len(ol)
    boxes = jnp.asarray(abs_boxes / [W, H, W, H], jnp.float32)
    labels = jnp.asarray([1, 2], jnp.int32)
    region = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    d_ident = d_area = d_kept = 0.0
    crop_j = jax.jit(sample_crop, static_argnums=4)
    for seed in range(n):
        d = {k: v[0] for k, v in
             sample_draws(jax.random.key(seed), 1).items()}
        rect, identity = crop_j(d, boxes, labels, region, W)
        rect = np.asarray(rect)
        if bool(identity):
            d_ident += 1
            d_area += 1.0
            d_kept += 2
        else:
            d_area += (rect[2] - rect[0]) * (rect[3] - rect[1])
            cx = (abs_boxes[:, :2] + abs_boxes[:, 2:]) / 2 / [W, H]
            inside = ((rect[0] < cx[:, 0]) & (rect[1] < cx[:, 1])
                      & (rect[2] > cx[:, 0]) & (rect[3] > cx[:, 1]))
            d_kept += inside.sum()
    assert abs(h_ident / n - d_ident / n) < 0.12, (h_ident / n, d_ident / n)
    assert abs(h_area / n - d_area / n) < 0.12, (h_area / n, d_area / n)
    assert abs(h_kept / n - d_kept / n) < 0.3, (h_kept / n, d_kept / n)


def test_no_valid_boxes_forces_identity():
    d = {k: v[0] for k, v in sample_draws(jax.random.key(7), 1).items()}
    region = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    # the reference's empty-image placeholder: box 0000 label 0 — its center
    # is never STRICTLY inside any rect, so the host never crops it either
    rect, identity = sample_crop(d, jnp.zeros((1, 4)),
                                 jnp.zeros((1,), jnp.int32), region, 64)
    assert bool(identity)
    rect, identity = sample_crop(d, jnp.zeros((2, 4)),
                                 jnp.full((2,), -1, jnp.int32), region, 64)
    assert bool(identity)


def test_mirror_flips_image_and_boxes():
    rng = np.random.default_rng(4)
    size = 16
    img = rng.integers(0, 255, (1, size, size, 3), dtype=np.uint8)
    boxes = np.asarray([[[0.1, 0.2, 0.4, 0.6]]], np.float32)
    labels = np.ones((1, 1), np.int32)
    regions = np.asarray([[0, 0, 1, 1, 1]], np.float32)
    draws = _no_op_draws(1, mirror=np.ones(1, bool))
    out, ob, ol = apply_augment(jnp.asarray(img), jnp.asarray(boxes),
                                jnp.asarray(labels), jnp.asarray(regions),
                                draws, out_size=size)
    np.testing.assert_allclose(np.asarray(out), _norm_rgb(img)[:, :, ::-1],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ob[0, 0]),
                               [0.6, 0.2, 0.9, 0.6], atol=1e-6)


def test_crop_disallowed_region_flag():
    """crop_allowed=0 (mosaic items) must force the identity rect even when
    the sampler would crop."""
    rng = np.random.default_rng(5)
    size = 32
    img = rng.integers(0, 255, (1, size, size, 3), dtype=np.uint8)
    boxes = np.asarray([[[0.3, 0.3, 0.7, 0.7]]], np.float32)
    labels = np.ones((1, 1), np.int32)
    allowed = np.asarray([[0, 0, 1, 1, 1]], np.float32)
    blocked = np.asarray([[0, 0, 1, 1, 0]], np.float32)
    # photometric/mirror off so any difference comes from the crop alone;
    # deterministic candidate: mode 1, w=h=0.86, centered → always accepted
    noop = _no_op_draws(1, mode=np.ones((1, 4), np.int32),
                        u_w=np.full((1, 4, 4), 0.8, np.float32),
                        u_h=np.full((1, 4, 4), 0.8, np.float32))
    out_a, _, _ = apply_augment(jnp.asarray(img), jnp.asarray(boxes),
                                jnp.asarray(labels), jnp.asarray(allowed),
                                noop, out_size=size)
    out_b, ob, _ = apply_augment(jnp.asarray(img), jnp.asarray(boxes),
                                 jnp.asarray(labels), jnp.asarray(blocked),
                                 noop, out_size=size)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_allclose(np.asarray(out_b), _norm_rgb(img), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ob), boxes, atol=1e-6)


def test_augment_fn_jit_determinism_and_dtypes():
    rng = np.random.default_rng(6)
    b, s0, s = 4, 48, 32
    img = rng.integers(0, 255, (b, s0, s0, 3), dtype=np.uint8)
    boxes = rng.uniform(0.1, 0.5, (b, 8, 4)).astype(np.float32)
    boxes[..., 2:] += 0.3
    labels = rng.integers(0, 5, (b, 8)).astype(np.int32)
    labels[:, 5:] = -1
    regions = np.tile(np.asarray([0, 0, 1, 1, 1], np.float32), (b, 1))
    aug = jax.jit(make_augment_fn(s, out_dtype=jnp.bfloat16))
    o1 = aug(img, boxes, labels, regions, jax.random.key(0))
    o2 = aug(img, boxes, labels, regions, jax.random.key(0))
    o3 = aug(img, boxes, labels, regions, jax.random.key(1))
    assert o1[0].shape == (b, s, s, 3) and o1[0].dtype == jnp.bfloat16
    assert o1[1].shape == (b, 8, 4) and o1[2].shape == (b, 8)
    for a, c in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    assert not np.allclose(np.asarray(o1[0], np.float32),
                           np.asarray(o3[0], np.float32))
    # padded rows stay dropped; surviving labels come from the input set
    ol = np.asarray(o1[2])
    assert (ol[:, 5:] == -1).all()
    # every image must keep ≥1 box (the crop accept rule guarantees it)
    assert (ol >= 0).any(axis=1).all()


def test_train_step_with_in_graph_augment():
    from yolo_nano_tpu.config import YoloNanoConfig
    from yolo_nano_tpu.models.yolo_nano import init_yolo_nano
    from yolo_nano_tpu.train.state import create_train_state, make_optimizer
    from yolo_nano_tpu.train.train_step import make_train_step

    cfg = YoloNanoConfig(num_classes=20)
    params, stats = init_yolo_nano(jax.random.key(0), cfg)
    tx = make_optimizer(lambda step: 1e-3)
    state = create_train_state(params, stats, tx, use_ema=True)
    base, out = 96, 64  # augment also folds the multi-scale resize
    step_fn = make_train_step(cfg, tx, out, donate=False,
                              augment=make_augment_fn(out))
    rng = np.random.default_rng(7)
    images = rng.integers(0, 255, (2, base, base, 3), dtype=np.uint8)
    boxes = np.tile(np.asarray([[0.2, 0.3, 0.6, 0.7], [0.5, 0.1, 0.9, 0.4]],
                               np.float32), (2, 1, 1))
    labels = np.tile(np.asarray([2, 7], np.int32), (2, 1))
    regions = np.tile(np.asarray([0, 0, 1, 1, 1], np.float32), (2, 1))
    losses = []
    for i in range(3):
        state, metrics = step_fn(state, images, boxes, labels, regions,
                                 jax.random.key(i))
        losses.append(float(metrics["loss/total"]))
    assert np.isfinite(losses).all()
    assert int(state.step) == 3


def test_train_step_augment_on_8_device_mesh():
    from yolo_nano_tpu.config import YoloNanoConfig
    from yolo_nano_tpu.models.yolo_nano import init_yolo_nano
    from yolo_nano_tpu.parallel.mesh import make_mesh, shard_batch
    from yolo_nano_tpu.train.state import create_train_state, make_optimizer
    from yolo_nano_tpu.train.train_step import make_train_step

    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    cfg = YoloNanoConfig(num_classes=20)
    params, stats = init_yolo_nano(jax.random.key(0), cfg)
    tx = make_optimizer(lambda step: 1e-3)
    state = create_train_state(params, stats, tx, use_ema=False)
    mesh = make_mesh(8)
    step_fn = make_train_step(cfg, tx, 64, mesh=mesh, donate=False,
                              augment=make_augment_fn(64))
    rng = np.random.default_rng(8)
    images = rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8)
    boxes = np.tile(np.asarray([[0.2, 0.3, 0.6, 0.7]], np.float32), (8, 1, 1))
    labels = np.tile(np.asarray([2], np.int32), (8, 1))
    regions = np.tile(np.asarray([0, 0, 1, 1, 1], np.float32), (8, 1))
    images, boxes, labels, regions = shard_batch(mesh, images, boxes, labels,
                                                 regions)
    state, metrics = step_fn(state, images, boxes, labels, regions,
                             jax.random.key(0))
    assert np.isfinite(float(metrics["loss/total"]))


def test_device_mode_canvas_cache_is_transparent(tmp_path):
    """With the image cache on, the deterministic letterboxed canvases are
    memoized — batch streams must be byte-identical to the uncached loader."""
    from tests.helpers import make_synthetic_voc
    from yolo_nano_tpu.data.loader import DetectionLoader
    from yolo_nano_tpu.data.voc import VOCDataset

    root, _ = make_synthetic_voc(tmp_path, n_images=6)
    streams = []
    for cache in (False, True):
        ds = VOCDataset(root, img_size=64, image_sets=[("2007", "trainval")],
                        mosaic=False)
        ds.device_augment = True
        if cache:
            ds.enable_image_cache()
        loader = DetectionLoader(ds, batch_size=2, num_workers=2, seed=3)
        batches = [b for _ in range(2) for b in loader]  # 2 epochs
        streams.append(batches)
        if cache:
            assert ds._canvas_cache and len(ds._canvas_cache) == 6
    for a, b in zip(*streams):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def test_device_mosaic_geometry_matches_host_oracle():
    """compose_mosaic vs the host load_mosaic (data/mosaic.py, reference
    voc.py:140-211) on handcrafted inputs: 4 constant-color tiles (one
    landscape → exercises the region-rect path), integer-aligned center.
    Boxes must map through the identical affine (exact); pixels must agree
    everywhere except a small band around tile seams (different resamplers).

    Device composes at out_size S ≡ the host's 2S canvas: host img_size=S/2.
    """
    from yolo_nano_tpu.data.device_aug import _MEAN, compose_mosaic
    from yolo_nano_tpu.data.mosaic import load_mosaic

    out = 128                       # host: img_size 64, canvas 128
    base = 64                       # device base-canvas resolution
    colors = [(200, 30, 30), (30, 200, 30), (30, 30, 200), (200, 200, 30)]
    # native images: 3 square 64x64, one landscape 64x32 (tile index 2)
    natives, nat_boxes = [], []
    for t in range(4):
        h = 32 if t == 2 else 64
        natives.append(np.full((h, 64, 3), colors[t], np.uint8))
        nat_boxes.append(np.asarray([[0.125, 0.25, 0.625, 0.75]], np.float32))

    # ---- host oracle: stub rng pins the center to (80, 80)
    class _RngStub:
        def __init__(self):
            self.calls = 0

        def uniform(self, lo, hi):
            self.calls += 1
            return 80.0

    def load_fn(i):
        t = np.concatenate([nat_boxes[i], np.full((1, 1), i, np.float32)], 1)
        return natives[i], t

    exp_img, exp_t = load_mosaic(load_fn, [0, 1, 2, 3], out // 2, _RngStub())

    # ---- device: canvases = letterboxed natives, boxes canvas-normalized
    from yolo_nano_tpu.data.transforms import resize_letterbox

    imgs = np.zeros((4, base, base, 3), np.uint8)
    boxes = np.full((4, 6, 4), 0.0, np.float32)
    labels = np.full((4, 6), -1, np.int32)
    regions = np.zeros((4, 5), np.float32)
    for t in range(4):
        canvas, cbox, scale, off = resize_letterbox(
            natives[t].astype(np.float32), base, boxes=nat_boxes[t])
        imgs[t] = np.clip(canvas, 0, 255).astype(np.uint8)
        regions[t, :4] = [off[0], off[1], off[0] + scale[0],
                          off[1] + scale[1]]
        regions[t, 4] = 1.0
        boxes[t, 0] = cbox[0]
        labels[t, 0] = t
    d = {"mos_tiles": jnp.asarray([0, 1, 2]),       # rows 1,2,3 for idx 0
         "mos_cx": jnp.asarray((80 / out - 0.25) / 0.5),
         "mos_cy": jnp.asarray((80 / out - 0.25) / 0.5)}
    pad = jnp.asarray(_MEAN, jnp.float32) * 255.0
    img_d, bx_d, lb_d = jax.jit(
        lambda d, i, b, l, r: compose_mosaic(  # noqa: E741
            jnp.asarray(0), d, i, b, l, r, out, pad))(
        d, jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(regions))
    img_d, bx_d, lb_d = map(np.asarray, (img_d, bx_d, lb_d))

    # boxes: one per tile, same order, same affine+clip (exact math)
    assert list(lb_d[:4]) == [0, 1, 2, 3] and (lb_d[4:] == -1).all()
    np.testing.assert_allclose(bx_d[:4], exp_t[:, :4], atol=2e-3)

    # pixels: equal outside a 3px band around every tile seam
    xc = yc = 80
    seams_x = [16, xc, xc + 64, out]     # tile edges (tile widths 64)
    seams_y = [16, 48, yc, yc + 64, yc + 32, out]
    keep = np.ones((out, out), bool)
    for sx in seams_x:
        keep[:, max(sx - 3, 0):sx + 3] = False
    for sy in seams_y:
        keep[max(sy - 3, 0):sy + 3, :] = False
    diff = np.abs(img_d - exp_img.astype(np.float32)).max(axis=-1)
    assert diff[keep].max() <= 2.0, diff[keep].max()


def test_device_mosaic_draws_and_integration():
    """sample_draws(mosaic=True) field sanity + the full apply_augment
    mosaic path under jit: mosaic'd items differ from the non-mosaic run,
    boxes stay in [0,1], valid boxes compact to the front, and the item's
    own boxes appear among the tiles' (tile 0 is the item itself)."""
    rng = np.random.default_rng(9)
    b, s0, s, m = 8, 48, 64, 8
    imgs = rng.integers(0, 255, (b, s0, s0, 3), dtype=np.uint8)
    boxes = rng.uniform(0.05, 0.45, (b, m, 4)).astype(np.float32)
    boxes[..., 2:] += 0.5
    labels = rng.integers(0, 5, (b, m)).astype(np.int32)
    labels[:, 2:] = -1                   # 2 valid boxes per image
    regions = np.tile(np.asarray([0, 0, 1, 1, 1], np.float32), (b, 1))

    draws = sample_draws(jax.random.key(3), b, mosaic=True)
    t = np.asarray(draws["mos_tiles"])
    assert t.shape == (b, 3) and (t >= 0).all() and (t <= b - 2).all()
    assert all(len(set(row)) == 3 for row in t)   # distinct offsets
    assert 0.0 < float(np.asarray(draws["mos_coin"]).mean()) < 1.0

    out_m = jax.jit(make_augment_fn(s, mosaic=True))(
        imgs, boxes, labels, regions, jax.random.key(3))
    out_p = jax.jit(make_augment_fn(s))(
        imgs, boxes, labels, regions, jax.random.key(3))
    im, bm, lm = map(np.asarray, out_m)
    assert im.shape == (b, s, s, 3) and np.isfinite(im).all()
    coin = np.asarray(draws["mos_coin"])
    assert coin.any() and not coin.all()
    valid = lm >= 0
    # f32 mirror math (1−x) can undershoot 0 by ~1e-8 — epsilon tolerance
    assert (bm[valid] >= -1e-6).all() and (bm[valid] <= 1 + 1e-6).all()
    # compact: no valid row after the first -1
    for i in range(b):
        v = valid[i]
        assert not (~v[:-1] & v[1:]).any()
        if coin[i]:
            # 4 tiles x 2 valid boxes each = 8 (nothing dropped, m=8 slots)
            assert v.sum() == 8, (i, v.sum())
            # tile 0 is the item: its labels lead the compacted list
            assert list(lm[i][:2]) == list(labels[i][:2])
        else:
            np.testing.assert_array_equal(im[i], np.asarray(out_p[0])[i])


def test_device_mosaic_train_step_and_mesh():
    """mosaic=True augment composed into the jitted train step on the
    8-device mesh — the launchable --device_augment --mosaic path."""
    from yolo_nano_tpu.config import YoloNanoConfig
    from yolo_nano_tpu.models.yolo_nano import init_yolo_nano
    from yolo_nano_tpu.parallel.mesh import make_mesh, shard_batch
    from yolo_nano_tpu.train.state import create_train_state, make_optimizer
    from yolo_nano_tpu.train.train_step import make_train_step

    cfg = YoloNanoConfig(num_classes=20)
    params, stats = init_yolo_nano(jax.random.key(0), cfg)
    tx = make_optimizer(lambda step: 1e-3)
    state = create_train_state(params, stats, tx, use_ema=False)
    mesh = make_mesh(8)
    step_fn = make_train_step(cfg, tx, 64, mesh=mesh, donate=False,
                              augment=make_augment_fn(64, mosaic=True))
    rng = np.random.default_rng(10)
    images = rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8)
    boxes = np.tile(np.asarray([[0.2, 0.3, 0.6, 0.7]], np.float32), (8, 1, 1))
    labels = np.tile(np.asarray([2], np.int32), (8, 1))
    regions = np.tile(np.asarray([0, 0, 1, 1, 1], np.float32), (8, 1))
    images, boxes, labels, regions = shard_batch(mesh, images, boxes, labels,
                                                 regions)
    state, metrics = step_fn(state, images, boxes, labels, regions,
                             jax.random.key(0))
    assert np.isfinite(float(metrics["loss/total"]))


def test_crowded_gt_crop_distribution_matches_host():
    """VERDICT r3 item 9: the R=16-round truncation bites hardest on crowded
    images (many boxes → most candidate crops rejected by the center /
    min-IoU rules). At 24 boxes/image, the device sampler's identity rate
    and kept-box mean must stay within sampling noise + the documented
    fallback tail (≤5%) of the host sampler's."""
    from yolo_nano_tpu.data.transforms import random_sample_crop

    n = 250
    W = H = 320
    img = np.zeros((H, W, 3), np.float32)
    g = np.random.default_rng(11)
    tl = g.uniform(0.02, 0.78, (24, 2))
    wh = g.uniform(0.08, 0.2, (24, 2))
    nboxes = np.concatenate([tl, np.minimum(tl + wh, 0.98)], 1)
    abs_boxes = (nboxes * [W, H, W, H]).astype(np.float32)
    labels_np = np.arange(24, dtype=np.int64) % 6

    h_ident = h_kept = 0.0
    for seed in range(n):
        rng = np.random.default_rng(seed)
        out, ob, ol = random_sample_crop(img, abs_boxes, labels_np, rng)
        if out.shape == img.shape:
            h_ident += 1
            h_kept += 24
        else:
            h_kept += len(ol)

    boxes = jnp.asarray(nboxes, jnp.float32)
    labels = jnp.asarray(labels_np, jnp.int32)
    region = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    crop_j = jax.jit(sample_crop, static_argnums=4)
    d_ident = d_kept = 0.0
    cx = (nboxes[:, :2] + nboxes[:, 2:]) / 2
    for seed in range(n):
        d = {k: v[0] for k, v in
             sample_draws(jax.random.key(seed), 1).items()}
        rect, identity = crop_j(d, boxes, labels, region, W)
        rect = np.asarray(rect)
        if bool(identity):
            d_ident += 1
            d_kept += 24
        else:
            inside = ((rect[0] < cx[:, 0]) & (rect[1] < cx[:, 1])
                      & (rect[2] > cx[:, 0]) & (rect[3] > cx[:, 1]))
            d_kept += inside.sum()
    # identity-rate gap ≤ sampling noise (2σ ≈ 0.09) + the ≤5% R=16 tail
    assert abs(h_ident / n - d_ident / n) < 0.14, (h_ident / n, d_ident / n)
    # kept-box mean (boxes surviving per draw) within 10% of 24
    assert abs(h_kept / n - d_kept / n) < 2.4, (h_kept / n, d_kept / n)


def test_loader_device_mode_yields_uint8_canvases_and_regions(tmp_path):
    from tests.helpers import make_synthetic_voc
    from yolo_nano_tpu.data.loader import DetectionLoader
    from yolo_nano_tpu.data.voc import VOCDataset

    root, _ = make_synthetic_voc(tmp_path, n_images=6)
    ds = VOCDataset(root, img_size=64, image_sets=[("2007", "trainval")],
                    mosaic=False)
    ds.device_augment = True
    loader = DetectionLoader(ds, batch_size=2, num_workers=2, seed=0)
    batch = next(iter(loader))
    assert len(batch) == 4
    images, boxes, labels, regions = batch
    assert images.dtype == np.uint8 and images.shape[1:] == (64, 64, 3)
    assert regions.shape == (2, 5)
    assert (regions[:, 4] == 1).all()      # crop allowed (augment dataset)
    r = regions[:, :4]
    assert (r[:, 2] > r[:, 0]).all() and (r[:, 3] > r[:, 1]).all()
    assert (r >= 0).all() and (r <= 1).all()
    # boxes land inside their image region (canvas-normalized)
    valid = labels >= 0
    for i in range(2):
        vb = boxes[i][valid[i]]
        assert (vb[:, 0] >= r[i, 0] - 1e-3).all()
        assert (vb[:, 3] <= r[i, 3] + 1e-3).all()
    # the augment consumes the batch end-to-end
    out, ob, ol = jax.jit(make_augment_fn(64))(
        images, boxes, labels, regions, jax.random.key(0))
    assert out.shape == (2, 64, 64, 3)
    assert bool((np.asarray(ol) >= 0).any())
