"""Data pipeline tests: letterbox invertibility, crop/mirror box validity,
mosaic geometry, loader determinism and fixed shapes."""

import numpy as np

from yolo_nano_tpu.data.transforms import (
    letterbox_undo,
    photometric_distort,
    random_mirror,
    random_sample_crop,
    resize_letterbox,
    train_transform,
    val_transform,
)


def test_letterbox_scale_offset_invertible():
    rng = np.random.default_rng(0)
    for h0, w0 in ((300, 500), (500, 300), (400, 400), (123, 457)):
        img = rng.integers(0, 255, (h0, w0, 3), dtype=np.uint8)
        boxes = np.array([[0.1, 0.2, 0.6, 0.8], [0.3, 0.0, 0.9, 0.5]],
                         np.float32)
        out, mapped, scale, offset = resize_letterbox(img, 128, boxes.copy())
        assert out.shape == (128, 128, 3)
        undone = letterbox_undo(mapped, scale, offset, w0, h0)
        want = boxes * np.array([w0, h0, w0, h0], np.float32)
        np.testing.assert_allclose(undone, want, rtol=1e-5, atol=1e-3)


def test_letterbox_padding_is_mean_value():
    from yolo_nano_tpu.data.transforms import IMAGE_MEAN

    img = np.zeros((100, 50, 3), np.uint8)  # tall → pads left/right
    out, _, _, _ = resize_letterbox(img, 64, None)
    np.testing.assert_allclose(out[0, 0], IMAGE_MEAN * 255, rtol=1e-5)
    assert np.all(out[:, 20:40] == 0)  # image content region


def test_random_mirror_box_flip():
    rng = np.random.default_rng(3)  # first integers(2) call → 1 (flip)
    img = np.arange(4 * 6 * 3, dtype=np.float32).reshape(4, 6, 3)
    boxes = np.array([[1.0, 0.0, 3.0, 2.0]], np.float32)
    out, ob = random_mirror(img, boxes, rng)
    if not np.array_equal(out, img):  # flipped
        np.testing.assert_allclose(ob, [[3.0, 0.0, 5.0, 2.0]])


def test_random_sample_crop_keeps_valid_boxes():
    rng = np.random.default_rng(1)
    img = np.zeros((200, 200, 3), np.float32)
    boxes = np.array([[50, 50, 150, 150], [10, 10, 40, 40]], np.float32)
    labels = np.array([1, 2], np.float32)
    for _ in range(20):
        ci, cb, cl = random_sample_crop(img.copy(), boxes.copy(),
                                        labels.copy(), rng)
        h, w = ci.shape[:2]
        assert len(cb) == len(cl) >= 1
        assert np.all(cb[:, 0] >= 0) and np.all(cb[:, 1] >= 0)
        assert np.all(cb[:, 2] <= w + 1e-3) and np.all(cb[:, 3] <= h + 1e-3)
        assert np.all(cb[:, 2] > cb[:, 0]) and np.all(cb[:, 3] > cb[:, 1])


def test_photometric_distort_preserves_shape_and_finite():
    rng = np.random.default_rng(2)
    img = np.random.default_rng(0).uniform(0, 255, (64, 64, 3)).astype(
        np.float32)
    out = photometric_distort(img, rng)
    assert out.shape == img.shape
    assert np.isfinite(out).all()


def test_train_transform_output_contract():
    rng = np.random.default_rng(5)
    img = np.random.default_rng(1).integers(0, 255, (240, 320, 3),
                                            dtype=np.uint8)
    boxes = np.array([[0.1, 0.1, 0.5, 0.6]], np.float32)
    labels = np.array([4.0], np.float32)
    out, ob, ol, scale, offset = train_transform(img, boxes, labels, 96, rng)
    assert out.shape == (96, 96, 3) and out.dtype == np.float32
    assert ob.shape[1] == 4 and len(ol) == len(ob)
    # normalized RGB roughly centered
    assert -4 < out.mean() < 4


def test_val_transform_deterministic():
    img = np.random.default_rng(1).integers(0, 255, (200, 300, 3),
                                            dtype=np.uint8)
    a, sa, oa = val_transform(img, 64)
    b, sb, ob = val_transform(img, 64)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(sa, sb)


def test_mosaic_geometry():
    from yolo_nano_tpu.data.mosaic import load_mosaic

    rng = np.random.default_rng(0)

    def load(i):
        img = np.full((100 + 10 * i, 120, 3), i * 40, np.uint8)
        target = np.array([[0.25, 0.25, 0.75, 0.75, float(i)]], np.float32)
        return img, target

    img, tg = load_mosaic(load, [0, 1, 2, 3], 64, rng)
    assert img.shape == (128, 128, 3)
    assert np.all(tg[:, :4] >= 0) and np.all(tg[:, :4] <= 1)
    assert 1 <= len(tg) <= 4


def test_pull_item_val_mode_boxes_match_letterboxed_content(tmp_path):
    """Regression: with augment=False the gt boxes must be remapped into the
    letterboxed frame (a white rectangle's pixels must lie inside its box)."""
    import cv2

    from yolo_nano_tpu.data.voc import VOCDataset

    d = tmp_path / "VOC2007"
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        (d / sub).mkdir(parents=True)
    img = np.zeros((200, 400, 3), np.uint8)  # wide → letterbox pads top/bot
    cv2.rectangle(img, (100, 50), (200, 150), (255, 255, 255), -1)
    cv2.imwrite(str(d / "JPEGImages" / "a.jpg"), img)
    (d / "Annotations" / "a.xml").write_text(
        "<annotation><object><name>dog</name><difficult>0</difficult>"
        "<bndbox><xmin>100</xmin><ymin>50</ymin><xmax>200</xmax>"
        "<ymax>150</ymax></bndbox></object></annotation>")
    (d / "ImageSets" / "Main" / "trainval.txt").write_text("a\n")

    ds = VOCDataset(str(tmp_path), img_size=128,
                    image_sets=[("2007", "trainval")], augment=False)
    out, target, h, w, scale, offset = ds.pull_item(0,
                                                    np.random.default_rng(0))
    x1, y1, x2, y2 = (target[0, :4] * 128).astype(int)
    # the white rectangle (bright in normalized RGB) must be inside the box
    inside = out[y1 + 2:y2 - 2, x1 + 2:x2 - 2].mean()
    outside = out[:max(y1 - 4, 1)].mean()
    assert inside > outside + 1.0, (inside, outside, (x1, y1, x2, y2))
    # and the box must reflect the letterbox offset (pad top = 0.25·128/2)
    assert y1 >= 16 - 1


def test_loader_fixed_shapes_and_determinism(tmp_path):
    import cv2

    from yolo_nano_tpu.data.loader import DetectionLoader
    from yolo_nano_tpu.data.voc import VOCDataset

    d = tmp_path / "VOC2007"
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        (d / sub).mkdir(parents=True)
    names = []
    rng = np.random.default_rng(0)
    for i in range(5):
        name = f"x{i}"
        names.append(name)
        img = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
        cv2.imwrite(str(d / "JPEGImages" / f"{name}.jpg"), img)
        (d / "Annotations" / f"{name}.xml").write_text(
            "<annotation><object><name>cat</name><difficult>0</difficult>"
            "<bndbox><xmin>10</xmin><ymin>10</ymin><xmax>90</xmax>"
            "<ymax>80</ymax></bndbox></object></annotation>")
    (d / "ImageSets" / "Main" / "trainval.txt").write_text("\n".join(names))

    ds = VOCDataset(str(tmp_path), img_size=64,
                    image_sets=[("2007", "trainval")])
    mk = lambda: DetectionLoader(ds, batch_size=2, max_boxes=8,  # noqa: E731
                                 num_workers=2, seed=7)
    batches_a = [(i.copy(), b.copy(), l.copy()) for i, b, l in mk()]
    batches_b = [(i.copy(), b.copy(), l.copy()) for i, b, l in mk()]
    assert len(batches_a) == 2  # 5 // 2 (drop_last)
    for (ia, ba, la), (ib, bb, lb) in zip(batches_a, batches_b):
        assert ia.shape == (2, 64, 64, 3)
        assert ba.shape == (2, 8, 4) and la.shape == (2, 8)
        np.testing.assert_array_equal(ia, ib)  # same seed ⇒ same epoch
        np.testing.assert_array_equal(ba, bb)
    # padding labels are -1
    assert (batches_a[0][2] == -1).any()


def test_loader_set_epoch_resume_continuity(tmp_path):
    """A freshly constructed loader positioned with set_epoch(k) yields
    byte-identical batches to epoch k of an uninterrupted loader — the
    resume path's data-order-continuity contract (cli/train.py resume)."""
    from yolo_nano_tpu.data.loader import DetectionLoader

    ds = _tiny_voc(tmp_path)
    cont = DetectionLoader(ds, batch_size=2, max_boxes=8, num_workers=2,
                           seed=7)
    epochs = [[(i.copy(), b.copy(), l.copy()) for i, b, l in cont]
              for _ in range(3)]
    # epochs genuinely differ (shuffle + augment streams advance)
    assert not np.array_equal(epochs[0][0][0], epochs[2][0][0])

    resumed = DetectionLoader(ds, batch_size=2, max_boxes=8, num_workers=2,
                              seed=7)
    resumed.set_epoch(2)
    replay = [(i.copy(), b.copy(), l.copy()) for i, b, l in resumed]
    for (ia, ba, la), (ib, bb, lb) in zip(epochs[2], replay):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ba, bb)
        np.testing.assert_array_equal(la, lb)


def test_loader_process_shard_union_equals_global(tmp_path):
    """Per-host sharded loading (multi-controller runs): each process
    materializes only its rows of every global batch, and the concatenation
    of all processes' shards is byte-identical to the single-process
    loader — shuffle order and augmentation RNG are keyed on GLOBAL
    positions (parallel/multiprocess.py contract)."""
    import pytest

    from yolo_nano_tpu.data.loader import DetectionLoader

    ds = _tiny_voc(tmp_path, n=9)
    kw = dict(batch_size=4, max_boxes=8, num_workers=2, seed=3)
    whole = [(i.copy(), b.copy(), l.copy())
             for i, b, l in DetectionLoader(ds, **kw)]
    shards = [[(i.copy(), b.copy(), l.copy())
               for i, b, l in DetectionLoader(ds, process_shard=(pid, 2),
                                              **kw)]
              for pid in range(2)]
    assert len(whole) == 2  # 9 // 4 (drop_last)
    for bi, (iw, bw, lw) in enumerate(whole):
        ii = np.concatenate([shards[0][bi][0], shards[1][bi][0]])
        bb = np.concatenate([shards[0][bi][1], shards[1][bi][1]])
        ll = np.concatenate([shards[0][bi][2], shards[1][bi][2]])
        assert shards[0][bi][0].shape[0] == 2  # local rows only
        np.testing.assert_array_equal(iw, ii)
        np.testing.assert_array_equal(bw, bb)
        np.testing.assert_array_equal(lw, ll)
    # invalid configs rejected at construction
    with pytest.raises(ValueError, match="divide evenly"):
        DetectionLoader(ds, batch_size=3, process_shard=(0, 2))
    with pytest.raises(ValueError, match="drop_last"):
        DetectionLoader(ds, batch_size=4, process_shard=(0, 2),
                        drop_last=False)


def _tiny_voc(tmp_path, n=5):
    import cv2

    from yolo_nano_tpu.data.voc import VOCDataset

    d = tmp_path / "VOC2007"
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        (d / sub).mkdir(parents=True)
    names = []
    rng = np.random.default_rng(0)
    for i in range(n):
        name = f"p{i}"
        names.append(name)
        img = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
        cv2.imwrite(str(d / "JPEGImages" / f"{name}.jpg"), img)
        (d / "Annotations" / f"{name}.xml").write_text(
            "<annotation><object><name>dog</name><difficult>0</difficult>"
            "<bndbox><xmin>12</xmin><ymin>14</ymin><xmax>88</xmax>"
            "<ymax>78</ymax></bndbox></object></annotation>")
    (d / "ImageSets" / "Main" / "trainval.txt").write_text("\n".join(names))
    return VOCDataset(str(tmp_path), img_size=64,
                      image_sets=[("2007", "trainval")])


def test_loader_process_mode_matches_thread_mode(tmp_path):
    """Both worker pools draw identical per-item RNG streams, so the
    augmented batch sequence must be byte-identical."""
    from yolo_nano_tpu.data.loader import DetectionLoader

    ds = _tiny_voc(tmp_path)
    thread = DetectionLoader(ds, batch_size=2, max_boxes=8, num_workers=2,
                             seed=7, worker_mode="thread")
    proc = DetectionLoader(ds, batch_size=2, max_boxes=8, num_workers=2,
                           seed=7, worker_mode="process")
    try:
        for (ia, ba, la), (ib, bb, lb) in zip(thread, proc):
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(ba, bb)
            np.testing.assert_array_equal(la, lb)
    finally:
        proc.close()


def test_image_cache_returns_equal_batches(tmp_path):
    from yolo_nano_tpu.data.loader import DetectionLoader

    ds_plain = _tiny_voc(tmp_path)
    ds_cached = _tiny_voc(tmp_path / "c")
    ds_cached.enable_image_cache()
    a = [(i.copy(), b.copy(), l.copy()) for i, b, l in DetectionLoader(
        ds_plain, batch_size=2, max_boxes=8, num_workers=2, seed=3)]
    # two epochs through the cached dataset: second epoch reads cache hits
    mk = DetectionLoader(ds_cached, batch_size=2, max_boxes=8,
                         num_workers=2, seed=3)
    _ = list(mk)
    mk._epoch = 0  # rewind to epoch 1's RNG stream
    b = [(i.copy(), b_.copy(), l.copy()) for i, b_, l in mk]
    # drop_last leaves one image unvisited per epoch (5 imgs, batch 2)
    assert len(ds_cached._img_cache) >= len(ds_cached) - 1
    for (ia, ba, la), (ib, bb, lb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ba, bb)


def test_loader_surfaces_worker_exceptions(tmp_path):
    """Regression: a worker exception used to kill the producer thread
    without the sentinel, hanging the consumer forever."""
    import pytest as _pytest

    from yolo_nano_tpu.data.loader import DetectionLoader

    class BadDataset:
        def __len__(self):
            return 4

        def pull_item(self, index, rng=None):
            raise RuntimeError("corrupt image")

    loader = DetectionLoader(BadDataset(), batch_size=2, num_workers=2)
    with _pytest.raises(RuntimeError, match="corrupt image"):
        next(iter(loader))


def test_letterbox_geometry_matches_resize_letterbox():
    """letterbox_geometry must reproduce resize_letterbox's scale/offset
    from (h0, w0, size) alone — the sharded multi-controller evaluator
    builds every row's letterbox-undo meta from annotation-declared sizes
    without decoding pixels (data/loader.py EvalLoader process_shard)."""
    from yolo_nano_tpu.data.transforms import letterbox_geometry

    rng = np.random.default_rng(11)
    cases = [(100, 140), (140, 100), (64, 64), (1, 999), (999, 1),
             (480, 360), (333, 500)]
    cases += [(int(rng.integers(1, 1200)), int(rng.integers(1, 1200)))
              for _ in range(40)]
    for h0, w0 in cases:
        img = np.zeros((h0, w0, 3), np.uint8)
        for size in (64, 320, 416, 608):
            _, _, scale, offset = resize_letterbox(img, size)
            g_scale, g_offset = letterbox_geometry(h0, w0, size)
            np.testing.assert_array_equal(scale, g_scale, err_msg=f"{h0}x{w0}@{size}")
            np.testing.assert_array_equal(offset, g_offset, err_msg=f"{h0}x{w0}@{size}")


def test_eval_loader_process_shard_union_equals_global(tmp_path):
    """Sharded eval loading: each controller decodes only its rows of every
    global batch, while metas (built from XML sizes, no decode) cover all
    real rows and match the single-process loader's exactly."""
    from yolo_nano_tpu.data.loader import EvalLoader

    ds = _tiny_voc(tmp_path, n=7)
    whole = list(EvalLoader(ds, img_size=64, batch_size=4, num_workers=2))
    shards = [list(EvalLoader(ds, img_size=64, batch_size=4, num_workers=2,
                              process_shard=(pid, 2)))
              for pid in range(2)]
    assert len(whole) == len(shards[0]) == len(shards[1]) == 2
    for bi, (iw, mw) in enumerate(whole):
        ii = np.concatenate([shards[0][bi][0], shards[1][bi][0]])
        assert shards[0][bi][0].shape[0] == 2  # local rows only
        np.testing.assert_array_equal(iw, ii)
        for ma, mb in zip(mw, shards[0][bi][1]):
            assert ma["id"] == mb["id"] and ma["index"] == mb["index"]
            assert (ma["w"], ma["h"]) == (mb["w"], mb["h"])
            np.testing.assert_array_equal(ma["scale"], mb["scale"])
            np.testing.assert_array_equal(ma["offset"], mb["offset"])
        # both processes see the same full meta list
        assert [m["id"] for m in shards[0][bi][1]] == \
            [m["id"] for m in shards[1][bi][1]]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divide evenly"):
        EvalLoader(ds, img_size=64, batch_size=3, process_shard=(0, 2))


def test_image_hw_reads_metadata_without_decode(tmp_path, monkeypatch):
    """VOC image_hw comes from the XML <size> element (no JPEG decode);
    XMLs without <size> fall back to decoding."""
    import cv2

    from yolo_nano_tpu.data.voc import VOCDataset

    d = tmp_path / "VOC2007"
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        (d / sub).mkdir(parents=True)
    img = np.zeros((120, 90, 3), np.uint8)
    cv2.imwrite(str(d / "JPEGImages" / "a.jpg"), img)
    cv2.imwrite(str(d / "JPEGImages" / "b.jpg"), img)
    cv2.imwrite(str(d / "JPEGImages" / "c.jpg"), img)
    (d / "Annotations" / "a.xml").write_text(
        "<annotation><size><width>90</width><height>120</height></size>"
        "</annotation>")
    (d / "Annotations" / "b.xml").write_text("<annotation></annotation>")
    # real-world malformed variants: <size> missing children; non-numeric
    cv2.imwrite(str(d / "JPEGImages" / "e.jpg"), img)
    (d / "Annotations" / "c.xml").write_text(
        "<annotation><size><depth>3</depth></size></annotation>")
    (d / "Annotations" / "e.xml").write_text(
        "<annotation><size><width>unknown</width>"
        "<height>375</height></size></annotation>")
    (d / "ImageSets" / "Main" / "test.txt").write_text("a\nb\nc\ne")
    ds = VOCDataset(str(tmp_path), img_size=64,
                    image_sets=[("2007", "test")])

    calls = []
    real = cv2.imread
    monkeypatch.setattr(cv2, "imread",
                        lambda *a, **k: calls.append(a) or real(*a, **k))
    assert ds.image_hw(0) == (120, 90)
    assert calls == []          # metadata path: no decode
    assert ds.image_hw(1) == (120, 90)
    assert len(calls) == 1      # fallback decoded exactly once
    assert ds.image_hw(2) == (120, 90)
    assert len(calls) == 2      # <size> without width/height: decode too
    assert ds.image_hw(3) == (120, 90)
    assert len(calls) == 3      # non-numeric width text: decode too
