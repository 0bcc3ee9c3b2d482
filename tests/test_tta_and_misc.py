"""TTA flip-merge consistency, EvalLoader final-batch padding, config
override plumbing."""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_nano_tpu.config import YoloNanoConfig
from yolo_nano_tpu.models.yolo_nano import init_yolo_nano


def test_tta_is_flip_equivariant():
    """TTA(image) and TTA(flipped image) must produce mirrored detections:
    the multi-scale+flip ensemble is symmetric under horizontal flip."""
    from yolo_nano_tpu.utils.tta import make_tta_predict

    cfg = YoloNanoConfig(num_classes=20, nms_pre_topk=64, max_detections=8,
                         conf_thresh=0.0)
    params, stats = init_yolo_nano(jax.random.key(0), cfg)
    tta = make_tta_predict(params, stats, cfg, scale_range=(64, 64, 32))
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))
    b1, s1, c1, v1 = (np.asarray(t) for t in tta(x))
    b2, s2, c2, v2 = (np.asarray(t) for t in tta(x[:, :, ::-1, :]))
    # mirror the second result back
    b2m = np.stack([1 - b2[..., 2], b2[..., 1], 1 - b2[..., 0], b2[..., 3]],
                   -1)
    np.testing.assert_allclose(np.sort(s1[v1]), np.sort(s2[v2]), rtol=1e-3,
                               atol=1e-4)
    # same top box location (order can differ on near-ties)
    top1 = b1[0, np.argmax(s1[0])]
    top2 = b2m[0, np.argmax(s2[0])]
    np.testing.assert_allclose(top1, top2, atol=5e-3)


def test_eval_loader_pads_final_batch(tmp_path):
    import cv2

    from yolo_nano_tpu.data.loader import EvalLoader
    from yolo_nano_tpu.data.voc import VOCDataset

    d = tmp_path / "VOC2007"
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        (d / sub).mkdir(parents=True)
    names = []
    for i in range(5):  # 5 images, batch 4 → final batch has 1 real image
        name = f"p{i}"
        names.append(name)
        cv2.imwrite(str(d / "JPEGImages" / f"{name}.jpg"),
                    np.full((100, 100, 3), i * 40, np.uint8))
        (d / "Annotations" / f"{name}.xml").write_text(
            "<annotation><object><name>cat</name><difficult>0</difficult>"
            "<bndbox><xmin>10</xmin><ymin>10</ymin><xmax>50</xmax>"
            "<ymax>50</ymax></bndbox></object></annotation>")
    (d / "ImageSets" / "Main" / "test.txt").write_text("\n".join(names))
    ds = VOCDataset(str(tmp_path), image_sets=[("2007", "test")],
                    augment=False)
    loader = EvalLoader(ds, img_size=64, batch_size=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    imgs0, metas0 = batches[0]
    imgs1, metas1 = batches[1]
    assert imgs0.shape == imgs1.shape == (4, 64, 64, 3)  # fixed shapes
    assert len(metas0) == 4 and len(metas1) == 1          # real-image metas
    total_ids = {m["id"][1] for m in metas0} | {m["id"][1] for m in metas1}
    assert total_ids == set(names)


def test_build_config_override_plumbing():
    from yolo_nano_tpu.cli.common import build_config

    cfg = build_config("coco", conf_thresh=0.2, nms_thresh=0.6,
                       diou_nms=True, nms_pre_topk=99, max_detections=7)
    assert cfg.num_classes == 80
    assert cfg.conf_thresh == 0.2 and cfg.nms_thresh == 0.6
    assert cfg.diou_nms and cfg.nms_pre_topk == 99
    assert cfg.max_detections == 7
    # dataclass is hashable → usable as jit static argument
    hash(cfg)


def test_class_names_for_coco_has_80_entries():
    from yolo_nano_tpu.cli.common import class_names_for

    names = class_names_for("coco")
    assert len(names) == 80
    assert names[0] == "person"
    assert "background" not in names
