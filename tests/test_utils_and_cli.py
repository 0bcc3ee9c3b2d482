"""Checkpoint round-trip, FLOPs report, TTA, k-means anchors, and a CLI
train→eval smoke run on a synthetic VOC dataset."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_nano_tpu.config import YoloNanoConfig
from yolo_nano_tpu.models.yolo_nano import init_yolo_nano


@pytest.fixture(scope="module")
def synthetic_voc(tmp_path_factory):
    from tests.helpers import make_synthetic_voc

    root, _ = make_synthetic_voc(tmp_path_factory.mktemp("vocdev"),
                                 classes=("dog",), deterministic_boxes=True)
    return root


def test_checkpoint_round_trip(tmp_path):
    from yolo_nano_tpu.train.schedule import warmup_step_schedule
    from yolo_nano_tpu.train.state import create_train_state, make_optimizer
    from yolo_nano_tpu.utils.checkpoint import CheckpointManager

    cfg = YoloNanoConfig(num_classes=20)
    params, stats = init_yolo_nano(jax.random.key(0), cfg)
    tx = make_optimizer(warmup_step_schedule(1e-3, 10))
    state = create_train_state(params, stats, tx, use_ema=True)
    state = state.replace(step=jnp.asarray(42, jnp.int32))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(42, state, wait=True)
    assert mgr.latest_step() == 42

    fresh = create_train_state(
        *init_yolo_nano(jax.random.key(1), cfg), tx, use_ema=True)
    restored = mgr.restore(fresh)
    assert int(restored.step) == 42
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    l1 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    mgr.close()


def test_flops_report_matches_reference_scale():
    """Reference README quotes 1.65 GFLOPs (thop MACs) @512 for the
    ShuffleNetV2-1.0x model (README.md:10)."""
    from yolo_nano_tpu.config import MULTI_ANCHOR_SIZE_COCO
    from yolo_nano_tpu.utils.flops import flops_and_params

    cfg = YoloNanoConfig(num_classes=80, anchors=MULTI_ANCHOR_SIZE_COCO)
    params, stats = init_yolo_nano(jax.random.key(0), cfg)
    gflops, gmacs, n = flops_and_params(params, stats, cfg, 512)
    assert n == 1_326_305
    assert 1.2 < gmacs < 2.2, gmacs


def test_tta_predict_shapes():
    from yolo_nano_tpu.utils.tta import make_tta_predict

    cfg = YoloNanoConfig(num_classes=20, nms_pre_topk=64, max_detections=8)
    params, stats = init_yolo_nano(jax.random.key(0), cfg)
    tta = make_tta_predict(params, stats, cfg, scale_range=(64, 96, 32))
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    boxes, scores, classes, valid = tta(x)
    assert boxes.shape == (2, 8, 4)
    assert valid.shape == (2, 8)


def test_kmeans_anchor_recovers_clusters():
    from yolo_nano_tpu.cli.kmeans_anchor import anchor_kmeans

    rng = np.random.default_rng(0)
    truth = np.array([[20, 30], [80, 60], [200, 150]], np.float64)
    wh = np.concatenate([t + rng.normal(0, 1.5, (200, 2)) for t in truth])
    centroids, mean_iou = anchor_kmeans(wh, 3, seed=1)
    assert mean_iou > 0.9
    np.testing.assert_allclose(centroids, truth, rtol=0.08)


def test_train_cli_end_to_end(synthetic_voc, tmp_path):
    """One epoch of the real training CLI on synthetic VOC, then the eval CLI
    on the saved checkpoint."""
    from yolo_nano_tpu.cli.train import main as train_main

    save = str(tmp_path / "weights")
    train_main([
        "-d", "voc", "--root", synthetic_voc, "--img_size", "64",
        "--eval_size", "64", "--batch_size", "2", "--max_epoch", "1", "--voc_sets", "2007",
        "--eval_epoch", "1", "--num_workers", "2", "--save_folder", save,
        "--lr", "1e-3", "--wp_epoch", "0", "-no_wp", "--ema",
    ])
    ckpt_dir = os.path.join(save, "voc", "yolo_nano", "ckpt")
    assert os.path.isdir(ckpt_dir)
    log = os.path.join(save, "voc", "yolo_nano", "train_log.jsonl")
    lines = [json.loads(ln) for ln in open(log)]
    assert lines and np.isfinite(lines[-1]["loss/total"])

    from yolo_nano_tpu.cli.eval import main as eval_main

    eval_main(["-d", "voc", "--root", synthetic_voc, "--weight", ckpt_dir,
               "--img_size", "64", "--batch_size", "2", "--ema"])


def test_test_cli_writes_visualizations(synthetic_voc, tmp_path):
    from yolo_nano_tpu.cli.train import main as train_main

    save = str(tmp_path / "w2")
    train_main(["-d", "voc", "--root", synthetic_voc, "--img_size", "64",
                "--eval_size", "64", "--batch_size", "2", "--max_epoch", "1", "--voc_sets", "2007",
                "--eval_epoch", "1", "--num_workers", "1",
                "--save_folder", save, "-no_wp"])
    ckpt_dir = os.path.join(save, "voc", "yolo_nano", "ckpt")

    from yolo_nano_tpu.cli.test import main as test_main

    out = str(tmp_path / "vis")
    test_main(["-d", "voc", "--root", synthetic_voc, "--weight", ckpt_dir,
               "--img_size", "64", "--num_images", "2",
               "--save_folder", out])
    assert len(os.listdir(out)) == 2


def test_demo_cli_video_mode(synthetic_voc, tmp_path, capsys):
    """Streaming demo on a tiny synthetic video: frames written + the
    fixed-latency report (p50/p99) printed."""
    import cv2

    from yolo_nano_tpu.cli.train import main as train_main

    save = str(tmp_path / "w3")
    train_main(["-d", "voc", "--root", synthetic_voc, "--img_size", "64",
                "--eval_size", "64", "--batch_size", "2", "--max_epoch", "1",
                "--voc_sets", "2007", "--eval_epoch", "1",
                "--num_workers", "1", "--save_folder", save, "-no_wp"])
    ckpt_dir = os.path.join(save, "voc", "yolo_nano", "ckpt")

    vid = str(tmp_path / "in.avi")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"XVID"), 10, (96, 80))
    rng = np.random.default_rng(0)
    for _ in range(5):
        w.write(rng.integers(0, 255, (80, 96, 3), np.uint8))
    w.release()

    from yolo_nano_tpu.cli.demo import main as demo_main

    out_dir = str(tmp_path / "demo_out")
    demo_main(["--mode", "video", "--path", vid, "--weight", ckpt_dir,
               "-d", "voc", "--img_size", "64", "--path_to_save", out_dir])
    assert os.path.exists(os.path.join(out_dir, "demo_out.avi"))
    printed = capsys.readouterr().out
    assert "frame latency: p50" in printed


def test_benchmark_cli_synthetic(capsys):
    """Benchmark CLI on the synthetic-input fallback (no dataset): prints
    FLOPs report and the throughput/latency JSON line."""
    from yolo_nano_tpu.cli.benchmark import main as benchmark_main

    benchmark_main(["--img_size", "64", "--batch_size", "2", "--iters", "3",
                    "--dtype", "float32"])
    printed = capsys.readouterr().out
    line = [ln for ln in printed.splitlines()
            if ln.startswith("{") and "img/s" in ln][-1]
    rec = json.loads(line)
    assert rec["value"] > 0 and rec["p50_batch_ms"] > 0


def test_compile_cache_cpu_gating(tmp_path, monkeypatch):
    """enable() is a no-op on the CPU backend (XLA:CPU AOT cache hits log
    spurious machine-feature errors), is forced on by YNT_COMPILE_CACHE=<dir>,
    and is forced off by YNT_COMPILE_CACHE=0."""
    from yolo_nano_tpu.utils.compile_cache import enable

    monkeypatch.delenv("YNT_COMPILE_CACHE", raising=False)
    assert jax.default_backend() == "cpu"
    assert enable() is None

    d = str(tmp_path / "xla_cache")
    monkeypatch.setenv("YNT_COMPILE_CACHE", d)
    try:
        assert enable() == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        jax.config.update("jax_compilation_cache_dir", None)

    monkeypatch.setenv("YNT_COMPILE_CACHE", "0")
    assert enable() is None
    assert jax.config.jax_compilation_cache_dir is None


def test_runbook_dryrun(tmp_path):
    """docs/REAL_DATA_RUNBOOK.md executes end-to-end on a synthetic
    VOCdevkit tree: synthesized torchvision .pth → converter →
    train --pretrained (real lr, ms+mosaic+EMA+device-augment) → eval at
    three resolutions → export → load_predictor (+threshold override) →
    k-means anchors. Zero missing glue for the day real data is reachable
    (round-4 VERDICT Next #5)."""
    from tools.runbook_dryrun import run

    run(str(tmp_path))
