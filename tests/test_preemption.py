"""Fault tolerance: a training process killed mid-run (SIGKILL) resumes from
its last checkpoint with --resume auto and continues to completion."""

import json
import os
import signal
import subprocess
import sys
import time


def test_kill_and_auto_resume(tmp_path):
    from tests.helpers import make_synthetic_voc

    root, _ = make_synthetic_voc(tmp_path / "voc", classes=("dog",),
                                 deterministic_boxes=True, n_images=4)
    save = str(tmp_path / "w")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.getcwd()
    base = [sys.executable, "-m", "yolo_nano_tpu.cli.train", "-d", "voc",
            "--root", root, "--voc_sets", "2007", "--img_size", "64",
            "--eval_size", "64", "--batch_size", "2", "--num_workers", "1",
            "--save_folder", save, "-no_wp", "--eval_epoch", "1"]

    # run 1: let it checkpoint at least once, then SIGKILL it mid-flight
    proc = subprocess.Popen(base + ["--max_epoch", "50"], env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    ckpt_dir = os.path.join(save, "voc", "yolo_nano", "ckpt")
    deadline = time.time() + 300
    try:
        while time.time() < deadline:
            if os.path.isdir(ckpt_dir) and any(
                    d.isdigit() for d in os.listdir(ckpt_dir)):
                break
            time.sleep(1)
        else:
            raise AssertionError("no checkpoint appeared before kill")
        time.sleep(2)  # let the checkpoint finish committing
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait()

    # run 2: resume automatically and finish a short schedule
    out = subprocess.run(base + ["--max_epoch", "3", "--resume", "auto"],
                         env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "resumed @ step" in out.stdout

    log = os.path.join(save, "voc", "yolo_nano", "train_log.jsonl")
    steps = [json.loads(ln)["step"] for ln in open(log)]
    assert steps, "no training log"


def test_resume_keeps_multi_scale_size_schedule(tmp_path):
    """A resumed -ms run must draw the SAME image-size sequence an
    uninterrupted run would have: the size stream is fast-forwarded past
    start_epoch's draws at resume (one draw per 10 iters from iter 10), the
    same way the loader repositions with set_epoch and the device-augment
    keys fold in the global iteration."""
    from tests.helpers import make_synthetic_voc

    root, _ = make_synthetic_voc(tmp_path / "voc", classes=("dog",),
                                 deterministic_boxes=True, n_images=24)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.getcwd()

    def run(save, max_epoch, resume=False):
        args = [sys.executable, "-m", "yolo_nano_tpu.cli.train", "-d", "voc",
                "--root", root, "--voc_sets", "2007", "--img_size", "64",
                "--eval_size", "64", "--batch_size", "2", "--num_workers",
                "1", "--save_folder", save, "-no_wp", "--lr", "0",
                "--eval_epoch", "99", "-ms", "--multi_scale_range", "2", "5",
                "--max_epoch", str(max_epoch)]
        if resume:
            args += ["--resume", "auto"]
        out = subprocess.run(args, env=env, capture_output=True, text=True,
                             timeout=900)
        assert out.returncode == 0, out.stderr[-2000:]

    def sizes(save):
        log = os.path.join(save, "voc", "yolo_nano", "train_log.jsonl")
        return [(e["epoch"], e["iter"], e["size"])
                for e in map(json.loads, open(log))]

    run(str(tmp_path / "full"), 4)                 # uninterrupted baseline
    run(str(tmp_path / "seg"), 2)                  # segment 1: epochs 0-1
    run(str(tmp_path / "seg"), 4, resume=True)     # segment 2: epochs 2-3
    # 12 iters/epoch → a draw at iter 10 of every epoch; the resumed
    # segment must reproduce the baseline's sizes, including the
    # carried-over last draw of epoch 1 at epoch 2's iters 0-9
    assert sizes(str(tmp_path / "seg")) == sizes(str(tmp_path / "full"))
