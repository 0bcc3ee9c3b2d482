"""Dry-run of docs/REAL_DATA_RUNBOOK.md against a synthetic VOCdevkit tree.

Executes every runbook step end-to-end at toy sizes — synthesized
torchvision .pth → converter CLI → `cli/train.py --pretrained` (short
lr>0 recipe) → `cli/eval.py` at three resolutions → `cli/export.py` →
`serving.load_predictor` — so the day real data is reachable, parity
validation is one command sequence with zero missing glue (round-4 VERDICT
Next #5). Run:

    python tools/runbook_dryrun.py [--out /tmp/runbook]

Prints RUNBOOK DRYRUN OK on success. Also pinned as a pytest
(tests/test_utils_and_cli.py::test_runbook_dryrun).
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(out_root: str, img_size: int = 64, epochs: int = 2) -> None:
    env = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}

    def sh(args, **kw):
        r = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=1200,
                           **kw)
        assert r.returncode == 0, (
            f"step failed: {args}\n{r.stdout[-1500:]}\n{r.stderr[-3000:]}")
        return r

    # step 0 stand-in: the fetch scripts need egress — synthesize the same
    # VOCdevkit layout instead
    root = os.path.join(out_root, "VOCdevkit")
    sh(["tools/make_synthetic_data.py", "voc", root, "--n", "24"])

    # step 1: torchvision .pth → converted backbone blob
    import numpy as np
    import torch

    sys.path.insert(0, REPO)
    from tests.test_convert import synth_torchvision_state_dict

    sd = synth_torchvision_state_dict("1.0x", seed=7)
    pth = os.path.join(out_root, "sv2_imagenet.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               pth)
    blob = os.path.join(out_root, "converted")
    sh(["tools/convert_torch_shufflenetv2.py", pth, blob, "--size", "1.0x"])

    # step 2: train the (toy-sized) canonical recipe from the pretrained
    # backbone — real lr, ms+mosaic+EMA+device-augment like the runbook
    save = os.path.join(out_root, "weights")
    sh(["-m", "yolo_nano_tpu.cli.train", "-d", "voc", "--root", root,
        "--voc_sets", "2007", "--img_size", str(img_size),
        "--eval_size", str(img_size), "--batch_size", "8",
        "-ms", "--multi_scale_range", "2", "3", "--mosaic", "--ema",
        "--device_augment", "--cache_images",
        "--max_epoch", str(epochs), "--eval_epoch", str(epochs),
        "--lr", "1e-3", "--lr_epoch", "1000",
        "--pretrained", blob, "--num_workers", "2",
        "--save_folder", save, "-v", "dry"])
    ckpt = os.path.join(save, "voc", "dry", "ckpt")

    # step 3: one set of weights, three resolutions (reference README:58-60)
    for s in (img_size, img_size + 32, img_size + 64):
        r = sh(["-m", "yolo_nano_tpu.cli.eval", "-d", "voc", "--root", root,
                "--img_size", str(s), "--weight", ckpt, "--ema"])
        assert "Mean AP" in r.stdout, r.stdout[-800:]

    # step 4: export + serving load (+ threshold override path)
    artifact = os.path.join(out_root, "artifact")
    sh(["-m", "yolo_nano_tpu.cli.export", "--weight", ckpt, "--out",
        artifact, "-d", "voc", "--img_size", str(img_size), "--ema"])
    code = (
        "from yolo_nano_tpu.serving import load_predictor\n"
        "import numpy as np\n"
        f"p = load_predictor({artifact!r})\n"
        f"q = load_predictor({artifact!r}, conf_thresh=0.25)\n"
        f"x = np.zeros((2, {img_size}, {img_size}, 3), np.float32)\n"
        "assert np.asarray(p(x)[0]).shape[0] == 2 and "
        "np.asarray(q(x)[0]).shape[0] == 2\n"
        "print('serving ok')\n")
    r = sh(["-c", code])
    assert "serving ok" in r.stdout

    # step 5: anchor regeneration tool parses the same tree
    sh(["-m", "yolo_nano_tpu.cli.kmeans_anchor", "--root_voc", root,
        "--voc_sets", "2007", "-size", str(img_size)])
    print("RUNBOOK DRYRUN OK")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/runbook")
    args = ap.parse_args(argv)
    if os.path.isdir(args.out):
        shutil.rmtree(args.out)
    os.makedirs(args.out, exist_ok=True)
    run(args.out)


if __name__ == "__main__":
    main()
