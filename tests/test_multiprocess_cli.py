"""End-to-end multi-controller training through the REAL CLI.

Two jax.distributed controllers (2 virtual CPU devices each) run
`python -m yolo_nano_tpu.cli.train --coordinator ...` on a tiny synthetic
VOC set; the losses, eval mAP, and the full saved checkpoint must be
identical to a single-process run over the same 4-device global mesh —
the per-host sharded loading + global_batch + replicated-state path changes
the execution topology, not the math.

The reference has no multi-process training at all (DDP imported, never
constructed — reference train.py:13-14); this is the capability it gestures
at, productized.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(n_devices: int, cache_dir: str | None = None) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # drops any sitecustomize that pre-inits jax
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    if cache_dir is not None:
        # shared persistent compile cache across the controllers: on a
        # loaded box, per-process compile-time skew can exceed XLA's
        # hardcoded 30s Gloo KV-store timeout — a retry that hits the cache
        # compiles in milliseconds and cannot skew (see _run_controllers)
        env["YNT_COMPILE_CACHE"] = cache_dir
    return env


# Infra artifacts of exit/compile skew between controllers on an overloaded
# CI box, not product failures. Gloo: XLA's hardcoded 30 s KV-store timeout
# at init. Heartbeat: a straggler whose coordinator exited (tolerantly,
# after the 300 s shutdown barrier) more than heartbeat_timeout before the
# straggler's own teardown — shutdown_tolerant() absorbs the barrier
# timeout itself, but a >400 s skew can still kill the laggard's heartbeat.
_INFRA_ERRORS = ("gloo context initialization failed",
                 "barrier timed out",
                 "heartbeat")


def _run_controllers(make_args, n_proc: int, devices_per_proc: int,
                     cache_dir: str, attempts: int = 3):
    """Launch the REAL CLI as n_proc jax.distributed controllers and wait.
    `make_args(attempt) -> (argv, save_dir)` — a fresh save dir per attempt
    (the jsonl log appends; a partial failed run must not pollute it).

    Retries (fresh coordinator port) only on the _INFRA_ERRORS skew
    artifacts of an overloaded host, never on product failures. The shared
    compile cache (populated even by the failed attempt) makes the retry
    skew-free. Returns (outs, save_dir)."""
    for attempt in range(attempts):
        args, save = make_args(attempt)
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs = [subprocess.Popen(
            args + ["--coordinator", f"127.0.0.1:{port}",
                    "--num_processes", str(n_proc),
                    "--process_id", str(pid)],
            env=_env(devices_per_proc, cache_dir), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
            for pid in range(n_proc)]
        outs = [p.communicate(timeout=1500) for p in procs]
        if all(p.returncode == 0 for p in procs):
            return outs, save
        if any(marker in se.lower() for _, se in outs
               for marker in _INFRA_ERRORS):
            if attempt < attempts - 1:
                continue
            raise AssertionError(
                f"infra-skew timeout on all {attempts} attempts; "
                "last stderr:\n"
                + "\n".join(se[-1500:] for _, se in outs))
        for pid, (p, (so, se)) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, (
                f"process {pid} failed (attempt {attempt + 1}):\n"
                f"{so[-2000:]}\n{se[-3000:]}")


def _train_args(root: str, save: str) -> list:
    # lr 0: cross-topology trajectory equality at lr>0 is PHYSICALLY
    # untestable for this model — at random init its gradients are violent
    # (momentum traces reach O(100)), and the benign f32 reduction-order
    # skew between device layouts (~1e-7 rel at step 1, measured) amplifies
    # through one update to ~1e-3 and past 1% within a few steps; even two
    # SINGLE-process runs that differ only in device count (2 vs 4 vs 8)
    # diverge 1.4% after ONE step. With lr 0 the params stay frozen, so
    # every logged loss pins the per-epoch DATA stream identity, the eval
    # mAP pins the sharded-eval path exactly, and the checkpointed momentum
    # trace — which still accumulates the raw psum'd gradients — pins the
    # whole backward + cross-host gradient-reduction path to reduction-order
    # precision (a wrong psum factor or a misrouted batch row would be an
    # O(1) mismatch).
    # --device_augment --mosaic: also pins the multi-controller in-graph
    # augmentation path (the per-iter aug key ships as replicated raw key
    # data and is wrapped in-graph) — the key derivation is identical on
    # every process, so the augmented batches must match the single-process
    # run exactly and every tolerance below still holds.
    return ["-m", "yolo_nano_tpu.cli.train", "-d", "voc", "--root", root,
            "--voc_sets", "2007", "--img_size", "64", "--eval_size", "64",
            "--batch_size", "8", "--max_epoch", "2", "--eval_epoch", "2",
            "--num_workers", "2", "--lr", "0", "--no_warm_up",
            "--device_augment", "--mosaic",
            "--seed", "0", "--save_folder", save]


def _with_args(argv: list, **overrides) -> list:
    """Return argv with --key value flags replaced/appended."""
    out = list(argv)
    for key, val in overrides.items():
        flag = f"--{key}"
        if flag in out:
            out[out.index(flag) + 1] = str(val)
        else:
            out += [flag, str(val)]
    return out


def _read_log(save: str) -> list:
    path = os.path.join(save, "voc", "yolo_nano", "train_log.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f]


def _load_ckpt_tree(save: str, step: int | None = None) -> dict:
    """Restore as plain numpy, ignoring saved shardings — the multiprocess
    checkpoint records process-1 device ids (2048+) that no other topology
    can materialize."""
    import jax
    import orbax.checkpoint as ocp

    d = os.path.join(save, "voc", "yolo_nano", "ckpt")
    step = max(int(s) for s in os.listdir(d) if s.isdigit()
               ) if step is None else step
    path = os.path.join(d, str(step), "default")
    ckptr = ocp.PyTreeCheckpointer()
    try:
        meta = ckptr.metadata(path).item_metadata
        tree = meta.tree if hasattr(meta, "tree") else meta
        ra = jax.tree.map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        return step, ckptr.restore(path,
                                   args=ocp.args.PyTreeRestore(
                                       restore_args=ra))
    finally:
        ckptr.close()


def _mean_ap(stdout: str) -> float:
    lines = [ln for ln in stdout.splitlines() if ln.startswith("Mean AP")]
    assert lines, f"no eval output in:\n{stdout[-2000:]}"
    return float(lines[-1].split("=")[1])


def test_multiprocess_cli_matches_single_process(tmp_path):
    from tools.make_synthetic_data import main as make_data

    root = str(tmp_path / "voc")
    make_data(["voc", root, "--n", "30"])  # 24 train / 6 test

    # single controller, 4 virtual devices (the baseline global mesh)
    single_save = str(tmp_path / "single")
    out_single = subprocess.run(
        [sys.executable] + _train_args(root, single_save),
        env=_env(4), cwd=REPO, capture_output=True, text=True, timeout=1500)
    assert out_single.returncode == 0, out_single.stderr[-3000:]

    # two controllers × 2 devices — same 4-device global mesh, real CLI
    outs, mp_save = _run_controllers(
        lambda attempt: (
            [sys.executable] + _train_args(root,
                                           str(tmp_path / f"mp{attempt}")),
            str(tmp_path / f"mp{attempt}")),
        n_proc=2, devices_per_proc=2,
        cache_dir=str(tmp_path / "xla_cache"))

    # losses logged by process 0 equal the single-process run's
    log_single = _read_log(single_save)
    log_mp = _read_log(mp_save)
    assert len(log_single) == len(log_mp) > 0
    for a, b in zip(log_single, log_mp):
        assert a["epoch"] == b["epoch"] and a["iter"] == b["iter"]
        np.testing.assert_allclose(a["loss/total"], b["loss/total"],
                                   rtol=1e-5)

    # eval hook ran sharded across both controllers with the same result
    # (identical params at lr 0 → identical detections)
    assert _mean_ap(out_single.stdout) == pytest.approx(
        _mean_ap(outs[0][0]), abs=1e-6)
    # process 1 prints nothing (single log stream)
    assert "Mean AP" not in outs[1][0]

    # the full train state checkpoint matches. params must be IDENTICAL
    # (lr 0 → zero updates from identical init); BN running stats pin the
    # whole data stream (any misrouted/mismatched batch moves them O(1));
    # the momentum trace accumulates the raw psum'd gradients — compared by
    # per-leaf norm + direction, NOT elementwise: bias/BN gradients are
    # residues of ~1e5-scale cancelling partial sums (e.g. conv1.bias sums
    # 24 imgs x 4096 positions), so the topologies' ~1e-6 reduction-order
    # skew legitimately shows up as a few % of the cancelled residue.
    # A wrong psum factor fails the norm ratio (x2); a misrouted batch row
    # fails the cosine.
    step_s, tree_s = _load_ckpt_tree(single_save)
    step_m, tree_m = _load_ckpt_tree(mp_save)
    assert step_s == step_m
    import jax

    assert jax.tree.structure(tree_s) == jax.tree.structure(tree_m)
    for (kp, ls), (_, lm) in zip(
            jax.tree_util.tree_leaves_with_path(tree_s["params"]),
            jax.tree_util.tree_leaves_with_path(tree_m["params"])):
        np.testing.assert_array_equal(np.asarray(ls), np.asarray(lm),
                                      err_msg=jax.tree_util.keystr(kp))
    for (kp, ls), (_, lm) in zip(
            jax.tree_util.tree_leaves_with_path(tree_s["stats"]),
            jax.tree_util.tree_leaves_with_path(tree_m["stats"])):
        np.testing.assert_allclose(np.asarray(ls), np.asarray(lm),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(kp))
    # global (concatenated) comparison, NOT per-leaf: biases feeding into
    # BN have mathematically-zero gradients, so their traces are pure
    # cancellation residue with random direction — per-leaf cosine there is
    # meaningless. Globally the informative leaves dominate the norm, while
    # both bug classes still fail: a wrong psum factor doubles the norm
    # ratio; a misrouted batch row decorrelates the direction.
    a = np.concatenate([np.asarray(x, np.float64).ravel()
                        for x in jax.tree.leaves(tree_s["opt_state"])
                        if np.ndim(x)])
    b = np.concatenate([np.asarray(x, np.float64).ravel()
                        for x in jax.tree.leaves(tree_m["opt_state"])
                        if np.ndim(x)])
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    assert abs(na - nb) <= 0.02 * na, (na, nb)
    cos = float(a @ b) / (na * nb)
    assert cos > 0.99, cos


def test_multiprocess_cli_resume(tmp_path):
    """--resume auto under jax.distributed: every controller restores the
    full train state through orbax (the multi-host RESTORE path — the test
    above only exercises the multi-host save), training continues at the
    epoch derived from the restored step, and the continued run checkpoints
    at the continued step. The reference cannot resume at all beyond bare
    weights (reference train.py:49-50,160-162 — no optimizer/EMA state).

    lr 0 makes the invariants exact: params in the step-12 checkpoint must
    be BIT-IDENTICAL to the step-6 checkpoint they were restored from (zero
    updates), while the BN running stats must keep moving (epochs 2-3 data
    flowed through the restored state).
    """
    import shutil

    from tools.make_synthetic_data import main as make_data

    root = str(tmp_path / "voc")
    make_data(["voc", root, "--n", "30"])  # 24 train → 3 iters/epoch
    cache = str(tmp_path / "xla_cache")

    outs_a, save_a = _run_controllers(
        lambda attempt: (
            [sys.executable] + _train_args(root,
                                           str(tmp_path / f"a{attempt}")),
            str(tmp_path / f"a{attempt}")),
        n_proc=2, devices_per_proc=2, cache_dir=cache)

    def resume_args(attempt):
        save = str(tmp_path / f"r{attempt}")
        # fresh copy of the finished run per attempt: a Gloo-timeout retry
        # must not resume from a log/ckpt polluted by the failed attempt
        shutil.copytree(save_a, save)
        argv = _with_args(_train_args(root, save),
                          max_epoch=4, resume="auto")
        return [sys.executable] + argv, save

    outs_r, save_r = _run_controllers(resume_args, n_proc=2,
                                      devices_per_proc=2, cache_dir=cache)

    # process 0 restored and derived the continuation epoch (process 1's
    # stdout is muted; its successful restore is pinned by returncode 0 —
    # a failed orbax barrier would hang or crash it)
    assert "resumed @ step 6 (epoch 2)" in outs_r[0][0], outs_r[0][0][-2000:]
    # log continued in place: epochs 0,1 from the first run + 2,3 appended
    assert [e["epoch"] for e in _read_log(save_r)] == [0, 1, 2, 3]
    # the continued run ran its eval hook (epoch-3) and checkpointed @ 12
    assert "Mean AP" in outs_r[0][0]
    step, tree12 = _load_ckpt_tree(save_r)
    assert step == 12
    _, tree6 = _load_ckpt_tree(save_r, step=6)
    import jax

    for (kp, l6), (_, l12) in zip(
            jax.tree_util.tree_leaves_with_path(tree6["params"]),
            jax.tree_util.tree_leaves_with_path(tree12["params"])):
        np.testing.assert_array_equal(np.asarray(l6), np.asarray(l12),
                                      err_msg=jax.tree_util.keystr(kp))
    moved = any(not np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(tree6["stats"]),
                                jax.tree.leaves(tree12["stats"])))
    assert moved, "BN stats frozen across the resumed epochs"


def test_compile_barrier_rendezvous(monkeypatch):
    """compile_barrier must be a no-op single-process and a coordination-
    service rendezvous (NOT a device collective) multi-process — it is the
    guard between XLA compilation and first execution of each collective
    executable. Without it, a warm persistent compile cache is fatal to any
    multi-controller rerun: JAX writes cache entries from process 0 only
    AND computes process-dependent keys for the same SPMD program
    (measured: the same jit_train_step hashes to f623133f… on process 0
    and f2dc0663… on process 1), so process 0 loads in milliseconds while
    the others recompile for minutes, and process 0's first execution dies
    in Gloo's hardcoded 30 s context-init handshake
    (`GetKeyValue() timed out with key: cpu:gloo/...`)."""
    from jax._src.distributed import global_state

    from yolo_nano_tpu.parallel.multiprocess import compile_barrier

    # no-op when distributed was never initialized
    monkeypatch.setattr(global_state, "client", None, raising=False)
    compile_barrier("step64")

    calls = []

    class FakeClient:
        def wait_at_barrier(self, barrier_id, timeout_ms,
                            process_ids=None):
            calls.append((barrier_id, timeout_ms))

    monkeypatch.setattr(global_state, "client", FakeClient(), raising=False)
    compile_barrier("step64")
    assert calls == [("ynt_compile:step64", 1_200_000)]


def test_shutdown_tolerant_absorbs_barrier_failure(monkeypatch):
    """A shutdown-barrier DEADLINE_EXCEEDED at teardown (exit skew between
    controllers on a loaded host) must not flip a completed run to a nonzero
    exit: shutdown_tolerant() absorbs the exception AND clears the leftover
    global_state.client so JAX's atexit hook cannot re-raise the same
    failure at interpreter exit."""
    import jax
    from jax._src.distributed import global_state

    from yolo_nano_tpu.parallel.multiprocess import shutdown_tolerant

    # no-op when distributed was never initialized
    shutdown_tolerant()

    calls = []

    class FakeService:
        def shutdown(self):
            calls.append("service")

    def boom():
        raise RuntimeError(
            "Failed to disconnect from coordination service: "
            "DEADLINE_EXCEEDED: Barrier timed out. Id: Shutdown::0")

    monkeypatch.setattr(jax.distributed, "shutdown", boom)
    monkeypatch.setattr(global_state, "client", object(), raising=False)
    monkeypatch.setattr(global_state, "service", FakeService(),
                        raising=False)
    shutdown_tolerant()  # must not raise
    assert global_state.client is None
    assert global_state.service is None
    assert calls == ["service"]  # coordinator side still torn down
