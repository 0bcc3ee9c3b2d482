"""Training driver (reference train.py capability, TPU-native execution).

Usage:
    python -m yolo_nano_tpu.cli.train -d voc --root /data/VOCdevkit \
        --batch_size 32 --img_size 640 -ms --ema --max_epoch 150 \
        --lr_epoch 90 120

Differences from the reference driver, by design:
  * one jitted train step per multi-scale bucket, compiled once and cached
    (the reference mutates model.set_grid and re-interpolates per iteration);
  * target assignment happens on device inside the step (no host numpy loop);
  * full train state (optimizer/EMA/step) checkpoints via orbax, so --resume
    actually resumes (the reference loses momentum/EMA/LR position);
  * when --ema is set, evaluation and export use the EMA weights;
  * data parallelism over all local devices via a 1-D mesh when >1 device.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="YOLO-Nano-TPU training")
    p.add_argument("--img_size", default=640, type=int)
    p.add_argument("--batch_size", default=16, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--max_epoch", type=int, default=150)
    p.add_argument("--lr_epoch", nargs="+", default=[90, 120], type=int)
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("-r", "--resume", default=None, type=str,
                   help="checkpoint dir to resume full train state from, or "
                        "'auto' to pick up this run's latest checkpoint")
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--worker_mode", default="thread",
                   choices=["thread", "process"],
                   help="augmentation worker pool type (process wins when "
                        "GIL-bound python dominates, e.g. crowded-image "
                        "SSD-crop retries on many-core hosts)")
    p.add_argument("--cache_images", action="store_true", default=False,
                   help="memoize decoded images in RAM (skips JPEG decode "
                        "after the first epoch; budget ~H*W*3 bytes/image)")
    p.add_argument("--eval_epoch", type=int, default=10)
    p.add_argument("--save_folder", default="weights/", type=str)
    p.add_argument("-v", "--version", default="yolo_nano")
    p.add_argument("--root", default="/data", help="dataset root")
    p.add_argument("-d", "--dataset", default="voc", choices=["voc", "coco"])
    p.add_argument("--voc_sets", default="2007,2012",
                   help="comma-separated VOC years for trainval")
    p.add_argument("--ema", action="store_true", default=False)
    p.add_argument("-ms", "--multi_scale", action="store_true", default=False)
    p.add_argument("--multi_scale_range", nargs=2, default=[10, 20],
                   type=int, metavar=("LO", "HI"),
                   help="multi-scale bucket range: sizes drawn from "
                        "randint(LO, HI)·32 (the reference parses this flag "
                        "but hardcodes 10..19, train.py:204 — here it works)")
    p.add_argument("-no_wp", "--no_warm_up", action="store_true",
                   default=False)
    p.add_argument("--wp_epoch", type=int, default=2)
    p.add_argument("--mosaic", action="store_true", default=False)
    p.add_argument("--backbone", default="1.0x")
    p.add_argument("--pretrained", default=None,
                   help="ImageNet backbone checkpoint dir (from "
                        "tools/convert_torch_shufflenetv2.py)")
    p.add_argument("--eval_size", default=416, type=int)
    p.add_argument("--max_boxes", default=64, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--log_file", default=None, type=str,
                   help="JSONL metrics log (default <save>/train_log.jsonl)")
    p.add_argument("--bf16", action="store_true", default=False,
                   help="bfloat16 activations (params/BN stats/losses stay "
                        "f32; MXU accumulates f32 natively)")
    p.add_argument("--device_augment", action="store_true", default=False,
                   help="run the SSD augmentation chain INSIDE the jitted "
                        "train step (data/device_aug.py): host workers only "
                        "decode + uint8-letterbox, so small hosts stop being "
                        "the training bottleneck (DESIGN §8.2)")
    p.add_argument("--tfboard", action="store_true", default=False,
                   help="also log losses to TensorBoard (reference "
                        "train.py:150-157 capability)")
    p.add_argument("--profile_steps", default=0, type=int,
                   help="capture a jax.profiler trace for N steps "
                        "(written to <save>/profile)")
    # multi-controller (one process per host) launch surface; the reference
    # imports DDP but never constructs it (reference train.py:13-14) — here
    # a real multi-host pod trains through the same CLI. Env fallbacks
    # (YNT_COORDINATOR / YNT_NUM_PROCESSES / YNT_PROCESS_ID) let cluster
    # launchers inject the topology without editing command lines.
    p.add_argument("--coordinator", default=os.environ.get("YNT_COORDINATOR"),
                   help="host:port of process 0 for jax.distributed — "
                        "setting this enables multi-process training; "
                        "batch_size stays the GLOBAL batch")
    p.add_argument("--num_processes", type=int,
                   default=int(os.environ.get("YNT_NUM_PROCESSES", 0)) or None)
    p.add_argument("--process_id", type=int,
                   default=(int(os.environ["YNT_PROCESS_ID"])
                            if "YNT_PROCESS_ID" in os.environ else None))
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.multi_scale:
        lo, hi = args.multi_scale_range
        if not 0 < lo < hi:
            # fail at parse time, not at iteration 10 after minutes of
            # compilation (rng.integers needs lo < hi; HI is exclusive)
            raise SystemExit(
                f"--multi_scale_range needs 0 < LO < HI (exclusive), got "
                f"{lo} {hi}; e.g. '10 20' draws sizes 320..608")
    if args.coordinator:
        # must run before anything touches the backend (compile-cache
        # included): jax.distributed stitches all processes' devices into
        # one global device set
        if args.num_processes is None or args.process_id is None:
            raise SystemExit("--coordinator needs --num_processes and "
                             "--process_id (or the YNT_* env vars)")
        from yolo_nano_tpu.parallel.multiprocess import initialize

        initialize(args.coordinator, args.num_processes, args.process_id)
    from yolo_nano_tpu.utils.compile_cache import enable as _cc_enable
    _cc_enable()  # persistent XLA cache: remote-TPU compiles are 1-4 min
    import jax
    import jax.numpy as jnp

    pid = jax.process_index()
    pcount = jax.process_count()
    is_main = pid == 0
    if not is_main:
        # one log stream: non-0 controllers run the identical program (SPMD)
        # and would print identical lines — keep stdout for process 0 only
        import builtins

        builtins.print = lambda *a, **k: None

    from yolo_nano_tpu.cli.common import build_config, make_predict_fn
    from yolo_nano_tpu.data.coco import COCODataset
    from yolo_nano_tpu.data.loader import DetectionLoader
    from yolo_nano_tpu.data.voc import VOCDataset
    from yolo_nano_tpu.evaluation.evaluator import COCOEvaluator, VOCEvaluator
    from yolo_nano_tpu.models.yolo_nano import init_yolo_nano
    from yolo_nano_tpu.parallel.mesh import make_mesh
    from yolo_nano_tpu.train.schedule import warmup_step_schedule
    from yolo_nano_tpu.train.state import create_train_state, make_optimizer
    from yolo_nano_tpu.train.train_step import make_train_step
    from yolo_nano_tpu.utils.checkpoint import CheckpointManager
    from yolo_nano_tpu.utils.flops import flops_and_params

    cfg = build_config(args.dataset, backbone=args.backbone)
    save_dir = os.path.join(args.save_folder, args.dataset, args.version)
    os.makedirs(save_dir, exist_ok=True)
    log_path = args.log_file or os.path.join(save_dir, "train_log.jsonl")

    # dataset + evaluator (reference build_dataset, train.py:282-321)
    if args.dataset == "voc":
        sets = [(y.strip(), "trainval")
                for y in args.voc_sets.split(",") if y.strip()]
        dataset = VOCDataset(args.root, img_size=args.img_size,
                             image_sets=sets, mosaic=args.mosaic)
        evaluator = VOCEvaluator(args.root, args.eval_size,
                                 batch_size=args.batch_size,
                                 num_workers=args.num_workers,
                                 process_shard=(pid, pcount) if pcount > 1
                                 else None)
    else:
        dataset = COCODataset(args.root, image_set="train2017",
                              img_size=args.img_size, mosaic=args.mosaic)
        evaluator = COCOEvaluator(args.root, args.eval_size,
                                  batch_size=args.batch_size,
                                  num_workers=args.num_workers,
                                  process_shard=(pid, pcount) if pcount > 1
                                  else None)

    # mosaic merges 4 images' ground truth — scale the padding budget so
    # crowded mosaics don't silently truncate boxes
    max_boxes = args.max_boxes * (4 if args.mosaic else 1)
    if args.device_augment:
        dataset.device_augment = True
    if args.cache_images:
        dataset.enable_image_cache()
    loader = DetectionLoader(dataset, args.batch_size,
                             max_boxes=max_boxes,
                             num_workers=args.num_workers, seed=args.seed,
                             worker_mode=args.worker_mode,
                             process_shard=(pid, pcount) if pcount > 1
                             else None)
    epoch_size = len(loader)

    params, stats = init_yolo_nano(jax.random.key(args.seed), cfg)
    if args.pretrained:
        # ImageNet-pretrained trunk (reference backbone/shufflenetv2.py:177-180)
        from yolo_nano_tpu.utils.checkpoint import load_params

        blob = load_params(args.pretrained,
                           {"params": params["backbone"],
                            "stats": stats["backbone"]})
        params = dict(params, backbone=blob["params"])
        stats = dict(stats, backbone=blob["stats"])
        print(f"loaded pretrained backbone from {args.pretrained}")
    if is_main:  # pure local compile/report — no collective work
        flops_and_params(params, stats, cfg, args.img_size)

    schedule = warmup_step_schedule(args.lr, epoch_size,
                                    wp_epochs=args.wp_epoch,
                                    lr_epochs=tuple(args.lr_epoch),
                                    warmup=not args.no_warm_up)
    tx = make_optimizer(schedule)
    state = create_train_state(params, stats, tx, use_ema=args.ema)

    ckpt = CheckpointManager(os.path.join(save_dir, "ckpt"))
    start_epoch = args.start_epoch
    if args.resume:
        resume_dir = (os.path.join(save_dir, "ckpt")
                      if args.resume == "auto" else args.resume)
        mgr = CheckpointManager(resume_dir) if args.resume != "auto" else ckpt
        if args.resume == "auto" and mgr.latest_step() is None:
            print("no checkpoint yet — starting fresh")
        else:
            state = mgr.restore(state)
            # full state restores optimizer/EMA/LR position (the reference's
            # --resume reloads weights only, SURVEY §5.3); epoch derived from
            # the restored step unless --start_epoch overrides
            start_epoch = max(start_epoch, int(state.step) // epoch_size)
            print(f"resumed @ step {int(state.step)} (epoch {start_epoch})")

    # data-parallel mesh over the most devices that divide the batch evenly;
    # multi-controller runs must use EVERY global device (each process's
    # chips participate in the same SPMD program)
    n_dev = jax.device_count()
    if pcount > 1:
        if args.batch_size % n_dev:
            raise SystemExit(
                f"multi-process training needs global batch_size "
                f"({args.batch_size}) divisible by the global device count "
                f"({n_dev})")
        n_use = n_dev
    else:
        n_use = max(d for d in range(1, n_dev + 1)
                    if args.batch_size % d == 0)
    mesh = make_mesh(n_use) if n_use > 1 else None
    if mesh is not None:
        print(f"data-parallel over {n_use}/{n_dev} devices"
              + (f" across {pcount} processes" if pcount > 1 else ""))
    if pcount > 1:
        # identical deterministic host state on every process (same seed,
        # same restore) → globally-replicated jax.Arrays on the mesh
        from yolo_nano_tpu.parallel.multiprocess import replicate_tree

        state = replicate_tree(mesh, state)

    steps = {}  # train_size → compiled step (multi-scale buckets)

    def get_step(size: int):
        if size not in steps:
            augment = None
            if args.device_augment:
                from yolo_nano_tpu.data.device_aug import make_augment_fn

                # mosaic composes IN-GRAPH from the batch's canvases
                # (device_aug.compose_mosaic) — the host never builds 2S
                # canvases in device mode
                augment = make_augment_fn(
                    size, out_dtype=jnp.bfloat16 if args.bf16
                    else jnp.float32, mosaic=args.mosaic)
            fn = make_train_step(cfg, tx, size, mesh=mesh, augment=augment)
            if pcount > 1:
                # compile-then-barrier: on the first call, finish XLA
                # compilation on EVERY controller before ANY controller
                # executes — first execution lazily initializes cross-host
                # comm contexts under short hardcoded timeouts, and the
                # persistent compile cache makes compile latency wildly
                # asymmetric across controllers (process-0-only writes,
                # process-dependent keys — see
                # parallel.multiprocess.compile_barrier)
                from yolo_nano_tpu.parallel.multiprocess import (
                    compile_barrier)

                def first_call(*a, _fn=fn, _size=size):
                    compiled = _fn.lower(*a).compile()
                    compile_barrier(f"step{_size}")
                    steps[_size] = compiled
                    return compiled(*a)

                fn = first_call
            steps[size] = fn
        return steps[size]

    tb_writer = None
    if args.tfboard and is_main:
        try:
            from torch.utils.tensorboard import SummaryWriter
        except ImportError as e:
            raise SystemExit(
                "--tfboard needs a TensorBoard event writer; install the "
                "optional extra (pip install 'yolo-nano-tpu[tb]') or drop "
                f"the flag — JSONL metrics at {log_path} are always written "
                f"regardless. ({e})")
        tb_writer = SummaryWriter(os.path.join(save_dir, "tb"))

    rng = np.random.default_rng(args.seed)
    train_size = args.img_size
    if args.multi_scale and start_epoch > 0:
        # resume determinism: fast-forward the size stream past the draws
        # an uninterrupted run would have made (one per 10 iters, starting
        # at iter 10), so the resumed run trains on the SAME size schedule
        # — train_size lands on the carried-over last draw, matching the
        # loader's set_epoch and the global-iteration augment keys
        lo, hi = args.multi_scale_range
        for _ in range(start_epoch * max(0, (epoch_size - 1) // 10)):
            train_size = int(rng.integers(lo, hi)) * 32
    # metrics log: process 0 writes, the rest sink (identical SPMD values)
    log_f = open(log_path if is_main else os.devnull, "a")
    profiling = False

    from yolo_nano_tpu.data.loader import device_prefetch
    from yolo_nano_tpu.parallel.mesh import batch_sharding

    in_dtype = jnp.bfloat16 if args.bf16 else np.float32
    batch_sh = batch_sharding(mesh) if mesh is not None else None
    put_fn = None
    if pcount > 1:
        # the loader yields ONLY this process's batch rows; join them into
        # global batch-sharded arrays (per-host loading, no redundant IO)
        from yolo_nano_tpu.parallel.multiprocess import global_batch

        def put_fn(batch):
            out = global_batch(mesh, *batch)
            return out if isinstance(out, tuple) else (out,)

    def host_batches():
        if args.device_augment:
            # images stay uint8 (4× less transfer than f32); the augment
            # casts to the compute dtype on device after normalization
            yield from loader
            return
        for images, boxes_, labels_ in loader:
            yield images.astype(in_dtype), boxes_, labels_

    # data-order continuity: position the loader at start_epoch so a resumed
    # (or --start_epoch) run draws the same shuffle/augment streams an
    # uninterrupted run would have (loader constructions start at epoch 0)
    loader.set_epoch(start_epoch)

    t0 = time.time()
    for epoch in range(start_epoch, args.max_epoch):
        # double-buffered device placement: host augmentation + transfer
        # overlap device compute
        batches = device_prefetch(host_batches(), size=2, sharding=batch_sh,
                                  put_fn=put_fn)
        for iter_i, batch in enumerate(batches):
            images, boxes, labels = batch[:3]
            if args.profile_steps and not profiling and \
                    epoch == start_epoch and iter_i == 2:  # skip compiles
                # start_epoch, not 0: --profile_steps must also work on a
                # resumed run
                jax.profiler.start_trace(os.path.join(save_dir, "profile"))
                profiling = True
            elif profiling and iter_i == min(2 + args.profile_steps,
                                             epoch_size - 1):
                # clamp to the epoch end: iter_i resets each epoch, so an
                # over-long --profile_steps would otherwise never stop the
                # trace (lost at exit, overhead for the whole run)
                jax.profiler.stop_trace()
                profiling = False
                print(f"profiler trace → {save_dir}/profile")
            # multi-scale trick (reference train.py:202-205)
            if args.multi_scale and iter_i % 10 == 0 and iter_i > 0:
                lo, hi = args.multi_scale_range
                train_size = int(rng.integers(lo, hi)) * 32
            step_fn = get_step(train_size if args.multi_scale
                               else args.img_size)
            if args.device_augment:
                # keyed on the GLOBAL iteration so a resumed run draws the
                # same augmentation stream as an uninterrupted one
                aug_key = jax.random.fold_in(
                    jax.random.key(args.seed ^ 0x0DE7A06),
                    epoch * epoch_size + iter_i)
                if pcount > 1:
                    # every process derives the identical key; ship it as
                    # raw key data (wrapped in-graph by the train step)
                    from yolo_nano_tpu.parallel.multiprocess import (
                        replicate_tree as _repl)

                    aug_key = _repl(mesh, jax.random.key_data(aug_key))
                state, metrics = step_fn(state, images, boxes, labels,
                                         batch[3], aug_key)
            else:
                state, metrics = step_fn(state, images, boxes, labels)
            if iter_i % 10 == 0:
                m = {k: float(v) for k, v in metrics.items()}
                lr = float(schedule(int(state.step)))
                dt = time.time() - t0
                t0 = time.time()
                print(f"[Epoch {epoch + 1}/{args.max_epoch}]"
                      f"[Iter {iter_i}/{epoch_size}][lr {lr:.6f}]"
                      f"[Loss: obj {m['loss/obj']:.2f} || cls "
                      f"{m['loss/cls']:.2f} || bbox {m['loss/bbox']:.2f} || "
                      f"iou {m['loss/iou']:.2f} || total "
                      f"{m['loss/total']:.2f} || size "
                      f"{train_size if args.multi_scale else args.img_size} "
                      f"|| time {dt:.2f}]", flush=True)
                log_f.write(json.dumps(
                    {"epoch": epoch, "iter": iter_i,
                     "step": int(state.step), "lr": lr,
                     "size": (train_size if args.multi_scale
                              else args.img_size), **m}) + "\n")
                log_f.flush()
                if tb_writer is not None:
                    gs = iter_i + epoch * epoch_size
                    tb_writer.add_scalar("obj loss", m["loss/obj"], gs)
                    tb_writer.add_scalar("cls loss", m["loss/cls"], gs)
                    tb_writer.add_scalar("box loss", m["loss/bbox"], gs)
                    tb_writer.add_scalar("iou loss", m["loss/iou"], gs)

        if (epoch + 1) % args.eval_epoch == 0:
            eval_params = state.ema_params if args.ema else state.params
            eval_stats = state.ema_stats if args.ema else state.stats
            # eval fans out over the same data-parallel mesh as training
            # (batch_size % n_use == 0 by construction of n_use, and
            # EvalLoader pads the final batch to batch_size, so every eval
            # batch is mesh-divisible)
            predict_fn = make_predict_fn(
                eval_params, eval_stats, cfg, args.eval_size, mesh=mesh,
                process_shard=(pid, pcount) if pcount > 1 else None,
                local_rows=pcount > 1)
            evaluator.evaluate(predict_fn)
            ckpt.save(int(state.step), state)
            print(f"saved checkpoint @ step {int(state.step)}")
    ckpt.save(int(state.step), state, wait=True)
    log_f.close()
    if pcount > 1:
        # the run is durably saved; a shutdown-barrier race between
        # controllers with exit skew must not fail the job
        from yolo_nano_tpu.parallel.multiprocess import shutdown_tolerant

        shutdown_tolerant()


if __name__ == "__main__":
    main()
