"""Batching input pipeline: fixed-shape padded batches with worker-parallel
augmentation and batch prefetch.

Replaces the reference's torch DataLoader + ragged-list collate
(reference utils/misc.py:45-63, train.py:324-334). Differences, by design:

  * fixed shapes — ground truth is padded to `max_boxes` per image
    (label −1 = padding) so every batch hits the same compiled XLA program;
  * augmentation runs in a thread pool (cv2/numpy release the GIL) with one
    child np.random.Generator per item, all spawned from a single seed —
    deterministic regardless of worker count (the torch loader's fork-time
    global-RNG duplication bug doesn't exist here);
  * an eval variant also carries (scale, offset, h, w, image_id) for
    letterbox-undo, enabling *batched* evaluation (the reference evaluators
    loop single images, evaluator/cocoapi_evaluator.py:65-87).
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from typing import Iterator, List, Tuple

import numpy as np

MAX_BOXES_DEFAULT = 64

# --- process-pool worker side (top-level: must pickle under spawn) ---------
_PP_DATASET = None


def _pp_init(dataset):
    global _PP_DATASET
    _PP_DATASET = dataset
    try:  # keep workers single-threaded: parallelism comes from the pool
        import cv2

        cv2.setNumThreads(0)
    except ImportError:
        pass


def _pp_load(args):
    index, seed_key = args
    rng = np.random.default_rng(seed_key)
    item = _PP_DATASET.pull_item(index, rng)
    # device-augment datasets return (canvas_u8, target, region); host-
    # augment ones (img, target, h, w, scale, offset) — keep the first 3
    return item[:3] if getattr(_PP_DATASET, "device_augment", False) \
        else item[:2]


def pad_targets(targets: List[np.ndarray], max_boxes: int
                ) -> Tuple[np.ndarray, np.ndarray]:
    """[M_i, 5] normalized (x1,y1,x2,y2,cls) per image → boxes [B, max_boxes, 4]
    + labels [B, max_boxes] int32 (−1 padding). Overflow beyond max_boxes is
    dropped largest-index-first (VOC p99 ≈ 20 boxes; mosaic can exceed —
    enlarge max_boxes for mosaic configs)."""
    b = len(targets)
    boxes = np.zeros((b, max_boxes, 4), np.float32)
    labels = np.full((b, max_boxes), -1, np.int32)
    for i, t in enumerate(targets):
        m = min(len(t), max_boxes)
        if m:
            boxes[i, :m] = t[:m, :4]
            labels[i, :m] = t[:m, 4].astype(np.int32)
    return boxes, labels


class DetectionLoader:
    """Iterable over epochs of (images [B,S,S,3] f32 NHWC, boxes, labels) —
    or, for a dataset with device_augment=True, (images uint8, boxes,
    labels, regions [B,5]) feeding the in-graph chain (data/device_aug.py)."""

    def __init__(self, dataset, batch_size: int, max_boxes: int =
                 MAX_BOXES_DEFAULT, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0,
                 drop_last: bool = True, prefetch: int = 2,
                 worker_mode: str = "thread",
                 process_shard: "Tuple[int, int] | None" = None):
        """worker_mode: "thread" (default — cv2/numpy release the GIL) or
        "process" (spawned worker pool; wins when augmentation is dominated
        by GIL-holding python, e.g. the SSD-crop retry loop on crowded
        images, and on many-core hosts). Both modes draw identical per-item
        RNG streams, so the augmented sample sequence is byte-identical.

        process_shard: (process_index, process_count) for multi-controller
        runs — this process materializes ONLY rows
        [pid·B/n, (pid+1)·B/n) of every global batch (`batch_size` stays
        the GLOBAL batch size). Shuffle order and per-item augmentation RNG
        are keyed on global positions, so the union of all processes'
        shards is byte-identical to a single-process run; feed the local
        shard through parallel.multiprocess.global_batch."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"unknown worker_mode {worker_mode!r}")
        self.worker_mode = worker_mode
        if process_shard is not None:
            pid, count = process_shard
            if not (0 <= pid < count):
                raise ValueError(f"bad process_shard {process_shard!r}")
            if batch_size % count:
                raise ValueError(
                    f"global batch_size {batch_size} must divide evenly "
                    f"over {count} processes")
            if not drop_last:
                raise ValueError(
                    "process_shard requires drop_last=True (a ragged final "
                    "batch cannot split evenly across processes)")
        self.process_shard = process_shard
        if (worker_mode == "process"
                and getattr(dataset, "_img_cache", None) is not None):
            import warnings

            warnings.warn(
                "cache_images with worker_mode='process' keeps an "
                "INDEPENDENT decoded-image cache in every spawned worker "
                "(the dataset is pickled once per worker): RAM scales with "
                "num_workers and shuffled epochs gut the hit rate. Prefer "
                "worker_mode='thread' with the cache (one shared copy), or "
                "drop the cache for process workers.", stacklevel=3)
        self._epoch = 0
        self._proc_pool = None

    def set_epoch(self, epoch: int) -> None:
        """Position the loader so the NEXT `__iter__` draws epoch `epoch`'s
        (0-based) shuffle order and augmentation RNG streams. A resumed run
        that calls set_epoch(restored_step // epoch_size) therefore sees the
        SAME sample sequence as an uninterrupted one — without this, every
        fresh construction replays the epoch-0/1/2… streams."""
        self._epoch = int(epoch)

    def _process_pool(self):
        """Lazy persistent process pool (the dataset ships once, at init)."""
        if self._proc_pool is None:
            import multiprocessing as mp
            import os
            import __main__

            # spawn re-imports __main__ in each worker: fail with a real
            # message instead of a cryptic BrokenProcessPool when the parent
            # is a REPL/heredoc (same constraint as torch's DataLoader)
            main_file = getattr(__main__, "__file__", None)
            if main_file is not None and not os.path.exists(main_file):
                raise RuntimeError(
                    "worker_mode='process' needs an importable __main__ "
                    f"(got {main_file!r}); run from a .py file / python -m, "
                    "or use worker_mode='thread'")
            self._proc_pool = cf.ProcessPoolExecutor(
                self.num_workers, mp_context=mp.get_context("spawn"),
                initializer=_pp_init, initargs=(self.dataset,))
        return self._proc_pool

    def close(self) -> None:
        if self._proc_pool is not None:
            self._proc_pool.shutdown(wait=False, cancel_futures=True)
            self._proc_pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        return order

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        order = self._epoch_order()
        self._epoch += 1
        nb = len(self)
        epoch = self._epoch

        def seed_key(pos: int):
            # identical per-item RNG streams in thread and process modes
            return [self.seed, epoch, pos]

        device_mode = getattr(self.dataset, "device_augment", False)

        def load_one(pos: int):
            rng = np.random.default_rng(seed_key(pos))
            item = self.dataset.pull_item(int(order[pos]), rng)
            return item[:3] if device_mode else item[:2]

        def map_batch(pool, lo: int, hi: int):
            if self.worker_mode == "process":
                return list(pool.map(
                    _pp_load, [(int(order[p]), seed_key(p))
                               for p in range(lo, hi)]))
            return list(pool.map(load_one, range(lo, hi)))

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            """Bounded put that also observes `stop` — a consumer abandoning
            the iterator mid-epoch must not leave this thread blocked on a
            full queue holding image batches."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                import contextlib

                if self.worker_mode == "process":
                    pool_cm = contextlib.nullcontext(self._process_pool())
                else:
                    pool_cm = cf.ThreadPoolExecutor(self.num_workers)
                with pool_cm as pool:
                    for bi in range(nb):
                        if stop.is_set():
                            return
                        lo = bi * self.batch_size
                        hi = min(lo + self.batch_size, len(order))
                        if self.process_shard is not None:
                            # only this process's rows of the global batch;
                            # seed_key stays keyed on the GLOBAL position
                            pid, count = self.process_shard
                            per = (hi - lo) // count
                            lo, hi = lo + pid * per, lo + (pid + 1) * per
                        items = map_batch(pool, lo, hi)
                        images = np.stack([it[0] for it in items])
                        boxes, labels = pad_targets([it[1] for it in items],
                                                    self.max_boxes)
                        if device_mode:
                            # in-graph augmentation: images are uint8 base
                            # canvases; regions [B,5] carry the image-region
                            # rect + crop_allowed (data/device_aug.py)
                            regions = np.stack([it[2] for it in items])
                            batch = (images, boxes, labels, regions)
                        else:
                            batch = (images, boxes, labels)
                        if not _put(batch):
                            return
            except BaseException as e:  # surface worker errors, don't hang
                _put(e)
                return
            _put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()


def device_prefetch(iterator, size: int = 2, sharding=None, put_fn=None):
    """Wrap a host batch iterator with asynchronous device placement: up to
    `size` batches live on device ahead of the consumer, overlapping host
    augmentation + transfer with device compute (the double-buffered
    device_put of SURVEY §7.4). `sharding` optionally places batches
    batch-sharded across a mesh; `put_fn(batch_tuple) → tuple` overrides
    placement entirely (multi-controller runs join per-process shards via
    parallel.multiprocess.global_batch, which device_put cannot do)."""
    import collections

    import jax

    queue_: "collections.deque" = collections.deque()

    def put(batch):
        if put_fn is not None:
            return put_fn(batch)
        return tuple(jax.device_put(b, sharding) for b in batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue_.append(put(next(it)))
    except StopIteration:
        pass
    while queue_:
        out = queue_.popleft()
        try:
            queue_.append(put(next(it)))
        except StopIteration:
            pass
        yield out


class EvalLoader:
    """Deterministic batched eval pipeline: yields
    (images, metas) where metas is a list of dicts with scale/offset/size/id.
    The last batch is padded by repeating the final image (fixed shapes);
    `metas` has one entry per REAL image only.

    process_shard=(process_index, process_count): multi-controller mode —
    `batch_size` stays the GLOBAL batch; this process decodes + letterboxes
    ONLY rows [pid·B/n, (pid+1)·B/n) of every global batch (host IO is
    O(dataset/hosts)), while `metas` still covers ALL real rows: their
    letterbox-undo geometry comes from annotation-declared image sizes
    (dataset.image_hw → transforms.letterbox_geometry), no pixel decode.
    Feed the local rows through a make_predict_fn(..., process_shard=…,
    local_rows=True) closure; its replicated detections + the full metas
    make every controller's evaluation identical to single-process."""

    def __init__(self, dataset, img_size: int, batch_size: int,
                 num_workers: int = 4,
                 process_shard: "Tuple[int, int] | None" = None):
        self.dataset = dataset
        self.img_size = img_size
        self.batch_size = batch_size
        self.num_workers = max(num_workers, 1)
        if process_shard is not None:
            pid, count = process_shard
            if not (0 <= pid < count):
                raise ValueError(f"bad process_shard {process_shard!r}")
            if batch_size % count:
                raise ValueError(
                    f"global eval batch {batch_size} must divide evenly "
                    f"over {count} processes")
        self.process_shard = process_shard

    def __len__(self) -> int:
        return -(-len(self.dataset) // self.batch_size)

    def __iter__(self):
        from yolo_nano_tpu.data.transforms import (
            letterbox_geometry,
            val_transform,
        )

        def load_one(i: int):
            img_bgr, img_id = self.dataset.pull_image(i)
            h, w = img_bgr.shape[:2]
            img, scale, offset = val_transform(img_bgr, self.img_size)
            return img, {"scale": scale, "offset": offset, "w": w, "h": h,
                         "id": img_id, "index": i}

        def meta_only(i: int):
            # geometry from annotation metadata — identical to what
            # load_one would compute (letterbox_geometry is pinned against
            # resize_letterbox), no JPEG decode
            h, w = self.dataset.image_hw(i)
            scale, offset = letterbox_geometry(h, w, self.img_size)
            return {"scale": scale, "offset": offset, "w": w, "h": h,
                    "id": self.dataset.ids[i], "index": i}

        n = len(self.dataset)
        shard = self.process_shard
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            for lo in range(0, n, self.batch_size):
                hi = min(lo + self.batch_size, n)
                if shard is None:
                    items = list(pool.map(load_one, range(lo, hi)))
                    images = [it[0] for it in items]
                    while len(images) < self.batch_size:  # pad final batch
                        images.append(images[-1])
                    yield np.stack(images), [it[1] for it in items]
                    continue
                pid, count = shard
                per = self.batch_size // count
                # pad the global index list (repeat the final index) so the
                # final ragged batch still splits evenly over processes
                idxs = list(range(lo, hi))
                idxs += [hi - 1] * (self.batch_size - len(idxs))
                local = idxs[pid * per:(pid + 1) * per]
                # submit both passes up front so XML/JSON meta parsing
                # overlaps the (much costlier) JPEG decode+letterbox
                img_futs = [pool.submit(load_one, i) for i in local]
                meta_futs = [pool.submit(meta_only, i)
                             for i in range(lo, hi)]
                imgs = [f.result()[0] for f in img_futs]
                metas = [f.result() for f in meta_futs]
                yield np.stack(imgs), metas
