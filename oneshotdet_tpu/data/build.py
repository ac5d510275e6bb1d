"""Data loader assembly (reference: maskrcnn_benchmark/data/build.py).

make_data_loader wires dataset + sampler + collator into a prefetching
iterator of padded numpy batches. Differences from the reference that matter
on TPU:

  - batches never shuffle again at loader level (the episodic index list is
    pre-shuffled with seed 6666 — build.py:119 sets shuffle=False too);
  - batches are grouped by image orientation so each compiles to one bucket;
  - a background thread pool decodes JPEGs and a prefetch queue keeps the
    accelerator fed (replaces torch DataLoader workers).
"""

from __future__ import annotations

import os
import queue
import threading

import numpy as np
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

from .collate import BatchCollator
from .datasets.coco import COCODataset
from .paths_catalog import DatasetCatalog
from .samplers import (
    DistributedSampler,
    grouped_batches,
    grouped_iteration_batches,
    iterate_batches,
    iteration_based_batches,
)
from .transforms import build_fused_transforms, build_transforms


def build_dataset(cfg, dataset_name: str, is_train: bool):
    info = DatasetCatalog.get(dataset_name)
    from ..csrc import load as load_native

    if load_native() is not None:
        transforms = build_fused_transforms(cfg, is_train)
    else:
        transforms = build_transforms(cfg, is_train)
    if info["factory"] == "COCODataset":
        return COCODataset(
            cfg,
            ann_file=info["args"]["ann_file"],
            root=info["args"]["root"],
            is_train=is_train,
            transforms=transforms,
        )
    raise ValueError(f"unknown dataset factory {info['factory']}")


_WORKER_STATE: dict = {}


def _shm_worker(task_q, result_q):
    """Forked worker loop: decode + fused transform; query pixels written
    straight into the inherited shared ring slab, everything small returned
    through the result queue."""
    ds = _WORKER_STATE["dataset"]
    col = _WORKER_STATE["collator"]
    slabs = _WORKER_STATE["slabs"]          # list of raw shm buffers
    while True:
        task = task_q.get()
        if task is None:
            return
        ring, slot, idx, query_hw, batch_size = task
        try:
            parts = col.item_arrays(ds[idx], tuple(query_hw))
            q = parts.pop("query_pixels")
            view = np.ndarray((batch_size,) + q.shape, np.float32,
                              buffer=slabs[ring])
            view[slot] = q
            result_q.put((ring, slot, q.shape, parts, None))
        except Exception as e:  # surface worker errors to the parent
            result_q.put((ring, slot, None, None, repr(e)))


class ProcessLoader:
    """Worker-PROCESS loader with a shared-memory query ring.

    The reference's torch DataLoader uses worker processes + shared-memory
    tensors (SURVEY §2.3); thread workers are GIL-bound (measured ~10x
    slower on production-size JPEGs) and naive process workers spend more
    time pickling the 12 MB f32 query tensors than decoding them. Here
    JPEG decode + the fused native resize/normalize/pad run in forked
    workers that write query pixels directly into one of ``prefetch + 2``
    shared batch slabs; only supports, GT and metadata ride the result
    queue.
    """

    def __init__(self, dataset, batch_iter, collator, num_workers=4,
                 prefetch=3, bound_hw_fn=None, max_query_area=None):
        self.dataset = dataset
        self.batch_iter = batch_iter
        self.collator = collator
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        # bound_hw_fn(idx) -> (h, w) upper bound of the transformed query
        # size (from annotation metadata; no decode), used for bucket choice
        self.bound_hw_fn = bound_hw_fn
        # upper bound on any batch bucket's h*w (slab sizing); derived from
        # the resize config by make_data_loader
        self.max_query_area = max_query_area

    def _bucket(self, batch_idx):
        if self.bound_hw_fn is None:
            return self.collator.query_bucket_for([])
        return self.collator.query_bucket_for(
            [self.bound_hw_fn(i) for i in batch_idx])

    def __iter__(self) -> Iterator[dict]:
        import collections
        import multiprocessing as mp

        ctx = mp.get_context("fork")
        max_hw = max((h * w for h, w in self.collator.query_buckets),
                     default=832 * 1216)
        if self.max_query_area is not None:
            # the fallback bucket (no configured bucket fits) rounds the
            # batch max up to /32 — bound it by the resize-config extremes
            max_hw = max(max_hw, self.max_query_area)
        # batch size is only known per batch; size slabs for the observed max
        src = self.batch_iter() if callable(self.batch_iter) else self.batch_iter
        batches = iter(src)
        try:
            first = next(batches)
        except StopIteration:
            return
        bmax = max(len(first), 1)
        rings = self.prefetch + 2
        slab_bytes = bmax * max_hw * 3 * 4
        slabs = [ctx.RawArray("b", slab_bytes) for _ in range(rings)]

        # module globals inherited by fork; workers for ONE loader iteration
        # fork here, so interleaved __iter__ calls on different loaders each
        # get a consistent snapshot (the dict is rebound before every fork)
        _WORKER_STATE["dataset"] = self.dataset
        _WORKER_STATE["collator"] = self.collator
        _WORKER_STATE["slabs"] = slabs
        task_q: mp.Queue = ctx.Queue()
        result_q: mp.Queue = ctx.Queue()
        procs = [ctx.Process(target=_shm_worker, args=(task_q, result_q),
                             daemon=True)
                 for _ in range(self.num_workers)]
        for p in procs:
            p.start()

        def batch_stream():
            yield first
            yield from batches

        submitted: collections.deque = collections.deque()  # (ring, n, hw)
        results: dict = {}

        def submit(bi, ring, batch_idx):
            hw = self._bucket(batch_idx)
            if len(batch_idx) > bmax:
                raise RuntimeError("batch larger than first batch")
            for s, idx in enumerate(batch_idx):
                task_q.put((ring, s, idx, hw, bmax))
            submitted.append((bi, ring, len(batch_idx)))

        try:
            stream = enumerate(batch_stream())
            exhausted = False
            next_ring = 0
            inflight_limit = rings - 1
            while True:
                while not exhausted and len(submitted) < inflight_limit:
                    try:
                        bi, batch_idx = next(stream)
                    except StopIteration:
                        exhausted = True
                        break
                    submit(bi, next_ring, batch_idx)
                    next_ring = (next_ring + 1) % rings
                if not submitted:
                    break
                bi, ring, n = submitted[0]
                got = results.setdefault(ring, [None] * bmax)
                have = sum(x is not None for x in got[:n])
                while have < n:
                    try:
                        r_ring, slot, qshape, parts, err = result_q.get(timeout=60)
                    except queue.Empty:
                        dead = [p.pid for p in procs if not p.is_alive()]
                        if dead:
                            raise RuntimeError(
                                f"loader worker(s) died (pids {dead}) — "
                                "likely OOM-killed during decode") from None
                        continue  # just slow (cold cache / huge image)
                    if err is not None:
                        raise RuntimeError(f"loader worker failed: {err}")
                    results.setdefault(r_ring, [None] * bmax)[slot] = (qshape, parts)
                    if r_ring == ring:
                        have += 1
                submitted.popleft()
                ready = results.pop(ring)[:n]
                qshape = ready[0][0]
                slab = np.ndarray((bmax,) + qshape, np.float32,
                                  buffer=slabs[ring])
                yield self.collator.assemble([p for _, p in ready],
                                             query_pixels=slab[:n])
        finally:
            for _ in procs:
                task_q.put(None)
            for p in procs:
                p.join(timeout=2)
                if p.is_alive():
                    p.terminate()


class PrefetchingLoader:
    """Iterates batches of collated numpy arrays with worker-thread decode."""

    def __init__(self, dataset, batch_iter, collator, num_workers=4, prefetch=4):
        self.dataset = dataset
        self.batch_iter = batch_iter
        self.collator = collator
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch

    def __iter__(self) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        src = self.batch_iter() if callable(self.batch_iter) else self.batch_iter

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                try:
                    for batch_idx in src:
                        items = list(pool.map(self.dataset.__getitem__, batch_idx))
                        q.put(self.collator(items))
                finally:
                    q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


def make_data_loader(
    cfg,
    is_train: bool = True,
    is_distributed: bool = False,
    start_iter: int = 0,
    num_replicas: int = 1,
    rank: int = 0,
    dataset_override=None,
):
    """Public API mirroring data/build.py:110-178."""
    if is_train:
        images_per_batch = cfg.SOLVER.IMS_PER_BATCH
        num_iters = cfg.SOLVER.MAX_ITER
        names = cfg.DATASETS.TRAIN
    else:
        images_per_batch = cfg.TEST.IMS_PER_BATCH
        num_iters = None
        names = cfg.DATASETS.TEST

    dataset = dataset_override or build_dataset(cfg, names[0], is_train)
    collator = BatchCollator(cfg)

    sampler = DistributedSampler(
        len(dataset),
        num_replicas=num_replicas if is_distributed else 1,
        rank=rank if is_distributed else 0,
        shuffle=False,  # episodic list is pre-shuffled (build.py:119)
    )
    grouping = cfg.DATALOADER.ASPECT_RATIO_GROUPING or len(cfg.TPU.QUERY_BUCKETS) > 1
    # a FACTORY, not a generator: loaders must be re-iterable (train_net
    # consumes one batch for shape init before do_train iterates again —
    # a single-use generator would leave the training loop an empty stream)
    if is_train:
        if grouping:
            batch_iter = lambda: grouped_iteration_batches(  # noqa: E731
                dataset, sampler, images_per_batch, num_iters, start_iter
            )
        else:
            batch_iter = lambda: iteration_based_batches(  # noqa: E731
                sampler, images_per_batch, num_iters, start_iter
            )
    else:
        if grouping:
            batch_iter = lambda: grouped_batches(  # noqa: E731
                dataset, sampler, images_per_batch, drop_last=False)
        else:
            batch_iter = lambda: iterate_batches(  # noqa: E731
                sampler, images_per_batch, drop_last=False)

    n_workers = cfg.DATALOADER.NUM_WORKERS
    use_procs = (getattr(cfg.DATALOADER, "USE_PROCESS_WORKERS", True)
                 and n_workers > 0 and hasattr(os, "fork"))
    if use_procs:
        from .transforms import get_resize_size

        min_sizes = (cfg.INPUT.MIN_SIZE_TRAIN if is_train
                     else (cfg.INPUT.MIN_SIZE_TEST,))
        if not isinstance(min_sizes, (tuple, list)):
            min_sizes = (min_sizes,)
        max_size = cfg.INPUT.MAX_SIZE_TRAIN if is_train else cfg.INPUT.MAX_SIZE_TEST

        def bound_hw(idx):
            info = dataset.get_img_info(idx)[0]
            wh = (info["width"], info["height"])
            cand = [get_resize_size(wh, m, max_size) for m in min_sizes]
            return (max(h for h, _ in cand), max(w for _, w in cand))

        r32 = lambda x: int(-(-x // 32) * 32)
        max_area = r32(max(min_sizes)) * r32(max_size or max(min_sizes))
        return ProcessLoader(
            dataset, batch_iter, collator, num_workers=n_workers,
            bound_hw_fn=bound_hw, max_query_area=max_area,
        ), dataset
    return PrefetchingLoader(
        dataset, batch_iter, collator, num_workers=n_workers
    ), dataset
