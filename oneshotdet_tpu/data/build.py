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

import queue
import threading
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

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                try:
                    for batch_idx in self.batch_iter:
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
    if is_train:
        if grouping:
            batch_iter = grouped_iteration_batches(
                dataset, sampler, images_per_batch, num_iters, start_iter
            )
        else:
            batch_iter = iteration_based_batches(
                sampler, images_per_batch, num_iters, start_iter
            )
    else:
        if grouping:
            batch_iter = grouped_batches(dataset, sampler, images_per_batch,
                                         drop_last=False)
        else:
            batch_iter = iterate_batches(sampler, images_per_batch, drop_last=False)

    return PrefetchingLoader(
        dataset, batch_iter, collator, num_workers=cfg.DATALOADER.NUM_WORKERS
    ), dataset
