#!/usr/bin/env python
"""Host input-pipeline throughput: episodic JPEG decode -> native fused
resize/normalize/pad -> bucketed batches.

The reference's own training logs show the loader as its bottleneck
(SURVEY §7 hard part 6). This measures our pipeline standalone so the
host-side img/s can be compared against the device img/s (bench.py): the
pipeline keeps up iff host >= device rate x (1 + shots).
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def make_dataset(root, n_images=64, hw=(800, 1200)):
    from PIL import Image

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    h, w = hw
    for i in range(n_images):
        arr = rng.randint(0, 255, (h, w, 3), np.uint8)
        name = f"{i:06d}.jpg"
        Image.fromarray(arr).save(os.path.join(img_dir, name), quality=90)
        images.append({"id": i + 1, "file_name": name, "width": w, "height": h})
        cat = (i % 2) + 1
        annotations.append({
            "id": ann_id, "image_id": i + 1, "category_id": cat,
            "bbox": [40, 40, 400, 300], "area": 120000.0, "iscrowd": 0,
        })
        ann_id += 1
    ds = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
    }
    ann = os.path.join(root, "instances.json")
    with open(ann, "w") as f:
        json.dump(ds, f)
    return ann, img_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=48)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()

    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.data.build import make_data_loader
    from oneshotdet_tpu.data.datasets.coco import COCODataset

    root = tempfile.mkdtemp(prefix="oneshot_loader_bench_")
    try:
        t0 = time.time()
        ann, img_dir = make_dataset(root, args.images)
        print(f"dataset built in {time.time() - t0:.1f}s", file=sys.stderr)

        c = cfg.clone()
        c.FEW_SHOT.TRAINING_EXCL_CATS = []
        c.INPUT.SUPP_AREA_THRESHOLD = 100
        c.SOLVER.IMS_PER_BATCH = args.batch
        c.DATALOADER.NUM_WORKERS = args.workers
        c.DATASETS.TRAIN = ("custom",)
        os.environ["ONESHOT_CUSTOM_IMG_DIR"] = img_dir
        os.environ["ONESHOT_CUSTOM_ANN_FILE"] = ann
        loader, dataset = make_data_loader(c, is_train=True)
        it = iter(loader)
        # warmup: one batch primes workers + jit-free host path
        next(it)
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.iters):
            batch = next(it)
            n += batch["query_pixels"].shape[0]
        dt = time.perf_counter() - t0
        print(f"{n / dt:.1f} query img/s host "
              f"({args.workers} workers, batch {args.batch}, "
              f"{1000 * dt / args.iters:.1f} ms/batch)", file=sys.stderr)
        print(json.dumps({
            "metric": "loader_images_per_sec_host",
            "value": round(n / dt, 1), "unit": "images/sec",
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
