#!/usr/bin/env python
"""Generate background-masked support images from polygon annotations
(reference: fewshot_utils/createCOCOAnns.py + FEW_SHOT.MASK_SUPP).

For every selected support annotation with a polygon segmentation, writes a
crop whose background pixels are zeroed.
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from oneshotdet_tpu.data.coco_api import LiteCOCO  # noqa: E402
from oneshotdet_tpu.structures.segmentation_mask import PolygonInstance  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--img-dir", required=True)
    p.add_argument("--out", default="supps_masked")
    p.add_argument("--per-class", type=int, default=5)
    p.add_argument("--min-area", type=float, default=80 * 80)
    args = p.parse_args()

    coco = LiteCOCO(args.ann_file)
    os.makedirs(args.out, exist_ok=True)
    for cont_id, cat in enumerate(coco.getCatIds(), start=1):
        anns = [
            a
            for a in coco.loadAnns(coco.getAnnIds(catIds=cat, iscrowd=False))
            if a["area"] > args.min_area and isinstance(a.get("segmentation"), list)
            and a["segmentation"]
        ]
        anns.sort(key=lambda a: -a["area"])
        for rank, ann in enumerate(anns[: args.per_class]):
            info = coco.loadImgs(ann["image_id"])[0]
            img = Image.open(os.path.join(args.img_dir, info["file_name"])).convert("RGB")
            poly = PolygonInstance(ann["segmentation"], img.size)
            mask = poly.rasterize()  # (H, W) uint8
            arr = np.asarray(img) * mask[:, :, None]
            x, y, w, h = [int(round(v)) for v in ann["bbox"]]
            crop = arr[y:y + h, x:x + w]
            Image.fromarray(crop).save(
                os.path.join(args.out, f"{cont_id}_{rank}.jpg")
            )
        print(f"cat {cat}: wrote {min(len(anns), args.per_class)} masked supports")


if __name__ == "__main__":
    main()
