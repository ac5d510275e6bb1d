#!/usr/bin/env python
"""Crop and save candidate support images per class
(reference: fewshot_utils/save_supp.py).

For each category, saves the K largest-area object crops as
``<out>/<contiguous_cat>_<rank>.jpg`` — the files FEW_SHOT.CHOOSE_SELECTED
reads at eval time (data/datasets/coco.py get_selected_item_from_cat).
"""

import argparse
import os
import sys

from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from oneshotdet_tpu.data.coco_api import LiteCOCO  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--img-dir", required=True)
    p.add_argument("--out", default="supps_test_selected")
    p.add_argument("--per-class", type=int, default=5)
    p.add_argument("--min-area", type=float, default=80 * 80)
    args = p.parse_args()

    coco = LiteCOCO(args.ann_file)
    os.makedirs(args.out, exist_ok=True)
    cat_ids = coco.getCatIds()
    for cont_id, cat in enumerate(cat_ids, start=1):
        anns = coco.loadAnns(coco.getAnnIds(catIds=cat, iscrowd=False))
        anns = [a for a in anns if a["area"] > args.min_area]
        anns.sort(key=lambda a: -a["area"])
        for rank, ann in enumerate(anns[: args.per_class]):
            info = coco.loadImgs(ann["image_id"])[0]
            img = Image.open(os.path.join(args.img_dir, info["file_name"])).convert("RGB")
            x, y, w, h = ann["bbox"]
            crop = img.crop((x, y, x + w, y + h))
            crop.save(os.path.join(args.out, f"{cont_id}_{rank}.jpg"))
        print(f"cat {cat} (contiguous {cont_id}): {min(len(anns), args.per_class)} supports")


if __name__ == "__main__":
    main()
