#!/usr/bin/env python
"""Convert PASCAL VOC XML annotations to a COCO-format json
(reference: fewshot_utils/voc2coco.py).

Usage:
    python fewshot_utils/voc2coco.py --voc-dir datasets/voc/VOC2007 \
        --split test --out datasets/voc/VOC2007/Annotations/pascal_test2007.json
"""

import argparse
import json
import os
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from oneshotdet_tpu.data.datasets.voc import VOC_CLASSES  # noqa: E402


def convert(voc_dir: str, split: str, out_path: str, keep_difficult: bool = True):
    imgset = os.path.join(voc_dir, "ImageSets", "Main", f"{split}.txt")
    with open(imgset) as f:
        ids = [line.strip().split()[0] for line in f if line.strip()]

    categories = [
        {"id": i, "name": name, "supercategory": "none"}
        for i, name in enumerate(VOC_CLASSES)
        if i > 0
    ]
    images, annotations = [], []
    ann_id = 1
    for img_idx, img_id in enumerate(ids, start=1):
        xml_path = os.path.join(voc_dir, "Annotations", f"{img_id}.xml")
        root = ET.parse(xml_path).getroot()
        size = root.find("size")
        images.append(
            {
                "id": img_idx,
                "file_name": f"{img_id}.jpg",
                "width": int(size.find("width").text),
                "height": int(size.find("height").text),
            }
        )
        for obj in root.iter("object"):
            difficult = int(obj.find("difficult").text)
            if difficult and not keep_difficult:
                continue
            name = obj.find("name").text.lower().strip()
            bb = obj.find("bndbox")
            x1 = float(bb.find("xmin").text) - 1
            y1 = float(bb.find("ymin").text) - 1
            x2 = float(bb.find("xmax").text) - 1
            y2 = float(bb.find("ymax").text) - 1
            w, h = x2 - x1 + 1, y2 - y1 + 1
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_idx,
                    "category_id": VOC_CLASSES.index(name),
                    "bbox": [x1, y1, w, h],
                    "area": w * h,
                    "iscrowd": 0,
                    "ignore": difficult,
                    "segmentation": [],
                }
            )
            ann_id += 1

    coco = {"images": images, "annotations": annotations, "categories": categories}
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(coco, f)
    print(f"wrote {len(images)} images / {len(annotations)} annotations -> {out_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--voc-dir", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--out", required=True)
    p.add_argument("--drop-difficult", action="store_true")
    a = p.parse_args()
    convert(a.voc_dir, a.split, a.out, keep_difficult=not a.drop_difficult)
