#!/usr/bin/env python
"""Cityscapes gtFine -> COCO instances json converter.

Behavioral port of the reference's tools/cityscapes/
convert_cityscapes_to_coco.py:115-227 (itself from Detectron), without the
``cityscapesscripts`` dependency: polygons come from the sibling
instances2dict_with_polygons module. Keeps the reference's conventions:
the 8 instancesonly categories, category ids assigned in first-seen order
starting at 1, bbox = tight polygon box converted to xywh with the
TO_REMOVE=1 legacy (+1) size convention (:60-64), and the
``instancesonly_filtered_<set>.json`` output naming.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from instances2dict_with_polygons import instances2dict_with_polygons  # noqa: E402

CATEGORY_INSTANCESONLY = [
    "person", "rider", "car", "truck", "bus", "train", "motorcycle", "bicycle",
]


def parse_args():
    parser = argparse.ArgumentParser(description="Convert dataset")
    parser.add_argument("--dataset", help="cocostuff, cityscapes_instance_only",
                        default=None, type=str)
    parser.add_argument("--outdir", help="output dir for json files",
                        default=None, type=str)
    parser.add_argument("--datadir", help="data dir for annotations to be converted",
                        default=None, type=str)
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    return parser.parse_args()


def poly_to_box(poly):
    """Tight xyxy box around a polygon list (reference :50-58)."""
    x0 = min(min(p[::2]) for p in poly)
    x1 = max(max(p[::2]) for p in poly)
    y0 = min(min(p[1::2]) for p in poly)
    y1 = max(max(p[1::2]) for p in poly)
    return [x0, y0, x1, y1]


def xyxy_to_xywh(xyxy_box):
    xmin, ymin, xmax, ymax = xyxy_box
    TO_REMOVE = 1  # legacy pixel convention (reference :62)
    return (xmin, ymin, xmax - xmin + TO_REMOVE, ymax - ymin + TO_REMOVE)


def convert_cityscapes_instance_only(data_dir, out_dir,
                                     sets=None, ann_dirs=None):
    """gtFine polygons -> COCO instance-segmentation jsons (reference
    :115-227)."""
    if sets is None:
        sets = ["gtFine_val", "gtFine_train", "gtFine_test"]
        ann_dirs = [
            "gtFine_trainvaltest/gtFine/val",
            "gtFine_trainvaltest/gtFine/train",
            "gtFine_trainvaltest/gtFine/test",
        ]
    json_name = "instancesonly_filtered_%s.json"
    ends_in = "%s_polygons.json"
    img_id = 0
    ann_id = 0
    cat_id = 1
    category_dict = {}

    for data_set, ann_dir in zip(sets, ann_dirs):
        print(f"Starting {data_set}")
        images = []
        annotations = []
        ann_dir = os.path.join(data_dir, ann_dir)
        suffix = ends_in % data_set.split("_")[0]

        for root, _, files in os.walk(ann_dir):
            for filename in sorted(files):
                if not filename.endswith(suffix):
                    continue
                if len(images) % 50 == 0:
                    print(f"Processed {len(images)} images, "
                          f"{len(annotations)} annotations")
                json_ann = json.load(open(os.path.join(root, filename)))
                stem = filename[: -len(suffix)]
                image = {
                    "id": img_id,
                    "width": json_ann["imgWidth"],
                    "height": json_ann["imgHeight"],
                    "file_name": stem + "leftImg8bit.png",
                    "seg_file_name": stem + "%s_instanceIds.png"
                    % data_set.split("_")[0],
                }
                img_id += 1
                images.append(image)

                fullname = os.path.join(root, image["seg_file_name"])
                objects = instances2dict_with_polygons(
                    [fullname], verbose=False)[os.path.abspath(fullname)]

                for object_cls, objs in objects.items():
                    if object_cls not in CATEGORY_INSTANCESONLY:
                        continue
                    for obj in objs:
                        if obj["contours"] == []:
                            print("Warning: empty contours.")
                            continue
                        if min(len(p) for p in obj["contours"]) <= 4:
                            print("Warning: invalid contours.")
                            continue
                        if object_cls not in category_dict:
                            category_dict[object_cls] = cat_id
                            cat_id += 1
                        ann = {
                            "id": ann_id,
                            "image_id": image["id"],
                            "segmentation": obj["contours"],
                            "category_id": category_dict[object_cls],
                            "iscrowd": 0,
                            "area": obj["pixelCount"],
                            "bbox": xyxy_to_xywh(poly_to_box(obj["contours"])),
                        }
                        ann_id += 1
                        annotations.append(ann)

        ann_dict = {
            "images": images,
            "categories": [{"id": cid, "name": name}
                           for name, cid in category_dict.items()],
            "annotations": annotations,
        }
        print(f"Num categories: {len(category_dict)}")
        print(f"Num images: {len(images)}")
        print(f"Num annotations: {len(annotations)}")
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, json_name % data_set), "w") as outfile:
            outfile.write(json.dumps(ann_dict))


def convert_coco_stuff_mat(data_dir, out_dir):
    """COCO-stuff .mat labels -> png + json (reference :67-104). Requires
    h5py; kept for CLI parity with the Detectron-era converter."""
    import h5py

    sets = ["train", "val"]
    categories = []
    json_name = "coco_stuff_%s.json"
    ann_dict = {}
    for data_set in sets:
        file_list = os.path.join(data_dir, "%s.txt")
        images = []
        with open(file_list % data_set) as f:
            for img_id, img_name in enumerate(f):
                img_name = img_name.replace("coco", "COCO").strip("\n")
                mat_file = os.path.join(data_dir, f"annotations/{img_name}.mat")
                data = h5py.File(mat_file, "r")
                label_map = data.get("S")
                if len(categories) == 0:
                    label_names = data.get("names")
                    for idx, n in enumerate(label_names):
                        categories.append(
                            {"id": idx,
                             "name": "".join(chr(i) for i in data[n[0]])})
                    ann_dict["categories"] = categories
                from PIL import Image

                Image.fromarray(np.asarray(label_map)).save(
                    os.path.join(data_dir, img_name + ".png"))
                images.append({
                    "width": label_map.shape[0],
                    "height": label_map.shape[1],
                    "file_name": img_name,
                    "seg_file_name": img_name,
                    "id": img_id,
                })
        ann_dict["images"] = images
        print(f"Num images: {len(images)}")
        with open(os.path.join(out_dir, json_name % data_set), "w") as outfile:
            outfile.write(json.dumps(ann_dict))


if __name__ == "__main__":
    args = parse_args()
    if args.dataset == "cityscapes_instance_only":
        convert_cityscapes_instance_only(args.datadir, args.outdir)
    elif args.dataset == "cocostuff":
        convert_coco_stuff_mat(args.datadir, args.outdir)
    else:
        print(f"Dataset not supported: {args.dataset}")
