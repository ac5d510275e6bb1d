"""Dataset name -> path mapping (reference: config/paths_catalog.py).

Paths resolve under the DATA_DIR environment variable ONESHOT_DATA_DIR
(default ``datasets/``) with the reference's directory layout.
"""

from __future__ import annotations

import os


class DatasetCatalog:
    DATA_DIR = os.environ.get("ONESHOT_DATA_DIR", "datasets")

    DATASETS = {
        "coco_2017_train": {
            "img_dir": "coco/train2017",
            "ann_file": "coco/annotations/instances_train2017.json",
        },
        "coco_2017_val": {
            "img_dir": "coco/val2017",
            "ann_file": "coco/annotations/instances_val2017.json",
        },
        "coco_2014_train": {
            "img_dir": "coco/train2014",
            "ann_file": "coco/annotations/instances_train2014.json",
        },
        "coco_2014_val": {
            "img_dir": "coco/val2014",
            "ann_file": "coco/annotations/instances_val2014.json",
        },
        "voc_2007_test_cocostyle": {
            "img_dir": "voc/VOC2007/JPEGImages",
            "ann_file": "voc/VOC2007/Annotations/pascal_test2007.json",
        },
        "voc_2012_val_cocostyle": {
            "img_dir": "voc/VOC2012/JPEGImages",
            "ann_file": "voc/VOC2012/Annotations/pascal_val2012.json",
        },
    }

    @classmethod
    def get(cls, name: str):
        if name == "custom":
            # ad-hoc dataset via env vars (tests, local experiments)
            return {
                "factory": "COCODataset",
                "args": {
                    "root": os.environ["ONESHOT_CUSTOM_IMG_DIR"],
                    "ann_file": os.environ["ONESHOT_CUSTOM_ANN_FILE"],
                },
            }
        if name not in cls.DATASETS:
            raise KeyError(f"unknown dataset {name}")
        attrs = cls.DATASETS[name]
        return {
            "factory": "COCODataset",
            "args": {
                "root": os.path.join(cls.DATA_DIR, attrs["img_dir"]),
                "ann_file": os.path.join(cls.DATA_DIR, attrs["ann_file"]),
            },
        }
