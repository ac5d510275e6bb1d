"""PASCAL VOC dataset (reference: maskrcnn_benchmark/data/datasets/voc.py).

Classic (non-episodic) XML-parsing VOC dataset with difficult flags and
``get_groundtruth`` — used by the VOC evaluator and as a general detection
dataset. Boxes follow the reference's convention of subtracting 1 from the
XML's 1-based corners (voc.py TO_REMOVE handling).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List

import numpy as np
from PIL import Image

VOC_CLASSES = (
    "__background__",
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


class PascalVOCDataset:
    def __init__(self, data_dir: str, split: str, use_difficult: bool = False,
                 transforms=None):
        self.root = data_dir
        self.image_set = split
        self.keep_difficult = use_difficult
        self.transforms = transforms

        self._annopath = os.path.join(self.root, "Annotations", "%s.xml")
        self._imgpath = os.path.join(self.root, "JPEGImages", "%s.jpg")
        self._imgsetpath = os.path.join(self.root, "ImageSets", "Main", "%s.txt")

        with open(self._imgsetpath % self.image_set) as f:
            self.ids = [x.strip() for x in f.readlines()]
        self.id_to_img_map = dict(enumerate(self.ids))
        self.class_to_ind = {c: i for i, c in enumerate(VOC_CLASSES)}

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, index: int):
        img_id = self.ids[index]
        img = Image.open(self._imgpath % img_id).convert("RGB")
        target = self.get_groundtruth(index)
        boxes, labels = target["boxes"], target["labels"]
        if self.transforms is not None:
            img, boxes = self.transforms(img, boxes)
        return {
            "img": img,
            "boxes": boxes,
            "labels": labels,
            "difficult": target["difficult"],
            "idx": index,
            "img_id": img_id,
        }

    def _parse(self, index: int):
        img_id = self.ids[index]
        return ET.parse(self._annopath % img_id).getroot()

    def get_groundtruth(self, index: int):
        anno = self._parse(index)
        boxes, labels, difficult = [], [], []
        for obj in anno.iter("object"):
            is_difficult = int(obj.find("difficult").text) == 1
            if is_difficult and not self.keep_difficult:
                # the reference keeps difficult boxes with a flag; we follow
                # suit so the evaluator can ignore them
                pass
            name = obj.find("name").text.lower().strip()
            bb = obj.find("bndbox")
            # XML corners are 1-based (voc.py convention): subtract 1
            box = [
                float(bb.find("xmin").text) - 1,
                float(bb.find("ymin").text) - 1,
                float(bb.find("xmax").text) - 1,
                float(bb.find("ymax").text) - 1,
            ]
            boxes.append(box)
            labels.append(self.class_to_ind[name])
            difficult.append(is_difficult)
        size = anno.find("size")
        return {
            "boxes": np.array(boxes, np.float32).reshape(-1, 4),
            "labels": np.array(labels, np.int64),
            "difficult": np.array(difficult, bool),
            "height": int(size.find("height").text),
            "width": int(size.find("width").text),
        }

    def get_img_info(self, index: int):
        anno = self._parse(index)
        size = anno.find("size")
        return (
            {"height": int(size.find("height").text),
             "width": int(size.find("width").text),
             "id": self.ids[index]},
            None,
        )

    @staticmethod
    def map_class_id_to_class_name(class_id: int) -> str:
        return VOC_CLASSES[class_id]


class ConcatDataset:
    """Concatenation with get_img_info passthrough (concat_dataset.py)."""

    def __init__(self, datasets: List):
        self.datasets = list(datasets)
        self.cum = np.cumsum([len(d) for d in self.datasets]).tolist()

    def __len__(self):
        return self.cum[-1] if self.cum else 0

    def _locate(self, idx):
        for di, bound in enumerate(self.cum):
            if idx < bound:
                start = self.cum[di - 1] if di else 0
                return di, idx - start
        raise IndexError(idx)

    def __getitem__(self, idx):
        di, local = self._locate(idx)
        return self.datasets[di][local]

    def get_img_info(self, idx):
        di, local = self._locate(idx)
        return self.datasets[di].get_img_info(local)


class ListDataset:
    """Path-list dataset for demos (list_dataset.py)."""

    def __init__(self, image_paths: List[str], transforms=None):
        self.image_paths = list(image_paths)
        self.transforms = transforms

    def __len__(self):
        return len(self.image_paths)

    def __getitem__(self, idx):
        img = Image.open(self.image_paths[idx]).convert("RGB")
        boxes = np.zeros((0, 4), np.float32)
        if self.transforms is not None:
            img, boxes = self.transforms(img, boxes)
        return {"img": img, "boxes": boxes, "idx": idx}

    def get_img_info(self, idx):
        img = Image.open(self.image_paths[idx])
        return ({"width": img.size[0], "height": img.size[1], "id": idx}, None)
