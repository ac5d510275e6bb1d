"""Cityscapes instance-ID PNGs -> per-class instance dicts with polygons.

Self-contained equivalent of the reference's
tools/cityscapes/instances2dict_with_polygons.py:19-70, which leans on the
external ``cityscapesscripts`` package for the label table and Instance
class. The label table below carries only what the converter consumes:
id -> (name, hasInstances) for the trainable instance classes plus the
background groups that can appear in instanceIds images.
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image

# Cityscapes label ids that carry instances (csHelpers labels table):
# encoded in instanceIds.png as labelID * 1000 + instance index.
CITYSCAPES_INSTANCE_LABELS = {
    24: "person",
    25: "rider",
    26: "car",
    27: "truck",
    28: "bus",
    29: "caravan",
    30: "trailer",
    31: "train",
    32: "motorcycle",
    33: "bicycle",
}


def get_label_id(inst_id: int) -> int:
    """instanceId -> labelId (reference convert_cityscapes_to_coco.py:108-112)."""
    return inst_id if inst_id < 1000 else inst_id // 1000


def find_contours(mask: np.ndarray):
    """External boundary polygons of a binary mask as flat [x0,y0,...] lists
    (reference: cv2.findContours RETR_EXTERNAL + CHAIN_APPROX_NONE through
    utils/cv2_util.py, which papers over the cv2 2/3-tuple return change)."""
    import cv2

    res = cv2.findContours(
        np.ascontiguousarray(mask, np.uint8), cv2.RETR_EXTERNAL,
        cv2.CHAIN_APPROX_NONE,
    )
    contours = res[0] if len(res) == 2 else res[1]
    return [c.reshape(-1).tolist() for c in contours]


def instances2dict_with_polygons(image_file_list, verbose: bool = False):
    """For each instanceIds.png: {class name: [{labelID, pixelCount,
    contours}, ...]} keyed by absolute path (reference :19-70)."""
    if not isinstance(image_file_list, list):
        image_file_list = [image_file_list]
    instance_dict = {}

    for count, image_file in enumerate(image_file_list, 1):
        img = np.array(Image.open(image_file))
        instances = {name: [] for name in CITYSCAPES_INSTANCE_LABELS.values()}

        for instance_id in np.unique(img):
            if instance_id < 1000:
                continue  # not an instance pixel
            label_id = get_label_id(int(instance_id))
            name = CITYSCAPES_INSTANCE_LABELS.get(label_id)
            if name is None:
                continue
            mask = (img == instance_id).astype(np.uint8)
            instances[name].append({
                "labelID": label_id,
                "pixelCount": int(mask.sum()),
                "contours": find_contours(mask),
            })

        instance_dict[os.path.abspath(image_file)] = instances
        if verbose:
            print(f"\rImages Processed: {count}", end=" ")
            sys.stdout.flush()
    if verbose:
        print("")
    return instance_dict


def main(argv):
    files = [a for a in argv if "png" in a]
    instances2dict_with_polygons(files, verbose=True)


if __name__ == "__main__":
    main(sys.argv[1:])
