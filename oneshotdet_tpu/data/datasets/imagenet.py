"""Episodic ImageNet-LOC dataset (reference: data/datasets/imagenet.py).

The reference's ImagenetDataset mirrors COCODataset over an ILSVRC
COCO-format json, with a preset-support mode (`get_one_preset_item_from_cat`,
imagenet.py:239) that reads one fixed support crop per class from a
directory. Since this framework's COCODataset is already generic over
COCO-format annotations, the ImageNet variant subclasses it and adds the
preset-support behavior.
"""

from __future__ import annotations

import os

from PIL import Image

from .coco import COCODataset


class ImagenetDataset(COCODataset):
    def __init__(self, cfg, ann_file, root, is_train, transforms=None,
                 preset_supp_dir: str = ""):
        super().__init__(cfg, ann_file, root, is_train, transforms=transforms)
        self.preset_supp_dir = preset_supp_dir or os.environ.get(
            "ONESHOT_PRESET_SUPP_DIR", ""
        )

    def get_one_preset_item_from_cat(self, cat_id: int, shot: int = 1):
        """Fixed support per class: <dir>/<contiguous_cat>.jpg
        (imagenet.py:239; falls back to random selection)."""
        cont = self.json_category_id_to_contiguous_id[cat_id]
        path = os.path.join(self.preset_supp_dir, f"{cont}.jpg")
        if self.preset_supp_dir and os.path.exists(path):
            return self._augment_supports([Image.open(path).convert("RGB")])
        return self.get_random_item_from_cat(cat_id, exclude_img_id=-1, shot=shot)

    def __getitem__(self, idx: int):
        if self.preset_supp_dir:
            # temporarily reroute support selection through the preset path
            img_id = self.ids[idx]
            cur_cat = self.chosen_cats[idx]
            item = super().__getitem__(idx)
            supp = self.get_one_preset_item_from_cat(cur_cat, shot=self.shot)
            if self._supp_transforms is not None:
                supp = [self._supp_transforms(s, None)[0] for s in supp]
            item["img_supp"] = supp
            return item
        return super().__getitem__(idx)
