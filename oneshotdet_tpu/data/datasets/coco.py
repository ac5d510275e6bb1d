"""Episodic one-shot COCO dataset.

Reimplements maskrcnn_benchmark/data/datasets/coco.py (the fork's core
few-shot machinery) on top of LiteCOCO (no pycocotools in this image):

  - per-category image catalog; dataset length = sum over categories of
    #images containing that category — one entry per (query image, class)
    episode (coco.py:181-203);
  - deterministic episodic shuffle, seed 6666 (coco.py:70) — via a private
    Random instance so concurrent loader threads can't perturb it;
  - train/test class split via TRAINING_EXCL_CATS / TEST_EXCL_CATS in
    contiguous 1..80 ids mapped back to json ids (coco.py:102-118);
  - __getitem__ filters annotations to the episode's class with labels=1
    (coco.py:476-496);
  - support selection: random = shuffle catalog, pick the largest-area
    annotation per candidate image, require area > SUPP_AREA_THRESHOLD,
    crop to the bbox (coco.py:296-363); selected = fixed support image
    paths for eval (coco.py:365-386); close = similarity-ranked pickles
    (coco.py:388-461) with random fallback;
  - support augmentation: flip (+ color jitter) (coco.py:275-294).

Output per item is a plain dict of numpy arrays + PIL-free images (HWC
float32 after transforms), consumed by the bucket-padding collator.
"""

from __future__ import annotations

import os
import pickle
import random
from typing import List, Optional

import numpy as np
from PIL import Image

from ..coco_api import LiteCOCO
from ..transforms import color_jitter


def _has_valid_annotation(anno) -> bool:
    """has_valid_annotation (coco.py:30-45), detection-only path."""
    if len(anno) == 0:
        return False
    if all(any(o <= 1 for o in obj["bbox"][2:]) for obj in anno):
        return False
    return True


class COCODataset:
    def __init__(
        self,
        cfg,
        ann_file: str,
        root: str,
        is_train: bool,
        transforms=None,
        remove_images_without_annotations: bool = True,
    ):
        # The reference seeds the GLOBAL RNG (coco.py:70) and shuffles with
        # it. A private Random(6666) produces the bit-identical shuffle
        # (same Mersenne Twister) but cannot race with loader worker
        # threads of a previous loader instance still drawing from the
        # global RNG — that race made the episodic index order
        # load-dependent (observed as batch-order flakes in
        # test_process_loader_matches_thread_loader).
        self._shuffle_rng = random.Random(6666)
        # the reference also (re)seeds the global RNG here, which support
        # selection (get_random_item_from_cat) draws from — keep that
        random.seed(6666)
        self.cfg = cfg
        self.root = root
        self.coco = LiteCOCO(ann_file)
        self.is_train = is_train
        self.shot = cfg.FEW_SHOT.NUM_SHOT
        self.supp_aug = cfg.FEW_SHOT.SUPP_AUG
        self.actual_num_imgs = (
            self.shot * (1 + cfg.FEW_SHOT.NUM_SUPP_AUG) if self.supp_aug else self.shot
        )
        self.choose_close = cfg.FEW_SHOT.CHOOSE_CLOSE
        self.choose_selected = cfg.FEW_SHOT.CHOOSE_SELECTED
        self.selected_cls = cfg.FEW_SHOT.TEST_SELECTED_CLS
        self.selected_order = cfg.FEW_SHOT.TEST_SELECTED_SUPP

        if isinstance(transforms, (list, tuple)):
            self._transforms, self._supp_transforms = transforms[0], transforms[1]
        else:
            self._transforms = self._supp_transforms = transforms

        # contiguous 1..K <-> json category id maps (coco.py:107-113)
        cat_ids = self.coco.getCatIds()
        self.all_json_category_id_to_contiguous_id = {v: i + 1 for i, v in enumerate(cat_ids)}
        self.all_contiguous_category_id_to_json_id = {
            v: k for k, v in self.all_json_category_id_to_contiguous_id.items()
        }
        excl_cont = (
            cfg.FEW_SHOT.TRAINING_EXCL_CATS if is_train else cfg.FEW_SHOT.TEST_EXCL_CATS
        )
        excl_json = {
            self.all_contiguous_category_id_to_json_id[c]
            for c in excl_cont
            if c in self.all_contiguous_category_id_to_json_id
        }
        self.json_cat_list = [c for c in cat_ids if c not in excl_json]
        self.json_category_id_to_contiguous_id = {
            v: i + 1 for i, v in enumerate(self.json_cat_list)
        }
        self.contiguous_category_id_to_json_id = {
            v: k for k, v in self.json_category_id_to_contiguous_id.items()
        }

        # TASK=1: restrict eval images to the task1 split file
        # (coco.py:146-159 — the reference reads the hardcoded filename and
        # filters each category's image list when FEW_SHOT.TASK == 1)
        task1_imgs = None
        if cfg.FEW_SHOT.TASK == 1 and not is_train:
            split_file = os.environ.get(
                "ONESHOT_TASK1_SPLIT", "task1_test_split.txt"
            )
            with open(split_file) as f:
                task1_imgs = {line.split(" ")[0].strip() for line in f if line.strip()}

        # per-category catalog (coco.py:151-171)
        self.catalog = {}
        for cat in self.json_cat_list:
            self.catalog[cat] = []
            img_ids = sorted(self.coco.getImgIds(catIds=cat))
            if task1_imgs is not None:
                img_ids = [
                    i for i in img_ids
                    if self.coco.loadImgs(i)[0]["file_name"] in task1_imgs
                ]
            for img_id in img_ids:
                ann_ids = self.coco.getAnnIds(imgIds=img_id, catIds=cat, iscrowd=False)
                anno = self.coco.loadAnns(ann_ids)
                if not remove_images_without_annotations or _has_valid_annotation(anno):
                    self.catalog[cat].append(img_id)

        # flatten to episodic (img, cat) pairs (coco.py:181-203)
        self.ids: List[int] = []
        self.chosen_cats: List[int] = []
        for cat, ids in self.catalog.items():
            if self.selected_cls != -1 and cat != self.selected_cls:
                continue
            self.ids.extend(ids)
            self.chosen_cats.extend([cat] * len(ids))

        index_arr = list(range(len(self.ids)))
        self._shuffle_rng.shuffle(index_arr)
        # Reference semantics: support selection (get_random_item_from_cat)
        # draws from the global RNG *after* it performed this shuffle
        # (ref coco.py:70,196 — nothing else draws in between). Sync the
        # global stream to the private RNG's post-shuffle state so the
        # episode→support mapping matches the reference bit-for-bit while
        # the shuffle itself stays immune to stray-thread draws.
        random.setstate(self._shuffle_rng.getstate())
        self.ids = [self.ids[i] for i in index_arr]
        self.chosen_cats = [self.chosen_cats[i] for i in index_arr]
        self.id_to_img_map = dict(enumerate(self.ids))

        # fixed selected supports for eval (coco.py:261-273): a directory of
        # candidate crops per class; cfg points at it via paths the caller set
        self.selected_supp_dir = getattr(cfg, "SELECTED_SUPP_DIR", "") if hasattr(cfg, "SELECTED_SUPP_DIR") else ""

        # similarity pickles for CHOOSE_CLOSE (coco.py:388-400). The path
        # comes from FEW_SHOT.SUPP_SIM_FILE (the reference hardcodes an
        # absolute template, coco.py:248-250); ONESHOT_SUPP_SIM_PKL overrides.
        self.close_dict = None
        self.mask_supp = cfg.FEW_SHOT.MASK_SUPP
        if self.choose_close and is_train:
            pkl = os.environ.get(
                "ONESHOT_SUPP_SIM_PKL", cfg.FEW_SHOT.SUPP_SIM_FILE
            )
            if os.path.exists(pkl):
                with open(pkl, "rb") as f:
                    self.close_dict = pickle.load(f)

        self.supp_aug_transforms = []
        if self.supp_aug:
            self.supp_aug_transforms.append(lambda im: im.transpose(Image.FLIP_LEFT_RIGHT))
            if cfg.FEW_SHOT.NUM_SUPP_AUG > 1:
                self.supp_aug_transforms.append(color_jitter)

    def __len__(self):
        return len(self.ids)

    # -- image loading -----------------------------------------------------
    def _load_image(self, img_id: int) -> Image.Image:
        path = self.coco.loadImgs(img_id)[0]["file_name"]
        return Image.open(os.path.join(self.root, path)).convert("RGB")

    # -- support selection ---------------------------------------------------
    def get_random_item_from_cat(self, cat_id: int, exclude_img_id: int, shot: int = 1):
        """Largest-area annotation > SUPP_AREA_THRESHOLD, cropped to bbox
        (coco.py:296-363)."""
        choices = self.catalog[cat_id].copy()
        random.shuffle(choices)
        picked = []
        for img_id in choices:
            if img_id == exclude_img_id:
                continue
            anns = self.coco.loadAnns(
                self.coco.getAnnIds(imgIds=img_id, catIds=cat_id, iscrowd=False)
            )
            if not anns:
                continue
            chosen = max(anns, key=lambda a: a["area"])
            if chosen["area"] > self.cfg.INPUT.SUPP_AREA_THRESHOLD:
                picked.append((img_id, chosen))
            if len(picked) == shot:
                break
        if not picked:  # degenerate dataset fallback: take best available
            for img_id in choices:
                if img_id == exclude_img_id:
                    continue
                anns = self.coco.loadAnns(
                    self.coco.getAnnIds(imgIds=img_id, catIds=cat_id, iscrowd=False)
                )
                if anns:
                    picked.append((img_id, max(anns, key=lambda a: a["area"])))
                    break
            if not picked:  # self-support as the last resort
                anns = self.coco.loadAnns(
                    self.coco.getAnnIds(imgIds=exclude_img_id, catIds=cat_id, iscrowd=False)
                )
                picked.append((exclude_img_id, max(anns, key=lambda a: a["area"])))
        while len(picked) < shot:
            picked.append(picked[-1])

        imgs = []
        for img_id, ann in picked:
            im = self._load_image(img_id)
            im = self._mask_support(im, ann)
            x, y, w, h = ann["bbox"]
            imgs.append(im.crop((x, y, x + w, y + h)))
        return self._augment_supports(imgs)

    def _mask_support(self, im: Image.Image, ann: dict) -> Image.Image:
        """FEW_SHOT.MASK_SUPP: zero the support's background using the
        annotation's segmentation polygons before cropping (coco.py:338-348
        — annToMask, binary threshold, pixelwise multiply)."""
        if not self.mask_supp:
            return im
        seg = ann.get("segmentation")
        if not isinstance(seg, list) or not seg:
            return im  # RLE/missing segmentation: leave unmasked
        from ...structures.segmentation_mask import PolygonInstance

        mask = PolygonInstance(seg, im.size).rasterize()  # (h, w) uint8
        arr = np.asarray(im, np.uint8) * (mask[:, :, None] > 0)
        return Image.fromarray(arr)

    def get_selected_item_from_cat(self, cat_id: int, shot: int = 1):
        """Fixed hand-picked support (coco.py:365-386): file
        <dir>/<contiguous_cat>_<order>.jpg, falling back to random choice."""
        d = os.environ.get("ONESHOT_SELECTED_SUPP_DIR", "supps_test_selected")
        cont = self.json_category_id_to_contiguous_id[cat_id]
        path = os.path.join(d, f"{cont}_{self.selected_order}.jpg")
        if os.path.exists(path):
            imgs = [Image.open(path).convert("RGB")]
            return self._augment_supports(imgs)
        return self.get_random_item_from_cat(cat_id, exclude_img_id=-1, shot=shot)

    def get_close_item_from_cat(self, query_img_id: int, cat_id: int, shot: int = 1):
        """Feature-similarity ranked supports (coco.py:388-461)."""
        if not self.is_train or self.close_dict is None:
            return self.get_random_item_from_cat(cat_id, query_img_id, shot=shot)
        try:
            ann_dict = self.close_dict[cat_id][query_img_id][cat_id]
        except (KeyError, TypeError):
            return self.get_random_item_from_cat(cat_id, query_img_id, shot=shot)
        ranked = sorted(ann_dict.items(), key=lambda kv: kv[1], reverse=True)
        imgs = []
        for ann_id, _ in ranked[:shot]:
            ann = self.coco.anns.get(ann_id)
            if ann is None:
                continue
            im = self._load_image(ann["image_id"])
            im = self._mask_support(im, ann)
            x, y, w, h = ann["bbox"]
            imgs.append(im.crop((x, y, x + w, y + h)))
        if not imgs:
            return self.get_random_item_from_cat(cat_id, query_img_id, shot=shot)
        return self._augment_supports(imgs)

    def _augment_supports(self, imgs):
        if self.supp_aug:
            out = []
            for im in imgs:
                out.append(im)
                for t in self.supp_aug_transforms:
                    out.append(t(im))
            imgs = out
        return imgs

    # -- episodic fetch ------------------------------------------------------
    def __getitem__(self, idx: int):
        img_id = self.ids[idx]
        cur_cat = self.chosen_cats[idx]
        img = self._load_image(img_id)
        anno = self.coco.loadAnns(self.coco.getAnnIds(imgIds=img_id, iscrowd=False))
        anno = [o for o in anno if o.get("iscrowd", 0) == 0 and o["category_id"] == cur_cat]

        boxes_xywh = np.array([o["bbox"] for o in anno], np.float32).reshape(-1, 4)
        # xywh -> xyxy with the TO_REMOVE convention (BoxList.convert)
        boxes = boxes_xywh.copy()
        boxes[:, 2] = boxes_xywh[:, 0] + np.maximum(boxes_xywh[:, 2] - 1, 0)
        boxes[:, 3] = boxes_xywh[:, 1] + np.maximum(boxes_xywh[:, 3] - 1, 0)
        labels = np.ones(len(anno), np.int64)

        # clip to image + drop empties (coco.py:496, remove_empty=True)
        w, h = img.size
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, w - 1)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, h - 1)
        keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
        boxes, labels = boxes[keep], labels[keep]
        anno = [o for k, o in zip(keep, anno) if k]

        # MASK_ON: carry per-GT polygons through the transforms, then
        # pre-rasterize each to a fixed box-normalized (S, S) grid — the
        # static replacement for the reference's SegmentationMask field
        # (coco.py target.add_field('masks', ...))
        masks = None
        if self.cfg.MODEL.MASK_ON:
            from ...structures.segmentation_mask import PolygonInstance

            masks = [
                PolygonInstance(
                    o.get("segmentation") if isinstance(o.get("segmentation"), list)
                    else [], img.size,
                )
                for o in anno
            ]

        # KEYPOINT_ON: carry per-GT (K, 3) COCO keypoints through the same
        # geometric transforms (ref coco.py target.add_field('keypoints',
        # PersonKeypoints(...))); PersonKeypoints shares the masks-list
        # resize/transpose interface, so it rides the transform pipeline as
        # one extra list element
        kps = None
        if self.cfg.MODEL.KEYPOINT_ON:
            from ...structures.keypoint import PersonKeypoints

            nk = self.cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_CLASSES
            raw = np.zeros((len(anno), nk, 3), np.float32)
            for i, o in enumerate(anno):
                flat = np.asarray(o.get("keypoints", []), np.float32).reshape(-1)
                m = min(len(flat) // 3, nk)
                if m:
                    raw[i, :m] = flat[: m * 3].reshape(m, 3)
            kps = PersonKeypoints(raw, img.size)

        if self.choose_close:
            img_supp = self.get_close_item_from_cat(img_id, cur_cat, shot=self.shot)
        elif self.choose_selected:
            img_supp = self.get_selected_item_from_cat(cur_cat, shot=self.shot)
        else:
            img_supp = self.get_random_item_from_cat(cur_cat, img_id, shot=self.shot)

        if self._transforms is not None:
            extras = (list(masks) if masks is not None else []) + (
                [kps] if kps is not None else []
            )
            if extras:
                img, boxes, extras = self._transforms(img, boxes, extras)
                if kps is not None:
                    kps = extras[-1]
                    extras = extras[:-1]
                if masks is not None:
                    masks = extras
            else:
                img, boxes = self._transforms(img, boxes)
            img_supp = [self._supp_transforms(s, None)[0] for s in img_supp]

        item = {
            "img": img,
            "img_supp": img_supp,
            "boxes": boxes,
            "labels": labels,
            "idx": idx,
            "target_id": cur_cat,
            "img_id": img_id,
        }
        if masks is not None:
            s = self.cfg.TPU.MASK_RASTER
            rasters = np.zeros((len(masks), s, s), np.float32)
            for i, (m, b) in enumerate(zip(masks, boxes)):
                if len(m):
                    rasters[i] = np.asarray(
                        m.crop(b).resize((s, s)).rasterize(), np.float32
                    )
            item["masks"] = rasters
        if kps is not None:
            item["keypoints"] = kps.keypoints  # (N, K, 3), transform-applied
        return item

    def get_img_info(self, index):
        img_id = self.id_to_img_map[index]
        return self.coco.imgs[img_id], self.chosen_cats[index]
