"""Batch collation into fixed resolution buckets.

Reference BatchCollator (data/collate_batch.py:15-42) pads queries to the
max-in-batch shape (/32) and flattens supports across the batch. Dynamic
shapes recompile on TPU, so this collator pads into the *fixed* buckets of
cfg.TPU.QUERY_BUCKETS / cfg.TPU.SUPP_BUCKET: per batch it picks the smallest
bucket that fits every image (orientation-grouped sampling keeps that
tight). GT boxes are padded to cfg.TPU.MAX_GT_BOXES with validity masks.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..csrc import resize_normalize_pad


def _pick_bucket(shapes, buckets):
    """Smallest-area bucket covering all (h, w) shapes, else max-rounded."""
    fitting = [b for b in buckets if all(h <= b[0] and w <= b[1] for h, w in shapes)]
    if fitting:
        return min(fitting, key=lambda b: b[0] * b[1])
    max_h = max(h for h, _ in shapes)
    max_w = max(w for _, w in shapes)
    r = lambda x: int(-(-x // 32) * 32)
    return (r(max_h), r(max_w))


class BatchCollator:
    def __init__(self, cfg):
        self.query_buckets = tuple(tuple(b) for b in cfg.TPU.QUERY_BUCKETS)
        self.supp_bucket = tuple(cfg.TPU.SUPP_BUCKET)
        self.max_gt = cfg.TPU.MAX_GT_BOXES
        self.host_s2d = bool(getattr(cfg.TPU, "HOST_S2D", False))

    @staticmethod
    def _shape_of(img):
        if isinstance(img, dict):  # fused-native path: pixels not yet resized
            return img["out_hw"]
        return img.shape[:2]

    @staticmethod
    def _write(img, dst):
        """Write one image into its zero-initialized batch slot."""
        if isinstance(img, dict):
            ok = resize_normalize_pad(
                img["u8"], dst, img["out_hw"], img["mean"], img["std"],
                img["to_bgr255"],
            )
            if ok:
                return img["out_hw"]
            # native lib unavailable: python fallback
            from PIL import Image

            oh, ow = img["out_hw"]
            arr = np.asarray(
                Image.fromarray(img["u8"]).resize((ow, oh), Image.BILINEAR),
                np.float32,
            )
            if img["to_bgr255"]:
                arr = arr[:, :, ::-1]
            else:
                arr = arr / 255.0
            dst[:oh, :ow] = (arr - img["mean"]) / img["std"]
            return img["out_hw"]
        h, w = img.shape[:2]
        dst[:h, :w] = img
        return h, w

    def __call__(self, items: List[dict]) -> Dict[str, np.ndarray]:
        b = len(items)
        q_shapes = [self._shape_of(it["img"]) for it in items]
        qh, qw = _pick_bucket(q_shapes, self.query_buckets)

        query = np.zeros((b, qh, qw, 3), np.float32)
        query_sizes = np.zeros((b, 2), np.float32)
        for i, it in enumerate(items):
            h, w = self._write(it["img"], query[i])
            query_sizes[i] = (h, w)

        supports = [s for it in items for s in it["img_supp"]]
        s_shapes = [self._shape_of(s) for s in supports]
        sh, sw = _pick_bucket(s_shapes, [self.supp_bucket])
        supp = np.zeros((len(supports), sh, sw, 3), np.float32)
        supp_sizes = np.zeros((len(supports), 2), np.float32)
        for i, s in enumerate(supports):
            h, w = self._write(s, supp[i])
            supp_sizes[i] = (h, w)

        gt_xyxy = np.zeros((b, self.max_gt, 4), np.float32)
        gt_valid = np.zeros((b, self.max_gt), bool)
        gt_labels = np.zeros((b, self.max_gt), np.int32)
        for i, it in enumerate(items):
            n = min(len(it["boxes"]), self.max_gt)
            if n:
                gt_xyxy[i, :n] = it["boxes"][:n]
                gt_valid[i, :n] = True
                gt_labels[i, :n] = it["labels"][:n]

        if self.host_s2d and qh % 2 == 0 and qw % 2 == 0 and sh % 2 == 0 and sw % 2 == 0:
            from .transforms import space_to_depth
            query = space_to_depth(query)
            supp = space_to_depth(supp)

        return {
            "query_pixels": query,
            "query_sizes": query_sizes,
            "supp_pixels": supp,
            "supp_sizes": supp_sizes,
            "gt_xyxy": gt_xyxy,
            "gt_valid": gt_valid,
            "gt_labels": gt_labels,
            "target_ids": np.array([it["target_id"] for it in items], np.int32),
            "img_ids": np.array([it["img_id"] for it in items], np.int64),
            "idxs": np.array([it["idx"] for it in items], np.int64),
        }
