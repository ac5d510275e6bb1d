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

    def query_bucket_for(self, shapes) -> tuple:
        return _pick_bucket(shapes, self.query_buckets)

    def _maybe_s2d(self, arr):
        if self.host_s2d and arr.shape[1] % 2 == 0 and arr.shape[2] % 2 == 0:
            from .transforms import space_to_depth

            return space_to_depth(arr)
        return arr

    def item_arrays(self, it: dict, query_hw: tuple) -> Dict[str, np.ndarray]:
        """The per-item (parallelizable) half of collation: decode-output ->
        resized/normalized/padded bucket slots (+host space-to-depth).
        Runs inside loader workers; ``assemble`` stacks the results."""
        qh, qw = query_hw
        query = np.zeros((1, qh, qw, 3), np.float32)
        h, w = self._write(it["img"], query[0])

        sh, sw = _pick_bucket([self._shape_of(s) for s in it["img_supp"]],
                              [self.supp_bucket])
        supp = np.zeros((len(it["img_supp"]), sh, sw, 3), np.float32)
        supp_sizes = np.zeros((len(it["img_supp"]), 2), np.float32)
        for i, s in enumerate(it["img_supp"]):
            hs, ws = self._write(s, supp[i])
            supp_sizes[i] = (hs, ws)

        gt_xyxy = np.zeros((self.max_gt, 4), np.float32)
        gt_valid = np.zeros((self.max_gt,), bool)
        gt_labels = np.zeros((self.max_gt,), np.int32)
        n = min(len(it["boxes"]), self.max_gt)
        if n:
            gt_xyxy[:n] = it["boxes"][:n]
            gt_valid[:n] = True
            gt_labels[:n] = it["labels"][:n]

        out = {
            "query_pixels": self._maybe_s2d(query)[0],
            "query_sizes": np.array([h, w], np.float32),
            "supp_pixels": self._maybe_s2d(supp),
            "supp_sizes": supp_sizes,
            "gt_xyxy": gt_xyxy,
            "gt_valid": gt_valid,
            "gt_labels": gt_labels,
            "target_id": np.int32(it["target_id"]),
            "img_id": np.int64(it["img_id"]),
            "idx": np.int64(it["idx"]),
        }
        if "masks" in it:  # MASK_ON: padded per-GT box-normalized rasters
            # shape[-1] is the raster size S even for a (0, S, S) array from
            # an all-degenerate-GT item; gating on len() produced a
            # (max_gt, 0, 0) part that crashed assemble()'s np.stack
            s = it["masks"].shape[-1]
            gm = np.zeros((self.max_gt, s, s), np.float32)
            if n:
                gm[:n] = it["masks"][:n]
            out["gt_masks"] = gm
        if "keypoints" in it:  # KEYPOINT_ON: padded per-GT (K, 3) keypoints
            k = it["keypoints"].shape[1]
            gk = np.zeros((self.max_gt, k, 3), np.float32)
            if n:
                gk[:n] = it["keypoints"][:n]
            out["gt_keypoints"] = gk
        return out

    @staticmethod
    def assemble(parts: List[Dict[str, np.ndarray]],
                 query_pixels: np.ndarray | None = None) -> Dict[str, np.ndarray]:
        """Stack per-item arrays into the batch dict (cheap, main process).
        ``query_pixels`` overrides the stack with an already-batched slab
        (shared-memory loader: zero-copy)."""
        out = {
            "query_pixels": (query_pixels if query_pixels is not None
                             else np.stack([p["query_pixels"] for p in parts])),
            "query_sizes": np.stack([p["query_sizes"] for p in parts]),
            "supp_pixels": np.concatenate([p["supp_pixels"] for p in parts]),
            "supp_sizes": np.concatenate([p["supp_sizes"] for p in parts]),
            "gt_xyxy": np.stack([p["gt_xyxy"] for p in parts]),
            "gt_valid": np.stack([p["gt_valid"] for p in parts]),
            "gt_labels": np.stack([p["gt_labels"] for p in parts]),
            "target_ids": np.array([p["target_id"] for p in parts], np.int32),
            "img_ids": np.array([p["img_id"] for p in parts], np.int64),
            "idxs": np.array([p["idx"] for p in parts], np.int64),
        }
        if "gt_masks" in parts[0]:  # MASK_ON
            out["gt_masks"] = np.stack([p["gt_masks"] for p in parts])
        if "gt_keypoints" in parts[0]:  # KEYPOINT_ON
            out["gt_keypoints"] = np.stack([p["gt_keypoints"] for p in parts])
        return out

    def __call__(self, items: List[dict]) -> Dict[str, np.ndarray]:
        q_shapes = [self._shape_of(it["img"]) for it in items]
        query_hw = _pick_bucket(q_shapes, self.query_buckets)
        return self.assemble([self.item_arrays(it, query_hw) for it in items])
