"""Streaming single-image predictor (reference: maskrcnn_benchmark/predictor.py).

``COCODemo.run_on_opencv_image`` (predictor.py:162-224) reimagined for the
one-shot model and for TPU:

  - the reference's demo calls ``model(image_list)`` single-arg and is
    therefore broken for the Siamese forward (SURVEY §3.4); here the support
    branch is first-class: ``set_support(image)`` computes support features
    ONCE per class and caches them on device;
  - preprocessing (resize + BGR255 normalize + bucket pad) is fused into the
    jitted forward (the "fused on-device preprocessing" requirement of
    BASELINE.json config #5);
  - each ``run_on_image`` call is one device round-trip: uint8 image in,
    (boxes, scores) out, boxes already rescaled to the original frame.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data.transforms import get_resize_size
from .models import build_detection_model
from .structures.image_batch import ImageBatch


class OneShotPredictor:
    def __init__(
        self,
        cfg,
        variables,
        confidence_threshold: float = 0.0,
        query_bucket: Optional[Tuple[int, int]] = None,
        supp_bucket: Optional[Tuple[int, int]] = None,
    ):
        self.cfg = cfg
        self.model = build_detection_model(cfg)
        self.variables = variables
        self.confidence_threshold = confidence_threshold
        self.query_bucket = tuple(query_bucket or cfg.TPU.QUERY_BUCKETS[0])
        self.supp_bucket = tuple(supp_bucket or cfg.TPU.SUPP_BUCKET)
        self.pixel_mean = jnp.asarray(cfg.INPUT.PIXEL_MEAN, jnp.float32)
        self.pixel_std = jnp.asarray(cfg.INPUT.PIXEL_STD, jnp.float32)
        self.to_bgr255 = cfg.INPUT.TO_BGR255
        self._supp_cache = None

        self._support_fn = jax.jit(self._compute_support)
        self._predict_fn = jax.jit(self._predict, static_argnames=("in_hw",))

    # -- preprocessing (device-side) ---------------------------------------
    def _normalize(self, img_f32):
        if self.to_bgr255:
            img_f32 = img_f32[..., ::-1]
        else:
            img_f32 = img_f32 / 255.0
        return (img_f32 - self.pixel_mean) / self.pixel_std

    def _preprocess(self, pixels_u8, in_hw, out_hw):
        """uint8 RGB (H0, W0, 3) -> normalized padded (outH, outW, 3)."""
        oh, ow = in_hw
        img = jax.image.resize(pixels_u8.astype(jnp.float32), (oh, ow, 3), "bilinear")
        img = self._normalize(img)
        out = jnp.zeros((*out_hw, 3), jnp.float32)
        return out.at[:oh, :ow].set(img)

    # -- support -------------------------------------------------------------
    def _compute_support(self, padded, size_hw):
        batch = ImageBatch(pixels=padded[None], sizes=size_hw[None])
        return self.model.apply(
            self.variables, batch, 1, method=lambda m, b, n: m.compute_support_features(b, n)
        )

    def set_support(self, image_rgb_u8: np.ndarray):
        """Compute + cache support features for one support crop."""
        h0, w0 = image_rgb_u8.shape[:2]
        oh, ow = get_resize_size(
            (w0, h0), self.cfg.INPUT.SUPP_MIN_SIZE_TEST, self.cfg.INPUT.SUPP_MAX_SIZE_TEST
        )
        oh, ow = min(oh, self.supp_bucket[0]), min(ow, self.supp_bucket[1])
        padded = self._preprocess(
            jnp.asarray(np.ascontiguousarray(image_rgb_u8)), (oh, ow), self.supp_bucket
        )
        self._supp_cache = self._support_fn(padded, jnp.array([oh, ow], jnp.float32))
        return self._supp_cache

    # -- per-frame detection ---------------------------------------------------
    def _predict(self, padded, size_hw, supp_pooled, supp_7x7, in_hw):
        batch = ImageBatch(pixels=padded[None], sizes=size_hw[None])
        dets = self.model.apply(
            self.variables, batch, supp_pooled, supp_7x7,
            method=lambda m, b, p, s: m.detect_with_support(b, p, s),
        )
        return dets.xyxy[0], dets.get_field("scores")[0], dets.valid[0]

    def run_on_image(self, image_rgb_u8: np.ndarray):
        """Detect the cached support class in one frame.

        Returns (boxes_xyxy, scores) in the ORIGINAL image coordinates.
        """
        assert self._supp_cache is not None, "call set_support() first"
        h0, w0 = image_rgb_u8.shape[:2]
        oh, ow = get_resize_size(
            (w0, h0), self.cfg.INPUT.MIN_SIZE_TEST, self.cfg.INPUT.MAX_SIZE_TEST
        )
        oh, ow = min(oh, self.query_bucket[0]), min(ow, self.query_bucket[1])
        padded = self._preprocess(
            jnp.asarray(np.ascontiguousarray(image_rgb_u8)), (oh, ow), self.query_bucket
        )
        supp_pooled, supp_7x7 = self._supp_cache
        boxes, scores, valid = self._predict_fn(
            padded, jnp.array([oh, ow], jnp.float32), supp_pooled, supp_7x7, (oh, ow)
        )
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        valid = np.asarray(valid) & (scores > self.confidence_threshold)
        boxes = boxes[valid]
        scores = scores[valid]
        # rescale back to the original frame
        boxes = boxes * np.array([w0 / ow, h0 / oh, w0 / ow, h0 / oh])
        return boxes, scores

    # -- annotated-frame API (COCODemo.run_on_opencv_image, predictor.py:162) --

    def overlay_boxes(self, image_rgb_u8: np.ndarray, boxes: np.ndarray,
                      color=(255, 40, 40), width: int = 3) -> np.ndarray:
        """Draw detection boxes (reference overlay_boxes, predictor.py:257)."""
        from PIL import Image, ImageDraw

        img = Image.fromarray(image_rgb_u8)
        draw = ImageDraw.Draw(img)
        for box in boxes:
            draw.rectangle([float(v) for v in box], outline=color, width=width)
        return np.asarray(img)

    def overlay_scores(self, image_rgb_u8: np.ndarray, boxes: np.ndarray,
                       scores: np.ndarray, label: str = "match",
                       color=(255, 255, 0)) -> np.ndarray:
        """Score/label text per box (reference overlay_class_names,
        predictor.py:330 — one-shot has a single 'match' class)."""
        from PIL import Image, ImageDraw

        img = Image.fromarray(image_rgb_u8)
        draw = ImageDraw.Draw(img)
        for box, score in zip(boxes, scores):
            draw.text((float(box[0]) + 2, float(box[1]) + 2),
                      f"{label}: {score:.2f}", fill=color)
        return np.asarray(img)

    def run_on_opencv_image(self, image_bgr_u8: np.ndarray) -> np.ndarray:
        """BGR frame in -> annotated BGR frame out — the reference's demo
        entry point (predictor.py:162-185), fixed for the Siamese model
        (the reference's calls model(image_list) single-arg and cannot run
        the one-shot forward, SURVEY §3.4)."""
        rgb = np.ascontiguousarray(image_bgr_u8[:, :, ::-1])
        boxes, scores = self.run_on_image(rgb)
        out = self.overlay_boxes(rgb, boxes)
        out = self.overlay_scores(out, boxes, scores)
        return np.ascontiguousarray(out[:, :, ::-1])
