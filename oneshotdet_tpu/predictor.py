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


def preprocess_frame(pixels_u8, in_hw, out_hw, pixel_mean, pixel_std,
                     to_bgr255):
    """uint8 RGB (H0, W0, 3) -> normalized, zero-padded (outH, outW, 3)."""
    oh, ow = in_hw
    img = jax.image.resize(pixels_u8.astype(jnp.float32), (oh, ow, 3),
                           "bilinear")
    if to_bgr255:
        img = img[..., ::-1]
    else:
        img = img / 255.0
    img = (img - pixel_mean) / pixel_std
    out = jnp.zeros((*out_hw, 3), jnp.float32)
    return out.at[:oh, :ow].set(img)


def _select_threshold(thr, class_id: int) -> float:
    """Scalar threshold, or the class's entry of a per-class vector
    (reference select_top_predictions, predictor.py:226-233)."""
    if np.ndim(thr) == 0:
        return float(thr)
    thr = np.asarray(thr, np.float32)
    if not 0 <= class_id < thr.shape[0]:
        raise IndexError(
            f"support class_id {class_id} outside the "
            f"{thr.shape[0]}-entry per-class threshold vector")
    return float(thr[class_id])


class OneShotPredictor:
    def __init__(
        self,
        cfg,
        variables,
        confidence_threshold=0.0,
        query_bucket: Optional[Tuple[int, int]] = None,
        supp_bucket: Optional[Tuple[int, int]] = None,
        spatial_devices: int = 1,
    ):
        """``confidence_threshold`` is a scalar OR a per-class vector
        (reference ``COCODemo(confidence_thresholds_for_classes=...)``,
        predictor.py:110/226-239 and the hardcoded 20-class tensor in
        demo/fcos_demo.py:15-40). A vector is indexed by the support
        class id passed to ``set_support(image, class_id=...)`` — the
        output of ``coco_eval.compute_thresholds_for_classes`` plugs in
        directly. Index 0 is background in the reference's tables; pass
        the same 1-based class ids used there."""
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
        self._supp_class_id = 1

        # spatial partitioning for single-image latency (``spatial_devices``
        # > 1): ONE frame's H axis is sharded across that many chips, params
        # stay replicated, and GSPMD inserts the conv halo exchanges — the
        # TPU-native way to push per-frame latency below the single-chip
        # floor. The reference's serving path has no analog (one GPU per
        # process, predictor.py:201-205).
        self._mesh = None
        if spatial_devices > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .parallel.mesh import make_mesh

            devs = jax.devices()[:spatial_devices]
            if len(devs) < spatial_devices:
                raise ValueError(
                    f"spatial_devices={spatial_devices} but only "
                    f"{len(devs)} devices are available")
            if self.query_bucket[0] % spatial_devices:
                raise ValueError(
                    f"query bucket H={self.query_bucket[0]} must divide "
                    f"spatial_devices={spatial_devices}")
            self._mesh = make_mesh(("model",), devs)
            self.variables = jax.device_put(
                self.variables, NamedSharding(self._mesh, P()))

        self._support_fn = jax.jit(self._compute_support)
        self._predict_fn = jax.jit(self._predict, static_argnames=("in_hw",))

    def _place(self, x, *spec):
        """Put ``x`` on the spatial mesh (no-op without one)."""
        if self._mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(x, NamedSharding(self._mesh, P(*spec)))

    def _threshold_for_current_class(self) -> float:
        """Scalar threshold, or the cached support class's entry of the
        per-class vector (reference select_top_predictions,
        predictor.py:226-233: thresholds = self.confidence_thresholds[labels])."""
        return _select_threshold(self.confidence_threshold, self._supp_class_id)

    # -- preprocessing (device-side) ---------------------------------------
    def _preprocess(self, pixels_u8, in_hw, out_hw):
        """uint8 RGB (H0, W0, 3) -> normalized padded (outH, outW, 3)."""
        return preprocess_frame(pixels_u8, in_hw, out_hw, self.pixel_mean,
                                self.pixel_std, self.to_bgr255)

    # -- support -------------------------------------------------------------
    def _compute_support(self, padded, size_hw):
        batch = ImageBatch(pixels=padded[None], sizes=size_hw[None])
        return self.model.apply(
            self.variables, batch, 1, method=lambda m, b, n: m.compute_support_features(b, n)
        )

    def set_support(self, image_rgb_u8: np.ndarray, class_id: int = 1):
        """Compute + cache support features for one support crop.

        ``class_id`` selects this class's entry when ``confidence_threshold``
        is a per-class vector (and is otherwise only bookkeeping)."""
        self._supp_class_id = int(class_id)
        h0, w0 = image_rgb_u8.shape[:2]
        oh, ow = get_resize_size(
            (w0, h0), self.cfg.INPUT.SUPP_MIN_SIZE_TEST, self.cfg.INPUT.SUPP_MAX_SIZE_TEST
        )
        oh, ow = min(oh, self.supp_bucket[0]), min(ow, self.supp_bucket[1])
        padded = self._preprocess(
            jnp.asarray(np.ascontiguousarray(image_rgb_u8)), (oh, ow), self.supp_bucket
        )
        self._supp_cache = self._support_fn(
            self._place(padded), self._place(jnp.array([oh, ow], jnp.float32)))
        return self._supp_cache

    # -- per-frame detection ---------------------------------------------------
    def _predict(self, padded, size_hw, supp_pooled, supp_7x7, in_hw):
        batch = ImageBatch(pixels=padded[None], sizes=size_hw[None])
        dets = self.model.apply(
            self.variables, batch, supp_pooled, supp_7x7,
            method=lambda m, b, p, s: m.detect_with_support(b, p, s),
        )
        out = (dets.xyxy[0], dets.get_field("scores")[0], dets.valid[0])
        if self.cfg.MODEL.MASK_ON:  # box-normalized fg-mask probs per det
            out = out + (dets.get_field("mask_probs")[0],)
        return out

    def run_on_image(self, image_rgb_u8: np.ndarray, return_masks: bool = False):
        """Detect the cached support class in one frame.

        Returns (boxes_xyxy, scores) in the ORIGINAL image coordinates —
        plus per-detection box-normalized mask probability grids when
        ``return_masks`` (requires MODEL.MASK_ON).
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
        out = self._predict_fn(
            self._place(padded, "model"),  # H sharded across the mesh
            self._place(jnp.array([oh, ow], jnp.float32)),
            supp_pooled, supp_7x7, (oh, ow)
        )
        boxes, scores, valid = (np.asarray(x) for x in out[:3])
        masks = np.asarray(out[3]) if len(out) > 3 else None
        valid = valid & (scores > self._threshold_for_current_class())
        boxes = boxes[valid]
        scores = scores[valid]
        masks = masks[valid] if masks is not None else None
        # descending-score order (reference select_top_predictions tail,
        # predictor.py:235-239)
        order = np.argsort(-scores, kind="stable")
        boxes, scores = boxes[order], scores[order]
        # rescale back to the original frame
        boxes = boxes * np.array([w0 / ow, h0 / oh, w0 / ow, h0 / oh])
        if return_masks:
            assert masks is not None, "return_masks requires MODEL.MASK_ON"
            return boxes, scores, masks[order]
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

    def overlay_mask_contours(self, image_rgb_u8: np.ndarray, boxes: np.ndarray,
                              mask_probs: np.ndarray, color=(40, 255, 80),
                              thresh: float = 0.5) -> np.ndarray:
        """Draw mask contours (reference overlay_mask, predictor.py:288-305
        + utils/cv2_util.findContours) — cv2-free: paste each detection's
        box-normalized mask grid into its box, threshold, and mark the
        boundary (mask minus its 4-neighbour erosion), dilated one pixel."""
        from PIL import Image

        out = image_rgb_u8.copy()
        h, w = out.shape[:2]
        for box, mp in zip(boxes, mask_probs):
            x1 = max(int(round(float(box[0]))), 0)
            y1 = max(int(round(float(box[1]))), 0)
            x2 = min(int(round(float(box[2]))), w - 1)
            y2 = min(int(round(float(box[3]))), h - 1)
            bw, bh = x2 - x1 + 1, y2 - y1 + 1
            if bw <= 2 or bh <= 2:
                continue
            grid = Image.fromarray(
                (np.asarray(mp, np.float32) * 255).astype(np.uint8)
            ).resize((bw, bh), Image.BILINEAR)
            m = np.asarray(grid, np.float32) / 255.0 >= thresh
            er = m.copy()
            er[1:] &= m[:-1]; er[:-1] &= m[1:]
            er[:, 1:] &= m[:, :-1]; er[:, :-1] &= m[:, 1:]
            edge = m & ~er
            thick = edge.copy()
            thick[1:] |= edge[:-1]; thick[:-1] |= edge[1:]
            thick[:, 1:] |= edge[:, :-1]; thick[:, :-1] |= edge[:, 1:]
            region = out[y1:y2 + 1, x1:x2 + 1]
            region[thick] = color
        return out

    def run_on_opencv_image(self, image_bgr_u8: np.ndarray) -> np.ndarray:
        """BGR frame in -> annotated BGR frame out — the reference's demo
        entry point (predictor.py:162-185), fixed for the Siamese model
        (the reference's calls model(image_list) single-arg and cannot run
        the one-shot forward, SURVEY §3.4)."""
        rgb = np.ascontiguousarray(image_bgr_u8[:, :, ::-1])
        if self.cfg.MODEL.MASK_ON:
            boxes, scores, masks = self.run_on_image(rgb, return_masks=True)
            out = self.overlay_mask_contours(rgb, boxes, masks)
        else:
            boxes, scores = self.run_on_image(rgb)
            out = rgb
        out = self.overlay_boxes(out, boxes)
        out = self.overlay_scores(out, boxes, scores)
        return np.ascontiguousarray(out[:, :, ::-1])


class ArtifactPredictor:
    """``OneShotPredictor``'s streaming API served from an exported serving
    BUNDLE (``export.export_serving``) — no model-building python, no config
    system, and on the compiled-executable fast path no tracing and no XLA
    compile at load time (the deployment cold-start fix, VERDICT r4 #3).

    The reference has no artifact story at all: its demo rebuilds the torch
    model and re-reads the .pth in every serving process (demo/predictor.py).

    Falls back to the portable StableHLO pair (jit-compiled at first call)
    when the bundle carries no executable for this platform; check
    ``self.used_executable``.
    """

    def __init__(self, path: str, confidence_threshold=0.0):
        import json

        from . import export as oexport

        with open(path + ".meta.json") as f:
            self.meta = json.load(f)
        sup = oexport.load_compiled(path + ".support")
        det = oexport.load_compiled(path + ".detect")
        self.used_executable = sup is not None and det is not None
        if not self.used_executable:
            sup = jax.jit(oexport.load(path + ".support").call)
            det = jax.jit(oexport.load(path + ".detect").call)
        self._sup_call, self._det_call = sup, det
        self.confidence_threshold = confidence_threshold
        m = self.meta
        self.query_bucket = tuple(m["query_bucket"])
        self.supp_bucket = tuple(m["supp_bucket"])
        self._pixel_mean = jnp.asarray(m["pixel_mean"], jnp.float32)
        self._pixel_std = jnp.asarray(m["pixel_std"], jnp.float32)
        self._supp_cache = None
        self._supp_class_id = 1
        self._prep = jax.jit(
            partial(preprocess_frame, pixel_mean=self._pixel_mean,
                    pixel_std=self._pixel_std, to_bgr255=m["to_bgr255"]),
            static_argnames=("in_hw", "out_hw"))

    def _pixels(self, image_rgb_u8, min_size, max_size, bucket):
        """Resize + normalize + pad (+ optional 2x2 space-to-depth, matching
        the artifact's input contract) -> ((1, ...) pixels, (1, 2) sizes)."""
        h0, w0 = image_rgb_u8.shape[:2]
        oh, ow = get_resize_size((w0, h0), min_size, max_size)
        oh, ow = min(oh, bucket[0]), min(ow, bucket[1])
        padded = self._prep(jnp.asarray(np.ascontiguousarray(image_rgb_u8)),
                            in_hw=(oh, ow), out_hw=tuple(bucket))
        if self.meta["host_s2d"]:
            h, w, c = padded.shape
            padded = (padded.reshape(h // 2, 2, w // 2, 2, c)
                      .transpose(0, 2, 1, 3, 4).reshape(h // 2, w // 2, 4 * c))
        return padded[None], jnp.array([[oh, ow]], jnp.float32), (oh, ow)

    def set_support(self, image_rgb_u8: np.ndarray, class_id: int = 1):
        """Compute + cache support features for one support crop."""
        self._supp_class_id = int(class_id)
        m = self.meta
        pixels, sizes, _ = self._pixels(
            image_rgb_u8, m["supp_min_size_test"], m["supp_max_size_test"],
            self.supp_bucket)
        self._supp_cache = self._sup_call(pixels, sizes)
        return self._supp_cache

    def run_on_image(self, image_rgb_u8: np.ndarray):
        """Detect the cached support class in one frame; returns
        (boxes_xyxy, scores) in the ORIGINAL image coordinates."""
        assert self._supp_cache is not None, "call set_support() first"
        m = self.meta
        h0, w0 = image_rgb_u8.shape[:2]
        pixels, sizes, (oh, ow) = self._pixels(
            image_rgb_u8, m["min_size_test"], m["max_size_test"],
            self.query_bucket)
        pooled, s7 = self._supp_cache
        xyxy, scores, valid = self._det_call(
            pixels, sizes, pooled, s7,
            jnp.full((1,), self._supp_class_id, jnp.int32))
        boxes, scores, valid = (np.asarray(x)[0] for x in (xyxy, scores, valid))
        valid = valid & (scores > _select_threshold(
            self.confidence_threshold, self._supp_class_id))
        boxes, scores = boxes[valid], scores[valid]
        order = np.argsort(-scores, kind="stable")
        boxes, scores = boxes[order], scores[order]
        return boxes * np.array([w0 / ow, h0 / oh, w0 / ow, h0 / oh]), scores
