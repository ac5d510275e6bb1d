"""Mask R-CNN mask head (reference: modeling/roi_heads/mask_head/).

Wired into CombinedROIHeads when MODEL.MASK_ON (off in all one-shot configs,
SURVEY §2.4) — kept for API parity. Padded/static redesign:

  - MaskRCNNFPNFeatureExtractor: 4x (3x3 conv 256 + ReLU) over 14x14 pooled
    ROI features (mask_feature_extractors.py);
  - MaskRCNNC4Predictor: 2x2 stride-2 deconv + 1x1 per-class mask logits
    (mask_predictors.py);
  - loss: BCE between predicted per-class 28x28 logits and mask targets
    rasterized inside each matched proposal (mask_head/loss.py project);
  - inference: sigmoid + per-detection class slice (mask_head/inference.py);
    the Masker image paste-back runs on host (numpy) at the API boundary.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.losses import bce_with_logits


class MaskRCNNFPNFeatureExtractor(nn.Module):
    layers: tuple = (256, 256, 256, 256)
    dtype: Any = jnp.float32
    quant: str = "none"  # TPU.QUANT: int8 fcn convs (predictor stays float)

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import make_conv

        for i, ch in enumerate(self.layers):
            x = nn.relu(
                make_conv(self.quant, features=ch, kernel_size=(3, 3),
                          padding="SAME", dtype=self.dtype,
                          kernel_init=nn.initializers.variance_scaling(
                              2.0, "fan_out", "normal"),
                          name=f"mask_fcn{i + 1}")(x)
            )
        return x


class MaskRCNNPredictor(nn.Module):
    num_classes: int = 2
    dim_reduced: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.dim_reduced, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="conv5_mask",
        )(x)
        x = nn.relu(x)
        return nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype, name="mask_fcn_logits"
        )(x).astype(jnp.float32)


class MaskHead(nn.Module):
    """feature extractor + predictor; returns (N, 2*res, 2*res, num_classes)."""

    num_classes: int = 2
    conv_layers: tuple = (256, 256, 256, 256)
    dtype: Any = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, roi_feats):
        x = MaskRCNNFPNFeatureExtractor(
            layers=self.conv_layers, dtype=self.dtype, quant=self.quant,
            name="feature_extractor"
        )(roi_feats)
        return MaskRCNNPredictor(
            num_classes=self.num_classes, dtype=self.dtype, name="predictor"
        )(x)


def project_masks_on_boxes(gt_masks: jnp.ndarray, boxes: jnp.ndarray,
                           mask_size: int) -> jnp.ndarray:
    """Crop+resize gt masks to each proposal (mask_head/loss.py project...).

    gt_masks: (N, H, W) float in image coords, aligned per proposal.
    boxes: (N, 4) xyxy. Returns (N, mask_size, mask_size) targets.
    """
    n, h, w = gt_masks.shape
    ys = jnp.linspace(0.0, 1.0, mask_size)
    xs = jnp.linspace(0.0, 1.0, mask_size)

    def per(mask, box):
        x1, y1, x2, y2 = box
        gy = y1 + ys * jnp.maximum(y2 - y1, 1.0)
        gx = x1 + xs * jnp.maximum(x2 - x1, 1.0)
        yi = jnp.clip(jnp.round(gy), 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(jnp.round(gx), 0, w - 1).astype(jnp.int32)
        return mask[yi][:, xi]

    return jax.vmap(per)(gt_masks, boxes)


def project_gt_rasters(
    rasters: jnp.ndarray,    # (N, S, S) per-proposal matched GT mask rasters
    gt_boxes: jnp.ndarray,   # (N, 4) xyxy of the matched GT
    prop_boxes: jnp.ndarray,  # (N, 4) xyxy of the proposal
    out_size: int,
) -> jnp.ndarray:
    """Static-shape mask target projection.

    The reference rasterizes each GT polygon cropped to the proposal box
    (mask_head/loss.py project_masks_on_boxes); carrying polygons through a
    jitted step is impossible, so the TPU-native pipeline pre-rasterizes each
    GT mask to a fixed (S, S) grid over its own box and this function
    bilinearly resamples that raster under the proposal->gt affine map
    (zero outside the GT box). Returns (N, out_size, out_size) in [0, 1].
    """
    n, s, _ = rasters.shape
    grid = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size

    def per(raster, gb, pb):
        # proposal-box grid points in image coords
        ys = pb[1] + grid * jnp.maximum(pb[3] - pb[1], 1.0)
        xs = pb[0] + grid * jnp.maximum(pb[2] - pb[0], 1.0)
        # normalize into the gt box, then to raster cells
        gy = (ys - gb[1]) / jnp.maximum(gb[3] - gb[1], 1.0) * s - 0.5
        gx = (xs - gb[0]) / jnp.maximum(gb[2] - gb[0], 1.0) * s - 0.5
        inside_y = (gy > -0.5) & (gy < s - 0.5)
        inside_x = (gx > -0.5) & (gx < s - 0.5)
        y0 = jnp.clip(jnp.floor(gy), 0, s - 1)
        x0 = jnp.clip(jnp.floor(gx), 0, s - 1)
        y1 = jnp.clip(y0 + 1, 0, s - 1)
        x1 = jnp.clip(x0 + 1, 0, s - 1)
        fy = jnp.clip(gy - y0, 0.0, 1.0)
        fx = jnp.clip(gx - x0, 0.0, 1.0)
        y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
        x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
        r00 = raster[y0i][:, x0i]
        r01 = raster[y0i][:, x1i]
        r10 = raster[y1i][:, x0i]
        r11 = raster[y1i][:, x1i]
        top = r00 * (1 - fx)[None, :] + r01 * fx[None, :]
        bot = r10 * (1 - fx)[None, :] + r11 * fx[None, :]
        out = top * (1 - fy)[:, None] + bot * fy[:, None]
        return out * (inside_y[:, None] & inside_x[None, :])

    return jax.vmap(per)(rasters.astype(jnp.float32), gt_boxes, prop_boxes)


def mask_head_loss(mask_logits: jnp.ndarray, mask_targets: jnp.ndarray,
                   labels: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Per-positive BCE on the matched class channel (mask_head/loss.py)."""
    n = mask_logits.shape[0]
    cls = jnp.clip(labels, 0, mask_logits.shape[-1] - 1)
    picked = jnp.take_along_axis(
        mask_logits, cls[:, None, None, None], axis=-1
    )[..., 0]
    l = bce_with_logits(picked, mask_targets).mean(axis=(1, 2))
    w = (valid & (labels > 0)).astype(jnp.float32)
    return (l * w).sum() / jnp.maximum(w.sum(), 1.0)


def paste_mask_in_image(mask: np.ndarray, box, im_h: int, im_w: int,
                        thresh: float = 0.5, padding: int = 1) -> np.ndarray:
    """Host-side Masker paste-back (mask_head/inference.py Masker)."""
    from PIL import Image

    mask = np.pad(mask, padding)
    x1, y1, x2, y2 = [int(round(float(v))) for v in box]
    w = max(x2 - x1 + 1, 1)
    h = max(y2 - y1 + 1, 1)
    resized = np.asarray(
        Image.fromarray((mask * 255).astype(np.uint8)).resize((w, h), Image.BILINEAR),
        np.float32,
    ) / 255.0
    out = np.zeros((im_h, im_w), np.uint8)
    xs1, ys1 = max(x1, 0), max(y1, 0)
    xs2, ys2 = min(x2 + 1, im_w), min(y2 + 1, im_h)
    out[ys1:ys2, xs1:xs2] = (
        resized[ys1 - y1:ys2 - y1, xs1 - x1:xs2 - x1] > thresh
    ).astype(np.uint8)
    return out
