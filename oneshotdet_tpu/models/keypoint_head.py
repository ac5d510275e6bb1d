"""Keypoint R-CNN head (reference: modeling/roi_heads/keypoint_head/).

Wired into CombinedROIHeads when MODEL.KEYPOINT_ON (off in all one-shot
configs) — kept for API parity. Padded/static redesign:

  - KeypointRCNNFeatureExtractor: 8x (3x3 conv 512 + ReLU) over 14x14
    pooled features;
  - KeypointRCNNPredictor: stride-2 deconv to K heatmap logits + 2x bilinear
    upsample (keypoint_head predictors);
  - loss: per-visible-keypoint softmax cross-entropy over heatmap positions;
  - inference: heatmap argmax -> image coordinates.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class KeypointRCNNFeatureExtractor(nn.Module):
    layers: tuple = tuple(512 for _ in range(8))
    dtype: Any = jnp.float32
    quant: str = "none"  # TPU.QUANT: int8 fcn convs (predictor stays float)

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import make_conv

        for i, ch in enumerate(self.layers):
            x = nn.relu(
                make_conv(self.quant, features=ch, kernel_size=(3, 3),
                          padding="SAME", dtype=self.dtype,
                          name=f"conv_fcn{i + 1}")(x)
            )
        return x


class KeypointRCNNPredictor(nn.Module):
    num_keypoints: int = 17
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.num_keypoints, (4, 4), strides=(2, 2), dtype=self.dtype,
            name="kps_score_lowres",
        )(x)
        n, h, w, k = x.shape
        x = jax.image.resize(x.astype(jnp.float32), (n, h * 2, w * 2, k), "bilinear")
        return x


class KeypointHead(nn.Module):
    num_keypoints: int = 17
    conv_layers: tuple = tuple(512 for _ in range(8))
    dtype: Any = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, roi_feats):
        x = KeypointRCNNFeatureExtractor(
            layers=self.conv_layers, dtype=self.dtype, quant=self.quant,
            name="feature_extractor"
        )(roi_feats)
        return KeypointRCNNPredictor(
            num_keypoints=self.num_keypoints, dtype=self.dtype, name="predictor"
        )(x)


def keypoints_to_heatmap_targets(
    keypoints: jnp.ndarray,  # (N, K, 3) in image coords
    boxes: jnp.ndarray,      # (N, 4)
    heatmap_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, K) flat heatmap indices + validity (keypoint_head/loss.py)."""
    x1 = boxes[:, 0:1]
    y1 = boxes[:, 1:2]
    sx = heatmap_size / jnp.maximum(boxes[:, 2:3] - x1, 1.0)
    sy = heatmap_size / jnp.maximum(boxes[:, 3:4] - y1, 1.0)
    px = jnp.floor((keypoints[..., 0] - x1) * sx)
    py = jnp.floor((keypoints[..., 1] - y1) * sy)
    inside = (px >= 0) & (px < heatmap_size) & (py >= 0) & (py < heatmap_size)
    valid = inside & (keypoints[..., 2] > 0)
    px = jnp.clip(px, 0, heatmap_size - 1)
    py = jnp.clip(py, 0, heatmap_size - 1)
    return (py * heatmap_size + px).astype(jnp.int32), valid


def keypoint_head_loss(kp_logits: jnp.ndarray, heatmap_idx: jnp.ndarray,
                       kp_valid: jnp.ndarray) -> jnp.ndarray:
    """Softmax CE over flattened heatmaps for visible keypoints."""
    n, h, w, k = kp_logits.shape
    logits = kp_logits.transpose(0, 3, 1, 2).reshape(n * k, h * w)
    logp = jax.nn.log_softmax(logits, axis=-1)
    idx = heatmap_idx.reshape(n * k)
    nll = -jnp.take_along_axis(logp, idx[:, None], axis=1)[:, 0]
    wv = kp_valid.reshape(n * k).astype(jnp.float32)
    return (nll * wv).sum() / jnp.maximum(wv.sum(), 1.0)


def heatmaps_to_keypoints(kp_logits: jnp.ndarray, boxes: jnp.ndarray):
    """Argmax decode back to image coordinates (keypoint_head/inference.py)."""
    n, h, w, k = kp_logits.shape
    flat = kp_logits.transpose(0, 3, 1, 2).reshape(n, k, h * w)
    idx = flat.argmax(-1)
    scores = flat.max(-1)
    py = (idx // w).astype(jnp.float32) + 0.5
    px = (idx % w).astype(jnp.float32) + 0.5
    x1 = boxes[:, 0:1]
    y1 = boxes[:, 1:2]
    sx = jnp.maximum(boxes[:, 2:3] - x1, 1.0) / w
    sy = jnp.maximum(boxes[:, 3:4] - y1, 1.0) / h
    return jnp.stack([x1 + px * sx, y1 + py * sy], axis=-1), scores
