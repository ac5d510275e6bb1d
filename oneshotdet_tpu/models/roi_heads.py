"""Combined ROI heads (reference: modeling/roi_heads/roi_heads.py).

CombinedROIHeads chains the box head with optional mask and keypoint heads
over shared or re-pooled ROI features (roi_heads.py:29-55). The one-shot
configs only enable the box head; this module keeps the composition surface
for MASK_ON / KEYPOINT_ON configurations.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .keypoint_head import KeypointHead
from .mask_head import MaskHead
from .roi_head import ROIBoxHeadNet


class CombinedROIHeads(nn.Module):
    """Box (+ mask, + keypoint) heads over pooled ROI features.

    The caller supplies pooled query ROI features and (for the one-shot box
    head) whole-support features; mask/keypoint heads run on the same or
    separately pooled features (share_box_feature_extractor semantics).
    """

    box_num_classes: int = 2
    box_num_bbox_reg: int = 2
    in_channels: int = 256
    mask_on: bool = False
    keypoint_on: bool = False
    num_keypoints: int = 17
    dtype: Any = jnp.float32

    def setup(self):
        self.box = ROIBoxHeadNet(
            in_channels=self.in_channels,
            num_classes=self.box_num_classes,
            num_bbox_reg=self.box_num_bbox_reg,
            dtype=self.dtype,
            name="box",
        )
        if self.mask_on:
            self.mask = MaskHead(num_classes=self.box_num_classes,
                                 dtype=self.dtype, name="mask")
        if self.keypoint_on:
            self.keypoint = KeypointHead(num_keypoints=self.num_keypoints,
                                         dtype=self.dtype, name="keypoint")

    def __call__(
        self,
        roi_feats: jnp.ndarray,          # (N, 7, 7, C)
        supp_feats: jnp.ndarray,         # (N, 7, 7, C)
        mask_feats: Optional[jnp.ndarray] = None,      # (N, 14, 14, C)
        keypoint_feats: Optional[jnp.ndarray] = None,  # (N, 14, 14, C)
    ):
        logits, deltas = self.box(roi_feats, supp_feats)
        out = {"class_logits": logits, "box_deltas": deltas}
        if self.mask_on:
            feats = mask_feats if mask_feats is not None else roi_feats
            out["mask_logits"] = self.mask(feats)
        if self.keypoint_on:
            feats = keypoint_feats if keypoint_feats is not None else roi_feats
            out["keypoint_logits"] = self.keypoint(feats)
        return out
