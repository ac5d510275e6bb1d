"""Classic anchor-based RPN (reference: modeling/rpn/rpn.py + rpn/loss.py +
rpn/inference.py) — the registered alternative to FCOS-as-RPN (build_rpn
dispatches on MODEL.FCOS_ON, rpn.py:201-210).

Padded/static-shape redesign: per-level anchors are dense (H*W*A, 4) arrays;
matching, sampling, decode, and NMS are masked ops; per-level results
concatenate into fixed-capacity proposal Boxes.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.box_coder import BoxCoder
from ..ops.losses import bce_with_logits, smooth_l1_loss
from ..ops.nms import nms_keep_mask
from ..structures.boxes import Boxes, masked_box_iou
from .anchor_generator import AnchorGenerator
from .matcher import BELOW_LOW_THRESHOLD, balanced_sample, match_boxes


class RPNHead(nn.Module):
    """SingleConvRPNHead (rpn.py:75-107): shared 3x3 conv + two 1x1 heads."""

    num_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        conv = nn.Conv(features[0].shape[-1], (3, 3), padding="SAME",
                       kernel_init=nn.initializers.normal(0.01),
                       dtype=self.dtype, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1),
                      kernel_init=nn.initializers.normal(0.01),
                      dtype=self.dtype, name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (1, 1),
                      kernel_init=nn.initializers.normal(0.01),
                      dtype=self.dtype, name="bbox_pred")
        objectness, box_reg = [], []
        for f in features:
            t = nn.relu(conv(f))
            objectness.append(cls(t).astype(jnp.float32))
            box_reg.append(reg(t).astype(jnp.float32))
        return objectness, box_reg


def rpn_targets(
    anchors: jnp.ndarray,        # (N, 4) all levels concatenated
    visibility: jnp.ndarray,     # (B, N) bool — per-image straddle mask
    gt_xyxy: jnp.ndarray,        # (B, G, 4)
    gt_valid: jnp.ndarray,       # (B, G)
    box_coder: BoxCoder,
    fg_iou: float = 0.7,
    bg_iou: float = 0.3,
):
    """Per-image anchor labels/regression targets (rpn/loss.py prepare_targets).

    labels: 1 fg, 0 bg, -1 discard (between thresholds or invisible).
    """

    def per_image(gt, gtv, vis):
        iou = masked_box_iou(gt, gtv, anchors, jnp.ones(anchors.shape[0], bool))
        matched = match_boxes(iou, gtv, fg_iou, bg_iou, allow_low_quality_matches=True)
        labels = (matched >= 0).astype(jnp.int32)
        labels = jnp.where(matched == BELOW_LOW_THRESHOLD, 0, labels)
        labels = jnp.where((matched < 0) & (matched != BELOW_LOW_THRESHOLD), -1, labels)
        labels = jnp.where(vis, labels, -1)  # discard straddling anchors
        matched_gt = jnp.take(gt, jnp.maximum(matched, 0), axis=0)
        reg = box_coder.encode(matched_gt, anchors)
        return labels, reg

    return jax.vmap(per_image)(gt_xyxy, gt_valid, visibility)


def rpn_losses(
    rng: jax.Array,
    objectness: List[jnp.ndarray],   # per level (B, H, W, A)
    box_reg: List[jnp.ndarray],      # per level (B, H, W, 4A)
    labels: jnp.ndarray,             # (B, N)
    reg_targets: jnp.ndarray,        # (B, N, 4)
    batch_per_image: int = 256,
    positive_fraction: float = 0.5,
):
    """RPNLossComputation.__call__ (rpn/loss.py:91-156): balanced-sampled
    BCE objectness + smooth-L1(beta=1/9) box loss over positives."""
    b = labels.shape[0]
    obj_flat = jnp.concatenate(
        [o.reshape(b, -1) for o in objectness], axis=1
    ).reshape(-1)
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in box_reg], axis=1
    ).reshape(-1, 4)
    labels_flat = labels.reshape(-1)
    reg_t_flat = reg_targets.reshape(-1, 4)

    keys = jax.random.split(rng, b)
    n = labels.shape[1]

    def sample_one(key, lab):
        idx, valid = balanced_sample(key, lab, jnp.ones(n, bool),
                                     batch_per_image, positive_fraction)
        mask = jnp.zeros(n, bool).at[idx].set(valid)
        return mask

    sampled = jax.vmap(sample_one)(keys, labels).reshape(-1)
    pos = sampled & (labels_flat == 1)

    box_l = smooth_l1_loss(reg_flat, reg_t_flat, beta=1.0 / 9).sum(-1)
    box_loss = (box_l * pos).sum() / jnp.maximum(sampled.sum(), 1)

    obj_l = bce_with_logits(obj_flat, (labels_flat == 1).astype(jnp.float32))
    obj_loss = (obj_l * sampled).sum() / jnp.maximum(sampled.sum(), 1)
    return obj_loss, box_loss


def rpn_postprocess(
    anchors_per_level: List[jnp.ndarray],
    objectness: List[jnp.ndarray],
    box_reg: List[jnp.ndarray],
    image_sizes_wh: jnp.ndarray,
    box_coder: BoxCoder,
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float,
    fpn_post_nms_top_n: int,
    min_size: float = 0.0,
) -> Boxes:
    """RPNPostProcessor (rpn/inference.py): per-level top-k + decode + NMS,
    then FPN-wide top-n by objectness."""
    b = objectness[0].shape[0]
    lvl_boxes, lvl_scores, lvl_valid = [], [], []
    for anchors, obj, reg in zip(anchors_per_level, objectness, box_reg):
        n = anchors.shape[0]
        scores = jax.nn.sigmoid(obj.reshape(b, n))
        k = min(pre_nms_top_n, n)
        top_scores, top_idx = jax.lax.top_k(scores, k)
        deltas = jnp.take_along_axis(
            reg.reshape(b, n, 4), top_idx[..., None], axis=1
        )
        sel_anchors = anchors[top_idx]  # (B, k, 4)
        decoded = box_coder.decode(
            deltas.reshape(-1, 4), sel_anchors.reshape(-1, 4)
        ).reshape(b, k, 4)
        # clip + remove small
        w = image_sizes_wh[:, 0:1]
        h = image_sizes_wh[:, 1:2]
        decoded = jnp.stack(
            [
                jnp.clip(decoded[..., 0], 0, w - 1),
                jnp.clip(decoded[..., 1], 0, h - 1),
                jnp.clip(decoded[..., 2], 0, w - 1),
                jnp.clip(decoded[..., 3], 0, h - 1),
            ],
            axis=-1,
        )
        ws = decoded[..., 2] - decoded[..., 0] + 1
        hs = decoded[..., 3] - decoded[..., 1] + 1
        valid = (ws >= min_size) & (hs >= min_size)
        keep = jax.vmap(nms_keep_mask, in_axes=(0, 0, 0, None))(
            decoded, top_scores, valid, nms_thresh
        )
        ranked = jnp.where(keep, top_scores, -jnp.inf)
        kk = min(post_nms_top_n, k)
        s2, i2 = jax.lax.top_k(ranked, kk)
        lvl_boxes.append(jnp.take_along_axis(decoded, i2[..., None], axis=1))
        lvl_scores.append(jnp.where(s2 > -jnp.inf, s2, 0.0))
        lvl_valid.append(s2 > -jnp.inf)

    boxes = jnp.concatenate(lvl_boxes, axis=1)
    scores = jnp.concatenate(lvl_scores, axis=1)
    valid = jnp.concatenate(lvl_valid, axis=1)
    k = min(fpn_post_nms_top_n, boxes.shape[1])
    top_scores, top_idx = jax.lax.top_k(jnp.where(valid, scores, -jnp.inf), k)
    out_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    out_valid = top_scores > -jnp.inf
    return Boxes(
        xyxy=out_boxes,
        valid=out_valid,
        size=image_sizes_wh.astype(jnp.float32),
        fields={"objectness": jnp.where(out_valid, top_scores, 0.0),
                "scores": jnp.where(out_valid, top_scores, 0.0)},
    )


class RPNModule(nn.Module):
    """Anchor-based RPNModule (rpn.py:110-198) with functional losses.

    Train: returns (proposals, {loss_objectness x10, loss_rpn_box_reg x500})
    matching the fork's loss scaling (rpn.py:181-184).
    """

    anchor_sizes: Sequence[float] = (32, 64, 128, 256, 512)
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    anchor_strides: Sequence[int] = (8, 16, 32, 64, 128)
    straddle_thresh: float = 0.0
    fg_iou: float = 0.7
    bg_iou: float = 0.3
    batch_per_image: int = 256
    positive_fraction: float = 0.5
    pre_nms_top_n: int = 2000        # test-time capacities (rpn.py:128-141
    post_nms_top_n: int = 2000       # builds a train/test postprocessor
    fpn_post_nms_top_n: int = 2000   # pair; __call__ picks by `train`)
    pre_nms_top_n_train: int = 12000
    post_nms_top_n_train: int = 4000
    fpn_post_nms_top_n_train: int = 4000
    nms_thresh: float = 0.7
    min_size: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.generator = AnchorGenerator(
            self.anchor_sizes, self.aspect_ratios, self.anchor_strides,
            self.straddle_thresh,
        )
        self.head = RPNHead(
            num_anchors=len(self.aspect_ratios), dtype=self.dtype, name="head"
        )
        self.box_coder = BoxCoder(weights=(1.0, 1.0, 1.0, 1.0))

    def __call__(self, features, image_sizes_wh, targets: Optional[Boxes] = None,
                 train: bool = False, rng=None):
        objectness, box_reg = self.head(features)
        shapes = [(f.shape[1], f.shape[2]) for f in features]
        anchors_per_level = self.generator.grid_anchors(shapes)

        losses = {}
        if train:
            anchors_all = jnp.concatenate(anchors_per_level, axis=0)
            # per-image straddle masks (the reference computes visibility per
            # BoxList, anchor_generator.py add_visibility_to)
            vis = jax.vmap(
                lambda wh: self.generator.visibility(anchors_all, (wh[0], wh[1]))
            )(image_sizes_wh)
            labels, reg_t = rpn_targets(
                anchors_all, vis, targets.xyxy, targets.valid, self.box_coder,
                self.fg_iou, self.bg_iou,
            )
            obj_loss, box_loss = rpn_losses(
                rng, objectness, box_reg, labels, reg_t,
                self.batch_per_image, self.positive_fraction,
            )
            losses = {
                "loss_objectness": obj_loss * 10.0,
                "loss_rpn_box_reg": box_loss * 500.0,
            }
        proposals = rpn_postprocess(
            anchors_per_level,
            [jax.lax.stop_gradient(o) for o in objectness],
            [jax.lax.stop_gradient(r) for r in box_reg],
            image_sizes_wh, self.box_coder,
            self.pre_nms_top_n_train if train else self.pre_nms_top_n,
            self.post_nms_top_n_train if train else self.post_nms_top_n,
            self.nms_thresh,
            self.fpn_post_nms_top_n_train if train else self.fpn_post_nms_top_n,
            self.min_size,
        )
        return proposals, losses
