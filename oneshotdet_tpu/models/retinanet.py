"""RetinaNet one-stage head (reference: modeling/rpn/retinanet/) — the
registered anchor-based alternative to FCOS (off by default,
MODEL.RETINANET_ON).

Padded/static redesign of retinanet.py (head), loss.py (focal + smooth-L1
beta=BBOX_REG_BETA over matched anchors) and inference.py (per-level top-k,
decode with BoxCoder(10,10,5,5), cross-level NMS).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.box_coder import BoxCoder
from ..ops.losses import sigmoid_focal_loss, smooth_l1_loss
from ..ops.nms import nms_keep_mask
from ..structures.boxes import Boxes, masked_box_iou
from .anchor_generator import AnchorGenerator, generate_cell_anchors
from .matcher import BELOW_LOW_THRESHOLD, match_boxes

import math


class RetinaNetHead(nn.Module):
    """4-conv twin towers (no GN) + A*C cls / A*4 reg heads
    (retinanet/retinanet.py:17-80)."""

    num_classes: int = 1          # foreground classes (C-1)
    num_anchors: int = 9
    num_convs: int = 4
    prior_prob: float = 0.01
    dtype: Any = jnp.float32
    quant: str = "none"  # TPU.QUANT: int8 tower convs (predictors stay float)

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        from ..ops.quant import make_conv

        ch = features[0].shape[-1]
        cls_tower = [
            make_conv(self.quant, features=ch, kernel_size=(3, 3),
                      padding="SAME", dtype=self.dtype,
                      kernel_init=nn.initializers.normal(0.01),
                      name=f"cls_tower_{i}")
            for i in range(self.num_convs)
        ]
        bbox_tower = [
            make_conv(self.quant, features=ch, kernel_size=(3, 3),
                      padding="SAME", dtype=self.dtype,
                      kernel_init=nn.initializers.normal(0.01),
                      name=f"bbox_tower_{i}")
            for i in range(self.num_convs)
        ]
        bias = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_logits = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding="SAME",
            dtype=self.dtype, kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias), name="cls_logits",
        )
        bbox_pred = nn.Conv(
            self.num_anchors * 4, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="bbox_pred",
        )
        logits, bbox_reg = [], []
        for f in features:
            t = f
            for conv in cls_tower:
                t = nn.relu(conv(t))
            logits.append(cls_logits(t).astype(jnp.float32))
            b = f
            for conv in bbox_tower:
                b = nn.relu(conv(b))
            bbox_reg.append(bbox_pred(b).astype(jnp.float32))
        return logits, bbox_reg


def retinanet_losses(
    anchors_all: jnp.ndarray,      # (N, 4)
    logits: List[jnp.ndarray],     # per level (B, H, W, A*C)
    bbox_reg: List[jnp.ndarray],
    gt_xyxy: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    box_coder: BoxCoder,
    num_classes: int,
    fg_iou: float = 0.5,
    bg_iou: float = 0.4,
    gamma: float = 2.0,
    alpha: float = 0.25,
    beta: float = 0.11,
    reg_weight: float = 4.0,
):
    """RetinaNetLossComputation (retinanet/loss.py)."""
    b = gt_xyxy.shape[0]

    def per_image(gt, gtl, gtv):
        iou = masked_box_iou(gt, gtv, anchors_all, jnp.ones(anchors_all.shape[0], bool))
        matched = match_boxes(iou, gtv, fg_iou, bg_iou, allow_low_quality_matches=True)
        labels = jnp.take(gtl, jnp.maximum(matched, 0)).astype(jnp.int32)
        labels = jnp.where(matched == BELOW_LOW_THRESHOLD, 0, labels)
        labels = jnp.where((matched < 0) & (matched != BELOW_LOW_THRESHOLD), -1, labels)
        reg = box_coder.encode(jnp.take(gt, jnp.maximum(matched, 0), axis=0), anchors_all)
        return labels, reg

    labels, reg_t = jax.vmap(per_image)(gt_xyxy, gt_labels, gt_valid)

    cls_flat = jnp.concatenate(
        [x.reshape(b, -1, num_classes) for x in logits], axis=1
    ).reshape(-1, num_classes)
    reg_flat = jnp.concatenate(
        [x.reshape(b, -1, 4) for x in bbox_reg], axis=1
    ).reshape(-1, 4)
    labels_flat = labels.reshape(-1)
    reg_t_flat = reg_t.reshape(-1, 4)

    pos = labels_flat > 0
    num_pos = jnp.maximum(pos.sum(), 1)
    cls_loss = sigmoid_focal_loss(cls_flat, labels_flat, gamma, alpha) / (
        num_pos + b
    )
    box_l = smooth_l1_loss(reg_flat, reg_t_flat, beta=beta).sum(-1)
    box_loss = (box_l * pos).sum() / num_pos * reg_weight
    return cls_loss, box_loss


class RetinaNetModule(nn.Module):
    """Full RetinaNet over an FPN pyramid (retinanet/retinanet.py:83-152)."""

    num_classes: int = 1
    anchor_sizes: Sequence[float] = (32, 64, 128, 256, 512)
    anchor_strides: Sequence[int] = (8, 16, 32, 64, 128)
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    octave: float = 2.0
    scales_per_octave: int = 3
    fg_iou: float = 0.5
    bg_iou: float = 0.4
    inference_th: float = 0.05
    pre_nms_top_n: int = 1000
    nms_thresh: float = 0.4
    detections_per_img: int = 100
    dtype: Any = jnp.float32
    quant: str = "none"

    def setup(self):
        cell = []
        for stride, size in zip(self.anchor_strides, self.anchor_sizes):
            sizes = [size * self.octave ** (i / self.scales_per_octave)
                     for i in range(self.scales_per_octave)]
            cell.append(generate_cell_anchors(stride, sizes, self.aspect_ratios))
        gen = AnchorGenerator.__new__(AnchorGenerator)
        gen.cell_anchors = cell
        gen.strides = tuple(self.anchor_strides)
        gen.straddle_thresh = 0.0
        self.generator = gen
        a = len(self.aspect_ratios) * self.scales_per_octave
        self.head = RetinaNetHead(
            num_classes=self.num_classes, num_anchors=a, dtype=self.dtype,
            quant=self.quant, name="head",
        )
        self.box_coder = BoxCoder(weights=(10.0, 10.0, 5.0, 5.0))

    def __call__(self, features, image_sizes_wh, targets: Optional[Boxes] = None,
                 train: bool = False):
        logits, bbox_reg = self.head(features)
        shapes = [(f.shape[1], f.shape[2]) for f in features]
        anchors_per_level = self.generator.grid_anchors(shapes)

        if train:
            anchors_all = jnp.concatenate(anchors_per_level, axis=0)
            cls_loss, box_loss = retinanet_losses(
                anchors_all, logits, bbox_reg, targets.xyxy,
                targets.get_field("labels"), targets.valid, self.box_coder,
                self.num_classes, self.fg_iou, self.bg_iou,
            )
            return None, {"loss_retina_cls": cls_loss, "loss_retina_reg": box_loss}

        # inference: per-level top-k + decode, cross-level NMS
        b = logits[0].shape[0]
        lvl_boxes, lvl_scores, lvl_valid = [], [], []
        for anchors, lg, br in zip(anchors_per_level, logits, bbox_reg):
            n = anchors.shape[0]
            scores = jax.nn.sigmoid(lg.reshape(b, n, self.num_classes)).max(-1)
            k = min(self.pre_nms_top_n, n)
            top_scores, top_idx = jax.lax.top_k(scores, k)
            deltas = jnp.take_along_axis(
                br.reshape(b, n, 4), top_idx[..., None], axis=1
            )
            sel = anchors[top_idx]
            decoded = self.box_coder.decode(
                deltas.reshape(-1, 4), sel.reshape(-1, 4)
            ).reshape(b, k, 4)
            w = image_sizes_wh[:, 0:1]
            h = image_sizes_wh[:, 1:2]
            decoded = jnp.stack(
                [jnp.clip(decoded[..., 0], 0, w - 1),
                 jnp.clip(decoded[..., 1], 0, h - 1),
                 jnp.clip(decoded[..., 2], 0, w - 1),
                 jnp.clip(decoded[..., 3], 0, h - 1)], axis=-1)
            lvl_boxes.append(decoded)
            lvl_scores.append(top_scores)
            lvl_valid.append(top_scores > self.inference_th)
        boxes = jnp.concatenate(lvl_boxes, axis=1)
        scores = jnp.concatenate(lvl_scores, axis=1)
        valid = jnp.concatenate(lvl_valid, axis=1)
        keep = jax.vmap(nms_keep_mask, in_axes=(0, 0, 0, None))(
            boxes, scores, valid, self.nms_thresh
        )
        ranked = jnp.where(keep, scores, -jnp.inf)
        k = min(self.detections_per_img, ranked.shape[1])
        top_scores, top_idx = jax.lax.top_k(ranked, k)
        out = Boxes(
            xyxy=jnp.take_along_axis(boxes, top_idx[..., None], axis=1),
            valid=top_scores > -jnp.inf,
            size=image_sizes_wh.astype(jnp.float32),
            fields={"scores": jnp.where(top_scores > -jnp.inf, top_scores, 0.0)},
        )
        return out, {}
