"""FCOS proposal network (stage 1 of the one-shot detector).

Reimplements maskrcnn_benchmark/modeling/rpn/fcos/{fcos,loss,inference}.py as
a flax head + pure-jnp target assignment, loss, and padded postprocessing.

Key reference semantics preserved:
  - head: NUM_CONVS x (3x3 conv + GN32 + ReLU) twin towers; cls_logits with
    num_classes hardcoded 1 (fcos.py:20); centerness taken from the *cls*
    tower (fcos.py:92); bbox_pred = exp(per-level Scale(conv)) (fcos.py:95-97);
    cls bias init -log((1-p)/p), p=PRIOR_PROB (fcos.py:76-79).
  - locations: stride-spaced grid + stride//2 offset (fcos.py:220-234).
  - targets: per-level size-of-interest buckets [-1,64],[64,128],[128,256],
    [256,512],[512,INF] (loss.py:102-108); center sampling clamps a
    radius*stride box inside the gt (loss.py:52-99); min-area tie-break
    (loss.py:186-196).
  - losses: sigmoid/softmax focal / (num_pos + N) (loss.py:251-254); GIoU reg
    loss weighted by centerness targets; BCE centerness over positives;
    centerness target sqrt(min/max * min/max) (loss.py:206-211).
  - postproc: per-level top-k of sigmoid(cls)*centerness, ltrb decode around
    locations (inference.py:104-109), clip, single cross-level NMS at
    RPN.NMS_THRESH (inference.py:289-323), cap at fpn_post_nms_top_n, then
    append GT boxes when training (inference.py:139-160).

TPU-first differences (documented, not semantic):
  - everything is padded/static; per-image python loops become vmap;
  - candidates are pre-capped to ``nms_pre_topk`` by score before NMS. Greedy
    suppression only flows from higher scores down, so the kept set within the
    cap is bit-identical to the reference's; the cap only drops boxes that
    could never reach the post-NMS top-k for sane configurations.
  - locations falling outside an image's true (unpadded) extent are masked
    out of the candidate set at inference; the reference has the same effect
    implicitly because it pads each batch minimally.
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.losses import bce_with_logits, iou_loss, sigmoid_focal_loss, softmax_focal_loss
from ..ops.nms import nms_keep_mask
from ..structures.boxes import Boxes
from .layers import ConvGNRelu, Scale

INF = 100000000.0

# per-level regression ranges (loss.py:102-108)
OBJECT_SIZES_OF_INTEREST = ((-1.0, 64.0), (64.0, 128.0), (128.0, 256.0), (256.0, 512.0), (512.0, INF))


class FCOSHead(nn.Module):
    """Shared-weight head applied to every FPN level."""

    num_convs: int = 4
    num_classes: int = 1  # hardcoded 1 in the reference (fcos.py:20)
    prior_prob: float = 0.01
    num_levels: int = 5
    dense_points: int = 1  # DENSE_POINTS 4/5-point variant (fcos.py:53-63)
    dtype: Any = jnp.float32
    quant: str = "none"  # TPU.QUANT: int8 tower convs (the predictors stay float)

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        cls_tower_blocks = [
            ConvGNRelu(features[0].shape[-1], dtype=self.dtype, quant=self.quant,
                       name=f"cls_tower_{i}")
            for i in range(self.num_convs)
        ]
        bbox_tower_blocks = [
            ConvGNRelu(features[0].shape[-1], dtype=self.dtype, quant=self.quant,
                       name=f"bbox_tower_{i}")
            for i in range(self.num_convs)
        ]
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_logits = nn.Conv(
            self.num_classes * self.dense_points, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias_value), name="cls_logits",
        )
        bbox_pred = nn.Conv(
            4 * self.dense_points, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros, name="bbox_pred",
        )
        centerness = nn.Conv(
            1 * self.dense_points, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros, name="centerness",
        )
        scales = [Scale(1.0, name=f"scale_{i}") for i in range(self.num_levels)]

        logits, bbox_reg, ctrness = [], [], []
        for lvl, feat in enumerate(features):
            t = feat
            for blk in cls_tower_blocks:
                t = blk(t)
            logits.append(cls_logits(t).astype(jnp.float32))
            ctrness.append(centerness(t).astype(jnp.float32))
            bt = feat
            for blk in bbox_tower_blocks:
                bt = blk(bt)
            bbox_reg.append(jnp.exp(scales[lvl](bbox_pred(bt)).astype(jnp.float32)))
        return logits, bbox_reg, ctrness


def compute_locations(feature_shapes: Sequence[Tuple[int, int]], strides: Sequence[int],
                      dense_points: int = 1):
    """Per-level (H*W*dense_points, 2) location grids (fcos.py:220-234):
    x = i*stride + stride//2, each cell optionally expanded into 4/5 dense
    sub-points at +-stride//4 offsets (get_dense_locations, fcos.py:236-255;
    sub-point index is the fastest-varying axis, matching the head's
    dp-major channel layout)."""
    out = []
    for (h, w), stride in zip(feature_shapes, strides):
        xs = jnp.arange(w, dtype=jnp.float32) * stride + stride // 2
        ys = jnp.arange(h, dtype=jnp.float32) * stride + stride // 2
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        loc = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)
        if dense_points > 1:
            step = float(stride // 4)
            if dense_points == 4:
                pts = jnp.array([[-step, -step], [step, -step],
                                 [-step, step], [step, step]], jnp.float32)
            elif dense_points == 5:
                pts = jnp.array([[-step, -step], [step, -step], [0.0, 0.0],
                                 [-step, step], [step, step]], jnp.float32)
            else:
                raise ValueError("dense points only support 1, 4, 5")
            loc = (loc[:, None, :] + pts[None, :, :]).reshape(-1, 2)
        out.append(loc)
    return out


def _flat_level_info(locations: List[jnp.ndarray], strides: Sequence[int]):
    """Concatenate per-level grids and expand per-point stride / size range."""
    pts = jnp.concatenate(locations, axis=0)  # (P, 2)
    stride_per_pt = jnp.concatenate(
        [jnp.full((loc.shape[0],), s, jnp.float32) for loc, s in zip(locations, strides)]
    )
    lo = jnp.concatenate(
        [jnp.full((loc.shape[0],), OBJECT_SIZES_OF_INTEREST[i][0], jnp.float32)
         for i, loc in enumerate(locations)]
    )
    hi = jnp.concatenate(
        [jnp.full((loc.shape[0],), OBJECT_SIZES_OF_INTEREST[i][1], jnp.float32)
         for i, loc in enumerate(locations)]
    )
    return pts, stride_per_pt, lo, hi


def fcos_targets(
    locations: List[jnp.ndarray],
    strides: Sequence[int],
    gt_xyxy: jnp.ndarray,      # (B, G, 4)
    gt_labels: jnp.ndarray,    # (B, G) int, 0 = padding
    gt_valid: jnp.ndarray,     # (B, G) bool
    center_sample: bool = True,
    radius: float = 1.5,
):
    """Vectorized target assignment (loss.py:101-204).

    Returns labels (B, P) int32 and reg_targets (B, P, 4) float32 where P is
    the total location count across levels.
    """
    pts, stride_pt, lo, hi = _flat_level_info(locations, strides)
    xs, ys = pts[:, 0], pts[:, 1]  # (P,)

    x1 = gt_xyxy[:, None, :, 0]  # (B, 1, G)
    y1 = gt_xyxy[:, None, :, 1]
    x2 = gt_xyxy[:, None, :, 2]
    y2 = gt_xyxy[:, None, :, 3]

    l = xs[None, :, None] - x1  # (B, P, G)
    t = ys[None, :, None] - y1
    r = x2 - xs[None, :, None]
    b = y2 - ys[None, :, None]
    reg = jnp.stack([l, t, r, b], axis=-1)  # (B, P, G, 4)

    if center_sample:
        cx = (x1 + x2) / 2
        cy = (y1 + y2) / 2
        rad = (stride_pt * radius)[None, :, None]
        # clamp sampling box inside gt (loss.py:88-91)
        sx1 = jnp.maximum(cx - rad, x1)
        sy1 = jnp.maximum(cy - rad, y1)
        sx2 = jnp.minimum(cx + rad, x2)
        sy2 = jnp.minimum(cy + rad, y2)
        inside = (
            (xs[None, :, None] - sx1 > 0)
            & (sy2 - ys[None, :, None] > 0)
            & (sx2 - xs[None, :, None] > 0)
            & (ys[None, :, None] - sy1 > 0)
        )
    else:
        inside = reg.min(axis=-1) > 0

    max_reg = reg.max(axis=-1)  # (B, P, G)
    cared = (max_reg >= lo[None, :, None]) & (max_reg <= hi[None, :, None])

    # area with the reference's +1 convention (BoxList.area, used at loss.py:162)
    area = (gt_xyxy[..., 2] - gt_xyxy[..., 0] + 1.0) * (gt_xyxy[..., 3] - gt_xyxy[..., 1] + 1.0)
    area_bpg = jnp.broadcast_to(area[:, None, :], inside.shape)
    area_bpg = jnp.where(inside & cared & gt_valid[:, None, :], area_bpg, INF)

    min_area = area_bpg.min(axis=-1)           # (B, P)
    min_idx = area_bpg.argmin(axis=-1)         # (B, P)

    labels = jnp.take_along_axis(gt_labels, min_idx, axis=-1)  # (B, P)
    labels = jnp.where(min_area == INF, 0, labels).astype(jnp.int32)
    reg_targets = jnp.take_along_axis(reg, min_idx[..., None, None].repeat(4, -1), axis=2)[:, :, 0, :]
    return labels, reg_targets


def centerness_targets(reg_targets: jnp.ndarray) -> jnp.ndarray:
    """sqrt((min l,r / max l,r) * (min t,b / max t,b)) (loss.py:206-211)."""
    lr = reg_targets[..., 0::2]
    tb = reg_targets[..., 1::2]
    c = (lr.min(-1) / jnp.maximum(lr.max(-1), 1e-9)) * (tb.min(-1) / jnp.maximum(tb.max(-1), 1e-9))
    return jnp.sqrt(jnp.maximum(c, 0.0))


def fcos_losses(
    logits: List[jnp.ndarray],       # per level (B, H, W, C)
    bbox_reg: List[jnp.ndarray],     # per level (B, H, W, 4)
    ctrness: List[jnp.ndarray],      # per level (B, H, W, 1)
    labels: jnp.ndarray,             # (B, P)
    reg_targets: jnp.ndarray,        # (B, P, 4)
    gamma: float = 2.0,
    alpha: float = 0.25,
    loc_loss_type: str = "giou",
    focal_mode: str = "SIGMOID",
    dense_points: int = 1,
):
    """Flatten levels and compute the three FCOS losses (loss.py:213-276)."""
    n = logits[0].shape[0]
    c = logits[0].shape[-1] // dense_points  # classes per point (loss.py:228)
    cls_flat = jnp.concatenate([x.reshape(n, -1, c) for x in logits], axis=1).reshape(-1, c)
    reg_flat = jnp.concatenate([x.reshape(n, -1, 4) for x in bbox_reg], axis=1).reshape(-1, 4)
    ctr_flat = jnp.concatenate([x.reshape(n, -1) for x in ctrness], axis=1).reshape(-1)
    labels_flat = labels.reshape(-1)
    reg_t_flat = reg_targets.reshape(-1, 4)

    pos = labels_flat > 0
    num_pos = pos.sum()

    if focal_mode == "SIGMOID":
        cls_loss = sigmoid_focal_loss(cls_flat, labels_flat, gamma, alpha) / (num_pos + n)
    else:
        cls_loss = softmax_focal_loss(cls_flat, labels_flat, gamma, alpha) / (num_pos + n)

    ctr_t = centerness_targets(reg_t_flat)
    w = jnp.where(pos, ctr_t, 0.0)
    reg_loss = iou_loss(reg_flat, reg_t_flat, w, loc_loss_type)
    ctr_bce = bce_with_logits(ctr_flat, ctr_t)
    ctr_loss = jnp.where(
        num_pos > 0, (ctr_bce * pos).sum() / jnp.maximum(num_pos, 1), 0.0
    )
    return cls_loss, reg_loss, ctr_loss


def fcos_postprocess(
    locations: List[jnp.ndarray],
    logits: List[jnp.ndarray],
    bbox_reg: List[jnp.ndarray],
    ctrness: List[jnp.ndarray],
    image_sizes_wh: jnp.ndarray,   # (B, 2) true (w, h)
    pre_nms_top_n: int,
    nms_thresh: float,
    post_top_n: int,
    nms_pre_topk: int = 8192,
    pre_nms_thresh: float = 0.0,
    score_mode: str = "BINARY",
    min_size: float = 0.0,
    level_topk: bool = True,
    dense_points: int = 1,
) -> Boxes:
    """Decode + per-level top-k + cross-level NMS → padded proposal Boxes.

    Mirrors FCOSPostProcessor.forward (inference.py:46-137, 251-323) with
    static shapes. Returns Boxes with batch dim: xyxy (B, post_top_n, 4),
    fields 'scores' and 'objectness'.
    """
    b = logits[0].shape[0]

    def level_scores(loc, lg, ct):
        c = lg.shape[-1] // dense_points  # (inference.py:66-71)
        if score_mode == "BINARY":
            cls = jax.nn.sigmoid(lg.reshape(b, -1, c))[..., 0]
        else:  # MULTI: 2-way softmax, take foreground prob (inference.py:63-66)
            cls = jax.nn.softmax(lg.reshape(b, -1, c)[..., :2], axis=-1)[..., 1]
        ctr = jax.nn.sigmoid(ct.reshape(b, -1))
        candidate = cls > pre_nms_thresh
        # mask out locations beyond each image's true extent
        in_img = (loc[None, :, 0] < image_sizes_wh[:, 0:1]) & (
            loc[None, :, 1] < image_sizes_wh[:, 1:2]
        )
        score = cls * ctr
        return jnp.where(candidate & in_img, score, -1.0)

    def decode(loc_k, reg_k):
        return jnp.stack(
            [
                loc_k[..., 0] - reg_k[..., 0],
                loc_k[..., 1] - reg_k[..., 1],
                loc_k[..., 0] + reg_k[..., 2],
                loc_k[..., 1] + reg_k[..., 3],
            ],
            axis=-1,
        )

    if level_topk:
        # strict reference semantics: per-level top-k before the cross-level
        # selection (FCOSPostProcessor.forward_for_single_feature_map)
        per_level_boxes, per_level_scores = [], []
        for loc, lg, br, ct in zip(locations, logits, bbox_reg, ctrness):
            score = level_scores(loc, lg, ct)
            k = min(pre_nms_top_n, score.shape[1])
            top_scores, top_idx = jax.lax.top_k(score, k)  # (B, k)
            reg_k = jnp.take_along_axis(
                br.reshape(b, -1, 4), top_idx[..., None], axis=1
            )
            per_level_boxes.append(decode(loc[top_idx], reg_k))
            per_level_scores.append(top_scores)
        boxes = jnp.concatenate(per_level_boxes, axis=1)     # (B, K, 4)
        scores = jnp.concatenate(per_level_scores, axis=1)
        valid = scores > max(pre_nms_thresh, 0.0)
    else:
        # fast path (pre_nms_thresh == 0): per-level top-k sorts are
        # subsumed by the global nms_pre_topk cap — one sort instead of six.
        # Only boxes ranked below BOTH caps can differ, i.e. candidates that
        # could never reach the post-NMS top-n (see PARITY.md deviations).
        all_scores = jnp.concatenate(
            [level_scores(loc, lg, ct)
             for loc, lg, ct in zip(locations, logits, ctrness)], axis=1)
        all_reg = jnp.concatenate(
            [br.reshape(b, -1, 4) for br in bbox_reg], axis=1)
        all_loc = jnp.concatenate(locations, axis=0)
        k = min(nms_pre_topk, all_scores.shape[1])
        top_scores, top_idx = jax.lax.top_k(all_scores, k)
        reg_k = jnp.take_along_axis(all_reg, top_idx[..., None], axis=1)
        boxes = decode(all_loc[top_idx], reg_k)
        scores = top_scores
        valid = scores > max(pre_nms_thresh, 0.0)

    # clip to image (BoxList.clip_to_image with TO_REMOVE=1)
    w = image_sizes_wh[:, 0:1]
    h = image_sizes_wh[:, 1:2]
    boxes = jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w - 1),
            jnp.clip(boxes[..., 1], 0, h - 1),
            jnp.clip(boxes[..., 2], 0, w - 1),
            jnp.clip(boxes[..., 3], 0, h - 1),
        ],
        axis=-1,
    )
    if min_size > 0:
        ws = boxes[..., 2] - boxes[..., 0] + 1
        hs = boxes[..., 3] - boxes[..., 1] + 1
        valid &= (ws >= min_size) & (hs >= min_size)

    # pre-cap candidates by score to bound the NMS sweep (see module docstring)
    if boxes.shape[1] > nms_pre_topk:
        capped_scores, cap_idx = jax.lax.top_k(jnp.where(valid, scores, -1.0), nms_pre_topk)
        boxes = jnp.take_along_axis(boxes, cap_idx[..., None], axis=1)
        scores = capped_scores
        valid = jnp.take_along_axis(valid, cap_idx, axis=1) & (scores > -0.5)

    # single class-agnostic NMS per image (inference.py:289-323)
    keep = jax.vmap(nms_keep_mask, in_axes=(0, 0, 0, None))(boxes, scores, valid, nms_thresh)
    ranked = jnp.where(keep, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(ranked, min(post_top_n, ranked.shape[1]))
    out_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    out_valid = top_scores > -jnp.inf
    out_scores = jnp.where(out_valid, top_scores, 0.0)

    pad = post_top_n - out_boxes.shape[1]
    if pad > 0:
        out_boxes = jnp.pad(out_boxes, ((0, 0), (0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, ((0, 0), (0, pad)))
        out_valid = jnp.pad(out_valid, ((0, 0), (0, pad)))

    return Boxes(
        xyxy=out_boxes,
        valid=out_valid,
        size=image_sizes_wh.astype(jnp.float32),
        fields={"scores": out_scores, "objectness": out_scores},
    )
