"""Stage-2 relation/matching box head.

Reimplements modeling/roi_heads/box_head/{box_head,roi_box_predictors,
loss,inference}.py for the one-shot 'concat' method:

  - 7x7 query ROI features and 7x7 whole-support ROI features are
    channel-concatenated per (proposal, support) pair (box_head.py:147);
  - compress_dim_conv: [1x1 conv (2C->2C) + GN32 + LeakyReLU(0.2),
    1x1 conv (2C->C) + GN32 + LeakyReLU(0.2)] (box_head.py:44-51);
  - feature_aggreg: 3x3 conv C->C/2 + GN32 + LeakyReLU(0.2) (box_head.py:62-66);
  - fc6: Linear(C/2*49 -> 1024), fc7: Linear(1024 -> 1024), ReLU after each
    (box_head.py:73-76, 153-154);
  - FPNPredictor: cls Linear(1024 -> num_classes), bbox Linear(1024 ->
    4*num_bbox_reg) with the (method, loss, neg_supp) decision table
    (roi_box_predictors.py:36-99) — concat+ce_loss -> 2 classes, 2 reg;
  - train losses: CE x5, smooth-L1 over positives with per-class reg slots
    4*label+[0..3], normalized by total sampled count, x2.5
    (box_head.py:190-195, loss.py:340-393);
  - eval: BoxCoder(10,10,5,5) decode of box_regression[:, :8], class-1
    softmax prob, per-image NMS(0.5), labels stamped with the episode's
    target_id (inference.py:46-167).

The fc6 input is flattened in torch's (C, H, W) channel-major order so
reference checkpoints import as a pure reshape.
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.box_coder import BoxCoder
from ..ops.losses import cross_entropy, sigmoid_focal_loss, smooth_l1_loss
from ..ops.nms import nms_keep_mask
from ..structures.boxes import Boxes, compact_boxes, masked_box_iou
from .matcher import BELOW_LOW_THRESHOLD, BETWEEN_THRESHOLDS, balanced_sample, match_boxes


def predictor_num_classes(method: str, cls_loss: str, neg_supp: bool) -> Tuple[int, int]:
    """(num_classes, num_bbox_reg_classes) decision table
    (roi_box_predictors.py:36-80)."""
    if method == "rn":
        num_classes = 1 if cls_loss == "focal_loss" else 2
    elif method == "concat":
        if cls_loss == "focal_loss":
            num_classes = 2 if neg_supp else 1
        elif cls_loss in ("ce_loss", "cxe_loss"):
            num_classes = 2
        elif cls_loss in ("mse_loss", "l1_loss"):
            num_classes = 1
        else:
            raise ValueError(f"unsupported SECOND_STAGE_CLS_LOSS {cls_loss}")
    else:
        raise ValueError(f"unsupported SECOND_STAGE_METHOD {method}")
    if cls_loss in ("focal_loss", "mse_loss", "l1_loss"):
        num_bbox_reg = num_classes + 1
    else:
        num_bbox_reg = num_classes
    return num_classes, num_bbox_reg


class _ConcatConv1x1(nn.Module):
    """1x1 conv over the channel-concatenation of (a, b) WITHOUT materializing
    the concat: conv(cat(a, b)) == a @ K[:ca] + (b @ K[ca:] + bias).

    When ``b``'s leading dim divides ``a``'s (per-image support features
    broadcast over each image's ROIs), the b-half is computed once per image
    and broadcast-added — at 16k ROIs this removes a ~400 MB concat
    materialization and halves the contraction depth of the hot matmul.
    Parameter layout/naming matches nn.Conv so checkpoints are unaffected.

    The halves are separately callable: ``query_half`` (no bias) is what the
    detector hoists to full-map cost pre-pooling (1x1 conv commutes with
    bilinear ROI pooling), ``supp_half`` (with bias) stays per-image.
    ``in_a``/``in_b`` fix the kernel shape so either half can run first.
    """

    features: int
    in_a: int = 256
    in_b: int = 256
    dtype: Any = jnp.float32
    quant: str = "none"  # TPU.QUANT: int8 halves (int8_dot)

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.normal(0.01),
            (1, 1, self.in_a + self.in_b, self.features),
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))

    def _dot(self, x: jnp.ndarray, k2d: jnp.ndarray) -> jnp.ndarray:
        if self.quant == "int8":
            from ..ops.quant import int8_dot

            return int8_dot(x, k2d).astype(self.dtype)
        if self.quant == "int8_weight":
            # fake-quant only: this kernel is sliced (query/supp halves), so
            # it stays float in storage; per-cout rounding matches the
            # WeightQuant modules' numerics (weight is tiny — no HBM stake)
            from ..ops.quant import fake_quant_weight

            wq, ws = fake_quant_weight(k2d)
            k2d = wq.astype(self.dtype) * ws.astype(self.dtype)
            return jnp.einsum("...c,cf->...f", x, k2d)
        return jnp.einsum("...c,cf->...f", x, k2d.astype(self.dtype))

    def query_half(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._dot(a, self.kernel[0, 0, : self.in_a])

    def supp_half(self, b: jnp.ndarray) -> jnp.ndarray:
        return self._dot(b, self.kernel[0, 0, self.in_a:]) \
            + self.bias.astype(self.dtype)

    def __call__(self, a: jnp.ndarray, b: jnp.ndarray):
        ya = self.query_half(a)
        yb = self.supp_half(b)
        if b.shape[0] != a.shape[0]:
            reps = a.shape[0] // b.shape[0]
            yb = jnp.broadcast_to(
                yb[:, None], (b.shape[0], reps) + yb.shape[1:]
            ).reshape((a.shape[0],) + yb.shape[1:])
        return ya + yb


class ROIBoxHeadNet(nn.Module):
    """The learned part: fused (query ROI, support) features -> logits, deltas.

    ``supp_feats`` may be (N, 7, 7, C) (one support per ROI) or (B, 7, 7, C)
    with B dividing N (per-image support, image-major ROI order) — the latter
    avoids materializing the broadcast.
    """

    in_channels: int = 256
    resolution: int = 7
    representation_size: int = 1024
    num_classes: int = 2
    num_bbox_reg: int = 2
    linear_fusion: bool = False
    dtype: Any = jnp.float32
    # TPU.QUANT: int8 for compress/aggreg convs + fc6/fc7 (the hot matmuls);
    # the final cls_score/bbox_pred predictors stay float (tiny, sensitive)
    quant: str = "none"

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray, supp_feats: jnp.ndarray,
                 use_pallas: bool = False,
                 prepooled_query: jnp.ndarray = None):
        """roi_feats: (N, 7, 7, C). Returns (N, cls), (N, 4*reg).

        ``prepooled_query``: (N, 7, 7, 2C) compress_0 query-half output
        pooled from pre-compressed feature maps (the detector hoists the
        1x1 query matmul to full-map cost — it commutes with bilinear ROI
        pooling). When given, roi_feats is ignored and only the support
        half + bias is added here.
        """
        c = self.in_channels

        # Fused Pallas path (eval only — forward-only kernel): the whole
        # compress/aggreg/fc/predictor chain runs VMEM-resident per block of
        # ROIs (ops/pallas_roi_head.py). MEASURED ON v5e (2026-08-17, batch 8
        # x 2000 ROIs): 19.99 ms/batch vs XLA's 20.37 standalone — a tie, and
        # the in-model XLA head overlaps to ~14 ms, so this is OPT-IN via
        # ONESHOT_PALLAS_ROI_HEAD=1, not the default (see the kernel header
        # for the full measurement story). Requires per-image support layout
        # (B divides N) and a usable block size; falls back to XLA otherwise.
        if (
            use_pallas
            and prepooled_query is None
            and os.environ.get("ONESHOT_PALLAS_ROI_HEAD") == "1"
            and not self.is_initializing()
            and not self.linear_fusion
            and self.resolution == 7
            and supp_feats.shape[0] != roi_feats.shape[0]
            and roi_feats.shape[0] % supp_feats.shape[0] == 0
        ):
            from ..ops.pallas_roi_align import pallas_enabled
            from ..ops.pallas_roi_head import (
                _pick_t,
                pallas_roi_head,
                roi_head_params_from_module,
            )

            per_image = roi_feats.shape[0] // supp_feats.shape[0]
            if pallas_enabled() and _pick_t(per_image) > 0:
                w = roi_head_params_from_module(self.variables["params"])
                return pallas_roi_head(roi_feats, supp_feats, w,
                                       per_image=per_image)

        if not self.linear_fusion:
            comp0 = _ConcatConv1x1(2 * c, in_a=c, in_b=c, dtype=self.dtype,
                                   quant=self.quant, name="compress_0")
            if prepooled_query is not None:
                yb = comp0.supp_half(supp_feats)
                n = prepooled_query.shape[0]
                if supp_feats.shape[0] != n:
                    reps = n // supp_feats.shape[0]
                    yb = jnp.broadcast_to(
                        yb[:, None], (supp_feats.shape[0], reps) + yb.shape[1:]
                    ).reshape((n,) + yb.shape[1:])
                x = prepooled_query + yb
            else:
                x = comp0(roi_feats, supp_feats)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="compress_gn0")(x)
            x = nn.leaky_relu(x, 0.2)
            from ..ops.quant import make_conv

            x = make_conv(self.quant, features=c, kernel_size=(1, 1),
                          dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          name="compress_1")(x)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="compress_gn1")(x)
            x = nn.leaky_relu(x, 0.2)
        else:
            if supp_feats.shape[0] != roi_feats.shape[0]:
                reps = roi_feats.shape[0] // supp_feats.shape[0]
                supp_feats = jnp.broadcast_to(
                    supp_feats[:, None], (supp_feats.shape[0], reps) + supp_feats.shape[1:]
                ).reshape(roi_feats.shape)
            x = jnp.concatenate([roi_feats, supp_feats], axis=-1)

        from ..ops.quant import make_conv as _mc
        from ..ops.quant import make_dense as _md

        x = _mc(self.quant, features=c // 2, kernel_size=(3, 3),
                padding="SAME", dtype=self.dtype, name="aggreg")(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="aggreg_gn")(x)
        x = nn.leaky_relu(x, 0.2)

        # flatten channel-major (torch .view order) for checkpoint interop
        n = x.shape[0]
        x = x.transpose(0, 3, 1, 2).reshape(n, -1)
        x = nn.relu(_md(self.quant, features=self.representation_size,
                        dtype=self.dtype, name="fc6")(x))
        x = nn.relu(_md(self.quant, features=self.representation_size,
                        dtype=self.dtype, name="fc7")(x))

        logits = nn.Dense(
            self.num_classes, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros, name="cls_score",
        )(x).astype(jnp.float32)
        deltas = nn.Dense(
            self.num_bbox_reg * 4, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            bias_init=nn.initializers.zeros, name="bbox_pred",
        )(x).astype(jnp.float32)
        return logits, deltas


def soft_labeling_function(t: jnp.ndarray, func: str = "linear") -> jnp.ndarray:
    """IoU -> soft target shaping (loss.py:81-104)."""
    if func == "discrete":
        return (t >= 0.5).astype(jnp.float32)
    if func == "linear":
        return t
    if func == "transLinear":
        upper = (0.2 * t + 0.8) * (t >= 0.5)
        middle = (2.25 * t - 0.225) * (t >= 0.1) * (t < 0.5)
        return upper + middle
    if func == "trans4thLinear":
        upper = (0.2 * t + 0.8) * (t >= 0.5)
        lower = 0.9 * ((2 * t) ** 4) * (t < 0.5)
        return upper + lower
    raise ValueError(func)


def prepare_roi_targets(
    rng: jax.Array,
    proposals: Boxes,      # batched (B, P)
    gt: Boxes,             # batched (B, G), field 'labels'
    box_coder: BoxCoder,
    batch_size_per_image: int = 128,
    positive_fraction: float = 0.25,
    fg_iou_threshold: float = 0.5,
    bg_iou_threshold: float = 0.5,
    soft_labeling: bool = False,
    soft_labeling_func: str = "linear",
):
    """subsample + target prep (loss.py:106-292) for the whole batch.

    Returns (sampled_idx (B, S), sampled_valid (B, S), labels (B, S),
    reg_targets (B, S, 4), matched_gt_idx (B, S)[, soft_labels (B, S)])
    with S = batch_size_per_image. matched_gt_idx is the clamped index of
    each sampled proposal's matched GT (used by the mask/keypoint heads to
    fetch per-GT targets, ref mask_head/loss.py prepare_targets).
    """

    def per_image(key, prop_xyxy, prop_valid, gt_xyxy, gt_valid, gt_labels):
        iou = masked_box_iou(gt_xyxy, gt_valid, prop_xyxy, prop_valid)  # (G, N)
        matched = match_boxes(iou, gt_valid, fg_iou_threshold, bg_iou_threshold)
        clamped = jnp.maximum(matched, 0)
        labels = jnp.take(gt_labels, clamped).astype(jnp.int32)
        labels = jnp.where(matched == BELOW_LOW_THRESHOLD, 0, labels)
        labels = jnp.where(matched == BETWEEN_THRESHOLDS, -1, labels)
        labels = jnp.where(prop_valid, labels, -1)  # padding is ignored
        matched_gt = jnp.take(gt_xyxy, clamped, axis=0)
        reg_targets = box_coder.encode(matched_gt, prop_xyxy)
        # matched IoU for soft labels (loss.py:52-62): zero for non-matches
        match_iou = jnp.take_along_axis(iou, clamped[None, :], axis=0)[0]
        match_iou = jnp.where(matched >= 0, match_iou, 0.0)
        idx, s_valid = balanced_sample(
            key, labels, prop_valid, batch_size_per_image, positive_fraction
        )
        return (
            idx,
            s_valid,
            jnp.take(labels, idx),
            jnp.take(reg_targets, idx, axis=0),
            jnp.take(match_iou, idx),
            jnp.take(clamped, idx),
        )

    b = proposals.xyxy.shape[0]
    keys = jax.random.split(rng, b)
    idx, s_valid, labels, reg_t, match_iou, gt_idx = jax.vmap(per_image)(
        keys, proposals.xyxy, proposals.valid, gt.xyxy, gt.valid,
        gt.get_field("labels"),
    )
    if soft_labeling:
        return idx, s_valid, labels, reg_t, gt_idx, soft_labeling_function(
            match_iou, soft_labeling_func
        )
    return idx, s_valid, labels, reg_t, gt_idx


def make_artificial_proposals(
    rng: jax.Array,
    gt: Boxes,                    # batched (B, G)
    iou_lower_bound: float = 0.5999,
    required_num: int = 3,
    granularity: float = 0.1,
    pool: int = 64,
) -> Boxes:
    """IoU-binned jittered GT proposals (generalized_rcnn.py:123-204).

    The reference rejection-samples per GT until every IoU bin
    [0.6,0.7) ... [0.9,1.0) holds ``required_num`` jitters. A data-dependent
    while-loop is hostile to jit, so this draws a fixed ``pool`` of
    candidates per GT (same per-coordinate uniform(thres-1, 1-thres) jitter,
    thres = iou_lower_bound + 0.25), keeps the first ``required_num`` per
    bin, and marks unfilled slots invalid instead of looping. Candidates
    touching the image border or below the IoU bound are rejected exactly as
    in the reference (:166-172); IoU here uses the raw (no TO_REMOVE) areas
    the reference's local box_iou uses (:133-143).

    Returns Boxes (B, G * nbins * required_num) with fields scores /
    objectness = 1 for valid slots. The GT boxes themselves are appended by
    the caller (random_shifts cats them, :178).
    """
    nbins = int((1.0 - iou_lower_bound) / granularity)
    thres = iou_lower_bound + 0.25
    b, g = gt.valid.shape

    def per_box(key, box, valid, size_wh):
        off = jax.random.uniform(
            key, (pool, 4), minval=thres - 1.0, maxval=1.0 - thres
        )
        w = box[2] - box[0]
        h = box[3] - box[1]
        cand = box[None, :] + off * jnp.array([w, h, w, h])
        inside = (
            (cand[:, 0] > 0) & (cand[:, 1] > 0)
            & (cand[:, 2] < size_wh[0]) & (cand[:, 3] < size_wh[1])
        )
        # raw-area IoU (reference's local box_iou, :133-143)
        il = jnp.maximum(box[0], cand[:, 0])
        it = jnp.maximum(box[1], cand[:, 1])
        ir = jnp.minimum(box[2], cand[:, 2])
        ib = jnp.minimum(box[3], cand[:, 3])
        inter = jnp.maximum(ir - il, 0.0) * jnp.maximum(ib - it, 0.0)
        area = lambda bx: (bx[..., 2] - bx[..., 0]) * (bx[..., 3] - bx[..., 1])
        iou = inter / jnp.maximum(area(box) + area(cand) - inter, 1e-9)
        ok = inside & (iou >= iou_lower_bound) & valid
        bin_idx = jnp.clip(
            jnp.floor((iou - iou_lower_bound) / granularity), 0, nbins - 1
        ).astype(jnp.int32)
        boxes_out, valid_out = [], []
        order = jnp.arange(pool)
        for bi in range(nbins):
            score = jnp.where(ok & (bin_idx == bi), order, pool)
            sel = jnp.sort(score)[:required_num]
            boxes_out.append(cand[jnp.minimum(sel, pool - 1)])
            valid_out.append(sel < pool)
        return jnp.concatenate(boxes_out), jnp.concatenate(valid_out)

    def per_image(key, xyxy, valid, size_wh):
        keys = jax.random.split(key, g)
        bx, vl = jax.vmap(per_box, in_axes=(0, 0, 0, None))(
            keys, xyxy, valid, size_wh
        )
        return bx.reshape(-1, 4), vl.reshape(-1)

    keys = jax.random.split(rng, b)
    bx, vl = jax.vmap(per_image)(keys, gt.xyxy, gt.valid, gt.size)
    ones = jnp.where(vl, 1.0, 0.0)
    return Boxes(
        xyxy=bx, valid=vl, size=gt.size,
        fields={"scores": ones, "objectness": ones},
    )


# compact_boxes (imported from structures.boxes) stable-moves valid slots to
# the front of the capacity dim. The reference's proposal[:1000] cap
# (generalized_rcnn.py:202) counts REAL boxes; truncating raw padded capacity
# instead would let the artificial-jitter block's invalid slots (G*12
# capacity regardless of how many GTs exist) crowd out real scored proposals
# — hence compact-then-truncate at the detector call site.


def truncate_boxes(boxes: Boxes, k: int) -> Boxes:
    """Static slice of the first k capacity slots (the reference's
    proposal[:1000] cap after adding artificial proposals, :202)."""
    if boxes.capacity <= k:
        return boxes
    return Boxes(
        xyxy=boxes.xyxy[:, :k],
        valid=boxes.valid[:, :k],
        size=boxes.size,
        fields={n: v[:, :k] for n, v in boxes.fields.items()},
    )


def roi_head_loss(
    logits: jnp.ndarray,        # (B*S, num_classes)
    deltas: jnp.ndarray,        # (B*S, 4*num_reg)
    labels: jnp.ndarray,        # (B, S)
    reg_targets: jnp.ndarray,   # (B, S, 4)
    sampled_valid: jnp.ndarray,  # (B, S)
    cls_loss_type: str = "ce_loss",
    focal_gamma: float = 2.0,
    focal_alpha: float = 0.25,
    cls_agnostic_bbox_reg: bool = False,
    soft_labels: jnp.ndarray | None = None,   # (B, S) in [0, 1]
    loss_weighted: bool = False,
    neg_logits: jnp.ndarray | None = None,    # (B*S, num_classes)
    rev_logits: jnp.ndarray | None = None,    # (B*S, num_classes)
):
    """FastRCNNLossComputation.__call__ (loss.py:306-446): the default path
    plus the mse/l1/cxe soft-label losses (:360-367), class-weighted CE
    (:349-357), the neg-support margin suppression (:435-444) and the
    REVERSE_ORDER consistency loss (:298-304, :371-374).

    Returns (cls_loss, box_loss) or (cls_loss, box_loss, extra) when
    neg_logits / rev_logits are given.
    """
    labels_flat = labels.reshape(-1)
    valid_flat = sampled_valid.reshape(-1) & (labels_flat >= 0)
    reg_t_flat = reg_targets.reshape(-1, 4)
    pos = (labels_flat > 0) & valid_flat
    vf = valid_flat.astype(jnp.float32)
    denom = jnp.maximum(vf.sum(), 1.0)
    if soft_labels is not None:
        soft_flat = soft_labels.reshape(-1)

    if cls_loss_type == "ce_loss":
        weight = None
        if loss_weighted:  # fg_weight = 0.75 (loss.py:350-356)
            weight = jnp.array([0.25] + [0.75] * (logits.shape[-1] - 1))
        cls_loss = cross_entropy(logits, labels_flat, weight=weight, valid=valid_flat)
    elif cls_loss_type == "focal_loss":
        cls_loss = sigmoid_focal_loss(
            logits, jnp.where(valid_flat, labels_flat, -1), focal_gamma, focal_alpha
        ) / jnp.maximum(pos.sum(), 1)
    elif cls_loss_type == "mse_loss":
        target = soft_flat if soft_labels is not None else labels_flat.astype(jnp.float32)
        p = jax.nn.sigmoid(logits[:, 0])
        cls_loss = (((p - target) ** 2) * vf).sum() / denom
    elif cls_loss_type == "l1_loss":
        target = soft_flat if soft_labels is not None else labels_flat.astype(jnp.float32)
        p = jax.nn.sigmoid(logits[:, 0])
        cls_loss = (jnp.abs(p - target) * vf).sum() / denom
    elif cls_loss_type == "cxe_loss":
        # CXE over softmax with soft targets (loss.py:294-296)
        target = soft_flat if soft_labels is not None else labels_flat.astype(jnp.float32)
        probs = jax.nn.softmax(logits[:, :2], axis=-1)
        two = jnp.stack([1 - target, target], axis=1)
        per = -(two * jnp.log(jnp.maximum(probs, 1e-9))).mean(axis=1)
        cls_loss = (per * vf).sum() / denom
    else:
        raise ValueError(f"unsupported cls loss {cls_loss_type}")

    # per-class regression slots: cols 4*label + [0..3] (loss.py:379-393)
    if cls_agnostic_bbox_reg:
        slot = jnp.full_like(labels_flat, 1)
    else:
        slot = jnp.maximum(labels_flat, 0)
    d = deltas.reshape(deltas.shape[0], -1, 4)
    slot = jnp.minimum(slot, d.shape[1] - 1)
    picked = jnp.take_along_axis(d, slot[:, None, None].repeat(4, -1), axis=1)[:, 0, :]
    box_l = smooth_l1_loss(picked, reg_t_flat, beta=1.0).sum(-1)
    box_loss = (box_l * pos).sum() / jnp.maximum(valid_flat.sum(), 1)

    if rev_logits is not None:
        # reverse-order consistency (loss.py:298-304, 371-374):
        # FOCAL(|softmax(cls) - softmax(rev)|) = -mean(d * log(1 - d + eps))
        diff = jnp.abs(
            jax.nn.softmax(logits, axis=-1) - jax.nn.softmax(rev_logits, axis=-1)
        )
        per = -(diff * jnp.log(1 - diff + 1e-6))
        rev_loss = (per.mean(axis=1) * vf).sum() / denom
        return cls_loss, box_loss, rev_loss

    if neg_logits is not None:
        # neg-support margin suppression (loss.py:435-444):
        # relu(neg_fg_score - pos_fg_score + 0.3) over label==1 proposals
        pos_scores = jax.nn.softmax(logits, axis=-1)[:, 1]
        neg_scores = jax.nn.softmax(neg_logits, axis=-1)[:, 1]
        is_fg = ((labels_flat == 1) & valid_flat).astype(jnp.float32)
        margin = jnp.maximum(neg_scores - pos_scores + 0.3, 0.0)
        suppress = (margin * is_fg).sum() / jnp.maximum(is_fg.sum(), 1.0)
        return cls_loss, box_loss, suppress

    return cls_loss, box_loss


def roi_head_postprocess(
    logits: jnp.ndarray,       # (B*P, num_classes)
    deltas: jnp.ndarray,       # (B*P, 4*num_reg)
    proposals: Boxes,          # (B, P)
    target_ids: jnp.ndarray,   # (B,)
    box_coder: BoxCoder,
    score_thresh: float = 0.0,
    nms_thresh: float = 0.5,
    detections_per_img: int = 2000,
    cls_loss_type: str = "ce_loss",
) -> Boxes:
    """PostProcessor.forward + filter_results (inference.py:46-167)."""
    b, p = proposals.valid.shape
    deltas = deltas[:, :8]  # (inference.py:60)
    if cls_loss_type in ("focal_loss", "mse_loss", "l1_loss"):
        fg = jax.nn.sigmoid(logits)[:, 0]  # (inference.py:61-63, 67-69)
    else:  # ce_loss / cxe_loss: 2-way softmax fg prob (inference.py:65-66)
        fg = jax.nn.softmax(logits[:, :2], axis=-1)[:, 1]
    scores = fg.reshape(b, p)

    decoded = box_coder.decode(deltas, proposals.xyxy.reshape(-1, 4))  # (B*P, 8)
    boxes_fg = decoded.reshape(b, p, -1)[..., 4:8]  # class-1 slot

    # clip to image
    w = proposals.size[..., 0:1]
    h = proposals.size[..., 1:2]
    boxes_fg = jnp.stack(
        [
            jnp.clip(boxes_fg[..., 0], 0, w - 1),
            jnp.clip(boxes_fg[..., 1], 0, h - 1),
            jnp.clip(boxes_fg[..., 2], 0, w - 1),
            jnp.clip(boxes_fg[..., 3], 0, h - 1),
        ],
        axis=-1,
    )

    valid = proposals.valid & (scores > score_thresh)
    keep = jax.vmap(nms_keep_mask, in_axes=(0, 0, 0, None))(
        boxes_fg, scores, valid, nms_thresh
    )
    ranked = jnp.where(keep, scores, -jnp.inf)
    k = min(detections_per_img, p)
    top_scores, top_idx = jax.lax.top_k(ranked, k)
    out_boxes = jnp.take_along_axis(boxes_fg, top_idx[..., None], axis=1)
    out_valid = top_scores > -jnp.inf
    out_scores = jnp.where(out_valid, top_scores, 0.0)
    labels = jnp.broadcast_to(target_ids[:, None], (b, k)).astype(jnp.int32)

    return Boxes(
        xyxy=out_boxes,
        valid=out_valid,
        size=proposals.size,
        fields={"scores": out_scores, "labels": labels},
    )
