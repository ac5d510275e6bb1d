"""Detection losses as plain jnp (XLA fuses these; no custom kernels needed).

Each function reproduces a reference op:
  - sigmoid_focal_loss: csrc/cuda/SigmoidFocalLoss_cuda.cu:21-58 and the CPU
    path layers/sigmoid_focal_loss.py:42-54 (EPSILON=1e-6, target-class
    convention t∈[1..C] against class channel d via ``t == d+1``).
  - softmax_focal_loss: layers/softmax_focal_loss.py analog (2-way softmax).
  - iou_loss / giou_loss: layers/iou_loss.py (FCOS ltrb parameterization,
    +1 smoothing on the IoU ratio).
  - smooth_l1_loss: layers/smooth_l1_loss.py.
  - bce_with_logits: torch BCEWithLogitsLoss (centerness loss).

All support a ``weight``/mask argument so padded slots contribute zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = 1e-6


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-element focal loss, summed.

    Args:
      logits: (N, C).
      targets: (N,) int — 0 = background, t in [1..C] = class t (class channel
        d is positive iff t == d+1); negative targets are fully ignored.
      valid: optional (N,) bool mask (padded slots → no loss). The reference
        has no padding so this defaults to all-true.
    Returns: scalar sum (the reference returns .sum(), sigmoid_focal_loss.py:71).
    """
    n, c = logits.shape
    class_range = jnp.arange(1, c + 1, dtype=targets.dtype)[None, :]  # (1, C)
    t = targets[:, None]
    p = jax.nn.sigmoid(logits)
    term1 = (1 - p) ** gamma * jnp.log(p + EPSILON)
    term2 = p ** gamma * jnp.log(1 - p + EPSILON)
    pos = (t == class_range).astype(logits.dtype)
    neg = ((t != class_range) & (t >= 0)).astype(logits.dtype)
    loss = -pos * term1 * alpha - neg * term2 * (1 - alpha)
    if valid is not None:
        loss = loss * valid[:, None].astype(loss.dtype)
    return loss.sum()


def softmax_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Softmax focal loss over (C+1)-way logits incl. background channel 0.

    Mirrors layers/softmax_focal_loss.py: P = softmax(logits),
    loss = -alpha_t * (1-p_t)^gamma * log(p_t) summed over elements.
    """
    n, c = logits.shape
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    t = jnp.clip(targets, 0, c - 1)
    p_t = jnp.take_along_axis(p, t[:, None], axis=-1)[:, 0]
    logp_t = jnp.take_along_axis(logp, t[:, None], axis=-1)[:, 0]
    alpha_t = jnp.where(targets > 0, alpha, 1 - alpha)
    loss = -alpha_t * (1 - p_t) ** gamma * logp_t
    loss = jnp.where(targets >= 0, loss, 0.0)
    if valid is not None:
        loss = loss * valid.astype(loss.dtype)
    return loss.sum()


def iou_loss(
    pred_ltrb: jnp.ndarray,
    target_ltrb: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    loss_type: str = "giou",
) -> jnp.ndarray:
    """FCOS IoU/GIoU regression loss (layers/iou_loss.py:10-49).

    pred/target are (N, 4) positive (l, t, r, b) distances from a location.
    weight: (N,) — the reference passes centerness targets; padded slots get 0.
    Returns weighted mean: (loss * w).sum() / w.sum().
    """
    if weight is not None:
        # Sanitize INPUTS for zero-weight rows, not just the loss output:
        # masking the output still back-propagates a 0 cotangent through
        # d(-log x)/dx, which is inf for garbage rows crossing 0, and
        # 0 * inf = NaN contaminates shared-conv grads. With pred = target
        # = 1 the row's loss is exactly 0 with finite gradients, and
        # where()'s VJP routes no gradient to the real inputs there.
        safe = (weight > 0)[..., None]
        pred_ltrb = jnp.where(safe, pred_ltrb, 1.0)
        target_ltrb = jnp.where(safe, target_ltrb, 1.0)

    pl, pt, pr, pb = (pred_ltrb[..., i] for i in range(4))
    tl, tt, tr, tb = (target_ltrb[..., i] for i in range(4))

    target_area = (tl + tr) * (tt + tb)
    pred_area = (pl + pr) * (pt + pb)

    w_intersect = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    g_w_intersect = jnp.maximum(pl, tl) + jnp.maximum(pr, tr)
    h_intersect = jnp.minimum(pb, tb) + jnp.minimum(pt, tt)
    g_h_intersect = jnp.maximum(pb, tb) + jnp.maximum(pt, tt)
    ac_union = g_w_intersect * g_h_intersect + 1e-7
    area_intersect = w_intersect * h_intersect
    area_union = target_area + pred_area - area_intersect
    ious = (area_intersect + 1.0) / (area_union + 1.0)
    gious = ious - (ac_union - area_union) / ac_union

    if loss_type == "iou":
        losses = -jnp.log(ious)
    elif loss_type == "linear_iou":
        losses = 1 - ious
    elif loss_type == "giou":
        losses = 1 - gious
    else:
        raise NotImplementedError(loss_type)

    if weight is not None:
        # zero-weight (padded) rows can hold garbage targets whose loss is
        # NaN/inf (e.g. -log of a negative "iou"); the reference never
        # evaluates those rows, so mask BEFORE multiplying — NaN * 0 = NaN
        losses = jnp.where(weight > 0, losses, 0.0)
        wsum = weight.sum()
        return jnp.where(wsum > 0, (losses * weight).sum() / jnp.maximum(wsum, EPSILON), 0.0)
    return losses.mean()


def smooth_l1_loss(
    pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0
) -> jnp.ndarray:
    """Elementwise smooth-L1 (layers/smooth_l1_loss.py), no reduction."""
    n = jnp.abs(pred - target)
    return jnp.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy with logits, no reduction."""
    # max(x,0) - x*t + log(1 + exp(-|x|)) — numerically stable form
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """torch F.cross_entropy analog with optional per-class weights and mask.

    Mean reduction over valid elements, weighted by per-class weight as torch
    does: sum(w_t * nll) / sum(w_t).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    t = jnp.clip(targets, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    if weight is not None:
        w = weight[t]
    else:
        w = jnp.ones_like(nll)
    if valid is not None:
        w = w * valid.astype(w.dtype)
    return (nll * w).sum() / jnp.maximum(w.sum(), EPSILON)
