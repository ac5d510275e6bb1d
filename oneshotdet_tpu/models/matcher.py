"""IoU matcher and balanced positive/negative sampler, functional.

Reimplements modeling/matcher.py and
modeling/balanced_positive_negative_sampler.py as pure masked jnp ops with
explicit RNG keys (the reference keeps state and uses torch.randperm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


def match_boxes(
    iou_gt_pred: jnp.ndarray,   # (G, N) quality matrix, gt x predictions
    gt_valid: jnp.ndarray,      # (G,) bool
    high_threshold: float,
    low_threshold: float,
    allow_low_quality_matches: bool = False,
) -> jnp.ndarray:
    """Matcher.__call__ (matcher.py:43-90).

    Returns (N,) int32: matched gt index, or BELOW_LOW_THRESHOLD /
    BETWEEN_THRESHOLDS. Invalid gt rows never match. With zero valid gts all
    predictions are background (the reference raises instead; padded episodic
    batches must not crash).
    """
    quality = jnp.where(gt_valid[:, None], iou_gt_pred, -1.0)
    matched_vals = quality.max(axis=0)   # (N,)
    matches = quality.argmax(axis=0).astype(jnp.int32)

    if allow_low_quality_matches:
        all_matches = matches
        # per-gt best prediction (incl. ties) keeps its match (matcher.py:91-118)
        highest_per_gt = quality.max(axis=1, keepdims=True)   # (G, 1)
        is_best = (quality == highest_per_gt) & gt_valid[:, None] & (highest_per_gt > -1.0)
        pred_is_best = is_best.any(axis=0)

    below = matched_vals < low_threshold
    between = (matched_vals >= low_threshold) & (matched_vals < high_threshold)
    out = jnp.where(below, BELOW_LOW_THRESHOLD, matches)
    out = jnp.where(between, BETWEEN_THRESHOLDS, out)

    if allow_low_quality_matches:
        out = jnp.where(pred_is_best, all_matches, out)
    return out


def balanced_sample(
    rng: jax.Array,
    labels: jnp.ndarray,        # (N,) int: -1 ignore, 0 negative, >0 positive
    valid: jnp.ndarray,         # (N,) bool — padded slots
    batch_size: int,            # 128
    positive_fraction: float,   # 0.25
):
    """BalancedPositiveNegativeSampler.__call__ (bal..._sampler.py:19-68).

    Returns (indices, sampled_valid): fixed ``batch_size`` proposal slots,
    positives first-come by random priority, negatives filling the rest.
    Uses random priorities instead of randperm — identical distribution.
    """
    n = labels.shape[0]
    u = jax.random.uniform(rng, (n,))
    pos = (labels >= 1) & valid
    neg = (labels == 0) & valid

    num_pos_target = int(batch_size * positive_fraction)
    pos_count = pos.sum()
    num_pos = jnp.minimum(pos_count, num_pos_target)
    num_neg = jnp.minimum(neg.sum(), batch_size - num_pos)

    # rank positives and negatives independently by random priority
    pos_priority = jnp.where(pos, u, -1.0)
    pos_rank = jnp.argsort(jnp.argsort(-pos_priority))  # rank 0 = best
    pos_selected = pos & (pos_rank < num_pos)

    neg_priority = jnp.where(neg, u, -1.0)
    neg_rank = jnp.argsort(jnp.argsort(-neg_priority))
    neg_selected = neg & (neg_rank < num_neg)

    # pack selected slots into a fixed-size index list, positives first
    combined = jnp.where(pos_selected, 2.0 + u, jnp.where(neg_selected, 1.0 + u, -1.0))
    _, idx = jax.lax.top_k(combined, batch_size)
    sampled_valid = jnp.take(combined, idx) > 0.0
    return idx, sampled_valid
