"""ROIAlign for TPU.

Reimplements the bilinear ROIAlign spec of csrc/cuda/ROIAlign_cuda.cu:15-110:
  - coordinates are NOT rounded ("do not round", ROIAlign_cuda.cu:81-89);
  - malformed ROIs are forced to at least 1x1 (``max(w, 1)``, :92-94);
  - each output bin averages a fixed ``sampling_ratio`` x ``sampling_ratio``
    grid of bilinear samples placed at (i + 0.5)/grid fractions of the bin;
  - samples outside [-1, H] x [-1, W] contribute zero; in-range coords are
    clamped to >= 0 and the interpolation corners to the last row/col.

Design: instead of a custom kernel with a hand-written scatter-add backward
(the reference's ROIAlign_cuda.cu backward), we express the op as vectorized
XLA gathers + arithmetic. JAX autodiff then derives the exact scatter-add
VJP, and XLA lays out the gathers efficiently on TPU (features are NHWC so
each gather row is a contiguous C-vector). A Pallas kernel can later replace
this for the last stretch of HBM bandwidth.

Shapes are fully static: R rois x P sample points known at trace time.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_gather(features: jnp.ndarray, b: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """Bilinear sample of NHWC ``features`` at float coords.

    Args:
      features: (B, H, W, C).
      b: (R,) int batch index per ROI.
      y, x: (R, P) float sample coordinates.
    Returns: (R, P, C).
    """
    _, height, width, _ = features.shape

    # Out-of-range: y < -1 or y > H (ROIAlign_cuda.cu:21-25) -> zero.
    in_range = (y >= -1.0) & (y <= height) & (x >= -1.0) & (x <= width)

    y = jnp.maximum(y, 0.0)
    x = jnp.maximum(x, 0.0)
    y_low = jnp.floor(y).astype(jnp.int32)
    x_low = jnp.floor(x).astype(jnp.int32)
    # corner clamp (ROIAlign_cuda.cu:33-47)
    y_low = jnp.minimum(y_low, height - 1)
    x_low = jnp.minimum(x_low, width - 1)
    y_high = jnp.minimum(y_low + 1, height - 1)
    x_high = jnp.minimum(x_low + 1, width - 1)
    yf = jnp.where(y_low >= height - 1, y_low.astype(y.dtype), y)
    xf = jnp.where(x_low >= width - 1, x_low.astype(x.dtype), x)

    ly = yf - y_low
    lx = xf - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx

    bb = b[:, None]  # (R, 1) broadcasts over P
    v1 = features[bb, y_low, x_low]
    v2 = features[bb, y_low, x_high]
    v3 = features[bb, y_high, x_low]
    v4 = features[bb, y_high, x_high]

    w1 = (hy * hx)[..., None]
    w2 = (hy * lx)[..., None]
    w3 = (ly * hx)[..., None]
    w4 = (ly * lx)[..., None]
    out = w1 * v1 + w2 * v2 + w3 * v3 + w4 * v4
    return jnp.where(in_range[..., None], out, 0.0)


@partial(jax.jit, static_argnames=("output_size", "spatial_scale", "sampling_ratio"))
def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: tuple,
    spatial_scale: float,
    sampling_ratio: int,
) -> jnp.ndarray:
    """ROIAlign forward.

    Args:
      features: (B, H, W, C) NHWC.
      rois: (R, 5) rows of (batch_idx, x1, y1, x2, y2) in image pixels —
        the reference's roi format (modeling/poolers.py:78-91).
      output_size: (pooled_h, pooled_w).
      spatial_scale: feature stride reciprocal.
      sampling_ratio: samples per bin side; must be > 0 for the static path
        (the one-shot config uses 2; adaptive ceil would be shape-dynamic).
    Returns: (R, pooled_h, pooled_w, C).
    """
    assert sampling_ratio > 0, "static TPU path requires sampling_ratio > 0"
    pooled_h, pooled_w = output_size
    g = sampling_ratio

    batch_idx = rois[:, 0].astype(jnp.int32)
    roi_start_w = rois[:, 1] * spatial_scale
    roi_start_h = rois[:, 2] * spatial_scale
    roi_end_w = rois[:, 3] * spatial_scale
    roi_end_h = rois[:, 4] * spatial_scale

    roi_w = jnp.maximum(roi_end_w - roi_start_w, 1.0)  # ROIAlign_cuda.cu:92-94
    roi_h = jnp.maximum(roi_end_h - roi_start_h, 1.0)
    bin_h = roi_h / pooled_h
    bin_w = roi_w / pooled_w

    # Sample offsets within the ROI for every (bin, grid) point: (P,) where
    # P = pooled*g per axis. offset = ph*bin + (iy+0.5)*bin/g.
    iy = (jnp.arange(pooled_h * g) % g).astype(features.dtype)
    ph = (jnp.arange(pooled_h * g) // g).astype(features.dtype)
    ix = (jnp.arange(pooled_w * g) % g).astype(features.dtype)
    pw = (jnp.arange(pooled_w * g) // g).astype(features.dtype)

    y_frac = ph + (iy + 0.5) / g  # (Ph*g,) in bin units
    x_frac = pw + (ix + 0.5) / g  # (Pw*g,)

    ys = roi_start_h[:, None] + y_frac[None, :] * bin_h[:, None]  # (R, Ph*g)
    xs = roi_start_w[:, None] + x_frac[None, :] * bin_w[:, None]  # (R, Pw*g)

    # full grid: (R, Ph*g * Pw*g)
    r = rois.shape[0]
    yy = jnp.repeat(ys, pooled_w * g, axis=1)
    xx = jnp.tile(xs, (1, pooled_h * g))

    vals = _bilinear_gather(features, batch_idx, yy, xx)  # (R, P, C)
    c = features.shape[-1]
    vals = vals.reshape(r, pooled_h, g, pooled_w, g, c)
    return vals.mean(axis=(2, 4))


def roi_align_reference(features_nchw, rois, output_size, spatial_scale, sampling_ratio):
    """Slow numpy oracle implementing the full spec incl. adaptive grid
    (sampling_ratio <= 0 -> ceil(roi_h / pooled_h), ROIAlign_cuda.cu:101).

    features_nchw: (B, C, H, W) to mirror the reference's layout.
    Returns (R, C, pooled_h, pooled_w).
    """
    B, C, H, W = features_nchw.shape
    ph_n, pw_n = output_size
    R = rois.shape[0]
    out = np.zeros((R, C, ph_n, pw_n), np.float32)

    def bilinear(b, y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C, np.float32)
        y = max(y, 0.0)
        x = max(x, 0.0)
        y_low, x_low = int(np.floor(y)), int(np.floor(x))
        if y_low >= H - 1:
            y_low = y_high = H - 1
            y = float(y_low)
        else:
            y_high = y_low + 1
        if x_low >= W - 1:
            x_low = x_high = W - 1
            x = float(x_low)
        else:
            x_high = x_low + 1
        ly, lx = y - y_low, x - x_low
        hy, hx = 1 - ly, 1 - lx
        return (
            hy * hx * features_nchw[b, :, y_low, x_low]
            + hy * lx * features_nchw[b, :, y_low, x_high]
            + ly * hx * features_nchw[b, :, y_high, x_low]
            + ly * lx * features_nchw[b, :, y_high, x_high]
        )

    for r in range(R):
        b = int(rois[r, 0])
        rsw, rsh = rois[r, 1] * spatial_scale, rois[r, 2] * spatial_scale
        rew, reh = rois[r, 3] * spatial_scale, rois[r, 4] * spatial_scale
        roi_w, roi_h = max(rew - rsw, 1.0), max(reh - rsh, 1.0)
        bin_h, bin_w = roi_h / ph_n, roi_w / pw_n
        gh = sampling_ratio if sampling_ratio > 0 else int(np.ceil(roi_h / ph_n))
        gw = sampling_ratio if sampling_ratio > 0 else int(np.ceil(roi_w / pw_n))
        for ph in range(ph_n):
            for pw in range(pw_n):
                acc = np.zeros(C, np.float32)
                for iy in range(gh):
                    y = rsh + ph * bin_h + (iy + 0.5) * bin_h / gh
                    for ix in range(gw):
                        x = rsw + pw * bin_w + (ix + 0.5) * bin_w / gw
                        acc += bilinear(b, y, x)
                out[r, :, ph, pw] = acc / (gh * gw)
    return out


# ---------------------------------------------------------------------------
# Multi-level (FPN) ROIAlign
# ---------------------------------------------------------------------------
def fpn_level_map(
    xyxy: jnp.ndarray,
    k_min: int,
    k_max: int,
    canonical_scale: float = 224.0,
    canonical_level: float = 4.0,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """FPN-paper level assignment (modeling/poolers.py:11-42).

    Returns 0-based level indices in [0, k_max - k_min], computed as
    floor(k0 + log2(sqrt(area)/224 + eps)) clamped to [k_min, k_max],
    with area under the +1 pixel convention (BoxList.area).
    """
    area = (xyxy[..., 2] - xyxy[..., 0] + 1.0) * (xyxy[..., 3] - xyxy[..., 1] + 1.0)
    s = jnp.sqrt(jnp.maximum(area, 0.0))
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + eps))
    lvl = jnp.clip(lvl, k_min, k_max)
    return (lvl - k_min).astype(jnp.int32)


def multilevel_roi_align(
    features,
    rois: jnp.ndarray,
    levels: jnp.ndarray,
    output_size,
    scales,
    sampling_ratio: int,
) -> jnp.ndarray:
    """ROIAlign over an FPN pyramid in ONE gather pass.

    The reference Pooler (modeling/poolers.py:108-122) scatters ROIs into
    per-level batches and runs 5 separate ROIAligns. On TPU that would cost
    5x the gather bandwidth (each level processes all R ROIs or requires
    dynamic partitions). Instead we flatten every level into a single
    (B, sum HW, C) buffer and compute per-ROI gather indices offset by the
    ROI's assigned level — one pass, level-dependent scale/extent per ROI.

    Args:
      features: list of (B, H_l, W_l, C) NHWC maps, one per level.
      rois: (R, 5) rows (batch_idx, x1, y1, x2, y2) image-pixel coords.
      levels: (R,) int 0-based level per ROI (see fpn_level_map).
      output_size: (pooled_h, pooled_w).
      scales: per-level spatial scales (e.g. 1/8 ... 1/128).
      sampling_ratio: static samples per bin side (> 0).
    Returns: (R, pooled_h, pooled_w, C).
    """
    assert sampling_ratio > 0
    pooled_h, pooled_w = output_size
    g = sampling_ratio
    num_levels = len(features)
    b_dim = features[0].shape[0]
    c = features[0].shape[-1]

    heights = jnp.array([f.shape[1] for f in features], jnp.int32)
    widths = jnp.array([f.shape[2] for f in features], jnp.int32)
    sizes = [f.shape[1] * f.shape[2] for f in features]
    offsets = jnp.array(np.concatenate([[0], np.cumsum(sizes)[:-1]]), jnp.int32)
    flat = jnp.concatenate([f.reshape(b_dim, -1, c) for f in features], axis=1)

    scale_arr = jnp.array(scales, jnp.float32)
    scale_r = scale_arr[levels]           # (R,)
    h_r = heights[levels]
    w_r = widths[levels]
    off_r = offsets[levels]
    batch_idx = rois[:, 0].astype(jnp.int32)

    roi_start_w = rois[:, 1] * scale_r
    roi_start_h = rois[:, 2] * scale_r
    roi_w = jnp.maximum(rois[:, 3] * scale_r - roi_start_w, 1.0)
    roi_h = jnp.maximum(rois[:, 4] * scale_r - roi_start_h, 1.0)
    bin_h = roi_h / pooled_h
    bin_w = roi_w / pooled_w

    iy = (jnp.arange(pooled_h * g) % g).astype(jnp.float32)
    ph = (jnp.arange(pooled_h * g) // g).astype(jnp.float32)
    ix = (jnp.arange(pooled_w * g) % g).astype(jnp.float32)
    pw = (jnp.arange(pooled_w * g) // g).astype(jnp.float32)
    y_frac = ph + (iy + 0.5) / g
    x_frac = pw + (ix + 0.5) / g

    ys = roi_start_h[:, None] + y_frac[None, :] * bin_h[:, None]  # (R, Ph*g)
    xs = roi_start_w[:, None] + x_frac[None, :] * bin_w[:, None]  # (R, Pw*g)
    yy = jnp.repeat(ys, pooled_w * g, axis=1)                      # (R, P)
    xx = jnp.tile(xs, (1, pooled_h * g))

    hf = h_r.astype(jnp.float32)[:, None]
    wf = w_r.astype(jnp.float32)[:, None]
    in_range = (yy >= -1.0) & (yy <= hf) & (xx >= -1.0) & (xx <= wf)
    y = jnp.maximum(yy, 0.0)
    x = jnp.maximum(xx, 0.0)
    y_low = jnp.minimum(jnp.floor(y).astype(jnp.int32), h_r[:, None] - 1)
    x_low = jnp.minimum(jnp.floor(x).astype(jnp.int32), w_r[:, None] - 1)
    y_high = jnp.minimum(y_low + 1, h_r[:, None] - 1)
    x_high = jnp.minimum(x_low + 1, w_r[:, None] - 1)
    yf = jnp.where(y_low >= h_r[:, None] - 1, y_low.astype(jnp.float32), y)
    xf = jnp.where(x_low >= w_r[:, None] - 1, x_low.astype(jnp.float32), x)
    ly = yf - y_low
    lx = xf - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx

    base = off_r[:, None]
    wr = w_r[:, None]
    bb = batch_idx[:, None]
    v1 = flat[bb, base + y_low * wr + x_low]
    v2 = flat[bb, base + y_low * wr + x_high]
    v3 = flat[bb, base + y_high * wr + x_low]
    v4 = flat[bb, base + y_high * wr + x_high]
    out = (
        (hy * hx)[..., None] * v1
        + (hy * lx)[..., None] * v2
        + (ly * hx)[..., None] * v3
        + (ly * lx)[..., None] * v4
    )
    out = jnp.where(in_range[..., None], out, 0.0)
    r = rois.shape[0]
    return out.reshape(r, pooled_h, g, pooled_w, g, c).mean(axis=(2, 4))


def roi_pool(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size,
    spatial_scale: float,
) -> jnp.ndarray:
    """ROIPool (max pooling) — csrc/cuda/ROIPool_cuda.cu equivalent.

    Quantized bin edges (round down start, round up end), max over each bin,
    empty bins yield 0. Implemented via a fixed sample grid per bin (dense
    enough to hit every cell: bins are at most ceil(roi/pool) cells, sampled
    at cell centers) — static shapes; autodiff gives the argmax-style
    (subgradient) backward for free.

    Args:
      features: (B, H, W, C) NHWC.
      rois: (R, 5) (batch_idx, x1, y1, x2, y2).
    Returns: (R, pooled_h, pooled_w, C).
    """
    pooled_h, pooled_w = output_size
    b_idx = rois[:, 0].astype(jnp.int32)
    height, width = features.shape[1], features.shape[2]

    x1 = jnp.round(rois[:, 1] * spatial_scale)
    y1 = jnp.round(rois[:, 2] * spatial_scale)
    x2 = jnp.round(rois[:, 3] * spatial_scale)
    y2 = jnp.round(rois[:, 4] * spatial_scale)
    roi_w = jnp.maximum(x2 - x1 + 1, 1.0)
    roi_h = jnp.maximum(y2 - y1 + 1, 1.0)
    bin_w = roi_w / pooled_w
    bin_h = roi_h / pooled_h

    # sample grid: S cells per bin side, S chosen to cover the largest bin
    max_bin = int(jnp.ceil(jnp.maximum(height, width) / min(pooled_h, pooled_w)))
    s = min(max(max_bin, 1), 16)  # cap for compile size; covers bins <= 16 px

    ph = jnp.arange(pooled_h, dtype=jnp.float32)
    pw = jnp.arange(pooled_w, dtype=jnp.float32)
    fr = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s

    ys = y1[:, None, None] + (ph[None, :, None] + fr[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (pw[None, :, None] + fr[None, None, :]) * bin_w[:, None, None]
    yi = jnp.clip(jnp.floor(ys), 0, height - 1).astype(jnp.int32)   # (R, Ph, S)
    xi = jnp.clip(jnp.floor(xs), 0, width - 1).astype(jnp.int32)    # (R, Pw, S)

    r = rois.shape[0]
    yy = yi[:, :, None, :, None]                                     # (R,Ph,1,S,1)
    xx = xi[:, None, :, None, :]                                     # (R,1,Pw,1,S)
    yy = jnp.broadcast_to(yy, (r, pooled_h, pooled_w, s, s))
    xx = jnp.broadcast_to(xx, (r, pooled_h, pooled_w, s, s))
    vals = features[b_idx[:, None, None, None, None], yy, xx]        # (...,C)
    return vals.max(axis=(3, 4))
