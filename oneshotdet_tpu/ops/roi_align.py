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
