"""Pallas TPU kernel for multi-level ROIAlign (the stage-2 hot op).

Why: the XLA-gather formulation (ops/roi_align.py) moves every bilinear
corner as its own scattered row-gather — measured ~50 GB/s effective on
v5e. This kernel instead DMAs one contiguous feature *window* per ROI into
VMEM and evaluates the 14x14 bilinear sample grid as two small matmuls
(separable interpolation: a (14, Wh) row-interp matrix and a (14, Ww)
column-interp matrix), putting the arithmetic on the MXU and the memory
traffic on bulk DMA.

Key layout trick: all FPN levels are padded to one common width and stacked
along the row axis into a single (B, H_total, W_pad, C) buffer, so a ROI's
level selection reduces to a row offset and every ROI costs exactly ONE
double-buffered DMA — no per-level dispatch in the inner loop.

Semantics match csrc/cuda/ROIAlign_cuda.cu (no rounding, malformed ROIs
forced >= 1x1, (i+0.5)/g sample placement, corner clamping at the *level*
boundary, zero outside [-1, H]x[-1, W]) for every ROI whose sample span fits
the window. ROIs are routed to a 32-cell or 64-cell window kernel by span;
the FPN level mapper bounds sqrt(area)/stride < 28 cells, so 64 cells covers
aspect ratios up to ~5:1 — beyond that the sample grid clamps to the window
(an approximation only for extremely elongated boxes).

The W axis of HBM memrefs is (8, 128)-tiled, so window column offsets are
quantized down to multiples of 8 and the window is 8 columns wider.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Global switch: host-side initialization (model.init under
# jax.default_device(cpu)) must not trace TPU kernels; wrap such calls in
# ``disable_pallas()``.
_DISABLED = False


class disable_pallas:
    """Context manager that routes ROI pooling to the XLA fallback."""

    def __enter__(self):
        global _DISABLED
        self._prev = _DISABLED
        _DISABLED = True

    def __exit__(self, *exc):
        global _DISABLED
        _DISABLED = self._prev


def pallas_enabled() -> bool:
    return not _DISABLED and jax.default_backend() != "cpu"


# scalar table columns
_COL_B = 0    # batch index
_COL_Y0G = 1  # window start row in the STACKED buffer
_COL_Y0 = 2   # window start row in level-local coords (interp origin)
_COL_X0 = 3   # window start col (multiple of 8)
_COL_SH = 4   # roi start h (scaled, float)
_COL_SW = 5
_COL_BH = 6   # bin h
_COL_BW = 7
_COL_USE = 8  # 1.0 if this kernel instance should process the roi
_COL_H = 9    # level true height (boundary clamping)
_COL_W = 10   # level true width
_COL_COUNT = 11  # number of used rois (same value in every row)
_NCOLS = 12


def _make_kernel(window: int, pooled: int, g: int, c: int, t: int, precision=None):
    p = pooled * g  # samples per axis
    win_h = window
    win_w = window + 8  # see module docstring (8-aligned column offsets)

    def kernel(c_b, c_y0g, c_y0, c_x0, c_sh, c_sw, c_bh, c_bw, c_th, c_tw,
               c_cnt, stack_ref, out_ref, win_buf, sems):
        # scalar columns are prefetched into SMEM (PrefetchScalarGridSpec):
        # SMEM scalar loads are far cheaper than dynamic VMEM reads and were
        # ~25% of the per-ROI cost
        base = pl.program_id(0) * t

        def dma(i, slot):
            gi = base + i
            b = c_b[gi].astype(jnp.int32)
            y0g = c_y0g[gi].astype(jnp.int32)
            x0 = pl.multiple_of(c_x0[gi].astype(jnp.int32), 8)
            return pltpu.make_async_copy(
                stack_ref.at[b, pl.ds(y0g, win_h), pl.ds(x0, win_w), :],
                win_buf.at[slot],
                sems.at[slot],
            )

        def interp_binned(start, bin_sz, origin, true_dim, width):
            """(pooled, width) interpolation matrix with the g-sample bin
            mean folded in: the g sub-sample bilinear rows of each bin are
            summed and scaled by 1/g, so the two pooling matmuls already
            produce averaged bins — no separate transpose+mean stage. All
            intermediates are 2D (Mosaic-friendly)."""
            bins = jax.lax.broadcasted_iota(jnp.int32, (pooled, width), 0).astype(jnp.float32)
            cells = jax.lax.broadcasted_iota(jnp.int32, (pooled, width), 1).astype(jnp.float32)
            gf = float(g)
            m_total = jnp.zeros((pooled, width), jnp.float32)
            for sub in range(g):
                pos = start + (bins + (sub + 0.5) / gf) * bin_sz
                in_range = (pos >= -1.0) & (pos <= true_dim)
                posc = jnp.maximum(pos, 0.0)
                low = jnp.minimum(jnp.floor(posc), true_dim - 1.0)
                high = jnp.minimum(low + 1.0, true_dim - 1.0)
                posf = jnp.where(low >= true_dim - 1.0, low, posc)
                lfrac = posf - low
                m = (cells == jnp.clip(low - origin, 0.0, width - 1.0)) * (1 - lfrac) + (
                    cells == jnp.clip(high - origin, 0.0, width - 1.0)
                ) * lfrac
                m_total = m_total + m * in_range.astype(jnp.float32)
            return m_total * (1.0 / gf)

        def compute(i, slot):
            gi = base + i
            wyb = interp_binned(c_sh[gi], c_bh[gi], c_y0[gi], c_th[gi], win_h)
            wxb = interp_binned(c_sw[gi], c_bw[gi], c_x0[gi], c_tw[gi], win_w)
            win = win_buf[slot].astype(jnp.float32)
            rows = jax.lax.dot_general(
                wyb, win.reshape(win_h, win_w * c),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # (7, win_w*C)
            out = jax.lax.dot_general(
                wxb, rows.reshape(pooled, win_w, c),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # (7sx, 7sy, C)
            out_ref[i] = out.transpose(1, 0, 2).astype(out_ref.dtype)


        # rois are compacted (used first, globally sorted); each block only
        # iterates over its used prefix — fully-unused blocks cost nothing
        total_used = c_cnt[0].astype(jnp.int32)
        n_local = jnp.clip(total_used - base, 0, t)

        # rows beyond the used prefix are never written by compute():
        # zero the whole block first (cheap VMEM store)
        out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(n_local > 0)
        def _():
            dma(0, 0).start()

        def body(i, _):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_local)
            def _():
                dma(i + 1, nxt).start()

            dma(i, slot).wait()
            compute(i, slot)
            return 0

        jax.lax.fori_loop(0, n_local, body, 0)

    return kernel


def _stack_levels(features, min_h: int, common_w: int):
    """Pad each level to a common width and stack along rows.

    Returns (stacked (B, H_total, W_pad, C), row_offsets list, padded heights).
    """
    padded = []
    offsets = []
    off = 0
    for f in features:
        b, h, w, c = f.shape
        th = max(h, min_h)
        f = jnp.pad(f, ((0, 0), (0, th - h), (0, common_w - w), (0, 0)))
        padded.append(f)
        offsets.append(off)
        off += th
    return jnp.concatenate(padded, axis=1), offsets


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "scales", "sampling_ratio", "windows", "rois_per_step"),
)
def pallas_multilevel_roi_align(
    features,
    rois: jnp.ndarray,
    levels: jnp.ndarray,
    output_size=(7, 7),
    scales: Sequence[float] = (0.125, 0.0625, 0.03125, 0.015625, 0.0078125),
    sampling_ratio: int = 2,
    windows=(16, 32, 64),
    rois_per_step: int = 512,
    valid=None,
):
    """Drop-in replacement for multilevel_roi_align (forward, TPU).

    Args as ops.roi_align.multilevel_roi_align; ``valid`` optionally masks
    padded/suppressed ROI slots so they skip DMA + compute entirely (their
    output rows are zeros). Returns (R, ph, pw, C).
    """
    pooled = output_size[0]
    assert output_size[0] == output_size[1]
    g = sampling_ratio
    c = features[0].shape[-1]
    r = rois.shape[0]
    dtype = features[0].dtype

    max_win = max(windows)
    # common width: all levels padded to the widest level (multiple of 8,
    # at least max window + 8 so every window slide is in-bounds)
    common_w = max(max(-(-f.shape[2] // 8) * 8 for f in features), max_win + 8)
    stacked, row_offsets = _stack_levels(features, max_win, common_w)

    heights = jnp.array([f.shape[1] for f in features], jnp.float32)
    widths = jnp.array([f.shape[2] for f in features], jnp.float32)
    pad_h = jnp.array([max(f.shape[1], max_win) for f in features], jnp.float32)
    offsets = jnp.array(row_offsets, jnp.float32)

    scale_arr = jnp.array(scales, jnp.float32)
    scale_r = scale_arr[levels]
    h_r = heights[levels]
    w_r = widths[levels]
    ph_r = pad_h[levels]
    off_r = offsets[levels]

    start_w = rois[:, 1] * scale_r
    start_h = rois[:, 2] * scale_r
    roi_w = jnp.maximum(rois[:, 3] * scale_r - start_w, 1.0)
    roi_h = jnp.maximum(rois[:, 4] * scale_r - start_h, 1.0)
    bin_h = roi_h / pooled
    bin_w = roi_w / pooled

    # conservative sample span in cells
    span_h = jnp.floor(start_h + roi_h) + 2 - jnp.floor(jnp.maximum(start_h, 0.0))
    span_w = jnp.floor(start_w + roi_w) + 2 - jnp.floor(jnp.maximum(start_w, 0.0))
    span = jnp.maximum(span_h, span_w)

    t = rois_per_step
    r_pad = int(-(-r // t) * t)

    def build_columns(window: int, use_mask: jnp.ndarray, order: jnp.ndarray):
        """11 compacted 1-D f32 columns for SMEM scalar prefetch."""
        y0 = jnp.clip(jnp.floor(start_h), 0.0, ph_r - window)
        x0 = jnp.clip(jnp.floor(start_w), 0.0, common_w - (window + 8))
        x0 = jnp.floor(x0 / 8.0) * 8.0
        count = jnp.broadcast_to(use_mask.sum().astype(jnp.float32), (r,))
        cols = []
        for col in (rois[:, 0], off_r + y0, y0, x0, start_h, start_w,
                    bin_h, bin_w, h_r, w_r, count):
            col = jnp.take(col.astype(jnp.float32), order)
            if r_pad > r:
                col = jnp.concatenate([col, jnp.zeros((r_pad - r,), jnp.float32)])
            cols.append(col)
        return cols

    # f32 inputs get full-precision MXU passes so results match the XLA
    # path bit-closely; bf16 inputs keep the fast default passes
    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None

    def run(window: int, use_mask: jnp.ndarray) -> jnp.ndarray:
        # compact: used rois first, so trailing grid blocks no-op instantly
        order = jnp.argsort(~use_mask, stable=True)
        inv = jnp.argsort(order)
        cols = build_columns(window, use_mask, order)
        kernel = _make_kernel(window, pooled, g, c, t, precision)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=11,
            grid=(r_pad // t,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (t, pooled, pooled, c), lambda i, *s: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, window, window + 8, c), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r_pad, pooled, pooled, c), dtype),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(1024 * 1024 * 100),
            ),
        )(*cols, stacked)
        return jnp.take(out[:r], inv, axis=0)

    ok = valid if valid is not None else jnp.ones((r,), bool)
    out = None
    prev_fit = jnp.zeros((r,), bool)
    for wi, window in enumerate(windows):
        fits = span <= window if wi < len(windows) - 1 else jnp.ones((r,), bool)
        tier = ok & fits & ~prev_fit
        prev_fit = prev_fit | fits
        part = run(window, tier)
        out = part if out is None else out + part
    return out
