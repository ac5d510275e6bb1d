"""Pallas TPU kernel for multi-level ROIAlign (the stage-2 hot op).

Why: the XLA-gather formulation (ops/roi_align.py) moves every bilinear
corner as its own scattered row-gather — measured ~50 GB/s effective on
v5e. Two generations of Pallas kernels replaced it:

v1 (windowed DMA): one HBM->VMEM DMA of a feature *window* per ROI, then
separable bilinear interpolation as two small MXU matmuls. Fast, but at
16k ROIs the per-ROI DMA moves ~7 GB of HBM traffic per batch and the DMA
issue overhead floors at ~1 us/ROI.

v2 (this file, "slab-resident"): ROIs are compacted and sorted by
(window-tier, image, FPN level); the grid walks blocks of ``t`` ROIs and a
scalar-prefetched ``index_map`` keeps each block's whole (image, level)
feature slab resident in VMEM — consecutive blocks of the same group hit
the pipeline's block-revisit cache, so every slab is fetched from HBM at
most once per tier (~300 MB total instead of ~7 GB). Each ROI's window is
then a cheap aligned VMEM slice feeding the same two interpolation
matmuls. Measured 1.24 us/ROI vs v1's 1.62 on v5e, bit-identical outputs.

Semantics match csrc/cuda/ROIAlign_cuda.cu (no rounding, malformed ROIs
forced >= 1x1, (i+0.5)/g sample placement, corner clamping at the *level*
boundary, zero outside [-1, H]x[-1, W]) for every ROI whose sample span
fits its window tier. ROIs route to a 16/32/64-cell window by span; the
FPN level mapper bounds sqrt(area)/stride < 28 cells, so 64 cells covers
aspect ratios up to ~5:1 — beyond that the sample grid clamps to the
window (an approximation only for extremely elongated boxes).

The W axis of the slab is (8, 128)-tiled, so window column offsets are
quantized down to multiples of 8 and windows are 8 columns wider; the row
axis is untiled (3rd-minor), so row offsets are free.

Measured dead ends (keep for the record, don't re-derive):
- "precomputed" interp mode (weights built in XLA pre-scatter): slower —
  the (R, 7, 64/72) weight-tensor scatter costs more than it saves.
- "postscatter" interp mode (weights built in XLA *after* the slot
  scatter, so only scalars are scattered and the kernel body shrinks to
  slice + two matmuls): bit-identical, 35.7 vs 33.7 ms on the tuner mix
  (2026-08-17) — the per-ROI *loop iteration* (address math + two
  M=7-row matmuls at ~5% MXU row utilization), not interp construction,
  is the floor.
- cross-ROI batched forms (v3/v4 files): 4-6 us/ROI — batching fixes the
  M=7 skew but pays more in full-width intermediates + sublane shuffles.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
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


def _interp_weights_xla(start, bin_sz, origin, true_dim, g: int, pooled: int,
                        width: int):
    """Vectorized (S, pooled, width) interpolation matrices — the exact
    per-ROI formula of the in-kernel interp_binned, hoisted to XLA where it
    vectorizes across all ROIs at once. In-kernel construction costs dozens
    of tiny (7, width) VPU ops per ROI and dominates the kernel's runtime
    (measured: unrolling the ROI loop gains nothing — the work, not the
    serial chain, is the bottleneck)."""
    s = start.shape[0]
    bins = jnp.arange(pooled, dtype=jnp.float32)[None, :, None]
    cells = jnp.arange(width, dtype=jnp.float32)[None, None, :]
    start = start[:, None, None]
    bin_sz = bin_sz[:, None, None]
    origin = origin[:, None, None]
    true_dim = true_dim[:, None, None]
    gf = float(g)
    m_total = jnp.zeros((s, pooled, width), jnp.float32)
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


def _make_kernel_pw(windows, pooled: int, c: int, t: int,
                    slab_h: int, w_pad: int, precision=None):
    """Kernel for precomputed interpolation weights: per ROI just an aligned
    VMEM window slice and the two pooling matmuls."""
    max_win = max(windows)

    def kernel(c_bb, c_bl, c_bt, c_bn, c_y0, c_x0, wy_ref, wx_ref,
               slab_ref, out_ref):
        del c_bb, c_bl
        k = pl.program_id(0)

        def compute(i, win):
            winw = win + 8
            y0i = c_y0[k * t + i]
            x0i = pl.multiple_of(c_x0[k * t + i], 8)
            wyb = wy_ref[i, :, :win]
            wxb = wx_ref[i, :, :winw]
            winv = slab_ref[0, pl.ds(y0i, win), pl.ds(x0i, winw), :]
            rows = jax.lax.dot_general(
                wyb.astype(winv.dtype), winv.reshape(win, winw * c),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # (pooled, winw*C)
            out = jax.lax.dot_general(
                wxb, rows.reshape(pooled, winw, c), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # (pooled_x, pooled_y, C)
            out_ref[i] = out.transpose(1, 0, 2).astype(out_ref.dtype)

        out_ref[...] = jnp.zeros_like(out_ref)

        def body(i, _):
            for tid, win in enumerate(windows):
                @pl.when(c_bt[k] == tid)
                def _(win=win):
                    compute(i, win)
            return 0

        jax.lax.fori_loop(0, c_bn[k], body, 0)

    return kernel


def _make_kernel(windows, pooled: int, g: int, c: int, t: int,
                 slab_h: int, w_pad: int, precision=None, unroll: int = 1):
    def kernel(c_bb, c_bl, c_bt, c_bn, c_thr, c_twr, c_sh, c_sw, c_bh, c_bw,
               slab_ref, out_ref):
        # c_bb/c_bl (slab selection) are consumed by the index_map; the
        # remaining columns live in SMEM (scalar prefetch).
        del c_bb, c_bl
        k = pl.program_id(0)
        base = k * t
        th = c_thr[k]  # level true height / width (boundary clamping)
        tw = c_twr[k]

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

        def compute(i, win):
            winw = win + 8
            gi = base + i
            sh = c_sh[gi]
            sw = c_sw[gi]
            y0 = jnp.clip(jnp.floor(sh), 0.0, float(slab_h - win))
            x0 = jnp.clip(jnp.floor(sw), 0.0, float(w_pad - winw))
            x0 = jnp.floor(x0 / 8.0) * 8.0
            wyb = interp_binned(sh, c_bh[gi], y0, th, win)
            wxb = interp_binned(sw, c_bw[gi], x0, tw, winw)
            y0i = y0.astype(jnp.int32)
            x0i = pl.multiple_of(x0.astype(jnp.int32), 8)
            # aligned VMEM slice of the resident slab — no per-ROI DMA
            winv = slab_ref[0, pl.ds(y0i, win), pl.ds(x0i, winw), :]
            # bf16 slabs keep native-dtype MXU passes (casting the interp
            # matrix down is bit-identical to casting the window up under
            # default precision); f32 slabs keep full-precision passes
            rows = jax.lax.dot_general(
                wyb.astype(winv.dtype), winv.reshape(win, winw * c),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # (pooled, winw*C)
            out = jax.lax.dot_general(
                wxb, rows.reshape(pooled, winw, c), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # (pooled_x, pooled_y, C)
            out_ref[i] = out.transpose(1, 0, 2).astype(out_ref.dtype)

        # rows beyond the used prefix are never written by compute():
        # zero the whole block first (cheap VMEM store)
        out_ref[...] = jnp.zeros_like(out_ref)

        def body(i, _):
            # the block's tier is constant; pl.when picks the static window.
            # ``unroll`` independent ROIs per iteration let Mosaic overlap
            # their serial slice->matmul->store chains.
            for tid, win in enumerate(windows):
                @pl.when(c_bt[k] == tid)
                def _(win=win):
                    for u in range(unroll):
                        idx = i * unroll + u
                        if unroll == 1:
                            compute(idx, win)
                        else:
                            @pl.when(idx < c_bn[k])
                            def _(idx=idx, win=win):
                                compute(idx, win)
            return 0

        jax.lax.fori_loop(0, (c_bn[k] + unroll - 1) // unroll, body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "scales", "sampling_ratio", "windows",
                     "rois_per_step", "unroll", "interp_mode"),
)
def pallas_multilevel_roi_align(
    features,
    rois: jnp.ndarray,
    levels: jnp.ndarray,
    output_size=(7, 7),
    scales: Sequence[float] = (0.125, 0.0625, 0.03125, 0.015625, 0.0078125),
    sampling_ratio: int = 2,
    windows=(16, 32, 64),
    rois_per_step: int = 64,
    valid=None,
    unroll: int = 1,
    interp_mode: str = "kernel",
):
    """Drop-in replacement for multilevel_roi_align (forward, TPU).

    Args as ops.roi_align.multilevel_roi_align; ``valid`` optionally masks
    padded/suppressed ROI slots so they skip compute entirely (their output
    rows are zeros). ``rois_per_step`` is the grid block size. Returns
    (R, ph, pw, C).
    """
    pooled = output_size[0]
    assert output_size[0] == output_size[1]
    g = sampling_ratio
    b_sz = features[0].shape[0]
    n_lvl = len(features)
    c = features[0].shape[-1]
    r = rois.shape[0]
    dtype = features[0].dtype
    t = rois_per_step

    max_win = max(windows)
    # common slab geometry: every level padded to the same (slab_h, w_pad)
    # so one BlockSpec covers any (image, level) slab
    w_pad = max(max(-(-f.shape[2] // 8) * 8 for f in features), max_win + 8)
    slab_h = max(max(f.shape[1] for f in features), max_win)
    slabs = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, slab_h - f.shape[1]), (0, w_pad - f.shape[2]), (0, 0)))
         for f in features], axis=1)  # (B, n_lvl*slab_h, w_pad, C)

    heights = jnp.array([f.shape[1] for f in features], jnp.float32)
    widths = jnp.array([f.shape[2] for f in features], jnp.float32)
    scale_r = jnp.array(scales, jnp.float32)[levels]

    start_w = rois[:, 1] * scale_r
    start_h = rois[:, 2] * scale_r
    roi_w = jnp.maximum(rois[:, 3] * scale_r - start_w, 1.0)
    roi_h = jnp.maximum(rois[:, 4] * scale_r - start_h, 1.0)
    bin_h = roi_h / pooled
    bin_w = roi_w / pooled

    # conservative sample span in cells -> window tier
    span_h = jnp.floor(start_h + roi_h) + 2 - jnp.floor(jnp.maximum(start_h, 0.0))
    span_w = jnp.floor(start_w + roi_w) + 2 - jnp.floor(jnp.maximum(start_w, 0.0))
    span = jnp.maximum(span_h, span_w)
    tier = jnp.zeros((r,), jnp.int32)
    for wi, w in enumerate(windows[:-1]):
        tier = jnp.where(span > w, wi + 1, tier)

    # compaction: sort ROIs by (tier, image, level) group; pad each group to
    # a block boundary so every grid block maps to exactly one slab
    ng = len(windows) * b_sz * n_lvl
    b_idx = rois[:, 0].astype(jnp.int32)
    group = (tier * b_sz + b_idx) * n_lvl + levels.astype(jnp.int32)
    ok = valid if valid is not None else jnp.ones((r,), bool)
    key = jnp.where(ok, group, ng)

    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    counts = jnp.zeros((ng + 1,), jnp.int32).at[key].add(1)
    blocks_g = -(-counts[:ng] // t)
    incl = jnp.cumsum(blocks_g)       # block allocation per group
    excl = incl - blocks_g
    nb = -(-r // t) + ng + 1          # static bound: sum(ceil) <= r/t + ng

    ks = jnp.arange(nb, dtype=jnp.int32)
    g_k = jnp.searchsorted(incl, ks, side="right").astype(jnp.int32)
    used = g_k < ng
    g_kc = jnp.minimum(g_k, ng - 1)
    blk_n = jnp.where(used, jnp.clip(counts[g_kc] - (ks - excl[g_kc]) * t, 0, t), 0)
    blk_tier = g_kc // (b_sz * n_lvl)
    rem = g_kc % (b_sz * n_lvl)
    blk_b = jnp.where(used, rem // n_lvl, 0)
    blk_l = jnp.where(used, rem % n_lvl, 0)
    blk_th = heights[blk_l]
    blk_tw = widths[blk_l]

    cnt_excl = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])[:-1]
    rank = jnp.arange(r, dtype=jnp.int32) - cnt_excl[sorted_key]
    dump = (nb - 1) * t  # last block is never used: its slots stay zero
    slot_sorted = jnp.where(
        sorted_key < ng, excl[jnp.minimum(sorted_key, ng - 1)] * t + rank, dump
    )

    nslots = nb * t

    def scatter(vals):
        return jnp.zeros((nslots,), jnp.float32).at[slot_sorted].set(
            vals[order].astype(jnp.float32))

    slot_orig = jnp.zeros((r,), jnp.int32).at[order].set(slot_sorted)

    # f32 inputs get full-precision MXU passes so results match the XLA
    # path bit-closely; bf16 inputs keep the fast default passes
    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None

    if interp_mode == "postscatter":
        # Interp matrices built in XLA *after* the slot scatter: only (S,)
        # scalar params are scattered (same cost as "kernel" mode) and the
        # (S, 7, 64/72) weight tensors materialize directly in slot order as
        # one fused XLA pass — the big gather+scatter that made
        # "precomputed" lose is gone. The per-ROI kernel body shrinks to
        # slice + two matmuls + store (no dozens of tiny VPU construction
        # ops per ROI).
        max_win = max(windows)
        win_r = jnp.array(windows, jnp.float32)[tier]
        c_sh = scatter(start_h)
        c_sw = scatter(start_w)
        c_bh = scatter(bin_h)
        c_bw = scatter(bin_w)
        th_s = scatter(heights[levels])
        tw_s = scatter(widths[levels])
        win_s = scatter(win_r)
        y0_s = jnp.clip(jnp.floor(c_sh), 0.0, float(slab_h) - win_s)
        x0c = jnp.clip(jnp.floor(c_sw), 0.0, float(w_pad) - (win_s + 8.0))
        x0_s = jnp.floor(x0c / 8.0) * 8.0
        wy_s = _interp_weights_xla(c_sh, c_bh, y0_s, th_s, g, pooled, max_win)
        wx_s = _interp_weights_xla(c_sw, c_bw, x0_s, tw_s, g, pooled,
                                   max_win + 8)

        kernel = _make_kernel_pw(windows, pooled, c, t, slab_h, w_pad,
                                 precision)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((t, pooled, max_win), lambda k, *s: (k, 0, 0)),
                pl.BlockSpec((t, pooled, max_win + 8), lambda k, *s: (k, 0, 0)),
                pl.BlockSpec((1, slab_h, w_pad, c),
                             lambda k, *s: (s[0][k], s[1][k], 0, 0)),
            ],
            out_specs=pl.BlockSpec((t, pooled, pooled, c),
                                   lambda k, *s: (k, 0, 0, 0)),
            scratch_shapes=[],
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nslots, pooled, pooled, c), dtype),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(1024 * 1024 * 110),
            ),
        )(blk_b, blk_l, blk_tier, blk_n, y0_s.astype(jnp.int32),
          x0_s.astype(jnp.int32), wy_s, wx_s, slabs)
        return jnp.take(out, slot_orig, axis=0)

    if interp_mode == "precomputed":
        # Experiment (kept for reference): interpolation matrices built in
        # XLA, vectorized over all ROIs. Measured SLOWER than the in-kernel
        # construction (37.2 vs 33.4 ms at 16k synthetic ROIs) — the kernel
        # is bound by window VMEM traffic + store, not by the interp math,
        # and the host-side scatter of the (R, 7, 64/72) weight tensors
        # costs more than it saves. Bit-identical outputs (parity-checked
        # in tools/tune_roialign.py). See "postscatter" for the version
        # that fixes the scatter cost.
        max_win = max(windows)
        win_r = jnp.array(windows, jnp.float32)[tier]
        th_r = heights[levels]
        tw_r = widths[levels]
        y0 = jnp.clip(jnp.floor(start_h), 0.0, float(slab_h) - win_r)
        x0c = jnp.clip(jnp.floor(start_w), 0.0, float(w_pad) - (win_r + 8.0))
        x0 = jnp.floor(x0c / 8.0) * 8.0
        wy = _interp_weights_xla(start_h, bin_h, y0, th_r, g, pooled, max_win)
        wx = _interp_weights_xla(start_w, bin_w, x0, tw_r, g, pooled,
                                 max_win + 8)

        def scatter3(vals, width):
            return jnp.zeros((nslots, pooled, width), jnp.float32).at[
                slot_sorted].set(vals[order])

        c_y0 = scatter(y0).astype(jnp.int32)
        c_x0 = scatter(x0).astype(jnp.int32)
        wy_s = scatter3(wy, max_win)
        wx_s = scatter3(wx, max_win + 8)

        kernel = _make_kernel_pw(windows, pooled, c, t, slab_h, w_pad,
                                 precision)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((t, pooled, max_win), lambda k, *s: (k, 0, 0)),
                pl.BlockSpec((t, pooled, max_win + 8), lambda k, *s: (k, 0, 0)),
                pl.BlockSpec((1, slab_h, w_pad, c),
                             lambda k, *s: (s[0][k], s[1][k], 0, 0)),
            ],
            out_specs=pl.BlockSpec((t, pooled, pooled, c),
                                   lambda k, *s: (k, 0, 0, 0)),
            scratch_shapes=[],
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nslots, pooled, pooled, c), dtype),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(1024 * 1024 * 110),
            ),
        )(blk_b, blk_l, blk_tier, blk_n, c_y0, c_x0, wy_s, wx_s, slabs)
        return jnp.take(out, slot_orig, axis=0)

    c_sh = scatter(start_h)
    c_sw = scatter(start_w)
    c_bh = scatter(bin_h)
    c_bw = scatter(bin_w)

    kernel = _make_kernel(windows, pooled, g, c, t, slab_h, w_pad, precision,
                          unroll)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, slab_h, w_pad, c),
                               lambda k, *s: (s[0][k], s[1][k], 0, 0))],
        out_specs=pl.BlockSpec((t, pooled, pooled, c), lambda k, *s: (k, 0, 0, 0)),
        scratch_shapes=[],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nslots, pooled, pooled, c), dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 110),
        ),
    )(blk_b, blk_l, blk_tier, blk_n, blk_th, blk_tw, c_sh, c_sw, c_bh, c_bw, slabs)
    return jnp.take(out, slot_orig, axis=0)
