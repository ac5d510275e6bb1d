"""Pallas TPU ROIAlign v3 — cross-ROI vectorized ("batched slab matmul").

v2 (pallas_roi_align.py) loops over ROIs inside each grid block: per ROI a
windowed VMEM slice feeds two tiny (M=7) matmuls plus a transposed store.
Measured floor ~1 us/ROI — not window traffic but the per-ROI op chain:
M=7 matmuls use 7/128 MXU rows, and the (7,7,C) transpose+store pays fixed
Mosaic op costs per ROI.

v3 removes every per-ROI op. A grid block owns t ROIs sharing one
(image, level) slab and computes them with TWO block-wide matmuls:

  stage A (columns):  Wx (t*7, W)  x  slab (H, W, C)   -> T1 (t*7, H, C)
  stage B (rows):     Wy (t*7, H)  x  T1 (t*7, H, C)   -> O  (t*7, t*7, C)

Stage A contracts the slab's W axis for all t ROIs at once (the slab is the
shared operand, so there are no per-ROI windows, copies, or tier clamping —
v3 is exact for every aspect ratio). Stage B computes the full (g, g')
cross-product and the g-diagonal is read off with t static slice-stores
that are already in (p, q, C) layout — no transposes. Interpolation weights
are built in-kernel from compact per-ROI index/weight params precomputed in
XLA (4 iota-compare terms on (t*7, dim) tiles — negligible VPU work).

Cost model per ROI (t=16, P3 slab 104x152, C=256, bf16): stage A ~60 MFLOP
at ~87% MXU-row utilization + stage B ~42 MFLOP; smaller levels cost less.
Semantics match csrc/cuda/ROIAlign_cuda.cu (no rounding, malformed ROIs
forced >= 1x1, (i+0.5)/g sample placement, border clamping, zero outside
[-1, dim]) — bit-identical to ops/roi_align.py's XLA oracle in f32 mode.

Forward-only (eval path), like v2; training uses the XLA fallback with VJP.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp_params(start, bin_sz, true_dim, g: int, pooled: int):
    """Compact bilinear params, vectorized over all ROIs.

    Returns idx (R, pooled, 2g) f32 cell indices and w (R, pooled, 2g) f32
    weights such that the dense interpolation row for (roi, p) is
    sum_j (cells == idx[j]) * w[j] — the exact per-sample formula of
    csrc/cuda/ROIAlign_cuda.cu:15-110 (low/high corners per sub-sample,
    in-range masking, border clamping) with the 1/g bin mean folded in.
    """
    bins = jnp.arange(pooled, dtype=jnp.float32)[None, :]
    start = start[:, None]
    bin_sz = bin_sz[:, None]
    true_dim = true_dim[:, None]
    gf = float(g)
    idxs, ws = [], []
    for sub in range(g):
        pos = start + (bins + (sub + 0.5) / gf) * bin_sz
        in_range = ((pos >= -1.0) & (pos <= true_dim)).astype(jnp.float32)
        posc = jnp.maximum(pos, 0.0)
        low = jnp.minimum(jnp.floor(posc), true_dim - 1.0)
        high = jnp.minimum(low + 1.0, true_dim - 1.0)
        posf = jnp.where(low >= true_dim - 1.0, low, posc)
        lfrac = posf - low
        idxs += [low, high]
        ws += [(1.0 - lfrac) * in_range / gf, lfrac * in_range / gf]
    return jnp.stack(idxs, axis=-1), jnp.stack(ws, axis=-1)


def _make_kernel(pooled: int, g: int, c: int, t: int, slab_h: int,
                 w_pad: int, acc_dtype, precision):
    m = t * pooled

    def kernel(c_bb, c_bl, yi_ref, yw_ref, xi_ref, xw_ref, slab_ref, out_ref):
        del c_bb, c_bl  # consumed by the slab index_map

        def weights(i_ref, w_ref, width):
            idx = i_ref[...].reshape(m, 2 * g)
            wgt = w_ref[...].reshape(m, 2 * g)
            cells = jax.lax.broadcasted_iota(jnp.int32, (m, width), 1).astype(
                jnp.float32)
            acc = jnp.zeros((m, width), jnp.float32)
            for j in range(2 * g):
                acc = acc + jnp.where(
                    cells == idx[:, j:j + 1], wgt[:, j:j + 1], 0.0)
            return acc

        wx = weights(xi_ref, xw_ref, w_pad)
        wy = weights(yi_ref, yw_ref, slab_h)

        slab = slab_ref[0]  # (slab_h, w_pad, C)
        dt = slab.dtype
        # stage A: contract W for all t ROIs at once -> ((g,q), H, C).
        # Accumulate f32 (Mosaic requires 32-bit acc), then keep the
        # intermediate in acc_dtype (bf16 halves stage B's operand traffic).
        t1 = jax.lax.dot_general(
            wx.astype(dt), slab, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(acc_dtype)
        # stage B: full (g, g') cross-product -> ((g,p), (g',q), C)
        o = jax.lax.dot_general(
            wy.astype(t1.dtype), t1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        # g-diagonal: t static slice-stores, already in (p, q, C) layout
        for i in range(t):
            out_ref[i] = o[i * pooled:(i + 1) * pooled,
                           i * pooled:(i + 1) * pooled].astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "scales", "sampling_ratio",
                     "rois_per_step"),
)
def pallas_multilevel_roi_align_v3(
    features,
    rois: jnp.ndarray,
    levels: jnp.ndarray,
    output_size=(7, 7),
    scales: Sequence[float] = (0.125, 0.0625, 0.03125, 0.015625, 0.0078125),
    sampling_ratio: int = 2,
    rois_per_step: int = 16,
    valid=None,
):
    """Drop-in replacement for multilevel_roi_align (forward, TPU).

    Same contract as pallas_multilevel_roi_align: features is a list of
    (B, H_l, W_l, C) per-level maps, rois (R, 5) as (batch_idx, x1, y1,
    x2, y2), levels (R,) 0-based. Returns (R, ph, pw, C).
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

    w_pad = max(-(-f.shape[2] // 8) * 8 for f in features)
    slab_h = max(f.shape[1] for f in features)
    slabs = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, slab_h - f.shape[1]),
                     (0, w_pad - f.shape[2]), (0, 0)))
         for f in features], axis=1)  # (B, n_lvl*slab_h, w_pad, C)

    heights = jnp.array([f.shape[1] for f in features], jnp.float32)
    widths = jnp.array([f.shape[2] for f in features], jnp.float32)
    scale_r = jnp.array(scales, jnp.float32)[levels]

    start_w = rois[:, 1] * scale_r
    start_h = rois[:, 2] * scale_r
    roi_w = jnp.maximum(rois[:, 3] * scale_r - start_w, 1.0)
    roi_h = jnp.maximum(rois[:, 4] * scale_r - start_h, 1.0)

    yi, yw = _interp_params(start_h, roi_h / pooled, heights[levels], g, pooled)
    xi, xw = _interp_params(start_w, roi_w / pooled, widths[levels], g, pooled)

    # compaction: sort ROIs by (image, level) group; pad each group to a
    # block boundary so every grid block maps to exactly one slab
    ng = b_sz * n_lvl
    b_idx = rois[:, 0].astype(jnp.int32)
    group = b_idx * n_lvl + levels.astype(jnp.int32)
    ok = valid if valid is not None else jnp.ones((r,), bool)
    key = jnp.where(ok, group, ng)
    # invalid/padded ROI slots keep zero weights -> their outputs are zeros
    yw = yw * ok[:, None, None]
    xw = xw * ok[:, None, None]

    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    counts = jnp.zeros((ng + 1,), jnp.int32).at[key].add(1)
    blocks_g = -(-counts[:ng] // t)
    incl = jnp.cumsum(blocks_g)
    excl = incl - blocks_g
    nb = -(-r // t) + ng + 1  # static bound: sum(ceil) <= r/t + ng

    ks = jnp.arange(nb, dtype=jnp.int32)
    g_k = jnp.searchsorted(incl, ks, side="right").astype(jnp.int32)
    g_kc = jnp.minimum(g_k, ng - 1)
    used = g_k < ng
    blk_b = jnp.where(used, g_kc // n_lvl, 0)
    blk_l = jnp.where(used, g_kc % n_lvl, 0)

    cnt_excl = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])[:-1]
    rank = jnp.arange(r, dtype=jnp.int32) - cnt_excl[sorted_key]
    dump = (nb - 1) * t  # last block: all-zero weights, never read back
    slot_sorted = jnp.where(
        sorted_key < ng, excl[jnp.minimum(sorted_key, ng - 1)] * t + rank,
        dump)
    nslots = nb * t
    slot_orig = jnp.zeros((r,), jnp.int32).at[order].set(slot_sorted)

    def scatter3(vals):
        return jnp.zeros((nslots, pooled, 2 * g), jnp.float32).at[
            slot_sorted].set(vals[order])

    yi_s, yw_s, xi_s, xw_s = (scatter3(v) for v in (yi, yw, xi, xw))

    # f32 inputs get full-precision MXU passes (parity with the XLA oracle);
    # bf16 inputs keep fast native passes with bf16 intermediates
    if dtype == jnp.float32:
        acc_dtype, precision = jnp.float32, jax.lax.Precision.HIGHEST
    else:
        acc_dtype, precision = jnp.bfloat16, None
    kernel = _make_kernel(pooled, g, c, t, slab_h, w_pad, acc_dtype, precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((t, pooled, 2 * g), lambda k, *s: (k, 0, 0)),
            pl.BlockSpec((t, pooled, 2 * g), lambda k, *s: (k, 0, 0)),
            pl.BlockSpec((t, pooled, 2 * g), lambda k, *s: (k, 0, 0)),
            pl.BlockSpec((t, pooled, 2 * g), lambda k, *s: (k, 0, 0)),
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
    )(blk_b, blk_l, yi_s, yw_s, xi_s, xw_s, slabs)
    return jnp.take(out, slot_orig, axis=0)
