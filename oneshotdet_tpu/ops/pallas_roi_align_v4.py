"""Pallas TPU ROIAlign v4 — cross-ROI vectorized, 2D-matmul-only.

MEASURED DEAD END (kept as an engineering record, like the precomputed
interp and Pallas GroupNorm experiments). v5e, 16k ROIs, bf16, vs v2:

    v2 t=64      19.3 ms (1.20 us/ROI)   <- production kernel
    v4 full      65.6 ms (4.10 us/ROI)
    v4 noswap    29.9 ms (1.87)  # per-g (p,w) swaps alone cost ~2.2 us/ROI
    v4 nobd      65.7 ms (4.11)  # bd-weight assembly is free
    v4 nostageb  25.8 ms (1.61)  # stage A ALONE already loses to all of v2

Why: (a) Mosaic lowers the small (7,WIN,C) transposes as ~448 sublane row
moves each (~2.2 us); (b) the shared-K stage A materializes a full-width
(t*7, W, C) intermediate — ~27 MB of VMEM traffic per 16-ROI block — and
runs at ~37 TF/s effective. Cross-ROI batching pays in intermediate size
what the per-ROI loop pays in op overhead; v2's windowed ref-slice design
(zero-copy MXU operands) is the local optimum for this op. The winning
move was fusing the ROI *head* instead (ops/pallas_roi_head.py), where the
work is uniform and dense.

Lessons from v2/v3 (measured on v5e):
  * v2 loops ROIs inside each block: ~10 small ops per ROI (M=7 matmuls,
    per-ROI transpose+store) -> ~1.1-2.1 us/ROI of per-op overhead.
  * v3 batched ROIs with dot_generals carrying the channel dim
    ((t7,W) x (H,W,C)); Mosaic decomposes carried-dim dots into per-slice
    M=7 matmuls -> 5.3-6.7 us/ROI. Carried-dim dots are a trap.

v4 uses ONLY plain 2D matmuls:

  stage A (rows, shared-K): Wy (t*7, H) @ slab2d (H, W*C) -> rows (t*7, W*C)
      one matmul for the whole block; the slab is the shared operand, no
      per-ROI windows; exact for every box height. Per-level static
      branches (pl.when on the block's level) shrink H/W to the level's
      true extent so P4+ blocks don't pay P3's K/N.
  shuffle: per-g slice rows3[g] = rows[(g,p), x0:x0+WIN, c] and swap
      (p, w) -> K-major stacked (t*WIN, 7*C). 64-col windows, x0 aligned
      to 8; sample columns beyond the window clamp to its edge (same
      approximation class as v2's 64-cell tier; exact for x-spans <= 56).
  stage B (cols, block-diagonal): Wx_bd (t*7, t*WIN) @ stacked -> outT
      ((g,q), (p, c)); Wx_bd is assembled by writing each ROI's dense
      (7, WIN) weight tile into a zeroed scratch at its diagonal offset.
  store: outT.reshape(t, 7, 7, C) written in ONE store; the block's output
      is (q, p, c)-ordered and the final XLA gather un-permutes (fused with
      the existing un-sort gather, no extra pass).

Interpolation weights are precomputed DENSE in XLA ((R, 7, H) rows /
(R, 7, WIN) cols, scattered to block slots) — no in-kernel weight
construction at all. Semantics: csrc/cuda/ROIAlign_cuda.cu (no rounding,
malformed ROIs >= 1x1, (i+0.5)/g placement, border clamping, zero outside
[-1, dim]); forward-only like v2/v3.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 64  # stage-B column window (cells); x-spans <= WIN - 8 are exact


def _dense_weights(start, bin_sz, origin, true_dim, g: int, pooled: int,
                   width: int):
    """(R, pooled, width) dense interpolation rows, built in XLA.

    Same formula as the v2 kernel's interp_binned (and the CUDA oracle):
    per sub-sample low/high corners with in-range masking and border
    clamping, bin-mean (1/g) folded in; cells outside [origin, origin+width)
    clamp to the window edge exactly like v2's windowed kernel.
    """
    bins = jnp.arange(pooled, dtype=jnp.float32)[None, :, None]
    cells = jnp.arange(width, dtype=jnp.float32)[None, None, :]
    start = start[:, None, None]
    bin_sz = bin_sz[:, None, None]
    origin = origin[:, None, None]
    true_dim = true_dim[:, None, None]
    gf = float(g)
    m_total = jnp.zeros((start.shape[0], pooled, width), jnp.float32)
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


def _make_kernel(pooled: int, c: int, t: int, slab_h: int, w_pad: int,
                 level_dims, acc_dtype, precision, debug_skip: str = ""):
    """level_dims: tuple of distinct (h_l, w_l) geometry branches.

    debug_skip (timing ablations only — WRONG RESULTS): 'noswap' drops the
    per-g (p,w) swaps, 'nobd' uses the zeroed bd weights, 'nostageb' skips
    the shuffle+stage-B entirely."""
    m = t * pooled

    def kernel(c_bb, c_bl, c_hl, c_x0, wy_ref, wx_ref, slab_ref, out_ref,
               rows_ref, stacked_ref, bd_ref):
        del c_bb, c_bl
        k = pl.program_id(0)
        wy = wy_ref[...].reshape(m, slab_h)
        slab = slab_ref[0]  # (slab_h, w_pad, C)
        dt = slab.dtype

        # stage-B weight assembly: zero + t diagonal tile writes
        bd_ref[...] = jnp.zeros_like(bd_ref)
        if debug_skip not in ("nobd", "nostageb"):
            for g in range(t):
                bd_ref[g * pooled:(g + 1) * pooled, g * WIN:(g + 1) * WIN] = (
                    wx_ref[g]
                )

        def stage_a(h_l, w_l):
            # rows (m, w_l*C) = Wy (m, h_l) @ slab2d (h_l, w_l*C)
            rows = jax.lax.dot_general(
                wy[:, :h_l].astype(dt),
                slab[:h_l, :w_l].reshape(h_l, w_l * c),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ).astype(acc_dtype)
            rows_ref[:, :w_l, :] = rows.reshape(m, w_l, c)

        for h_l, w_l in level_dims:
            @pl.when(c_hl[k] == h_l)
            def _(h_l=h_l, w_l=w_l):
                stage_a(h_l, w_l)

        # per-g (p, w) swap into the K-major stack (ref slices support
        # dynamic starts; value-level dynamic_slice does not lower)
        if debug_skip != "nostageb":
            for g in range(t):
                x0 = pl.multiple_of(c_x0[k * t + g], 8)
                sl = rows_ref[g * pooled:(g + 1) * pooled, pl.ds(x0, WIN), :]
                if debug_skip == "noswap":
                    stacked_ref[g * WIN:g * WIN + pooled] = (
                        sl.reshape(pooled, WIN * c)[:, :pooled * c]
                    )
                else:
                    stacked_ref[g * WIN:(g + 1) * WIN] = jnp.swapaxes(
                        sl, 0, 1
                    ).reshape(WIN, pooled * c)

        outt = jax.lax.dot_general(
            bd_ref[...].astype(acc_dtype), stacked_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # ((g,q), (p,c))
        out_ref[...] = outt.reshape(t, pooled, pooled, c).astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "scales", "sampling_ratio",
                     "rois_per_step", "debug_skip"),
)
def pallas_multilevel_roi_align_v4(
    features,
    rois: jnp.ndarray,
    levels: jnp.ndarray,
    output_size=(7, 7),
    scales: Sequence[float] = (0.125, 0.0625, 0.03125, 0.015625, 0.0078125),
    sampling_ratio: int = 2,
    rois_per_step: int = 16,
    valid=None,
    debug_skip: str = "",
):
    """Drop-in replacement for multilevel_roi_align (forward, TPU).

    Contract as pallas_multilevel_roi_align: per-level (B, H_l, W_l, C)
    features, rois (R, 5) (batch_idx, x1, y1, x2, y2), levels (R,) 0-based.
    Returns (R, ph, pw, C).
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

    w_pad = max(max(-(-f.shape[2] // 8) * 8 for f in features), WIN + 8)
    slab_h = max(f.shape[1] for f in features)
    slabs = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, slab_h - f.shape[1]),
                     (0, w_pad - f.shape[2]), (0, 0)))
         for f in features], axis=1)  # (B, n_lvl*slab_h, w_pad, C)

    heights = jnp.array([f.shape[1] for f in features], jnp.float32)
    widths = jnp.array([f.shape[2] for f in features], jnp.float32)
    # static per-level geometry branches: (h_l, w_l) padded to sublane/lane
    # multiples; deduped so the kernel has one branch per distinct shape
    level_dims = tuple(sorted({
        (int(f.shape[1]), min(max(-(-f.shape[2] // 8) * 8, WIN + 8), w_pad))
        for f in features}, reverse=True))
    hl_of_level = jnp.array([f.shape[1] for f in features], jnp.int32)

    scale_r = jnp.array(scales, jnp.float32)[levels]
    start_w = rois[:, 1] * scale_r
    start_h = rois[:, 2] * scale_r
    roi_w = jnp.maximum(rois[:, 3] * scale_r - start_w, 1.0)
    roi_h = jnp.maximum(rois[:, 4] * scale_r - start_h, 1.0)

    # x window origin: floor(start), clipped, aligned down to 8 (v2's rule)
    w_l_of = jnp.array(
        [min(max(-(-f.shape[2] // 8) * 8, WIN + 8), w_pad) for f in features],
        jnp.float32)[levels]
    x0 = jnp.clip(jnp.floor(start_w), 0.0, w_l_of - WIN)
    x0 = jnp.floor(x0 / 8.0) * 8.0

    wy = _dense_weights(start_h, roi_h / pooled, jnp.zeros_like(start_h),
                        heights[levels], g, pooled, slab_h)
    wx = _dense_weights(start_w, roi_w / pooled, x0, widths[levels], g,
                        pooled, WIN)

    # compaction: sort ROIs by (image, level); pad groups to block boundary
    ng = b_sz * n_lvl
    b_idx = rois[:, 0].astype(jnp.int32)
    group = b_idx * n_lvl + levels.astype(jnp.int32)
    ok = valid if valid is not None else jnp.ones((r,), bool)
    key = jnp.where(ok, group, ng)
    okf = ok.astype(jnp.float32)[:, None, None]
    wy = wy * okf
    wx = wx * okf

    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    counts = jnp.zeros((ng + 1,), jnp.int32).at[key].add(1)
    blocks_g = -(-counts[:ng] // t)
    incl = jnp.cumsum(blocks_g)
    excl = incl - blocks_g
    nb = -(-r // t) + ng + 1

    ks = jnp.arange(nb, dtype=jnp.int32)
    g_k = jnp.searchsorted(incl, ks, side="right").astype(jnp.int32)
    g_kc = jnp.minimum(g_k, ng - 1)
    used = g_k < ng
    blk_b = jnp.where(used, g_kc // n_lvl, 0)
    blk_l = jnp.where(used, g_kc % n_lvl, 0)
    blk_hl = hl_of_level[blk_l]

    cnt_excl = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])[:-1]
    rank = jnp.arange(r, dtype=jnp.int32) - cnt_excl[sorted_key]
    dump = (nb - 1) * t
    slot_sorted = jnp.where(
        sorted_key < ng, excl[jnp.minimum(sorted_key, ng - 1)] * t + rank,
        dump)
    nslots = nb * t
    slot_orig = jnp.zeros((r,), jnp.int32).at[order].set(slot_sorted)

    def scatter(vals, shape):
        return jnp.zeros((nslots,) + shape, vals.dtype).at[slot_sorted].set(
            vals[order])

    wy_s = scatter(wy, (pooled, slab_h))
    wx_s = scatter(wx, (pooled, WIN))
    x0_s = scatter(x0.astype(jnp.int32), ())

    if dtype == jnp.float32:
        acc_dtype, precision = jnp.float32, jax.lax.Precision.HIGHEST
    else:
        acc_dtype, precision = jnp.bfloat16, None

    kernel = _make_kernel(pooled, c, t, slab_h, w_pad, level_dims, acc_dtype,
                          precision, debug_skip)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((t, pooled, slab_h), lambda k, *s: (k, 0, 0)),
            pl.BlockSpec((t, pooled, WIN), lambda k, *s: (k, 0, 0)),
            pl.BlockSpec((1, slab_h, w_pad, c),
                         lambda k, *s: (s[0][k], s[1][k], 0, 0)),
        ],
        out_specs=pl.BlockSpec((t, pooled, pooled, c),
                               lambda k, *s: (k, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((t * pooled, w_pad, c), acc_dtype),
            pltpu.VMEM((t * WIN, pooled * c), acc_dtype),
            pltpu.VMEM((t * pooled, t * WIN), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nslots, pooled, pooled, c), dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 110),
        ),
    )(blk_b, blk_l, blk_hl, x0_s, wy_s, wx_s, slabs)
    # blocks emit (q, p, c); un-sort AND un-permute in one fused gather
    return jnp.take(out, slot_orig, axis=0).swapaxes(1, 2)
