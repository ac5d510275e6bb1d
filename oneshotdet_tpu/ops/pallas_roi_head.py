"""Pallas TPU fused ROI box-head kernel (stage-2 relation head, eval path).

STATUS: built, parity-verified, measured — and kept OPT-IN
(ONESHOT_PALLAS_ROI_HEAD=1) because it only TIES XLA. Measured on v5e
(2026-08-17, batch 8 x 2000 ROIs x 256ch bf16, fresh buffers every iter):

    XLA flax module (standalone)        20.37 ms/batch
    this kernel, 2D form, T=80          19.99 ms/batch
    this kernel, 2D form, T=200         21.19 ms/batch
    first version (3D intermediates)    31.20 ms at T=80; T=200 compile OOM
    ablations at T=80: skeleton (no GN, center tap only) 10.51;
                       no-GN (9 taps) 13.81  =>  GN 6.2 ms, taps 3.3 ms

The skeleton number is the tell: the bare 6-matmul chain runs at ~18% MXU
— per-op Mosaic overhead (~1.5-2 us x ~30 ops x 200 blocks), not FLOPs or
bandwidth, is the floor, and the in-model XLA head overlaps to ~14 ms.
Same lesson as pallas_groupnorm.py: XLA's fusion wins at these shapes.

XLA runs the head chain (concat-compress 1x1 convs -> GN32 -> LeakyReLU ->
3x3 aggreg -> GN -> fc6 -> fc7 -> predictors; box_head.py:43-76,147-155) as
separate HBM-roundtripping ops over (R, 7, 7, C) tensors. This kernel
processes blocks of T ROIs entirely in VMEM with all weights resident,
and — critically — keeps EVERY intermediate 2D (T*49, C): Mosaic tiles
only the trailing two dims, so 3D (T, 49, C) values unroll T-fold into
per-slice instructions.

2D-only building blocks:
  - the support half of compress_0 is precomputed per image in XLA
    ((B, 49, 2C) = supp7x7 @ K_b + bias) and broadcast to all T ROIs of a
    block by a (T*49, 49) pattern-indicator matmul (row i repeats slot
    i%49) — the channel concat is never materialized (same trick as
    models/roi_head.py's _ConcatConv1x1);
  - GroupNorm stats per (ROI, group) via indicator matmuls: rows are
    summed per ROI with a (T, T*49) 0/1 matrix, channels per group with a
    (C, G) one-hot, and the per-(ROI,group) mean/rsqrt broadcast back by
    the transposed indicators — lane and sublane dims stay intact;
  - the 3x3 aggreg conv is 9 sublane rolls: with rows ordered
    i = t*49 + y*7 + x, neighbor (y+dy, x+dx) sits at row i + 7dy + dx, so
    roll(-7dy-dx) + an iota boundary mask (zero-pad semantics; ROI-block
    crossings imply y/x out of range so they mask too) + one matmul per
    tap against the (C, C/2) tap weight;
  - fc6 consumes our (p, q, c)-flat layout directly: its weight rows are
    permuted once in XLA from the checkpoint's torch (c, p, q) order;
  - only (T, ncls) logits and (T, 4*nreg) deltas leave the kernel.

Blocks must not straddle images (per-image support): T divides the
per-image ROI count P; grid block k maps to image k*T // P. Supported
surface: SECOND_STAGE_METHOD='concat', no neg-support second pass, no
linear fusion — everything else falls back to the XLA module.

Semantics: ROIBoxHeadNet (models/roi_head.py:97-155), itself rebuilding
box_head.py / roi_box_predictors.py. f32 inputs use HIGHEST-precision
matmuls for test parity; bf16 keeps native MXU passes (weights pre-cast
to bf16 in XLA so the resident copies are half-size).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(t: int, c: int, dtype, precision):
    s = 49  # 7*7
    m = t * s
    c2 = 2 * c
    ca = c // 2

    def mm(a, b):
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    # constant 0/1 indicators, built from 2D iotas in both orientations
    # (in-kernel .T would be a Mosaic relayout; iotas are free)
    def _ind(rows: int, cols: int, rmap, cmap):
        ri = rmap(jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0))
        ci = cmap(jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1))
        return (ri == ci).astype(dtype)

    def _row_inds():
        """(T, M) and (M, T) row<->ROI indicators: 1 iff row // 49 == roi."""
        rt = _ind(t, m, lambda j: j, lambda i: i // s)
        r_ = _ind(m, t, lambda i: i // s, lambda j: j)
        return rt, r_

    def _pat_ind():
        """(M, 49) slot indicator: P[i, k] = 1 iff i % 49 == k."""
        return _ind(m, s, lambda i: i % s, lambda k: k)

    def gn(x2, ch, gamma, beta, rt, r_, groups: int = 32, eps: float = 1e-5):
        """GroupNorm over (M, ch) rows, stats per (ROI, group).

        rt: (T, M) row indicator; r_: (M, T) its transpose. Two-pass
        variance (E[x^2]-E[x]^2 cancels catastrophically in f32)."""
        cg = ch // groups
        ind = _ind(ch, groups, lambda ci: ci // cg, lambda g: g)   # (ch, G)
        dni = _ind(groups, ch, lambda g: g, lambda ci: ci // cg)   # (G, ch)
        n = float(s * cg)
        xs = mm(rt, x2)                                 # (T, ch) row sums
        mean_g = mm(xs, ind) / n                        # (T, G)
        mean_r = mm(r_, mm(mean_g, dni))                # (M, ch)
        d = x2 - mean_r
        var_g = mm(mm(rt, d * d), ind) / n              # (T, G)
        scale_r = mm(r_, mm(jax.lax.rsqrt(var_g + eps), dni))
        return d * scale_r * gamma + beta

    def _leaky(x, slope=0.2):
        return jnp.where(x >= 0, x, x * slope)

    # perf-ablation knob (tools/tune_roi_head.py): 'nogn' skips the three
    # GroupNorms, 'noagg' replaces the 9-tap conv with the center tap,
    # 'skeleton' does both — isolates where kernel time goes on-chip
    ablate = os.environ.get("ONESHOT_ROI_HEAD_ABLATE", "")
    skip_gn = ablate in ("nogn", "skeleton")
    skip_agg = ablate in ("noagg", "skeleton")

    def kernel(x_ref, yb_ref,
               c0a_ref, gn0g_ref, gn0b_ref,
               c1_ref, c1b_ref, gn1g_ref, gn1b_ref,
               ag_ref, agb_ref, gng_ref, gnb_ref,
               fc6_ref, fc6b_ref, fc7_ref, fc7b_ref,
               cls_ref, clsb_ref, box_ref, boxb_ref,
               logits_ref, deltas_ref):
        rt, r_ = _row_inds()

        def maybe_gn(x2, ch, gamma, beta):
            return x2 if skip_gn else gn(x2, ch, gamma, beta, rt, r_)

        x = x_ref[...].reshape(m, c)                          # (M, C)
        # compress_0: roi half matmul + per-image supp half (box_head.py:44-51)
        h = mm(x, c0a_ref[...])                               # (M, 2C) f32
        h = h + mm(_pat_ind(), yb_ref[...].reshape(s, c2))
        h = _leaky(maybe_gn(h, c2, gn0g_ref[...], gn0b_ref[...]))
        # compress_1: 1x1 2C -> C + GN + leaky
        h = mm(h, c1_ref[...]) + c1b_ref[...]
        h = _leaky(maybe_gn(h, c, gn1g_ref[...], gn1b_ref[...]))
        # 3x3 aggreg conv C -> C/2: 9 sublane rolls + boundary masks.
        # flax SAME conv: out[y,x] = sum_{ky,kx} in[y+ky-1, x+kx-1] W[ky,kx]
        h = h.astype(dtype)
        yi = (jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % s) // 7
        xi = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % 7
        acc = jnp.broadcast_to(agb_ref[...].astype(jnp.float32), (m, ca))
        taps = ((1, 1),) if skip_agg else tuple(
            (ky, kx) for ky in range(3) for kx in range(3))
        for ky, kx in taps:
            dy, dx = ky - 1, kx - 1
            shift = dy * 7 + dx
            # Mosaic rejects roll(0) (lowers to a 0-size slice)
            shifted = jnp.roll(h, -shift, axis=0) if shift else h
            ok = ((yi + dy >= 0) & (yi + dy < 7)
                  & (xi + dx >= 0) & (xi + dx < 7))
            acc = acc + mm(shifted * ok.astype(dtype),
                           ag_ref[ky * 3 + kx])
        a = _leaky(maybe_gn(acc, ca, gng_ref[...], gnb_ref[...]))
        # fc6 (weights pre-permuted to (p,q,c)-flat rows) -> fc7 -> heads
        a = a.astype(dtype).reshape(t, s, ca).reshape(t, s * ca)
        f = jnp.maximum(mm(a, fc6_ref[...]) + fc6b_ref[...], 0.0)
        f = jnp.maximum(mm(f, fc7_ref[...]) + fc7b_ref[...], 0.0)
        # output lanes are padded to 128 (tiling); weights are pre-padded
        logits_ref[...] = (mm(f, cls_ref[...]) + clsb_ref[...]).astype(
            logits_ref.dtype)
        deltas_ref[...] = (mm(f, box_ref[...]) + boxb_ref[...]).astype(
            deltas_ref.dtype)

    return kernel


def _pick_t(p: int) -> int:
    """Largest multiple-of-8 divisor of the per-image ROI count with a
    bounded block (output blocks need 8-divisible sublanes). Returns 0 if
    none exists (caller falls back to the XLA head)."""
    cap = int(os.environ.get("ONESHOT_ROI_HEAD_T", "200"))
    best = 0
    for t in range(8, min(p, cap) + 1, 8):
        if p % t == 0:
            best = t
    return best


def roi_head_params_from_module(params) -> dict:
    """Extract the flax ROIBoxHeadNet param dict into kernel operands."""
    def k(*names):
        node = params
        for n in names:
            node = node[n]
        return node

    fc6 = k("fc6", "kernel")                       # ((c,p,q)-flat, 1024)
    ca = k("aggreg", "kernel").shape[-1]           # C/2
    # permute fc6 rows from the checkpoint's torch (c,p,q)-flat order to the
    # kernel's (p,q,c)-flat order (traceable: runs under jit per forward)
    fc6_perm = jnp.asarray(fc6).reshape(ca, 7, 7, -1).transpose(
        1, 2, 0, 3).reshape(49 * ca, -1)
    return {
        "c0": k("compress_0", "kernel")[0, 0],     # (2C, 2C)
        "c0b": k("compress_0", "bias"),
        "gn0g": k("compress_gn0", "scale"),
        "gn0b": k("compress_gn0", "bias"),
        "c1": k("compress_1", "kernel")[0, 0],     # (2C, C)
        "c1b": k("compress_1", "bias"),
        "gn1g": k("compress_gn1", "scale"),
        "gn1b": k("compress_gn1", "bias"),
        "ag": jnp.asarray(k("aggreg", "kernel")).reshape(9, -1, ca),
        "agb": k("aggreg", "bias"),
        "gng": k("aggreg_gn", "scale"),
        "gnb": k("aggreg_gn", "bias"),
        "fc6": jnp.asarray(fc6_perm),
        "fc6b": k("fc6", "bias"),
        "fc7": k("fc7", "kernel"),
        "fc7b": k("fc7", "bias"),
        "cls": k("cls_score", "kernel"),
        "clsb": k("cls_score", "bias"),
        "box": k("bbox_pred", "kernel"),
        "boxb": k("bbox_pred", "bias"),
    }


@functools.partial(jax.jit, static_argnames=("per_image", "interpret"))
def pallas_roi_head(roi_feats, supp_7x7, w: dict, per_image: int,
                    interpret: bool = False):
    """(R, 7, 7, C) pooled ROI features + (B, 7, 7, C) per-image supports
    -> ((R, ncls) logits, (R, 4*nreg) deltas). R = B * per_image."""
    r = roi_feats.shape[0]
    c = roi_feats.shape[-1]
    b = supp_7x7.shape[0]
    assert r == b * per_image, (r, b, per_image)
    dtype = roi_feats.dtype
    if dtype == jnp.float32:
        precision = jax.lax.Precision.HIGHEST
    else:
        precision = None
    t = _pick_t(per_image)
    assert t > 0, f"per_image={per_image} has no usable block size"
    nb = r // t
    ncls = w["cls"].shape[-1]
    nreg4 = w["box"].shape[-1]
    # GN scale/bias stay f32 (applied on f32 rows); matmul weights are
    # pre-cast to the kernel dtype so the VMEM-resident copies are native
    w = {kk: (vv if kk.startswith("gn") or kk.endswith("b")
              else jnp.asarray(vv).astype(dtype)) for kk, vv in w.items()}
    # pad the tiny head outputs to the 128-lane tile
    cls_p = jnp.pad(w["cls"], ((0, 0), (0, 128 - ncls)))
    clsb_p = jnp.pad(w["clsb"], (0, 128 - ncls))
    box_p = jnp.pad(w["box"], ((0, 0), (0, 128 - nreg4)))
    boxb_p = jnp.pad(w["boxb"], (0, 128 - nreg4))

    # support half of compress_0, once per image in XLA (B, 49, 2C)
    supp_flat = supp_7x7.reshape(b, 49, c)
    yb = (
        jnp.einsum("bsc,cf->bsf", supp_flat.astype(jnp.float32),
                   w["c0"][c:].astype(jnp.float32))
        + w["c0b"].astype(jnp.float32)
    ).astype(dtype)

    kernel = _make_kernel(t, c, dtype, precision)

    def wspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda k, _nd=nd: (0,) * _nd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((t, 7, 7, c), lambda k: (k, 0, 0, 0)),
            pl.BlockSpec((1, 49, 2 * c),
                         lambda k: (k * t // per_image, 0, 0)),
            wspec(w["c0"][:c].shape),
            wspec(w["gn0g"].shape), wspec(w["gn0b"].shape),
            wspec(w["c1"].shape), wspec(w["c1b"].shape),
            wspec(w["gn1g"].shape), wspec(w["gn1b"].shape),
            wspec(w["ag"].shape), wspec(w["agb"].shape),
            wspec(w["gng"].shape), wspec(w["gnb"].shape),
            wspec(w["fc6"].shape), wspec(w["fc6b"].shape),
            wspec(w["fc7"].shape), wspec(w["fc7b"].shape),
            wspec(cls_p.shape), wspec(clsb_p.shape),
            wspec(box_p.shape), wspec(boxb_p.shape),
        ],
        out_specs=[
            pl.BlockSpec((t, 128), lambda k: (k, 0)),
            pl.BlockSpec((t, 128), lambda k: (k, 0)),
        ],
    )
    logits, deltas = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((r, 128), jnp.float32),
            jax.ShapeDtypeStruct((r, 128), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 110),
        ),
    )(roi_feats, yb, w["c0"][:c], w["gn0g"], w["gn0b"], w["c1"], w["c1b"],
      w["gn1g"], w["gn1b"], w["ag"], w["agb"], w["gng"], w["gnb"],
      w["fc6"], w["fc6b"], w["fc7"], w["fc7b"], cls_p, clsb_p,
      box_p, boxb_p)
    return logits[:, :ncls], deltas[:, :nreg4]
