"""Pallas fused GroupNorm(+activation) for TPU.

GroupNorm with 32 groups over 256 channels reduces over 8-lane channel
slivers — XLA lowers it to ~12x the memory-bound cost (measured ~0.95 ms per
layer on P3-sized maps where ~0.08 ms is the traffic). The FCOS towers alone
contain 8 GN layers, the relation head 3 more, so GN is the second-largest
eval cost after ROI pooling.

This kernel splits GN into two lane-friendly passes:
  1. moments: per-channel sum and sum-of-squares accumulated across
     spatial blocks (one read of x);
  2. normalize: (x - mean) * inv * gamma + beta fused with the following
     ReLU / LeakyReLU (one read + one write).
The tiny per-group reduction of the (B, 2, C) moments happens in XLA between
the two pallas_calls. Total traffic = 3 passes over x, the memory-bound
minimum for a two-pass normalizer.

Backward runs through a custom VJP using the standard recompute-based GN
gradient in plain jnp (training throughput is not eval-critical); forward
falls back to a jnp implementation off-TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_roi_align import pallas_enabled


def _largest_divisor_leq(n: int, cap: int) -> int:
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


def _act(x, act: Optional[str], slope: float):
    if act == "relu":
        return jnp.maximum(x, 0.0)
    if act == "leaky":
        return jnp.where(x >= 0, x, x * slope)
    return x


def _moments_kernel(x_ref, out_ref):
    i = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # (SB, C)
    s1 = jnp.sum(x, axis=0, keepdims=True)        # (1, C)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0, 0:1, :] += s1
    out_ref[0, 1:2, :] += s2


def _make_normalize_kernel(act, slope):
    def kernel(x_ref, mean_ref, inv_ref, gamma_ref, beta_ref, out_ref):
        x = x_ref[0].astype(jnp.float32)
        y = (x - mean_ref[0, 0]) * inv_ref[0, 0] * gamma_ref[0, 0] + beta_ref[0, 0]
        out_ref[0] = _act(y, act, slope).astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def group_norm_act(x, gamma, beta, num_groups=32, eps=1e-5, act=None, slope=0.2):
    """Fused GroupNorm + optional activation.

    x: (..., C) with C % num_groups == 0; statistics over all non-batch axes
    within each channel group (flax nn.GroupNorm semantics for NHWC inputs
    with a leading batch axis).
    """
    return _gn_forward(x, gamma, beta, num_groups, eps, act, slope)[0]


def _stats(x, num_groups, eps):
    b = x.shape[0]
    c = x.shape[-1]
    cpg = c // num_groups
    xf = x.reshape(b, -1, c).astype(jnp.float32)
    n = xf.shape[1] * cpg
    s1 = xf.sum(axis=1)
    s2 = (xf * xf).sum(axis=1)
    g1 = s1.reshape(b, num_groups, cpg).sum(-1) / n
    g2 = s2.reshape(b, num_groups, cpg).sum(-1) / n
    inv = jax.lax.rsqrt(jnp.maximum(g2 - g1 * g1, 0.0) + eps)
    mean_c = jnp.repeat(g1, cpg, axis=1)   # (B, C)
    inv_c = jnp.repeat(inv, cpg, axis=1)
    return mean_c, inv_c


def _gn_jnp(x, gamma, beta, num_groups, eps, act, slope):
    mean_c, inv_c = _stats(x, num_groups, eps)
    shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    y = (x.astype(jnp.float32) - mean_c.reshape(shape)) * inv_c.reshape(shape)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return _act(y, act, slope).astype(x.dtype), mean_c, inv_c


def _gn_pallas(x, gamma, beta, num_groups, eps, act, slope):
    orig_shape = x.shape
    b = x.shape[0]
    c = x.shape[-1]
    cpg = c // num_groups
    xs = x.reshape(b, -1, c)
    s = xs.shape[1]
    sb = _largest_divisor_leq(s, 2048)
    grid = (b, s // sb)

    moments = pl.pallas_call(
        _moments_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((1, sb, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(xs)

    n = s * cpg
    g1 = moments[:, 0].reshape(b, num_groups, cpg).sum(-1) / n
    g2 = moments[:, 1].reshape(b, num_groups, cpg).sum(-1) / n
    inv = jax.lax.rsqrt(jnp.maximum(g2 - g1 * g1, 0.0) + eps)
    mean_c = jnp.repeat(g1, cpg, axis=1)          # (B, C)
    inv_c = jnp.repeat(inv, cpg, axis=1)

    # per-image row vectors as (B, 1, C): TPU blocks need the last two
    # dims (1, C) to match or tile (8, 128)
    gamma2 = jnp.broadcast_to(gamma.astype(jnp.float32)[None, None], (b, 1, c))
    beta2 = jnp.broadcast_to(beta.astype(jnp.float32)[None, None], (b, 1, c))
    mean3 = mean_c[:, None, :]
    inv3 = inv_c[:, None, :]

    row_spec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_normalize_kernel(act, slope),
        out_shape=jax.ShapeDtypeStruct(xs.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, sb, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((1, sb, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )(xs, mean3, inv3, gamma2, beta2)
    return out.reshape(orig_shape), mean_c, inv_c


def _gn_forward(x, gamma, beta, num_groups, eps, act, slope):
    # Measured verdict (v5e, full model): XLA fuses GN into the surrounding
    # convs well enough that this kernel's fusion-barrier cost cancels its
    # standalone 1.7x win — so the Pallas path is opt-in (ONESHOT_PALLAS_GN=1)
    # and only for big-map/few-image inputs; everything else runs the XLA
    # formula.
    import os

    spatial = 1
    for d in x.shape[1:-1]:
        spatial *= d
    if (os.environ.get("ONESHOT_PALLAS_GN") == "1" and pallas_enabled()
            and spatial >= 512 and x.shape[0] <= 64):
        out, mean_c, inv_c = _gn_pallas(x, gamma, beta, num_groups, eps, act, slope)
    else:
        out, mean_c, inv_c = _gn_jnp(x, gamma, beta, num_groups, eps, act, slope)
    return out, (x, gamma, beta, mean_c, inv_c)


def _gn_fwd(x, gamma, beta, num_groups, eps, act, slope):
    out, res = _gn_forward(x, gamma, beta, num_groups, eps, act, slope)
    return out, res


def _gn_bwd(num_groups, eps, act, slope, res, dy):
    x, gamma, beta, mean_c, inv_c = res
    b = x.shape[0]
    c = x.shape[-1]
    cpg = c // num_groups
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)

    mean_b = mean_c.reshape(shape)
    inv_b = inv_c.reshape(shape)
    xhat = (xf - mean_b) * inv_b
    pre_act = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if act == "relu":
        dyf = dyf * (pre_act > 0)
    elif act == "leaky":
        dyf = dyf * jnp.where(pre_act >= 0, 1.0, slope)

    reduce_axes = tuple(range(x.ndim - 1))
    dgamma = (dyf * xhat).sum(axis=reduce_axes)
    dbeta = dyf.sum(axis=reduce_axes)

    # dx for group norm: standard formula over each group
    dxhat = dyf * gamma.astype(jnp.float32)
    dxh_g = dxhat.reshape(b, -1, num_groups, cpg)
    xhat_g = xhat.reshape(b, -1, num_groups, cpg)
    n = dxh_g.shape[1] * cpg
    m1 = dxh_g.mean(axis=(1, 3), keepdims=True)
    m2 = (dxh_g * xhat_g).mean(axis=(1, 3), keepdims=True)
    dx_g = (dxh_g - m1 - xhat_g * m2) * inv_c.reshape(b, 1, num_groups, cpg)
    dx = dx_g.reshape(x.shape).astype(x.dtype)
    return dx, dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype)


group_norm_act.defvjp(_gn_fwd, _gn_bwd)
