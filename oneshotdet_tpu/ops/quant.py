"""Opt-in int8 inference quantization for the conv stack (TPU.QUANT).

v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 rate; the eval cost
model (CLAUDE.md) puts backbone + FPN + FCOS towers at ~26.6 ms of the
67 ms batch-8 forward, so halving their MXU time is the largest single
lever left below the bf16 roofline (BASELINE.md roofline note).

Scheme (weight-static / activation-dynamic symmetric quantization):
  - weights: per-OUTPUT-CHANNEL scale  s_w[o] = max|W[..., o]| / 127,
    quantized once per apply (cheap relative to activations);
  - activations: per-TENSOR dynamic scale s_a = max|x| / 127 computed on
    the fly (a single reduction, fused by XLA);
  - conv in int8 with int32 accumulation (preferred_element_type), then
    dequantize y * (s_a * s_w) and add bias in float.

``QuantConv8`` mirrors flax ``nn.Conv``'s parameter naming and layout
("kernel" HWIO, optional "bias"), so reference-imported checkpoints load
unchanged; it is substituted for nn.Conv only when the module's ``quant``
field says so — the default bf16/f32 path is untouched.

Rebuilds nothing from the reference directly (the reference has no
quantized path); the conv stack being quantized mirrors
maskrcnn_benchmark/modeling/backbone/resnet.py:318-390 + rpn/fcos/fcos.py
tower convs.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


def quantize_weight_per_channel(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(kh, kw, cin, cout) float -> (int8 weights, (cout,) f32 scales)."""
    wf = w.astype(jnp.float32)
    wscale = jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0 + 1e-12
    wq = jnp.clip(jnp.round(wf / wscale), -127, 127).astype(jnp.int8)
    return wq, wscale


def quantize_activation(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor dynamic symmetric quantization to int8."""
    xf = x.astype(jnp.float32)
    ascale = jnp.max(jnp.abs(xf)) / 127.0 + 1e-12
    xq = jnp.clip(jnp.round(xf / ascale), -127, 127).astype(jnp.int8)
    return xq, ascale


def int8_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Sequence[int],
    padding: Union[str, Sequence[Tuple[int, int]]],
    kernel_dilation: Sequence[int] = (1, 1),
) -> jnp.ndarray:
    """Dynamic-activation int8 conv; returns f32 (dequantized)."""
    wq, wscale = quantize_weight_per_channel(kernel)
    xq, ascale = quantize_activation(x)
    y = jax.lax.conv_general_dilated(
        xq, wq, tuple(strides), padding,
        rhs_dilation=tuple(kernel_dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (ascale * wscale)


class QuantConv8(nn.Module):
    """Drop-in int8 replacement for ``nn.Conv`` (NHWC/HWIO, same params)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    kernel_dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features)
        )
        y = int8_conv(x, kernel, self.strides, self.padding, self.kernel_dilation)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias
        return y.astype(self.dtype)


def int8_dot(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x: (..., K) float, w: (K, F) float -> (..., F) f32 via int8 MXU.

    Per-output-column weight scales + per-tensor dynamic activation scale,
    int32 accumulation — same scheme as ``int8_conv``.
    """
    wf = w.astype(jnp.float32)
    wscale = jnp.max(jnp.abs(wf), axis=0) / 127.0 + 1e-12
    wq = jnp.clip(jnp.round(wf / wscale), -127, 127).astype(jnp.int8)
    xq, ascale = quantize_activation(x)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (ascale * wscale)


class QuantDense8(nn.Module):
    """Drop-in int8 replacement for ``nn.Dense`` (same param names/shapes)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        y = int8_dot(x, kernel)
        if self.use_bias:
            y = y + self.param("bias", self.bias_init, (self.features,))
        return y.astype(self.dtype)


def make_dense(quant: str, **kw):
    """Factory: nn.Dense for quant='none', QuantDense8 for quant='int8'."""
    if quant == "int8":
        return QuantDense8(**kw)
    if quant in ("", "none", None):
        return nn.Dense(**kw)
    raise ValueError(f"unknown TPU.QUANT mode: {quant!r}")


def make_conv(quant: str, **kw):
    """Factory: nn.Conv for quant='none', QuantConv8 for quant='int8'.

    Accepts the nn.Conv keyword surface used in this repo (features,
    kernel_size, strides, padding, kernel_dilation, use_bias, dtype,
    kernel_init, bias_init, name).
    """
    if quant == "int8":
        return QuantConv8(**kw)
    if quant in ("", "none", None):
        return nn.Conv(**kw)
    raise ValueError(f"unknown TPU.QUANT mode: {quant!r}")
