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


# ---------------------------------------------------------------------------
# Weight-only int8 (TPU.QUANT="int8_weight")
#
# Round 3 measured the dynamic-activation scheme above as an end-to-end
# REGRESSION on v5e (103.2 vs 121.7 img/s): the per-conv abs-max reduce +
# round/clip write of every activation costs more HBM traffic than the int8
# MXU rate saves. Weight-only quantization avoids that failure mode entirely:
#   - weights are quantized OFFLINE (``quantize_weights_int8_``) to int8 with
#     static per-output-channel scales stored in a ``quant_scales`` collection;
#   - at apply time the int8 kernel is dequantized INTO the conv
#     (``kernel.astype(bf16) * scale`` — XLA fuses the convert+scale as a
#     producer of the conv, so HBM reads the kernel as int8);
#   - activations stay bf16: zero extra activation passes, conv runs at the
#     normal bf16 MXU rate; the win is halved weight traffic + smaller
#     checkpoints, the cost is weight rounding error only.
# A fresh (un-transformed) float tree fake-quantizes per call so numerics are
# identical with or without the offline transform.
# ---------------------------------------------------------------------------
QUANT_SCALES_COLLECTION = "quant_scales"


def fake_quant_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """float kernel -> (int8 kernel, f32 per-cout scales); last dim = cout."""
    wf = w.astype(jnp.float32)
    axes = tuple(range(w.ndim - 1))
    wscale = jnp.max(jnp.abs(wf), axis=axes) / 127.0 + 1e-12
    wq = jnp.clip(jnp.round(wf / wscale), -127, 127).astype(jnp.int8)
    return wq, wscale


def _dequant_or_fake_quant(mod: nn.Module, kernel: jnp.ndarray,
                           features: int, dtype) -> jnp.ndarray:
    """Shared kernel-path logic for the WeightQuant modules.

    - int8 kernel (offline-transformed tree): dequantize with the stored
      per-cout scale — XLA fuses convert+scale into the consumer, so HBM
      reads int8.
    - float kernel: fake-quantize per call (identical numerics); at init
      time also declare the ``quant_scales`` entry so the offline transform
      knows which kernels to quantize. A float CHECKPOINT tree without the
      collection still applies cleanly (the scale is never read).
    """
    if kernel.dtype == jnp.int8:
        scale = mod.variable(
            QUANT_SCALES_COLLECTION, "kernel_scale",
            lambda: jnp.ones((features,), jnp.float32)).value
        return kernel.astype(dtype) * scale.astype(dtype)
    if mod.is_initializing():
        mod.variable(QUANT_SCALES_COLLECTION, "kernel_scale",
                     lambda: jnp.ones((features,), jnp.float32))
    wq, ws = fake_quant_weight(kernel)
    return wq.astype(dtype) * ws.astype(dtype)


class WeightQuantConv8(nn.Module):
    """nn.Conv with int8-stored weights, bf16/f32 activations.

    Same param surface as ``nn.Conv`` ("kernel" HWIO, optional "bias") so
    reference-imported checkpoints load unchanged; a per-cout scale lives in
    the ``quant_scales`` collection (ones at init; filled together with the
    int8 cast by ``quantize_weights_int8``).
    """

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
        w = _dequant_or_fake_quant(self, kernel, self.features, self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, tuple(self.strides), self.padding,
            rhs_dilation=tuple(self.kernel_dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param(
                "bias", self.bias_init, (self.features,)).astype(self.dtype)
        return y.astype(self.dtype)


class WeightQuantDense8(nn.Module):
    """nn.Dense with int8-stored weights, bf16/f32 activations."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        w = _dequant_or_fake_quant(self, kernel, self.features, self.dtype)
        y = jnp.dot(x.astype(self.dtype), w)
        if self.use_bias:
            y = y + self.param(
                "bias", self.bias_init, (self.features,)).astype(self.dtype)
        return y.astype(self.dtype)


def quantize_weights_int8(variables):
    """Offline weight-only transform for a TPU.QUANT='int8_weight' model.

    For every module that declared a ``quant_scales`` entry at init (i.e.
    every WeightQuantConv8/WeightQuantDense8), casts its float "kernel" param
    to int8 and writes the per-cout scale. Returns a new variables dict;
    leaves every other param (biases, GN, predictors, SplitDot) untouched.
    Run OUTSIDE jit, once, after init/checkpoint load.
    """
    import flax.traverse_util as trav

    if QUANT_SCALES_COLLECTION not in variables:
        return variables
    params = dict(trav.flatten_dict(variables["params"]))
    scales = dict(trav.flatten_dict(variables[QUANT_SCALES_COLLECTION]))
    for spath in scales:
        assert spath[-1] == "kernel_scale", spath
        kpath = spath[:-1] + ("kernel",)
        k = params[kpath]
        if k.dtype == jnp.int8:  # already transformed
            continue
        wq, ws = fake_quant_weight(k)
        params[kpath] = wq
        scales[spath] = ws
    out = dict(variables)
    out["params"] = trav.unflatten_dict(params)
    out[QUANT_SCALES_COLLECTION] = trav.unflatten_dict(scales)
    return out


def make_dense(quant: str, **kw):
    """Factory: nn.Dense ('none'), QuantDense8 ('int8' dynamic-activation),
    WeightQuantDense8 ('int8_weight')."""
    if quant == "int8":
        return QuantDense8(**kw)
    if quant == "int8_weight":
        return WeightQuantDense8(**kw)
    if quant in ("", "none", None):
        return nn.Dense(**kw)
    raise ValueError(f"unknown TPU.QUANT mode: {quant!r}")


def make_conv(quant: str, **kw):
    """Factory: nn.Conv ('none'), QuantConv8 ('int8' dynamic-activation),
    WeightQuantConv8 ('int8_weight' static weight-only).

    Accepts the nn.Conv keyword surface used in this repo (features,
    kernel_size, strides, padding, kernel_dilation, use_bias, dtype,
    kernel_init, bias_init, name).
    """
    if quant == "int8":
        return QuantConv8(**kw)
    if quant == "int8_weight":
        return WeightQuantConv8(**kw)
    if quant in ("", "none", None):
        return nn.Conv(**kw)
    raise ValueError(f"unknown TPU.QUANT mode: {quant!r}")
