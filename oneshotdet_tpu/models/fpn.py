"""Feature Pyramid Network (flax/NHWC).

Reimplements maskrcnn_benchmark/modeling/backbone/fpn.py for the one-shot
configuration `R-50-FPN-RETINANET` (backbone/backbone.py:49-73):

  - lateral 1x1 convs on C3, C4, C5 (the C2 lateral is skipped —
    in_channels_list starts with 0);
  - top-down pathway with 2x nearest-neighbor upsampling + add;
  - 3x3 output convs → P3, P4, P5;
  - LastLevelP6P7: P6 = 3x3 s2 conv on P5 (USE_C5=False) and
    P7 = 3x3 s2 conv on relu(P6) (fpn.py:85-99).

Conv init is kaiming-uniform(a=1) with zero bias, matching
conv_with_kaiming_uniform (modeling/make_layers.py:99-122).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _kaiming_uniform_a1():
    # torch kaiming_uniform_(a=1): gain = sqrt(2/(1+a^2)) = 1, fan_in mode,
    # bound = sqrt(3)*gain/sqrt(fan_in) == variance_scaling(1/3*... ) —
    # variance_scaling(scale=1/3... ). torch uniform bound implies variance
    # gain^2/fan_in * 3/3; variance_scaling('uniform') samples with
    # var = scale/fan_in, so scale = gain^2 = 1.0 gives bound sqrt(3/fan_in).
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _conv(features, kernel, stride=1, name=None, dtype=jnp.float32,
          quant="none"):
    from ..ops.quant import make_conv

    return make_conv(
        quant,
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=True,
        dtype=dtype,
        kernel_init=_kaiming_uniform_a1(),
        bias_init=nn.initializers.zeros,
        name=name,
    )


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbor upsample, NHWC (F.interpolate mode='nearest')."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    """P3-P7 pyramid from (C2, C3, C4, C5).

    Attributes:
      out_channels: pyramid width (256).
      use_c5_for_p6: if True P6 comes from C5, else from P5 (USE_C5 flag).
    """

    out_channels: int = 256
    use_c5_for_p6: bool = False
    dtype: Any = jnp.float32
    quant: str = "none"  # TPU.QUANT int8 path for lateral/output convs

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        # Under a 2-D (data, model) mesh the lateral/top-down tensors get
        # explicit sharding constraints: the `last` tensor feeds TWO
        # consumers (output conv + next top-down add), and without pinned
        # shardings GSPMD resolves the backward's mismatched cotangent
        # `add_any` with an involuntary full rematerialization. No-op on a
        # 1-D mesh / off-mesh (parallel/sharding.py::constrain_spatial).
        from ..parallel.sharding import constrain_spatial

        c2, c3, c4, c5 = features
        # lateral (inner) convs — names follow the reference fpn_inner{2,3,4}
        # numbering over the non-skipped inputs (C3=2, C4=3, C5=4).
        inner3 = constrain_spatial(_conv(self.out_channels, 1, name="fpn_inner2", dtype=self.dtype, quant=self.quant)(c3))
        inner4 = constrain_spatial(_conv(self.out_channels, 1, name="fpn_inner3", dtype=self.dtype, quant=self.quant)(c4))
        inner5 = constrain_spatial(_conv(self.out_channels, 1, name="fpn_inner4", dtype=self.dtype, quant=self.quant)(c5))

        def top_down(lateral, top):
            up = upsample_nearest_2x(top)
            # crop to the lateral's extent — needed when the input is not
            # divisible by 32 (the reference asserts SIZE_DIVISIBILITY instead)
            up = up[:, : lateral.shape[1], : lateral.shape[2], :]
            return constrain_spatial(lateral + up)

        last = inner5
        p5 = constrain_spatial(_conv(self.out_channels, 3, name="fpn_layer4", dtype=self.dtype, quant=self.quant)(last))
        last = top_down(inner4, last)
        p4 = constrain_spatial(_conv(self.out_channels, 3, name="fpn_layer3", dtype=self.dtype, quant=self.quant)(last))
        last = top_down(inner3, last)
        p3 = constrain_spatial(_conv(self.out_channels, 3, name="fpn_layer2", dtype=self.dtype, quant=self.quant)(last))

        p6_in = c5 if self.use_c5_for_p6 else p5
        # p5/p6 each feed two consumers (pyramid output + the next top conv):
        # constrain them so the backward's cotangent sum has matching shards.
        p6 = constrain_spatial(_conv(self.out_channels, 3, stride=2, name="top_p6", dtype=self.dtype, quant=self.quant)(p6_in))
        p7 = constrain_spatial(_conv(self.out_channels, 3, stride=2, name="top_p7", dtype=self.dtype, quant=self.quant)(nn.relu(p6)))
        return (p3, p4, p5, p6, p7)


class ResNetFPN(nn.Module):
    """body + fpn composition = build_resnet_fpn_p3p7_backbone."""

    depth: int = 50
    out_channels: int = 256
    use_c5_for_p6: bool = False
    stride_in_1x1: bool = True
    dtype: Any = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        from .resnet import ResNet  # local import to avoid cycles

        cs = ResNet(
            depth=self.depth,
            stride_in_1x1=self.stride_in_1x1,
            dtype=self.dtype,
            quant=self.quant,
            name="body",
        )(x)
        return FPN(
            out_channels=self.out_channels,
            use_c5_for_p6=self.use_c5_for_p6,
            dtype=self.dtype,
            quant=self.quant,
            name="fpn",
        )(cs)
