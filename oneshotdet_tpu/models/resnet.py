"""ResNet backbone (flax/NHWC), Caffe2-convention.

Reimplements the config-driven ResNet of
maskrcnn_benchmark/modeling/backbone/resnet.py with the conventions the
pretrained Caffe2/torch weights assume:

  - stem: 7x7 s2 conv (no bias) + FrozenBN + ReLU + 3x3 s2 maxpool
    (resnet.py:318-337);
  - BottleneckWithFixedBatchNorm: 1x1 (stride here when STRIDE_IN_1X1,
    resnet.py:263) + 3x3 + 1x1x4, FrozenBN after each, ReLU after the
    residual add; 1x1-strided FrozenBN downsample on the first block of a
    stage (resnet.py:218-316);
  - stage strides: res2 = 1, res3..5 = 2 (first block);
  - all BN statistics frozen (constants collection, see layers.FrozenBatchNorm).

Parameter freezing (FREEZE_CONV_BODY_AT, resnet.py:127-136) is functional
here: `frozen_param_paths` returns the path prefixes whose gradients the
optimizer masks to zero — the pjit-friendly analog of requires_grad=False.

Module names mirror the torch names (stem/layer1..4/0..n/conv1..3/bn1..3/
downsample) so checkpoint import is a mechanical rename.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import FrozenBatchNorm

# (blocks per stage) for each depth
STAGE_BLOCKS = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


def _conv(features, kernel, stride=1, name=None, dtype=jnp.float32,
          quant="none"):
    from ..ops.quant import make_conv

    return make_conv(
        quant,
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        dtype=dtype,
        kernel_init=nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
        name=name,
    )


class Bottleneck(nn.Module):
    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    dtype: Any = jnp.float32
    quant: str = "none"  # TPU.QUANT: "int8" quantizes every block conv

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        identity = x
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)

        out = _conv(self.bottleneck_channels, 1, s1, name="conv1",
                    dtype=self.dtype, quant=self.quant)(x)
        out = FrozenBatchNorm(self.bottleneck_channels, name="bn1", dtype=self.dtype)(out)
        out = nn.relu(out)

        from ..ops.quant import make_conv

        out = make_conv(
            self.quant,
            features=self.bottleneck_channels,
            kernel_size=(3, 3),
            strides=(s3, s3),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = FrozenBatchNorm(self.bottleneck_channels, name="bn2", dtype=self.dtype)(out)
        out = nn.relu(out)

        out = _conv(self.out_channels, 1, 1, name="conv3", dtype=self.dtype,
                    quant=self.quant)(out)
        out = FrozenBatchNorm(self.out_channels, name="bn3", dtype=self.dtype)(out)

        if in_channels != self.out_channels or self.stride != 1:
            identity = _conv(self.out_channels, 1, self.stride,
                             name="downsample_conv", dtype=self.dtype,
                             quant=self.quant)(x)
            identity = FrozenBatchNorm(self.out_channels, name="downsample_bn", dtype=self.dtype)(identity)

        return nn.relu(out + identity)


class _StemConv(nn.Module):
    """7x7/2 stem conv, evaluated via space-to-depth when H and W are even.

    A 3-channel 7x7 conv puts a contraction depth of 3 on a 128-deep MXU
    (~2% utilization — measured ~9 ms/batch8 at 832x1216 on v5e). Regrouping
    pixels into 2x2 blocks (12 channels) turns it into an exactly-equivalent
    4x4/1 conv with contraction depth 192: out[i,j] = sum_{dy,dx,c}
    x[2i+dy-3, 2j+dx-3, c] * W[dy,dx,c] regroups rows as 2p+a, so each tap
    (dy -> py=(dy-3-a)//2+2, a=(dy+1)%2) lands in a unique (py, a) slot of a
    4x4 kernel over the 2x2-blocked input with asymmetric padding (2, 1).
    The parameter keeps nn.Conv's name/layout ("kernel", (7,7,C,O)) so
    checkpoint import is unaffected; the regrouped kernel is formed on the
    fly from two tiny 8x7 selection matmuls.
    """

    out_channels: int = 64
    in_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = self.in_channels
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (7, 7, cin, self.out_channels),
        )
        b, h, w, c = x.shape
        pre_blocked = c == 4 * cin  # input pipeline already did space_to_depth
        if not pre_blocked and (h % 2 or w % 2):
            return jax.lax.conv_general_dilated(
                x, kernel.astype(self.dtype), (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # tap -> (slot, parity) selection (constant folded at trace time)
        sel = np.zeros((8, 7), np.float32)
        for d in range(7):
            a = (d + 1) % 2
            sel[((d - 3 - a) // 2 + 2) * 2 + a, d] = 1.0
        sel = jnp.asarray(sel)
        k2 = jnp.einsum("yd,xe,deco->yxco", sel, sel, kernel)
        k2 = (k2.reshape(4, 2, 4, 2, cin, self.out_channels)
                .transpose(0, 2, 1, 3, 4, 5)
                .reshape(4, 4, 4 * cin, self.out_channels))
        if pre_blocked:
            x2 = x
        else:
            x2 = (x.reshape(b, h // 2, 2, w // 2, 2, cin)
                   .transpose(0, 1, 3, 2, 4, 5)
                   .reshape(b, h // 2, w // 2, 4 * cin))
        return jax.lax.conv_general_dilated(
            x2.astype(self.dtype), k2.astype(self.dtype), (1, 1),
            [(2, 1), (2, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Stem(nn.Module):
    out_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _StemConv(self.out_channels, name="conv1", dtype=self.dtype)(x)
        x = FrozenBatchNorm(self.out_channels, name="bn1", dtype=self.dtype)(x)
        x = nn.relu(x)
        # torch max_pool2d(kernel=3, stride=2, padding=1): pad with -inf
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        return x


class ResNet(nn.Module):
    """Returns (C2, C3, C4, C5) feature maps, NHWC."""

    depth: int = 50
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    width_per_group: int = 64
    num_groups: int = 1
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    dtype: Any = jnp.float32
    # TPU.QUANT: int8 path for every bottleneck conv; the stem stays in the
    # compute dtype (one conv, s2d-regrouped, small share of the cost)
    quant: str = "none"

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = Stem(self.stem_out_channels, name="stem", dtype=self.dtype)(x)
        outputs = []
        blocks = STAGE_BLOCKS[self.depth]
        for stage_idx, n_blocks in enumerate(blocks, start=1):
            mult = 2 ** (stage_idx - 1)
            out_ch = self.res2_out_channels * mult
            bottleneck_ch = self.num_groups * self.width_per_group * mult
            stride = 1 if stage_idx == 1 else 2
            dilation = self.res5_dilation if stage_idx == 4 else 1
            if dilation > 1:
                stride = 1
            for b in range(n_blocks):
                x = Bottleneck(
                    bottleneck_channels=bottleneck_ch,
                    out_channels=out_ch,
                    stride=stride if b == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1,
                    dilation=dilation,
                    dtype=self.dtype,
                    quant=self.quant,
                    name=f"layer{stage_idx}_{b}",
                )(x)
            outputs.append(x)
        return tuple(outputs)


def frozen_param_paths(freeze_at: int = 2) -> Tuple[str, ...]:
    """Path prefixes to freeze, matching _freeze_backbone (resnet.py:127-136).

    freeze_at=2 freezes the stem and layer1 (stage 0 = stem convention).
    Returns prefixes relative to the ResNet module ('stem', 'layer1', ...).
    """
    prefixes = []
    for stage_index in range(freeze_at):
        prefixes.append("stem" if stage_index == 0 else f"layer{stage_index}")
    return tuple(prefixes)


class ResNetHead(nn.Module):
    """C4-style head (resnet.py:148-195): runs res5 on pooled ROI features —
    used by the C4 feature extractors (ResNet50Conv5ROIFeatureExtractor)."""

    stage: int = 4                 # which stage (res5 = index 4)
    block_count: int = 3
    res2_out_channels: int = 256
    width_per_group: int = 64
    num_groups: int = 1
    stride_in_1x1: bool = True
    stride_init: int = 2
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mult = 2 ** (self.stage - 1)
        out_ch = self.res2_out_channels * mult
        bottleneck_ch = self.num_groups * self.width_per_group * mult
        stride = self.stride_init
        for b in range(self.block_count):
            x = Bottleneck(
                bottleneck_channels=bottleneck_ch,
                out_channels=out_ch,
                stride=stride if b == 0 else 1,
                stride_in_1x1=self.stride_in_1x1,
                dilation=self.dilation,
                dtype=self.dtype,
                name=f"layer{self.stage}_{b}",
            )(x)
        return x
