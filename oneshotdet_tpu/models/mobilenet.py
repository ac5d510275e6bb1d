"""MobileNetV2 backbone (reference: modeling/backbone/mobilenet.py).

Standard inverted-residual MobileNetV2 returning the four feature stages the
FPN consumes (strides 4, 8, 16, 32) — the registered light alternative to
ResNet ("MNV2-FPN-RETINANET", backbone/backbone.py:75-95).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

# (expansion t, out channels c, repeats n, stride s) — MobileNetV2 paper
INVERTED_RESIDUAL_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)
# stage boundaries whose outputs feed the FPN (stride 4/8/16/32 endpoints)
RETURN_AFTER_BLOCK = {1: 0, 2: 1, 4: 2, 6: 3}  # setting index -> feature slot


def _make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            feature_group_count=self.groups, use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype)(x)
        return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        use_res = self.stride == 1 and inp == self.out_channels
        out = x
        if self.expand_ratio != 1:
            out = ConvBNReLU6(hidden, kernel=1, dtype=self.dtype)(out)
        out = ConvBNReLU6(hidden, kernel=3, stride=self.stride, groups=hidden,
                          dtype=self.dtype)(out)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=True, dtype=self.dtype)(out)
        return x + out if use_res else out


class MobileNetV2(nn.Module):
    """Returns 4 feature maps at strides 4/8/16/32."""

    width_mult: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        input_channel = _make_divisible(32 * self.width_mult)
        x = ConvBNReLU6(input_channel, kernel=3, stride=2, dtype=self.dtype)(x)
        outputs = []
        for idx, (t, c, n, s) in enumerate(INVERTED_RESIDUAL_SETTING):
            out_ch = _make_divisible(c * self.width_mult)
            for i in range(n):
                x = InvertedResidual(
                    out_ch, s if i == 0 else 1, t, dtype=self.dtype
                )(x)
            if idx in RETURN_AFTER_BLOCK:
                outputs.append(x)
        return tuple(outputs)

    @staticmethod
    def return_features_num_channels(width_mult: float = 1.0):
        return [_make_divisible(c * width_mult) for c in (24, 32, 96, 320)]
