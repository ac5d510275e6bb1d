"""Small shared layers (reference: maskrcnn_benchmark/layers/).

All modules are NHWC and dtype-polymorphic: params live in float32,
computation can run in bfloat16 (cfg.TPU.COMPUTE_DTYPE).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine params.

    Matches layers/batch_norm.py:19-24 exactly: ``scale = weight *
    rsqrt(running_var)`` (NO epsilon), ``bias = bias - running_mean * scale``.
    The four buffers live in the ``constants`` collection so they are never
    touched by the optimizer — the functional analog of torch buffers.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.variable("constants", "weight", nn.initializers.ones, None, (self.features,), jnp.float32).value
        bias = self.variable("constants", "bias", nn.initializers.zeros, None, (self.features,), jnp.float32).value
        mean = self.variable("constants", "running_mean", nn.initializers.zeros, None, (self.features,), jnp.float32).value
        var = self.variable("constants", "running_var", nn.initializers.ones, None, (self.features,), jnp.float32).value
        scale = weight * jax.lax.rsqrt(var)
        shift = bias - mean * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class Scale(nn.Module):
    """Per-level learnable scalar multiplier (layers/scale.py)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.constant(self.init_value), (), jnp.float32)
        return x * s.astype(x.dtype)


def group_norm(x, num_groups: int = 32, eps: float = 1e-5):
    """Functional 32-group GroupNorm matching make_layers.group_norm defaults."""
    return nn.GroupNorm(num_groups=num_groups, epsilon=eps)(x)


class FusedGroupNorm(nn.Module):
    """Drop-in nn.GroupNorm replacement backed by the Pallas fused kernel
    (ops/pallas_groupnorm.py); same param names (scale/bias) so checkpoint
    paths are unchanged. Optionally fuses the following activation."""

    features: int
    num_groups: int = 32
    epsilon: float = 1e-5
    act: str = ""          # "" | "relu" | "leaky"
    negative_slope: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas_groupnorm import group_norm_act

        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return group_norm_act(
            x, scale, bias, self.num_groups, self.epsilon,
            self.act or None, self.negative_slope,
        )


class ConvGNRelu(nn.Module):
    """3x3 conv + GroupNorm(32) + activation — the FCOS tower block
    (rpn/fcos/fcos.py:27-49) and head-aggregation block building unit."""

    features: int
    kernel: int = 3
    negative_slope: float = 0.0  # 0 -> ReLU, 0.2 -> LeakyReLU(0.2)
    dtype: Any = jnp.float32
    quant: str = "none"  # TPU.QUANT int8 path for the tower conv

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import make_conv

        # explicit name matches nn.Conv's auto-name so checkpoints load
        # unchanged whichever conv class is substituted
        x = make_conv(
            self.quant,
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            padding="SAME",
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros,
            name="Conv_0",
        )(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype)(x)
        if self.negative_slope > 0:
            x = nn.leaky_relu(x, self.negative_slope)
        else:
            x = nn.relu(x)
        return x
