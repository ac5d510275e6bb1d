"""FBNet config-driven mobile backbone zoo (reference: modeling/backbone/
fbnet.py, fbnet_builder.py, fbnet_modeldef.py).

The reference expresses each architecture as parallel lists (``block_op_type``
+ ``block_cfg``) that a stateful torch builder zips back together.  Here each
arch is a flat tuple of per-stage block specs ``(op, t, c, n, s)`` —
(primitive name, expansion, channels, repeats, stride) — consumed by pure
functions, and the blocks are flax modules in NHWC.  Functionally equivalent
surface:

- primitives: skip, ir_k{1,3,5,7} (+_e{1,3,6}, _s{2,4} shuffle, _se, _sep/cdw
  variants), basic_block (cascade 3x3), shift_5x5
  (fbnet_builder.py:37-192);
- width scaling with python-2 rounding to a divisor
  (fbnet_builder.py:26-34);
- stage roles (backbone / rpn / bbox / mask) and negative strides meaning
  nearest-neighbor upsampling (fbnet_builder.py:428-442);
- registered builders: BACKBONES["FBNet"], RPN_HEADS["FBNet.rpn_head"],
  ROI_BOX_FEATURE_EXTRACTORS["FBNet.roi_head"] (fbnet.py:96-222).

TPU notes: the shift_5x5 primitive is pure data movement — implemented as
pad + 25 static slices instead of the reference's one-hot depthwise conv
(fbnet_builder.py:241-292), which would waste MXU cycles on a permutation.
Channel shuffle is a reshape/transpose pair XLA folds into layout.
"""

from __future__ import annotations

import json
import math
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .registry import (
    BACKBONES,
    ROI_BOX_FEATURE_EXTRACTORS,
    ROI_KEYPOINT_FEATURE_EXTRACTORS,
    ROI_MASK_FEATURE_EXTRACTORS,
    RPN_HEADS,
)

# ---------------------------------------------------------------------------
# Architecture definitions (data tables, re-expressed flat).
# Stage = tuple of block specs (op, t, c, n, s). Roles index into "stages".
# ---------------------------------------------------------------------------

ARCH_DEFS = {
    "default": {
        "first": (32, 2, 3),
        "stages": (
            (("ir_k3", 1, 16, 1, 1),),
            (("ir_k3", 6, 24, 2, 2),),
            (("ir_k3", 6, 32, 3, 2),),
            (("ir_k3", 6, 64, 4, 2), ("ir_k3", 6, 96, 3, 1)),
            (("ir_k3", 4, 160, 1, 2), ("ir_k3", 6, 160, 2, 1),
             ("ir_k3", 6, 240, 1, 1)),
            (("ir_k3", 6, 96, 3, 1),),
            (("ir_k3", 4, 160, 1, 1), ("ir_k3", 6, 160, 3, 1),
             ("ir_k3", 3, 80, 1, -2)),
        ),
        "last": (0, 0.0),
        "backbone": (0, 1, 2, 3),
        "rpn": (5,),
        "bbox": (4,),
        "mask": (6,),
    },
    "xirb16d_dsmask": {
        "first": (16, 2, 3),
        "stages": (
            (("ir_k3", 1, 16, 1, 1),),
            (("ir_k3", 6, 32, 2, 2),),
            (("ir_k3", 6, 48, 3, 2),),
            (("ir_k3", 6, 96, 4, 2), ("ir_k3", 6, 128, 3, 1)),
            (("ir_k3", 4, 128, 1, 2), ("ir_k3", 6, 128, 2, 1),
             ("ir_k3", 6, 160, 1, 1)),
            (("ir_k3", 4, 128, 1, 2), ("ir_k3", 6, 128, 2, 1),
             ("ir_k3", 6, 128, 1, -2), ("ir_k3", 3, 64, 1, -2)),
            (("ir_k3", 6, 128, 3, 1),),
        ),
        "last": (0, 0.0),
        "backbone": (0, 1, 2, 3),
        "rpn": (6,),
        "bbox": (4,),
        "mask": (5,),
    },
    "mobilenet_v2": {
        "first": (32, 2, 3),
        "stages": (
            (("ir_k3", 1, 16, 1, 1),),
            (("ir_k3", 6, 24, 2, 2),),
            (("ir_k3", 6, 32, 3, 2),),
            (("ir_k3", 6, 64, 4, 2), ("ir_k3", 6, 96, 3, 1)),
            (("ir_k3", 6, 160, 3, 1), ("ir_k3", 6, 320, 1, 1)),
        ),
        "last": (0, 0.0),
        "backbone": (0, 1, 2, 3),
        "bbox": (4,),
    },
    "cham_v1a": {
        "first": (32, 2, 3),
        "stages": (
            (("ir_k3", 1, 24, 1, 1),),
            (("ir_k7", 4, 48, 2, 2),),
            (("ir_k3", 7, 64, 5, 2),),
            (("ir_k5", 12, 56, 7, 2), ("ir_k3", 8, 88, 5, 1)),
            (("ir_k3", 7, 152, 4, 2), ("ir_k3", 10, 104, 1, 1)),
            (("ir_k3", 8, 88, 3, 1),),
        ),
        "last": (0, 0.0),
        "backbone": (0, 1, 2, 3),
        "rpn": (5,),
        "bbox": (4,),
    },
    "cham_v2": {
        "first": (32, 2, 3),
        "stages": (
            (("ir_k3", 1, 24, 1, 1),),
            (("ir_k5", 8, 32, 4, 2),),
            (("ir_k7", 5, 48, 6, 2),),
            (("ir_k5", 9, 56, 3, 2), ("ir_k3", 6, 56, 6, 1)),
            (("ir_k3", 2, 160, 6, 2), ("ir_k3", 6, 112, 1, 1)),
            (("ir_k3", 6, 56, 1, 1),),
        ),
        "last": (0, 0.0),
        "backbone": (0, 1, 2, 3),
        "rpn": (5,),
        "bbox": (4,),
    },
}


def add_archs(archs: dict) -> None:
    """Register custom architectures (fbnet_modeldef.py:4-8)."""
    for name, arch in archs.items():
        assert name not in ARCH_DEFS, f"Duplicated model name {name}"
        ARCH_DEFS[name] = arch


def _py2_round(x: float) -> int:
    # python-2 banker-free rounding used by the reference
    # (fbnet_builder.py:26-27)
    return int(math.floor(x + 0.5) if x >= 0.0 else math.ceil(x - 0.5))


def get_divisible_by(num: float, divisible_by: int, min_val: int) -> int:
    ret = int(num)
    if divisible_by > 0 and num % divisible_by != 0:
        ret = int((_py2_round(num / divisible_by) or min_val) * divisible_by)
    return ret


def expand_stage(stage: Sequence[Tuple]) -> Tuple[Tuple, ...]:
    """Unroll repeat counts; stride applies to the first repeat only
    (fbnet_builder.py:563-580)."""
    out = []
    for (op, t, c, n, s) in stage:
        for i in range(n):
            out.append((op, t, c, 1, s if i == 0 else 1))
    return tuple(out)


def resolve_arch(name_or_def) -> dict:
    """Look up a named arch or accept an inline definition (a dict in this
    module's flat format, or a JSON string of one)."""
    if isinstance(name_or_def, str) and name_or_def in ARCH_DEFS:
        return ARCH_DEFS[name_or_def]
    if isinstance(name_or_def, str):
        arch = json.loads(name_or_def)
    else:
        arch = dict(name_or_def)
    assert "stages" in arch and "first" in arch, "malformed FBNet arch def"
    return arch


# ---------------------------------------------------------------------------
# Primitive blocks.
# ---------------------------------------------------------------------------


class ConvNormAct(nn.Module):
    """conv + {bn|frozen-bn|gn|none} + optional relu
    (fbnet_builder.py:342-394)."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    norm: str | None = "bn"   # "bn" | "af" | "gn" | None
    relu: bool = True
    gn_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad)] * 2,
            feature_group_count=self.groups,
            use_bias=self.norm is None,
            dtype=self.dtype,
        )(x)
        if self.norm in ("bn", "af"):
            # inference-mode statistics; "af" (FrozenBatchNorm) and eval-mode
            # BN coincide — both are affine transforms with stored stats
            x = nn.BatchNorm(use_running_average=True, dtype=self.dtype)(x)
        elif self.norm == "gn":
            x = nn.GroupNorm(num_groups=self.gn_groups, dtype=self.dtype)(x)
        if self.relu:
            x = nn.relu(x)
        return x


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """[..., C] -> interleave g channel groups (fbnet_builder.py:322-339).
    Pure layout change; XLA fuses it into the adjacent convs."""
    *lead, c = x.shape
    assert c % groups == 0, f"group {groups} incompatible with C={c}"
    x = x.reshape(*lead, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(*lead, c)


def upsample_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC nearest-neighbor upsample (negative-stride blocks,
    fbnet_builder.py:414-442)."""
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def shift5x5(x: jnp.ndarray) -> jnp.ndarray:
    """Grouped spatial shift (reference Shift, fbnet_builder.py:241-292).

    The reference realizes the shift as a frozen one-hot 5x5 depthwise conv;
    on TPU that is a wasted convolution — the same permutation is pad + 25
    static channel-block slices, pure VMEM data movement.  Channel grouping
    convention matches: C//25 channels per (i, j) offset, remainder assigned
    to the center tap.
    """
    n, h, w, c = x.shape
    k, hks, ksq = 5, 2, 25
    xp = jnp.pad(x, ((0, 0), (hks, hks), (hks, hks), (0, 0)))
    pieces = []
    ch = 0
    for i in range(k):
        for j in range(k):
            num = c // ksq + (c % ksq if (i == hks and j == hks) else 0)
            if num == 0:
                continue
            # output[y, x] = input[y + i - hks, x + j - hks] per conv semantics
            pieces.append(xp[:, i:i + h, j:j + w, ch:ch + num])
            ch += num
    return jnp.concatenate(pieces, axis=-1)


class Identity(nn.Module):
    """'skip' primitive: pass-through, or 1x1 conv-bn-relu when shape changes
    (fbnet_builder.py:195-218)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == self.features and self.stride == 1:
            return x
        return ConvNormAct(self.features, kernel=1, stride=self.stride,
                           norm="bn", relu=True, dtype=self.dtype)(x)


class CascadeConv3x3(nn.Module):
    """'basic_block': 3x3(s) + bn + relu + 3x3 + bn, residual when shapes
    allow (fbnet_builder.py:221-238)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvNormAct(x.shape[-1], kernel=3, stride=self.stride,
                        norm="bn", relu=True, dtype=self.dtype)(x)
        y = ConvNormAct(self.features, kernel=3, stride=1,
                        norm="bn", relu=False, dtype=self.dtype)(y)
        if self.stride == 1 and x.shape[-1] == self.features:
            y = y + x
        return y


class ShiftBlock5x5(nn.Module):
    """'shift_5x5': pw expand + grouped spatial shift + pw-linear
    (fbnet_builder.py:295-319). Stride 2 realized by subsampling after the
    shift (the reference strides its one-hot conv)."""

    features: int
    expansion: float
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = get_divisible_by(x.shape[-1] * self.expansion, 8, 8)
        y = ConvNormAct(mid, kernel=1, norm="bn", relu=True,
                        dtype=self.dtype)(x)
        y = shift5x5(y)
        if self.stride == 2:
            y = y[:, ::2, ::2, :]
        y = ConvNormAct(self.features, kernel=1, norm="bn", relu=False,
                        dtype=self.dtype)(y)
        if self.stride == 1 and x.shape[-1] == self.features:
            y = y + x
        return y


class SEModule(nn.Module):
    """Squeeze-excitation, reduction 4, floor 8 (fbnet_builder.py:397-411)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mid = max(c // 4, 8)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(mid, (1, 1), dtype=self.dtype)(s))
        s = nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype)(s))
        return x * s


class IRFBlock(nn.Module):
    """Inverted-residual block, the workhorse primitive
    (fbnet_builder.py:445-560).

    pw expand (grouped) -> [mid shuffle] -> [upsample] -> dw (or cascaded
    dw-dw when ``cdw``) -> pw-linear (grouped) -> residual -> [SE].
    """

    features: int
    expansion: float
    stride: int = 1              # negative => nearest upsample by |stride|
    kernel: int = 3
    norm: str = "bn"
    width_divisor: int = 1
    shuffle_mid: bool = False
    pw_group: int = 1
    se: bool = False
    cdw: bool = False
    dw_skip_norm: bool = False
    dw_skip_relu: bool = False
    gn_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        use_res = self.stride == 1 and c_in == self.features
        mid = get_divisible_by(int(c_in * self.expansion),
                               self.width_divisor, self.width_divisor)

        y = ConvNormAct(mid, kernel=1, groups=self.pw_group, norm=self.norm,
                        relu=True, gn_groups=self.gn_groups,
                        dtype=self.dtype, name="pw")(x)
        if self.shuffle_mid:
            y = channel_shuffle(y, self.pw_group)

        stride = self.stride
        if stride < 0:
            y = upsample_nearest(y, -stride)
            stride = 1

        dw_norm = None if self.dw_skip_norm else self.norm
        dw_relu = not self.dw_skip_relu
        if self.kernel > 1:
            if self.cdw:
                y = ConvNormAct(mid, kernel=self.kernel, stride=stride,
                                groups=mid, norm=self.norm, relu=True,
                                gn_groups=self.gn_groups, dtype=self.dtype,
                                name="dw1")(y)
                y = ConvNormAct(mid, kernel=self.kernel, stride=1, groups=mid,
                                norm=dw_norm, relu=dw_relu,
                                gn_groups=self.gn_groups, dtype=self.dtype,
                                name="dw2")(y)
            else:
                y = ConvNormAct(mid, kernel=self.kernel, stride=stride,
                                groups=mid, norm=dw_norm, relu=dw_relu,
                                gn_groups=self.gn_groups, dtype=self.dtype,
                                name="dw")(y)

        y = ConvNormAct(self.features, kernel=1, groups=self.pw_group,
                        norm=self.norm, relu=False, gn_groups=self.gn_groups,
                        dtype=self.dtype, name="pwl")(y)
        if use_res:
            y = y + x
        if self.se:
            y = SEModule(dtype=self.dtype, name="se")(y)
        return y


# op name -> IRFBlock keyword overrides (PRIMITIVES table,
# fbnet_builder.py:37-192). ``e``: fixed expansion; ``k``: kernel;
# ``s<g>``: mid shuffle with pw group g (s2 forces e=1); ``se``; ``sep``/
# ``k33``/``k7_sep``: cascaded dw (cdw).
_IR_VARIANTS = {}
for _k in (1, 3, 5, 7):
    _IR_VARIANTS[f"ir_k{_k}"] = dict(kernel=_k)
for _k in (3, 5, 7):
    for _e in (1, 3, 6):
        _IR_VARIANTS[f"ir_k{_k}_e{_e}"] = dict(kernel=_k, expansion=_e)
for _k in (3, 5):
    _IR_VARIANTS[f"ir_k{_k}_s4"] = dict(kernel=_k, expansion=4,
                                        shuffle_mid=True, pw_group=4)
    _IR_VARIANTS[f"ir_k{_k}_s2"] = dict(kernel=_k, expansion=1,
                                        shuffle_mid=True, pw_group=2)
for _name in list(_IR_VARIANTS):
    if _name != "ir_k1":
        _IR_VARIANTS[_name + "_se"] = dict(_IR_VARIANTS[_name], se=True)
_IR_VARIANTS["shuffle"] = dict(shuffle_mid=True, pw_group=4)
_IR_VARIANTS["ir_k3_sep"] = dict(kernel=3, cdw=True)
_IR_VARIANTS["ir_k7_sep"] = dict(kernel=7, cdw=True)
for _e in (1, 3, 6):
    _IR_VARIANTS[f"ir_k33_e{_e}"] = dict(kernel=3, expansion=_e, cdw=True)
    _IR_VARIANTS[f"ir_k7_sep_e{_e}"] = dict(kernel=7, expansion=_e, cdw=True)


def build_block(op: str, features: int, expansion: float, stride: int,
                *, norm: str = "bn", width_divisor: int = 1,
                dw_skip_norm: bool = False, dw_skip_relu: bool = False,
                gn_groups: int = 32, dtype: Any = jnp.float32,
                name: str | None = None) -> nn.Module:
    """Instantiate a primitive by name (PRIMITIVES dispatch)."""
    if op == "skip":
        return Identity(features, stride, dtype=dtype, name=name)
    if op == "basic_block":
        return CascadeConv3x3(features, stride, dtype=dtype, name=name)
    if op == "shift_5x5":
        return ShiftBlock5x5(features, expansion, stride, dtype=dtype,
                             name=name)
    kw = dict(_IR_VARIANTS[op])
    kw.setdefault("expansion", expansion)
    return IRFBlock(
        features=features, stride=stride, norm=norm,
        width_divisor=width_divisor, dw_skip_norm=dw_skip_norm,
        dw_skip_relu=dw_skip_relu, gn_groups=gn_groups, dtype=dtype,
        name=name, **kw,
    )


# ---------------------------------------------------------------------------
# Assembled networks.
# ---------------------------------------------------------------------------


class FBNetStages(nn.Module):
    """A run of expanded block specs under shared builder options."""

    blocks: Tuple[Tuple, ...]        # ((op, t, c, 1, s), ...) expanded
    width_ratio: float = 1.0
    width_divisor: int = 1
    norm: str = "bn"
    dw_skip_norm: bool = False
    dw_skip_relu: bool = False
    gn_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, (op, t, c, _n, s) in enumerate(self.blocks):
            out_c = get_divisible_by(int(c * self.width_ratio),
                                     self.width_divisor, self.width_divisor)
            x = build_block(
                op, out_c, t, s, norm=self.norm,
                width_divisor=self.width_divisor,
                dw_skip_norm=self.dw_skip_norm,
                dw_skip_relu=self.dw_skip_relu, gn_groups=self.gn_groups,
                dtype=self.dtype, name=f"b{i}",
            )(x)
        return x


class FBNetTrunk(nn.Module):
    """first conv + backbone stages -> one feature map (stride 16 for the
    shipped archs) (fbnet.py:79-104)."""

    arch: Any = "default"
    width_ratio: float = 1.0
    width_divisor: int = 1
    norm: str = "bn"
    dw_skip_norm: bool = False
    dw_skip_relu: bool = False
    gn_groups: int = 32
    dtype: Any = jnp.float32

    def _spec(self):
        return resolve_arch(self.arch)

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        spec = self._spec()
        c_first, s_first, k_first = (tuple(spec["first"]) + (3,))[:3]
        c_first = get_divisible_by(int(c_first * self.width_ratio),
                                   self.width_divisor, self.width_divisor)
        x = ConvNormAct(c_first, kernel=k_first, stride=s_first,
                        norm=self.norm, gn_groups=self.gn_groups,
                        dtype=self.dtype, name="first")(x)
        trunk = spec.get("backbone", tuple(range(len(spec["stages"]) - 1)))
        blocks = []
        for si in trunk:
            blocks += list(expand_stage(spec["stages"][si]))
        x = FBNetStages(
            tuple(blocks), self.width_ratio, self.width_divisor, self.norm,
            self.dw_skip_norm, self.dw_skip_relu, self.gn_groups,
            dtype=self.dtype, name="stages",
        )(x)
        return (x,)

    def out_channels(self) -> int:
        spec = self._spec()
        trunk = spec.get("backbone", tuple(range(len(spec["stages"]) - 1)))
        last = spec["stages"][trunk[-1]][-1]
        return get_divisible_by(int(last[2] * self.width_ratio),
                                self.width_divisor, self.width_divisor)


class FBNetRPNHead(nn.Module):
    """rpn-stage blocks applied per feature level (fbnet.py:121-140)."""

    arch: Any = "default"
    width_ratio: float = 1.0
    width_divisor: int = 1
    norm: str = "bn"
    use_blocks: int = 0          # >0: keep only the last N blocks
    dw_skip_norm: bool = False
    dw_skip_relu: bool = False
    gn_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        spec = resolve_arch(self.arch)
        blocks = []
        for si in spec["rpn"]:
            blocks += list(expand_stage(spec["stages"][si]))
        if self.use_blocks > 0:
            assert self.use_blocks <= len(blocks)
            blocks = blocks[-self.use_blocks:]
        head = FBNetStages(
            tuple(blocks), self.width_ratio, self.width_divisor, self.norm,
            self.dw_skip_norm, self.dw_skip_relu, self.gn_groups,
            dtype=self.dtype, name="head",
        )
        return [head(f) for f in features]


class FBNetROIHead(nn.Module):
    """bbox/kpts/mask-stage blocks + optional 'last' 1x1 over pooled ROI
    features (fbnet.py:174-207). Input: (B, R, s, s, C) pooled features;
    output flattened per-ROI embeddings (B, R, D)."""

    arch: Any = "default"
    head_name: str = "bbox"
    width_ratio: float = 1.0
    width_divisor: int = 1
    norm: str = "bn"
    stride_init: int = 0         # overwrite first block's stride (0 = keep)
    last_scale: float = 1.0
    use_blocks: Tuple[int, ...] = ()
    spatial: bool = False        # mask/kpts heads keep the spatial map
    dw_skip_norm: bool = False
    dw_skip_relu: bool = False
    gn_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> jnp.ndarray:
        spec = resolve_arch(self.arch)
        head_name = self.head_name if self.head_name in spec else "head"
        blocks = []
        for si in spec[head_name]:
            blocks += list(expand_stage(spec["stages"][si]))
        if self.use_blocks:
            blocks = [blocks[i] for i in self.use_blocks]
        if self.stride_init:
            op, t, c, n, _s = blocks[0]
            blocks[0] = (op, t, c, n, self.stride_init)

        b, r = roi_feats.shape[:2]
        x = roi_feats.reshape((b * r,) + roi_feats.shape[2:])
        x = FBNetStages(
            tuple(blocks), self.width_ratio, self.width_divisor, self.norm,
            self.dw_skip_norm, self.dw_skip_relu, self.gn_groups,
            dtype=self.dtype, name="blocks",
        )(x)
        last_c, last_scale = spec.get("last", (0, 0.0))
        last_scale = self.last_scale if self.last_scale is not None else last_scale
        if last_scale != 0.0:
            if last_scale > 0:
                ch = int(last_c * self.width_ratio) if self.width_ratio > 1.0 \
                    else int(last_c)
                ch = int(ch * last_scale)
            else:
                ch = int(x.shape[-1] * -last_scale)
            ch = get_divisible_by(ch, self.width_divisor, self.width_divisor)
            if ch > 0:
                x = ConvNormAct(ch, kernel=1, norm=self.norm,
                                gn_groups=self.gn_groups, dtype=self.dtype,
                                name="last")(x)
        if self.spatial:
            # mask/kpts predictors consume the spatial map
            return x.reshape(b, r, *x.shape[1:])
        # bbox: global pool to a per-ROI embedding (the reference's box
        # predictor avg-pools + fc)
        x = jnp.mean(x, axis=(1, 2))
        return x.reshape(b, r, -1)


# ---------------------------------------------------------------------------
# Registry builders (cfg plumbing, fbnet.py:21-68).
# ---------------------------------------------------------------------------


def _builder_opts(cfg):
    bn_type = cfg.MODEL.FBNET.BN_TYPE
    return dict(
        arch=(cfg.MODEL.FBNET.ARCH_DEF or cfg.MODEL.FBNET.ARCH),
        width_ratio=cfg.MODEL.FBNET.SCALE_FACTOR,
        width_divisor=cfg.MODEL.FBNET.WIDTH_DIVISOR,
        norm=bn_type,
        dw_skip_norm=cfg.MODEL.FBNET.DW_CONV_SKIP_BN,
        dw_skip_relu=cfg.MODEL.FBNET.DW_CONV_SKIP_RELU,
        gn_groups=cfg.MODEL.GROUP_NORM.NUM_GROUPS,
    )


def _fbnet_backbone(cfg, dtype):
    return FBNetTrunk(dtype=dtype, **_builder_opts(cfg))


def _fbnet_rpn_head(cfg, dtype):
    opts = _builder_opts(cfg)
    if cfg.MODEL.FBNET.RPN_BN_TYPE:
        opts["norm"] = cfg.MODEL.FBNET.RPN_BN_TYPE
    return FBNetRPNHead(use_blocks=cfg.MODEL.FBNET.RPN_HEAD_BLOCKS,
                        dtype=dtype, **opts)


def _fbnet_roi_head(cfg, dtype):
    return FBNetROIHead(
        head_name="bbox",
        stride_init=cfg.MODEL.FBNET.DET_HEAD_STRIDE,
        last_scale=cfg.MODEL.FBNET.DET_HEAD_LAST_SCALE,
        use_blocks=tuple(cfg.MODEL.FBNET.DET_HEAD_BLOCKS),
        dtype=dtype, **_builder_opts(cfg),
    )


def _fbnet_kpts_head(cfg, dtype):
    return FBNetROIHead(
        head_name="kpts",
        stride_init=cfg.MODEL.FBNET.KPTS_HEAD_STRIDE,
        last_scale=cfg.MODEL.FBNET.KPTS_HEAD_LAST_SCALE,
        use_blocks=tuple(cfg.MODEL.FBNET.KPTS_HEAD_BLOCKS),
        spatial=True, dtype=dtype, **_builder_opts(cfg),
    )


def _fbnet_mask_head(cfg, dtype):
    return FBNetROIHead(
        head_name="mask",
        stride_init=cfg.MODEL.FBNET.MASK_HEAD_STRIDE,
        last_scale=cfg.MODEL.FBNET.MASK_HEAD_LAST_SCALE,
        use_blocks=tuple(cfg.MODEL.FBNET.MASK_HEAD_BLOCKS),
        spatial=True, dtype=dtype, **_builder_opts(cfg),
    )


BACKBONES.register("FBNet", _fbnet_backbone)
RPN_HEADS.register("FBNet.rpn_head", _fbnet_rpn_head)
ROI_BOX_FEATURE_EXTRACTORS.register("FBNet.roi_head", _fbnet_roi_head)
ROI_KEYPOINT_FEATURE_EXTRACTORS.register("FBNet.roi_head_keypoints",
                                         _fbnet_kpts_head)
ROI_MASK_FEATURE_EXTRACTORS.register("FBNet.roi_head_mask", _fbnet_mask_head)
