"""FBNet backbone zoo tests (reference: tests/test_fbnet.py — registry
sweep + shape checks; plus primitive-level golden checks the reference
lacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneshotdet_tpu.config import cfg
from oneshotdet_tpu.models.fbnet import (
    ARCH_DEFS,
    FBNetROIHead,
    FBNetRPNHead,
    FBNetTrunk,
    add_archs,
    build_block,
    channel_shuffle,
    expand_stage,
    get_divisible_by,
    shift5x5,
    upsample_nearest,
)
from oneshotdet_tpu.models.registry import (
    BACKBONES,
    ROI_BOX_FEATURE_EXTRACTORS,
    RPN_HEADS,
)


@pytest.mark.parametrize("arch", sorted(ARCH_DEFS))
def test_trunk_all_archs_build(arch):
    m = FBNetTrunk(arch=arch)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    (y,) = m.apply(v, x)
    # shipped archs: first stride 2 + three stride-2 stages = stride 16
    assert y.shape == (1, 4, 4, m.out_channels())


def test_width_scaling_py2_round():
    # reference _get_divisible_by semantics (fbnet_builder.py:26-34)
    assert get_divisible_by(30, 8, 8) == 32      # round .75 up
    assert get_divisible_by(28, 8, 8) == 32      # py2 rounds .5 away from 0
    assert get_divisible_by(19, 8, 8) == 16
    assert get_divisible_by(96, 1, 1) == 96      # divisor 1: identity
    assert get_divisible_by(3, 8, 8) == 64       # round->0 falls back to min*8

    m = FBNetTrunk(arch="mobilenet_v2", width_ratio=0.5, width_divisor=8)
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    (y,) = m.apply(v, x)
    assert y.shape[-1] == m.out_channels() == 48  # 96*0.5 = 48


def test_expand_stage_stride_on_first_repeat_only():
    blocks = expand_stage((("ir_k3", 6, 64, 3, 2),))
    assert [b[4] for b in blocks] == [2, 1, 1]
    assert all(b[3] == 1 for b in blocks)


def test_primitive_variants_forward():
    x = jnp.zeros((1, 8, 8, 16))
    key = jax.random.PRNGKey(0)
    for op, out_c in [
        ("skip", 16), ("skip", 24), ("basic_block", 16), ("shift_5x5", 16),
        ("ir_k1", 16), ("ir_k5_e3", 24), ("ir_k3_e6_se", 16),
        ("ir_k3_s4", 16), ("ir_k5_s2", 16), ("ir_k3_sep", 16),
        ("ir_k33_e3", 24), ("ir_k7_sep_e1", 16), ("shuffle", 16),
    ]:
        blk = build_block(op, out_c, 6, 1)
        v = blk.init(key, x)
        y = blk.apply(v, x)
        assert y.shape == (1, 8, 8, out_c), op
        blk2 = build_block(op, out_c, 6, 2)
        v2 = blk2.init(key, x)
        y2 = blk2.apply(v2, x)
        # reference quirk preserved: kernel-1 IR blocks have no dw conv, so
        # their stride is silently dropped (fbnet_builder.py:489-490)
        want_hw = (8, 8) if op == "ir_k1" else (4, 4)
        assert y2.shape == (1, *want_hw, out_c), op


def test_negative_stride_upsamples():
    # mask-head stages use stride -2 = 2x nearest upsample
    x = jnp.zeros((1, 4, 4, 16))
    blk = build_block("ir_k3", 16, 3, -2)
    v = blk.init(jax.random.PRNGKey(0), x)
    assert blk.apply(v, x).shape == (1, 8, 8, 16)
    u = upsample_nearest(jnp.arange(4.0).reshape(1, 2, 2, 1), 2)
    assert np.allclose(u[0, :, :, 0],
                       [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]])


def test_shift5x5_semantics():
    # channel group for offset (i, j) reads input shifted by (i-2, j-2);
    # center group (channels [2*12, 2*13+rem)) is identity
    c = 50
    x = jnp.asarray(np.random.RandomState(0).randn(1, 6, 6, c).astype(np.float32))
    y = shift5x5(x)
    assert y.shape == x.shape
    assert np.allclose(y[0, 2:, 2:, 0], x[0, :-2, :-2, 0])     # (0,0) corner tap
    assert np.allclose(y[0, :, :, 24], x[0, :, :, 24])         # center tap
    assert np.allclose(y[0, :-2, :-2, 48], x[0, 2:, 2:, 48])   # (4,4) corner tap


def test_channel_shuffle_matches_reference_permutation():
    # [N,g,C/g] -> transpose: out channel k*g+j <- in channel j*(C/g)+k
    x = jnp.arange(8.0).reshape(1, 1, 1, 8)
    y = channel_shuffle(x, 4)
    assert np.allclose(y.ravel(), [0, 2, 4, 6, 1, 3, 5, 7])


def test_rpn_and_roi_heads():
    rh = FBNetRPNHead(arch="default", use_blocks=2)
    feats = [jnp.zeros((1, 8, 8, 96)), jnp.zeros((1, 4, 4, 96))]
    v = rh.init(jax.random.PRNGKey(0), feats)
    outs = rh.apply(v, feats)
    assert [o.shape for o in outs] == [(1, 8, 8, 96), (1, 4, 4, 96)]

    roih = FBNetROIHead(arch="default", last_scale=0.0)
    rf = jnp.zeros((2, 4, 7, 7, 96))
    v = roih.init(jax.random.PRNGKey(0), rf)
    out = roih.apply(v, rf)
    assert out.shape == (2, 4, 240)  # bbox stage tops out at 240 channels

    # last_scale < 0: 1x1 conv to |scale| * current channels
    roih2 = FBNetROIHead(arch="default", last_scale=-2.0)
    v2 = roih2.init(jax.random.PRNGKey(0), rf)
    assert roih2.apply(v2, rf).shape == (2, 4, 480)


def test_registry_builders_from_cfg():
    c = cfg.clone()
    c.MODEL.FBNET.ARCH = "mobilenet_v2"
    c.MODEL.FBNET.SCALE_FACTOR = 1.0
    m = BACKBONES["FBNet"](c, jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    (y,) = m.apply(v, x)
    assert y.shape == (1, 2, 2, 96)

    assert "FBNet.rpn_head" in RPN_HEADS
    assert "FBNet.roi_head" in ROI_BOX_FEATURE_EXTRACTORS
    roi = ROI_BOX_FEATURE_EXTRACTORS["FBNet.roi_head"](c, jnp.float32)
    rf = jnp.zeros((1, 2, 7, 7, 96))
    v = roi.init(jax.random.PRNGKey(0), rf)
    assert roi.apply(v, rf).ndim == 3

    from oneshotdet_tpu.models.registry import (
        ROI_KEYPOINT_FEATURE_EXTRACTORS,
        ROI_MASK_FEATURE_EXTRACTORS,
    )

    # mask head of the "default" arch upsamples 2x (stride -2 tail block)
    c2 = cfg.clone()
    mask = ROI_MASK_FEATURE_EXTRACTORS["FBNet.roi_head_mask"](c2, jnp.float32)
    v = mask.init(jax.random.PRNGKey(0), rf)
    out = mask.apply(v, rf)
    assert out.shape[:2] == (1, 2) and out.shape[2:4] == (14, 14)
    # kpts falls back to the generic "head"/bbox stage when absent; "default"
    # has no kpts stage and no generic "head" -> skip (xirb16d has mask only)
    assert "FBNet.roi_head_keypoints" in ROI_KEYPOINT_FEATURE_EXTRACTORS


def test_add_archs_and_inline_def():
    custom = {
        "first": (8, 2, 3),
        "stages": ((("ir_k3", 1, 8, 1, 1),), (("ir_k3", 6, 16, 1, 2),)),
        "last": (0, 0.0),
        "backbone": (0, 1),
    }
    add_archs({"_test_tiny": custom})
    try:
        m = FBNetTrunk(arch="_test_tiny")
        x = jnp.zeros((1, 16, 16, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        (y,) = m.apply(v, x)
        assert y.shape == (1, 4, 4, 16)
        with pytest.raises(AssertionError):
            add_archs({"_test_tiny": custom})  # duplicate rejected
    finally:
        ARCH_DEFS.pop("_test_tiny", None)
