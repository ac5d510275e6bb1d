"""TPU.QUANT=int8 — opt-in int8 conv stack (VERDICT r2 #3).

Properties tested:
  1. param-tree equality: QuantConv8 substitutes for nn.Conv without
     changing any parameter path/shape, so reference-imported checkpoints
     load unchanged in either mode;
  2. numeric closeness: int8 (per-out-channel weight scales, per-tensor
     dynamic activation scales) tracks the float path on a single conv and
     through a ResNet bottleneck to within quantization error;
  3. full-detector smoke: the detector builds and runs eval with
     TPU.QUANT="int8" and returns finite, plausibly-overlapping detections
     vs the float path.

The reference has no quantized path (this is a TPU roofline lever —
BASELINE.md); the layers quantized mirror
maskrcnn_benchmark/modeling/backbone/resnet.py:318-390 and the FCOS tower
convs (rpn/fcos/fcos.py:27-49).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneshotdet_tpu.config import cfg
from oneshotdet_tpu.models import build_detection_model
from oneshotdet_tpu.ops.quant import QuantConv8, int8_conv, make_conv
from oneshotdet_tpu.structures import ImageBatch

pytestmark = pytest.mark.smoke


def test_param_tree_identical_across_modes():
    from oneshotdet_tpu.models.fpn import ResNetFPN

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vf = ResNetFPN(depth=50, quant="none").init(jax.random.PRNGKey(0), x)
    vq = ResNetFPN(depth=50, quant="int8").init(jax.random.PRNGKey(0), x)
    pf = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vf)
    pq = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vq)
    fl_f = jax.tree_util.tree_flatten_with_path(pf)[0]
    fl_q = jax.tree_util.tree_flatten_with_path(pq)[0]
    assert [k for k, _ in fl_f] == [k for k, _ in fl_q]
    assert [v for _, v in fl_f] == [v for _, v in fl_q]


def test_fcos_head_param_tree_identical():
    from oneshotdet_tpu.models.fcos import FCOSHead

    feats = [jnp.zeros((1, 2 ** (5 - i), 2 ** (5 - i), 64), jnp.float32)
             for i in range(5)]
    vf = FCOSHead(num_levels=5, quant="none").init(jax.random.PRNGKey(0), feats)
    vq = FCOSHead(num_levels=5, quant="int8").init(jax.random.PRNGKey(0), feats)
    kf = [k for k, _ in jax.tree_util.tree_flatten_with_path(vf)[0]]
    kq = [k for k, _ in jax.tree_util.tree_flatten_with_path(vq)[0]]
    assert kf == kq


def test_roi_head_param_tree_and_output():
    from oneshotdet_tpu.models.roi_head import ROIBoxHeadNet

    rng = np.random.RandomState(5)
    roi = jnp.asarray(rng.randn(8, 7, 7, 64).astype(np.float32))
    supp = jnp.asarray(rng.randn(2, 7, 7, 64).astype(np.float32))
    hf = ROIBoxHeadNet(in_channels=64, quant="none")
    hq = ROIBoxHeadNet(in_channels=64, quant="int8")
    v = hf.init(jax.random.PRNGKey(0), roi, supp)
    vq = hq.init(jax.random.PRNGKey(0), roi, supp)
    kf = [k for k, _ in jax.tree_util.tree_flatten_with_path(v)[0]]
    kq = [k for k, _ in jax.tree_util.tree_flatten_with_path(vq)[0]]
    assert kf == kq
    lf, df = hf.apply(v, roi, supp)
    lq, dq = hq.apply(v, roi, supp)  # float weights load into the quant head
    # GroupNorm after each quantized conv renormalizes, so the relative
    # error stays modest through the 6-matmul chain
    denom = np.abs(np.asarray(lf)).max() + 1e-6
    assert np.abs(np.asarray(lq) - np.asarray(lf)).max() / denom < 0.25


def test_int8_conv_tracks_float():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 32, 64).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = int8_conv(x, w, (1, 1), [(1, 1), (1, 1)])
    # error budget: ~1/127 per operand, relative to output magnitude
    denom = np.abs(np.asarray(ref)).max()
    err = np.abs(np.asarray(got) - np.asarray(ref)).max() / denom
    assert err < 0.04, err


def test_quantconv8_module_matches_nn_conv_params_and_output():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    kw = dict(features=24, kernel_size=(3, 3), padding="SAME", name="c")
    mf = make_conv("none", **kw)
    mq = make_conv("int8", **kw)
    v = mf.init(jax.random.PRNGKey(2), x)
    yf = mf.apply(v, x)
    yq = mq.apply(v, x)  # same variables load into the quant module
    denom = np.abs(np.asarray(yf)).max()
    assert np.abs(np.asarray(yq) - np.asarray(yf)).max() / denom < 0.04
    assert isinstance(mq, QuantConv8)


@pytest.mark.slow
def test_prepool_compress_int8_smoke(monkeypatch):
    """ONESHOT_PREPOOL_COMPRESS=1 with TPU.QUANT=int8 quantizes the hoisted
    full-map query-half matmul (detector._eval_roi_pool int8_dot branch);
    the run must produce finite detections broadly agreeing with the
    non-hoisted int8 path (quantization grouping differs — full-map vs
    per-ROI activation scales — so only closeness, not identity)."""
    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.structures import ImageBatch

    c = cfg.clone()
    c.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 64
    c.MODEL.RETINANET.USE_C5 = False
    c.FEW_SHOT.SIAMESE_BACKBONE = True
    c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
    c.FEW_SHOT.SUPP_ROIALIGN = True
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 32
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 16
    c.TPU.NMS_PRE_TOPK = 128
    c.TPU.COMPUTE_DTYPE = "float32"
    c.TPU.QUANT = "int8"

    model = build_detection_model(c)
    rng = np.random.RandomState(11)
    images = ImageBatch(
        pixels=jnp.asarray(rng.randn(1, 96, 128, 3).astype(np.float32)),
        sizes=jnp.array([[96.0, 128.0]]))
    supp = ImageBatch(
        pixels=jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32)),
        sizes=jnp.array([[64.0, 64.0]]))
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, supp,
                           train=False)

    def run():
        dets = model.apply(variables, images, supp,
                           target_ids=jnp.ones((1,), jnp.int32), train=False)
        return np.asarray(dets.xyxy), np.asarray(dets.valid)

    monkeypatch.delenv("ONESHOT_PREPOOL_COMPRESS", raising=False)
    base_xyxy, base_valid = run()
    monkeypatch.setenv("ONESHOT_PREPOOL_COMPRESS", "1")
    fused_xyxy, fused_valid = run()
    assert np.isfinite(fused_xyxy[fused_valid]).all()
    assert abs(int(fused_valid.sum()) - int(base_valid.sum())) <= 4


@pytest.mark.slow
def test_detector_int8_smoke():
    def _cfg(quant):
        c = cfg.clone()
        c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
        c.MODEL.RETINANET.USE_C5 = False
        c.FEW_SHOT.SIAMESE_BACKBONE = True
        c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
        c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 128
        c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 64
        c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 16
        c.TPU.NMS_PRE_TOPK = 256
        c.TPU.COMPUTE_DTYPE = "float32"
        c.TPU.QUANT = quant
        return c

    rng = np.random.RandomState(7)
    pixels = jnp.asarray(rng.randn(1, 96, 128, 3).astype(np.float32))
    supp = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    images = ImageBatch(pixels=pixels, sizes=jnp.array([[96.0, 128.0]]))
    s = ImageBatch(pixels=supp, sizes=jnp.array([[64.0, 64.0]]))

    mf = build_detection_model(_cfg("none"))
    variables = mf.init({"params": jax.random.PRNGKey(0)}, images, s,
                        train=False)
    df = mf.apply(variables, images, s,
                  target_ids=jnp.ones((1,), jnp.int32), train=False)

    mq = build_detection_model(_cfg("int8"))
    dq = mq.apply(variables, images, s,
                  target_ids=jnp.ones((1,), jnp.int32), train=False)

    bq = np.asarray(dq.xyxy)
    assert np.isfinite(bq[np.asarray(dq.valid)]).all()
    # same random weights: the two modes should fire on broadly the same
    # number of locations (quantization shifts scores slightly)
    nf, nq = int(np.asarray(df.valid).sum()), int(np.asarray(dq.valid).sum())
    assert abs(nf - nq) <= max(4, nf // 2 + 1), (nf, nq)


def test_retinanet_head_param_tree_and_output():
    """quant=int8 RetinaNet towers: identical param tree, tracking output."""
    from oneshotdet_tpu.models.retinanet import RetinaNetHead

    rng = np.random.RandomState(7)
    feats = [jnp.asarray(rng.randn(1, 2 ** (4 - i), 2 ** (4 - i), 64)
                         .astype(np.float32)) for i in range(3)]
    hf = RetinaNetHead(num_classes=2, num_anchors=9, quant="none")
    hq = RetinaNetHead(num_classes=2, num_anchors=9, quant="int8")
    v = hf.init(jax.random.PRNGKey(0), feats)
    vq = hq.init(jax.random.PRNGKey(0), feats)
    kf = [k for k, _ in jax.tree_util.tree_flatten_with_path(v)[0]]
    kq = [k for k, _ in jax.tree_util.tree_flatten_with_path(vq)[0]]
    assert kf == kq
    cls_f, _ = hf.apply(v, feats)
    cls_q, _ = hq.apply(v, feats)  # float weights load into the quant head
    denom = np.abs(np.asarray(cls_f[0])).max() + 1e-6
    assert np.abs(np.asarray(cls_q[0]) - np.asarray(cls_f[0])).max() / denom < 0.25


# ---------------------------------------------------------------------------
# TPU.QUANT=int8_weight — static weight-only int8 (VERDICT r3 #2)
# ---------------------------------------------------------------------------
def test_weightquant_conv_tracks_float_and_loads_float_checkpoints():
    """A float checkpoint tree (params only, no quant_scales collection)
    applies cleanly to the weight-only module; the output tracks nn.Conv
    to within weight rounding error (~1/127 — activations are exact)."""
    from oneshotdet_tpu.ops.quant import WeightQuantConv8

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    kw = dict(features=24, kernel_size=(3, 3), padding="SAME", name="c")
    mf = make_conv("none", **kw)
    mw = make_conv("int8_weight", **kw)
    assert isinstance(mw, WeightQuantConv8)
    v = mf.init(jax.random.PRNGKey(2), x)  # params only
    yf = mf.apply(v, x)
    yw = mw.apply(v, x)
    denom = np.abs(np.asarray(yf)).max()
    assert np.abs(np.asarray(yw) - np.asarray(yf)).max() / denom < 0.02


def test_weightquant_params_tree_identical_and_transform_roundtrip():
    """init param paths match across none/int8_weight; quantize_weights_int8
    casts exactly the declared kernels to int8 and the transformed tree
    reproduces the fake-quant output bit-for-bit (same rounding path)."""
    from oneshotdet_tpu.models.fpn import ResNetFPN
    from oneshotdet_tpu.ops.quant import (
        QUANT_SCALES_COLLECTION, quantize_weights_int8)

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vf = ResNetFPN(depth=50, quant="none").init(jax.random.PRNGKey(0), x)
    mw = ResNetFPN(depth=50, quant="int8_weight")
    vw = mw.init(jax.random.PRNGKey(0), x)
    # params sub-tree paths identical (quant_scales is a separate collection)
    kf = [k for k, _ in
          jax.tree_util.tree_flatten_with_path(vf["params"])[0]]
    kw_ = [k for k, _ in
           jax.tree_util.tree_flatten_with_path(vw["params"])[0]]
    assert kf == kw_
    assert QUANT_SCALES_COLLECTION in vw

    rng = np.random.RandomState(4)
    xr = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    y_fake = mw.apply(vw, xr)

    vq = quantize_weights_int8(vw)
    n_int8 = sum(int(a.dtype == jnp.int8) for a in
                 jax.tree_util.tree_leaves(vq["params"]))
    n_scales = len(jax.tree_util.tree_leaves(vq[QUANT_SCALES_COLLECTION]))
    assert n_int8 == n_scales > 0
    y_int8 = mw.apply(vq, xr)
    for a, b in zip(jax.tree_util.tree_leaves(y_fake),
                    jax.tree_util.tree_leaves(y_int8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_detector_int8_weight_smoke():
    """Full detector with TPU.QUANT=int8_weight: the offline-transformed
    tree runs eval and broadly agrees with the float path."""
    from oneshotdet_tpu.ops.quant import quantize_weights_int8

    def _cfg(quant):
        c = cfg.clone()
        c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
        c.MODEL.RETINANET.USE_C5 = False
        c.FEW_SHOT.SIAMESE_BACKBONE = True
        c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
        c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 128
        c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 64
        c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 16
        c.TPU.NMS_PRE_TOPK = 256
        c.TPU.COMPUTE_DTYPE = "float32"
        c.TPU.QUANT = quant
        return c

    rng = np.random.RandomState(13)
    images = ImageBatch(
        pixels=jnp.asarray(rng.randn(1, 96, 128, 3).astype(np.float32)),
        sizes=jnp.array([[96.0, 128.0]]))
    s = ImageBatch(
        pixels=jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32)),
        sizes=jnp.array([[64.0, 64.0]]))

    mf = build_detection_model(_cfg("none"))
    vf = mf.init({"params": jax.random.PRNGKey(0)}, images, s, train=False)
    df = mf.apply(vf, images, s,
                  target_ids=jnp.ones((1,), jnp.int32), train=False)

    mw = build_detection_model(_cfg("int8_weight"))
    vw = mw.init({"params": jax.random.PRNGKey(0)}, images, s, train=False)
    vq = quantize_weights_int8(vw)
    dq = mw.apply(vq, images, s,
                  target_ids=jnp.ones((1,), jnp.int32), train=False)

    bq = np.asarray(dq.xyxy)
    assert np.isfinite(bq[np.asarray(dq.valid)]).all()
    nf, nq = int(np.asarray(df.valid).sum()), int(np.asarray(dq.valid).sum())
    assert abs(nf - nq) <= max(4, nf // 2 + 1), (nf, nq)


def test_mask_keypoint_head_param_tree_and_output():
    """quant=int8 mask/keypoint fcn convs: identical trees, tracking output."""
    from oneshotdet_tpu.models.keypoint_head import KeypointHead
    from oneshotdet_tpu.models.mask_head import MaskHead

    rng = np.random.RandomState(9)
    roi = jnp.asarray(rng.randn(4, 14, 14, 64).astype(np.float32))
    for cls_, kw in ((MaskHead, dict(num_classes=2, conv_layers=(64, 64))),
                     (KeypointHead, dict(num_keypoints=17,
                                         conv_layers=(64, 64)))):
        hf = cls_(quant="none", **kw)
        hq = cls_(quant="int8", **kw)
        v = hf.init(jax.random.PRNGKey(0), roi)
        vq = hq.init(jax.random.PRNGKey(0), roi)
        kf = [k for k, _ in jax.tree_util.tree_flatten_with_path(v)[0]]
        kq = [k for k, _ in jax.tree_util.tree_flatten_with_path(vq)[0]]
        assert kf == kq, cls_.__name__
        yf = np.asarray(hf.apply(v, roi))
        yq = np.asarray(hq.apply(v, roi))
        denom = np.abs(yf).max() + 1e-6
        assert np.abs(yq - yf).max() / denom < 0.25, cls_.__name__
