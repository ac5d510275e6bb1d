import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneshotdet_tpu.models import ResNet, ResNetFPN
from oneshotdet_tpu.models.fcos import (
    FCOSHead,
    compute_locations,
    fcos_losses,
    fcos_postprocess,
    fcos_targets,
)
from oneshotdet_tpu.models.matcher import balanced_sample, match_boxes
from oneshotdet_tpu.ops.roi_align import fpn_level_map


def test_resnet_stage_shapes():
    m = ResNet(depth=50)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vars_, x)
    shapes = [o.shape for o in outs]
    assert shapes == [
        (1, 16, 16, 256),
        (1, 8, 8, 512),
        (1, 4, 4, 1024),
        (1, 2, 2, 2048),
    ]


def test_resnet_fpn_pyramid_shapes():
    m = ResNetFPN(depth=50, out_channels=256, use_c5_for_p6=False)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vars_, x)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 256),
        (1, 4, 4, 256),
        (1, 2, 2, 256),
        (1, 1, 1, 256),
        (1, 1, 1, 256),
    ]


def test_frozen_bn_constants_collection():
    m = ResNet(depth=50)
    vars_ = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    assert "constants" in vars_
    # BN stats must NOT be in trainable params
    flat = jax.tree_util.tree_leaves_with_path(vars_["params"])
    for path, _ in flat:
        assert "bn" not in "".join(str(p) for p in path) or "conv" in "".join(
            str(p) for p in path
        ), path


def test_fcos_head_shapes_and_bias_init():
    head = FCOSHead(num_convs=4, num_classes=1, num_levels=5)
    feats = [jnp.zeros((2, 8 // (2 ** i) or 1, 8 // (2 ** i) or 1, 256)) for i in range(5)]
    vars_ = head.init(jax.random.PRNGKey(0), feats)
    logits, bbox, ctr = head.apply(vars_, feats)
    assert len(logits) == 5 and logits[0].shape == (2, 8, 8, 1)
    assert bbox[0].shape == (2, 8, 8, 4)
    assert float(bbox[0].min()) > 0  # exp()
    # focal-prior bias: sigmoid(bias) ~ 0.01 (fcos.py:76-79)
    bias = vars_["params"]["cls_logits"]["bias"][0]
    np.testing.assert_allclose(1 / (1 + np.exp(-bias)), 0.01, rtol=1e-4)


def test_compute_locations():
    # stride 8, 2x3 map: x = i*8 + 4 (fcos.py:220-234)
    locs = compute_locations([(2, 3)], [8])[0]
    want = np.array(
        [[4, 4], [12, 4], [20, 4], [4, 12], [12, 12], [20, 12]], np.float32
    )
    np.testing.assert_allclose(np.asarray(locs), want)


def _single_level_targets(gt, gt_labels, gt_valid, shape=(16, 16), stride=8):
    locs = compute_locations([shape], [stride])
    return fcos_targets(
        locs, [stride], gt, gt_labels, gt_valid, center_sample=True, radius=1.5
    )


def test_fcos_targets_positive_at_center():
    # gt box 20..60 (size 40 <= 64 -> level-0 bucket)
    gt = jnp.array([[[20.0, 20.0, 60.0, 60.0]]])
    labels, reg = _single_level_targets(gt, jnp.array([[1]]), jnp.array([[True]]))
    labels = np.asarray(labels).reshape(16, 16)
    reg = np.asarray(reg).reshape(16, 16, 4)
    # location (36, 36) = index (4, 4) is inside the center region
    assert labels[4, 4] == 1
    np.testing.assert_allclose(reg[4, 4], [16, 16, 24, 24])
    # location (4, 4) = index (0, 0) is outside the gt box
    assert labels[0, 0] == 0


def test_fcos_targets_level_bucketing():
    # a big box (size 400) must NOT be assigned on the stride-8 level
    gt = jnp.array([[[0.0, 0.0, 400.0, 400.0]]])
    locs = compute_locations([(16, 16)], [8])
    labels, _ = fcos_targets(
        locs, [8], gt, jnp.array([[1]]), jnp.array([[True]]), center_sample=False
    )
    assert int(np.asarray(labels).sum()) == 0  # max ltrb > 64 everywhere inside


def test_fcos_targets_min_area_tiebreak():
    # two nested boxes; the smaller wins at shared locations
    gt = jnp.array([[[0.0, 0.0, 63.0, 63.0], [16.0, 16.0, 47.0, 47.0]]])
    labels_all, reg = _single_level_targets(
        gt, jnp.array([[1, 2]]), jnp.array([[True, True]])
    )
    labels = np.asarray(labels_all).reshape(16, 16)
    # center of the small box: location (28, 28) -> index 3 (x=3*8+4=28)
    assert labels[3, 3] == 2


def test_fcos_targets_padded_gt_ignored():
    gt = jnp.array([[[20.0, 20.0, 60.0, 60.0], [0.0, 0.0, 0.0, 0.0]]])
    labels, _ = _single_level_targets(
        gt, jnp.array([[1, 1]]), jnp.array([[True, False]])
    )
    l2, _ = _single_level_targets(
        gt[:, :1], jnp.array([[1]]), jnp.array([[True]])
    )
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(l2))


def test_fcos_losses_finite_and_zero_when_perfect():
    b, h, w = 1, 8, 8
    logits = [jnp.full((b, h, w, 1), -10.0)]
    bbox = [jnp.ones((b, h, w, 4))]
    ctr = [jnp.zeros((b, h, w, 1))]
    labels = jnp.zeros((b, h * w), jnp.int32)
    reg_t = jnp.zeros((b, h * w, 4))
    cls_l, reg_l, ctr_l = fcos_losses(logits, bbox, ctr, labels, reg_t)
    assert np.isfinite(float(cls_l)) and float(cls_l) < 1e-3
    assert float(reg_l) == 0.0  # no positives
    assert float(ctr_l) == 0.0


def test_fcos_postprocess_global_topk_matches_level_topk():
    """Fast path (one global top-k) == strict path when per-level caps don't bind."""
    rng = np.random.RandomState(3)
    shapes = [(8, 12), (4, 6), (2, 3), (1, 2), (1, 1)]
    b = 2
    logits = [jnp.asarray(rng.randn(b, h, w, 1).astype(np.float32)) for h, w in shapes]
    bbox = [jnp.abs(jnp.asarray(rng.randn(b, h, w, 4).astype(np.float32))) * 8 for h, w in shapes]
    ctr = [jnp.asarray(rng.randn(b, h, w, 1).astype(np.float32)) for h, w in shapes]
    locs = compute_locations(shapes, (8, 16, 32, 64, 128))
    sizes_wh = jnp.array([[96.0, 64.0], [80.0, 50.0]])
    kw = dict(pre_nms_top_n=1000, nms_thresh=0.6, post_top_n=32, nms_pre_topk=4096)
    strict = fcos_postprocess(locs, logits, bbox, ctr, sizes_wh, level_topk=True, **kw)
    fast = fcos_postprocess(locs, logits, bbox, ctr, sizes_wh, level_topk=False, **kw)
    np.testing.assert_array_equal(np.asarray(strict.valid), np.asarray(fast.valid))
    np.testing.assert_allclose(
        np.asarray(strict.xyxy)[np.asarray(strict.valid)],
        np.asarray(fast.xyxy)[np.asarray(fast.valid)], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(strict.get_field("scores")), np.asarray(fast.get_field("scores")), atol=1e-6)


def test_fcos_postprocess_shapes_and_validity():
    locs = compute_locations([(8, 8), (4, 4)], [8, 16])
    b = 2
    rng = np.random.RandomState(0)
    logits = [jnp.asarray(rng.randn(b, 8, 8, 1).astype(np.float32)),
              jnp.asarray(rng.randn(b, 4, 4, 1).astype(np.float32))]
    bbox = [jnp.asarray(np.abs(rng.randn(b, 8, 8, 4)).astype(np.float32) * 8),
            jnp.asarray(np.abs(rng.randn(b, 4, 4, 4)).astype(np.float32) * 16)]
    ctr = [jnp.asarray(rng.randn(b, 8, 8, 1).astype(np.float32)),
           jnp.asarray(rng.randn(b, 4, 4, 1).astype(np.float32))]
    sizes_wh = jnp.array([[64.0, 64.0], [48.0, 40.0]])
    out = fcos_postprocess(locs, logits, bbox, ctr, sizes_wh,
                           pre_nms_top_n=50, nms_thresh=0.8, post_top_n=20)
    assert out.xyxy.shape == (2, 20, 4)
    assert out.valid.shape == (2, 20)
    arr = np.asarray(out.xyxy)
    v = np.asarray(out.valid)
    # boxes clipped to each image's true size
    assert arr[0][v[0]][:, 2].max() <= 63.0 + 1e-5
    assert arr[1][v[1]][:, 2].max() <= 47.0 + 1e-5
    # scores sorted descending among valid
    s = np.asarray(out.get_field("scores"))[0]
    assert (np.diff(s[v[0]]) <= 1e-6).all()


def test_matcher_thresholds():
    # 2 gt x 4 predictions
    iou = jnp.array([
        [0.9, 0.4, 0.55, 0.1],
        [0.2, 0.6, 0.65, 0.0],
    ])
    m = np.asarray(match_boxes(iou, jnp.array([True, True]), 0.7, 0.3))
    assert m[0] == 0          # 0.9 >= 0.7
    assert m[1] == -2         # 0.6 between
    assert m[2] == -2         # 0.65 between
    assert m[3] == -1         # 0.2 below... (max 0.1 < 0.3)


def test_matcher_low_quality_recovery():
    iou = jnp.array([[0.25, 0.1], [0.05, 0.2]])
    m = np.asarray(match_boxes(iou, jnp.array([True, True]), 0.7, 0.3,
                               allow_low_quality_matches=True))
    # each gt's best prediction is recovered
    assert m[0] == 0 and m[1] == 1


def test_matcher_no_valid_gt():
    iou = jnp.zeros((2, 3))
    m = np.asarray(match_boxes(iou, jnp.array([False, False]), 0.5, 0.5))
    assert (m == -1).all()


def test_balanced_sample_counts():
    rng = jax.random.PRNGKey(0)
    labels = jnp.array([1] * 10 + [0] * 200 + [-1] * 10)
    valid = jnp.ones(220, bool)
    idx, ok = balanced_sample(rng, labels, valid, 128, 0.25)
    lab = np.asarray(labels)[np.asarray(idx)]
    ok = np.asarray(ok)
    assert ok.sum() == 128
    assert (lab[ok] == 1).sum() == 10      # all 10 positives (< 32 cap)
    assert (lab[ok] == 0).sum() == 118     # negatives fill the rest
    assert (lab[ok] == -1).sum() == 0      # ignores never sampled


def test_balanced_sample_pos_cap():
    rng = jax.random.PRNGKey(1)
    labels = jnp.array([1] * 100 + [0] * 100)
    idx, ok = balanced_sample(rng, labels, jnp.ones(200, bool), 128, 0.25)
    lab = np.asarray(labels)[np.asarray(idx)]
    assert (lab[np.asarray(ok)] == 1).sum() == 32  # 128 * 0.25


def test_fpn_level_map():
    # area 224^2 -> level 4 -> index 1 with k_min=3
    box = jnp.array([[0.0, 0.0, 223.0, 223.0],     # exactly canonical
                     [0.0, 0.0, 55.0, 55.0],       # small -> clamped to k_min
                     [0.0, 0.0, 1000.0, 1000.0]])  # big -> k_max
    lv = np.asarray(fpn_level_map(box, 3, 7))
    assert lv[0] == 1
    assert lv[1] == 0
    assert lv[2] == 3  # floor(4 + log2(1001/224)) = floor(6.16) = 6 -> idx 3


def test_stem_accepts_host_s2d_input():
    """Pre-blocked (H/2, W/2, 12) pixels produce identical detections."""
    from oneshotdet_tpu.data.transforms import space_to_depth
    from oneshotdet_tpu.models.resnet import _StemConv

    m = _StemConv(64, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    y3 = m.apply(v, x)
    x12 = jnp.asarray(space_to_depth(np.asarray(x)))
    assert x12.shape == (2, 32, 48, 12)
    y12 = m.apply(v, x12)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y12), atol=1e-6)
    # and both match the direct 7x7/2 convolution
    ref = jax.lax.conv_general_dilated(
        x, v["params"]["kernel"], (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y3), np.asarray(ref), atol=1e-4)
