import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneshotdet_tpu.ops import (
    BoxCoder,
    bce_with_logits,
    cross_entropy,
    iou_loss,
    nms,
    nms_keep_mask,
    roi_align,
    roi_align_reference,
    sigmoid_focal_loss,
    smooth_l1_loss,
)


# ---------------------------------------------------------------------------
# BoxCoder
# ---------------------------------------------------------------------------
def _np_encode(ref, prop, weights=(10.0, 10.0, 5.0, 5.0)):
    """Independent numpy oracle for the reference encode (box_coder.py:22-50)."""
    ex_w = prop[:, 2] - prop[:, 0] + 1
    ex_h = prop[:, 3] - prop[:, 1] + 1
    ex_cx = prop[:, 0] + 0.5 * ex_w
    ex_cy = prop[:, 1] + 0.5 * ex_h
    gt_w = ref[:, 2] - ref[:, 0] + 1
    gt_h = ref[:, 3] - ref[:, 1] + 1
    gt_cx = ref[:, 0] + 0.5 * gt_w
    gt_cy = ref[:, 1] + 0.5 * gt_h
    wx, wy, ww, wh = weights
    return np.stack(
        [
            wx * (gt_cx - ex_cx) / ex_w,
            wy * (gt_cy - ex_cy) / ex_h,
            ww * np.log(gt_w / ex_w),
            wh * np.log(gt_h / ex_h),
        ],
        axis=1,
    )


def test_box_coder_encode_matches_oracle():
    rng = np.random.RandomState(0)
    prop = rng.uniform(0, 50, (16, 4)).astype(np.float32)
    prop[:, 2:] += prop[:, :2] + 5
    gt = prop + rng.uniform(-3, 3, (16, 4)).astype(np.float32)
    coder = BoxCoder()
    enc = np.asarray(coder.encode(jnp.asarray(gt), jnp.asarray(prop)))
    np.testing.assert_allclose(enc, _np_encode(gt, prop), rtol=1e-5, atol=1e-5)


def test_box_coder_roundtrip():
    """decode(encode(gt, prop), prop) == gt (up to the -1 convention)."""
    rng = np.random.RandomState(1)
    prop = rng.uniform(0, 50, (8, 4)).astype(np.float32)
    prop[:, 2:] += prop[:, :2] + 5
    gt = prop + rng.uniform(-3, 3, (8, 4)).astype(np.float32)
    coder = BoxCoder()
    enc = coder.encode(jnp.asarray(gt), jnp.asarray(prop))
    dec = np.asarray(coder.decode(enc, jnp.asarray(prop)))
    # decode subtracts 1 from x2/y2 relative to cx + w/2; encode used +1 widths
    # so the roundtrip recovers gt exactly: x2 = cx + 0.5*w - 1 with w = gt_w+?
    np.testing.assert_allclose(dec[:, 0], gt[:, 0], atol=1e-3)
    np.testing.assert_allclose(dec[:, 1], gt[:, 1], atol=1e-3)
    np.testing.assert_allclose(dec[:, 2], gt[:, 2], atol=1e-3)
    np.testing.assert_allclose(dec[:, 3], gt[:, 3], atol=1e-3)


def test_box_coder_multiclass_layout():
    coder = BoxCoder()
    boxes = jnp.array([[0.0, 0.0, 9.0, 9.0]])
    codes = jnp.zeros((1, 8))
    dec = np.asarray(coder.decode(codes, boxes))
    assert dec.shape == (1, 8)
    # zero deltas decode to the box itself (with the -1 on x2/y2 the box is
    # reproduced since widths use +1)
    np.testing.assert_allclose(dec[0, :4], [0, 0, 9, 9], atol=1e-5)
    np.testing.assert_allclose(dec[0, 4:], [0, 0, 9, 9], atol=1e-5)


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------
def _np_greedy_nms(boxes, scores, thresh):
    """Numpy oracle: CUDA-kernel semantics (sort desc, suppress iou > t, +1)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        w = np.maximum(0, xx2 - xx1 + 1)
        h = np.maximum(0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas - inter)
        later = scores < scores[i]  # strictly later in sorted order (no ties here)
        suppressed |= (iou > thresh) & later
    return sorted(keep)


def test_nms_simple():
    boxes = jnp.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    valid = jnp.ones(3, bool)
    keep = np.asarray(nms_keep_mask(boxes, scores, valid, 0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_nms_matches_numpy_oracle():
    rng = np.random.RandomState(42)
    for trial in range(5):
        n = 64
        xy = rng.uniform(0, 80, (n, 2)).astype(np.float32)
        wh = rng.uniform(5, 40, (n, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], axis=1)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        want = _np_greedy_nms(boxes, scores, 0.5)
        keep = np.asarray(
            nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.5)
        )
        got = sorted(np.nonzero(keep)[0].tolist())
        assert got == want, f"trial {trial}"


def test_nms_invalid_never_kept_or_suppressing():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.array([0.9, 0.95])  # invalid has HIGHER score
    valid = jnp.array([True, False])
    keep = np.asarray(nms_keep_mask(boxes, scores, valid, 0.5))
    np.testing.assert_array_equal(keep, [True, False])


def test_nms_topk_output():
    boxes = jnp.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    idx, ok = nms(boxes, scores, jnp.ones(3, bool), 0.5, max_out=4)
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert list(idx[ok]) == [0, 2]


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------
def test_sigmoid_focal_loss_matches_reference_cpu_formula():
    """Oracle re-derived from layers/sigmoid_focal_loss.py:42-54."""
    rng = np.random.RandomState(3)
    logits = rng.randn(12, 3).astype(np.float32)
    targets = rng.randint(0, 4, 12)  # 0=bg, 1..3 classes
    gamma, alpha, eps = 2.0, 0.25, 1e-6

    class_range = np.arange(1, 4)[None, :]
    t = targets[:, None]
    p = 1 / (1 + np.exp(-logits))
    term1 = (1 - p) ** gamma * np.log(p + eps)
    term2 = p ** gamma * np.log(1 - p + eps)
    want = (
        -(t == class_range).astype(np.float32) * term1 * alpha
        - ((t != class_range) & (t >= 0)).astype(np.float32) * term2 * (1 - alpha)
    ).sum()

    got = float(
        sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets), gamma, alpha)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sigmoid_focal_loss_mask():
    logits = jnp.ones((4, 1))
    targets = jnp.array([1, 1, 1, 1])
    full = float(sigmoid_focal_loss(logits, targets))
    half = float(
        sigmoid_focal_loss(logits, targets, valid=jnp.array([True, True, False, False]))
    )
    np.testing.assert_allclose(half, full / 2, rtol=1e-6)


def test_iou_loss_perfect_prediction():
    ltrb = jnp.array([[5.0, 5.0, 5.0, 5.0]])
    w = jnp.array([1.0])
    assert float(iou_loss(ltrb, ltrb, w, "giou")) < 1e-6
    assert float(iou_loss(ltrb, ltrb, w, "iou")) < 1e-3  # -log((I+1)/(U+1)) == 0


def test_iou_loss_matches_reference_formula():
    """Check the +1 smoothing (iou_loss.py:34) is reproduced."""
    pred = jnp.array([[2.0, 2.0, 2.0, 2.0]])
    tgt = jnp.array([[4.0, 4.0, 4.0, 4.0]])
    w = jnp.array([1.0])
    # areas: pred 16, tgt 64; intersect (2+2)*(2+2)=16; union 64
    # ious = (16+1)/(64+1); enclosing = 8*8=64 → gious = ious - 0
    want_iou = 17.0 / 65.0
    got = float(iou_loss(pred, tgt, w, "linear_iou"))
    np.testing.assert_allclose(got, 1 - want_iou, rtol=1e-5)


def test_smooth_l1():
    p = jnp.array([0.0, 2.0])
    t = jnp.array([0.5, 0.0])
    out = np.asarray(smooth_l1_loss(p, t, beta=1.0))
    np.testing.assert_allclose(out, [0.125, 1.5])


def test_bce_matches_torch_formula():
    x = np.array([-2.0, 0.0, 3.0], np.float32)
    t = np.array([0.0, 1.0, 1.0], np.float32)
    want = -(t * np.log(1 / (1 + np.exp(-x))) + (1 - t) * np.log(1 - 1 / (1 + np.exp(-x))))
    got = np.asarray(bce_with_logits(jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cross_entropy_weighted():
    logits = jnp.array([[2.0, 1.0], [0.5, 2.5]])
    targets = jnp.array([0, 1])
    got = float(cross_entropy(logits, targets))
    p = jax.nn.log_softmax(logits)
    want = float(-(p[0, 0] + p[1, 1]) / 2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


# ---------------------------------------------------------------------------
# ROIAlign
# ---------------------------------------------------------------------------
def test_roi_align_matches_oracle():
    rng = np.random.RandomState(7)
    feat_nchw = rng.randn(2, 3, 16, 20).astype(np.float32)
    rois = np.array(
        [
            [0, 4.0, 4.0, 60.0, 60.0],
            [1, 0.0, 0.0, 30.0, 76.0],
            [0, 10.0, 12.0, 14.0, 13.0],  # tiny roi -> forced >= 1x1
        ],
        np.float32,
    )
    scale, ratio, size = 0.25, 2, (7, 7)
    want = roi_align_reference(feat_nchw, rois, size, scale, ratio)
    feat_nhwc = jnp.asarray(feat_nchw.transpose(0, 2, 3, 1))
    got = np.asarray(roi_align(feat_nhwc, jnp.asarray(rois), size, scale, ratio))
    got_nchw = got.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, want, rtol=1e-4, atol=1e-5)


def test_roi_align_1x1_whole_image():
    """The SuppAlignLayer use-case: 1x1 pool over the whole support box."""
    feat = jnp.ones((1, 8, 8, 4))
    rois = jnp.array([[0, 0.0, 0.0, 63.0, 63.0]])
    out = np.asarray(roi_align(feat, rois, (1, 1), 0.125, 2))
    assert out.shape == (1, 1, 1, 4)
    np.testing.assert_allclose(out, 1.0, rtol=1e-6)


def test_roi_align_is_differentiable():
    feat = jnp.ones((1, 8, 8, 2))
    rois = jnp.array([[0, 0.0, 0.0, 16.0, 16.0]])

    def f(x):
        return roi_align(x, rois, (2, 2), 0.5, 2).sum()

    g = jax.grad(f)(feat)
    assert g.shape == feat.shape
    assert float(jnp.abs(g).sum()) > 0


def test_iou_loss_gradients_finite_with_garbage_padding():
    """Zero-weight rows holding garbage (negative distances -> -log of a
    value crossing 0) must not contaminate gradients: 0-cotangent * inf
    local derivative = NaN unless the INPUTS are sanitized (ADVICE r2)."""
    pred = jnp.array([[5.0, 5.0, 5.0, 5.0],
                      [-3.0, -7.0, 2.0, -1.0]])    # garbage padded row
    target = jnp.array([[4.0, 6.0, 5.0, 5.0],
                        [-2.0, -2.0, -2.0, -2.0]])
    w = jnp.array([1.0, 0.0])
    for lt in ("iou", "linear_iou", "giou"):
        val, grad = jax.value_and_grad(
            lambda p: iou_loss(p, target, w, lt))(pred)
        assert np.isfinite(float(val)), lt
        assert np.isfinite(np.asarray(grad)).all(), lt
        # the padded row receives exactly zero gradient
        assert np.abs(np.asarray(grad[1])).max() == 0.0, lt
