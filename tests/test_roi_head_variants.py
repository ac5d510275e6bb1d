import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneshotdet_tpu.models.roi_head import (
    predictor_num_classes,
    roi_head_loss,
    soft_labeling_function,
)


def _setup(num_classes=2, num_reg=2, b=2, s=8):
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(b * s, num_classes).astype(np.float32))
    deltas = jnp.asarray(rng.randn(b * s, num_reg * 4).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 2, (b, s)).astype(np.int32))
    reg_t = jnp.asarray(rng.randn(b, s, 4).astype(np.float32))
    valid = jnp.ones((b, s), bool)
    return logits, deltas, labels, reg_t, valid


def test_soft_labeling_functions():
    t = jnp.array([0.0, 0.05, 0.3, 0.5, 0.75, 1.0])
    np.testing.assert_allclose(
        np.asarray(soft_labeling_function(t, "discrete")), [0, 0, 0, 1, 1, 1]
    )
    np.testing.assert_allclose(np.asarray(soft_labeling_function(t, "linear")), np.asarray(t))
    tl = np.asarray(soft_labeling_function(t, "transLinear"))
    np.testing.assert_allclose(tl[3], 0.9, atol=1e-6)   # 0.2*0.5+0.8
    np.testing.assert_allclose(tl[1], 0.0, atol=1e-6)   # below 0.1
    t4 = np.asarray(soft_labeling_function(t, "trans4thLinear"))
    np.testing.assert_allclose(t4[2], 0.9 * 0.6 ** 4, atol=1e-5)
    np.testing.assert_allclose(t4[5], 1.0, atol=1e-6)


@pytest.mark.parametrize("loss_type,ncls", [
    ("ce_loss", 2), ("focal_loss", 1), ("mse_loss", 1), ("l1_loss", 1),
    ("cxe_loss", 2),
])
def test_all_cls_loss_types_finite(loss_type, ncls):
    _, nreg = predictor_num_classes("concat", loss_type, False)
    logits, deltas, labels, reg_t, valid = _setup(ncls, nreg)
    soft = jnp.asarray(np.random.RandomState(1).rand(2, 8).astype(np.float32))
    cls_l, box_l = roi_head_loss(
        logits, deltas, labels, reg_t, valid, loss_type, soft_labels=soft
    )
    assert np.isfinite(float(cls_l)) and float(cls_l) >= 0
    assert np.isfinite(float(box_l))


def test_weighted_ce_differs():
    logits, deltas, labels, reg_t, valid = _setup()
    a, _ = roi_head_loss(logits, deltas, labels, reg_t, valid, "ce_loss")
    b, _ = roi_head_loss(logits, deltas, labels, reg_t, valid, "ce_loss",
                         loss_weighted=True)
    assert float(a) != pytest.approx(float(b))


def test_neg_support_margin():
    logits, deltas, labels, reg_t, valid = _setup()
    # neg logits strongly positive -> high suppression loss
    neg_hi = jnp.tile(jnp.array([[-5.0, 5.0]]), (16, 1))
    _, _, sup_hi = roi_head_loss(logits, deltas, labels, reg_t, valid,
                                 "ce_loss", neg_logits=neg_hi)
    neg_lo = jnp.tile(jnp.array([[5.0, -5.0]]), (16, 1))
    _, _, sup_lo = roi_head_loss(logits, deltas, labels, reg_t, valid,
                                 "ce_loss", neg_logits=neg_lo)
    assert float(sup_hi) > float(sup_lo)
    # with neg fg-prob ~1 and random pos scores, margin stays near its cap
    assert float(sup_hi) > 0.5


def test_reverse_order_consistency_zero_when_identical():
    logits, deltas, labels, reg_t, valid = _setup()
    _, _, rev = roi_head_loss(logits, deltas, labels, reg_t, valid, "ce_loss",
                              rev_logits=logits)
    assert float(rev) == pytest.approx(0.0, abs=1e-5)
    _, _, rev2 = roi_head_loss(logits, deltas, labels, reg_t, valid, "ce_loss",
                               rev_logits=-logits)
    assert float(rev2) > 0


@pytest.mark.slow
def test_prepool_compress_parity(monkeypatch):
    """ONESHOT_PREPOOL_COMPRESS=1 hoists the compress_0 query-half 1x1
    matmul to full-map cost before ROI pooling (models/detector.py
    _eval_roi_pool). A 1x1 per-channel linear map commutes exactly with
    bilinear ROI pooling, so eval detections must match the standard path
    to float tolerance."""
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

    model = build_detection_model(c)
    rng = np.random.RandomState(0)
    images = ImageBatch(
        pixels=jnp.asarray(rng.randn(2, 96, 128, 3).astype(np.float32)),
        sizes=jnp.array([[96.0, 128.0], [96.0, 128.0]]))
    supp = ImageBatch(
        pixels=jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32)),
        sizes=jnp.array([[64.0, 64.0], [64.0, 64.0]]))
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, supp,
                           train=False)

    def run():
        dets = model.apply(variables, images, supp,
                           target_ids=jnp.array([1, 1]), train=False)
        return (np.asarray(dets.xyxy), np.asarray(dets.get_field("scores")),
                np.asarray(dets.valid))

    monkeypatch.delenv("ONESHOT_PREPOOL_COMPRESS", raising=False)
    base = run()
    monkeypatch.setenv("ONESHOT_PREPOOL_COMPRESS", "1")
    fused = run()
    np.testing.assert_allclose(fused[0], base[0], atol=1e-3)
    np.testing.assert_allclose(fused[1], base[1], atol=1e-4)
    np.testing.assert_array_equal(fused[2], base[2])


def test_compact_boxes_valid_first_stable():
    from oneshotdet_tpu.models.roi_head import compact_boxes, truncate_boxes
    from oneshotdet_tpu.structures import Boxes

    xyxy = jnp.arange(6 * 4, dtype=jnp.float32).reshape(1, 6, 4)
    valid = jnp.array([[False, True, False, True, True, False]])
    scores = jnp.arange(6, dtype=jnp.float32)[None]
    b = Boxes(xyxy=xyxy, valid=valid, size=jnp.array([[64.0, 64.0]]),
              fields={"scores": scores})
    c = compact_boxes(b)
    # valid rows 1,3,4 first (order preserved), then invalid 0,2,5
    np.testing.assert_array_equal(np.asarray(c.valid[0]),
                                  [True, True, True, False, False, False])
    np.testing.assert_allclose(np.asarray(c.xyxy[0, :3]),
                               np.asarray(xyxy[0, [1, 3, 4]]))
    np.testing.assert_allclose(np.asarray(c.fields["scores"][0, :3]),
                               [1.0, 3.0, 4.0])
    # truncation after compaction keeps REAL boxes (the reference's
    # proposal[:1000] counts real boxes, generalized_rcnn.py:202)
    t = truncate_boxes(c, 3)
    assert int(t.valid.sum()) == 3


def test_artificial_proposals_cap_counts_real_boxes():
    """With few GTs the artificial block is mostly invalid padding; the
    1000-cap must not let that padding crowd out real scored proposals
    (ADVICE r2 medium)."""
    from oneshotdet_tpu.models.roi_head import (
        compact_boxes, make_artificial_proposals, truncate_boxes,
    )
    from oneshotdet_tpu.structures import Boxes, cat_boxes

    g = 64  # max_gt capacity, only 2 real GTs
    gt = Boxes(
        xyxy=jnp.tile(jnp.array([[[8.0, 8.0, 40.0, 40.0]]]), (1, g, 1)),
        valid=jnp.arange(g)[None] < 2,
        size=jnp.array([[128.0, 128.0]]),
        fields={"scores": jnp.ones((1, g)), "objectness": jnp.ones((1, g))},
    )
    props = Boxes(
        xyxy=jnp.tile(jnp.array([[[1.0, 1.0, 20.0, 20.0]]]), (1, 900, 1)),
        valid=jnp.ones((1, 900), bool),
        size=jnp.array([[128.0, 128.0]]),
        fields={"scores": jnp.full((1, 900), 0.5),
                "objectness": jnp.full((1, 900), 0.5)},
    )
    art = make_artificial_proposals(jax.random.PRNGKey(0), gt)
    merged = truncate_boxes(compact_boxes(cat_boxes(cat_boxes(art, gt), props)), 1000)
    # artificial block capacity is g*12=768, but only ~2*12 real jitters;
    # nearly all 900 scored proposals must survive the cap
    n_art_valid = int(art.valid.sum())
    assert n_art_valid <= 2 * 12
    assert int(merged.valid.sum()) >= 900  # pre-fix this was ~1000-768=232
