"""DENSE_POINTS variant (ref fcos.py:236-255) and ADD_ARTIFICIAL_PROPOSALS
(ref generalized_rcnn.py:106-204) — round-1 dead keys now wired."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneshotdet_tpu.config import cfg
from oneshotdet_tpu.models import build_detection_model
from oneshotdet_tpu.models.fcos import compute_locations
from oneshotdet_tpu.models.roi_head import make_artificial_proposals, truncate_boxes
from oneshotdet_tpu.structures import Boxes, ImageBatch


def test_dense_locations_golden():
    base = compute_locations([(2, 2)], [8])[0]
    assert base.shape == (4, 2)
    d4 = compute_locations([(2, 2)], [8], dense_points=4)[0]
    assert d4.shape == (16, 2)
    # first cell center (4, 4); step = 8 // 4 = 2 -> corners at +-2
    np.testing.assert_allclose(
        np.asarray(d4[:4]), [[2, 2], [6, 2], [2, 6], [6, 6]]
    )
    d5 = compute_locations([(2, 2)], [8], dense_points=5)[0]
    assert d5.shape == (20, 2)
    np.testing.assert_allclose(np.asarray(d5[2]), [4, 4])  # center point


def _small_cfg(**kw):
    c = cfg.clone()
    c.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 64
    c.MODEL.RETINANET.USE_C5 = False
    c.FEW_SHOT.SIAMESE_BACKBONE = False
    c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
    c.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 64
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 16
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 16
    c.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 8
    c.TPU.MAX_GT_BOXES = 4
    c.TPU.NMS_PRE_TOPK = 128
    c.TPU.COMPUTE_DTYPE = "float32"
    for k, v in kw.items():
        node = c
        parts = k.split(".")
        for p in parts[:-1]:
            node = getattr(node, p)
        setattr(node, parts[-1], v)
    return c


def _inputs(b=1):
    rng = np.random.RandomState(0)
    images = ImageBatch(
        pixels=jnp.asarray(rng.randn(b, 64, 64, 3).astype(np.float32)),
        sizes=jnp.array([[64.0, 64.0]] * b),
    )
    supp = ImageBatch(
        pixels=jnp.asarray(rng.randn(b, 32, 32, 3).astype(np.float32)),
        sizes=jnp.array([[32.0, 32.0]] * b),
    )
    targets = Boxes(
        xyxy=jnp.tile(jnp.array([[[8.0, 8.0, 40.0, 40.0]] + [[0.0] * 4] * 3]), (b, 1, 1)),
        valid=jnp.tile(jnp.array([[True, False, False, False]]), (b, 1)),
        size=images.sizes_wh(),
        fields={"labels": jnp.tile(jnp.array([[1, 0, 0, 0]]), (b, 1))},
    )
    return images, supp, targets


@pytest.mark.parametrize("dp", [4, 5])
def test_dense_points_detector_train_eval(dp):
    c = _small_cfg(**{"MODEL.FCOS.DENSE_POINTS": dp})
    model = build_detection_model(c)
    images, supp, targets = _inputs()
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, supp,
                           targets, train=True, rng=jax.random.PRNGKey(1))
    # head emits dp-multiplied channels
    k = variables["params"]["fcos_head"]["cls_logits"]["kernel"]
    assert k.shape[-1] == dp
    losses = model.apply(variables, images, supp, targets, train=True,
                         rng=jax.random.PRNGKey(2))
    assert all(np.isfinite(float(v)) for v in losses.values())
    dets = model.apply(variables, images, supp, train=False)
    assert dets.xyxy.shape[0] == 1


def test_artificial_proposals_bins():
    gt = Boxes(
        xyxy=jnp.array([[[100.0, 100.0, 300.0, 260.0],
                         [0.0, 0.0, 0.0, 0.0]]]),
        valid=jnp.array([[True, False]]),
        size=jnp.array([[640.0, 480.0]]),
        fields={},
    )
    art = make_artificial_proposals(jax.random.PRNGKey(0), gt, pool=256)
    assert art.xyxy.shape == (1, 2 * 4 * 3, 4)   # G * nbins * required_num
    bx = np.asarray(art.xyxy[0])
    vl = np.asarray(art.valid[0])
    # slots of the invalid gt are invalid
    assert not vl[12:].any()
    # every valid jitter has raw-area IoU >= 0.5999 with its gt and its
    # bin matches its slot index
    g = np.array([100.0, 100.0, 300.0, 260.0])

    def iou(a, b):
        il, it = np.maximum(a[:2], b[:2])
        ir, ib = np.minimum(a[2:], b[2:])
        inter = max(ir - il, 0) * max(ib - it, 0)
        ar = lambda x: (x[2] - x[0]) * (x[3] - x[1])
        return inter / (ar(a) + ar(b) - inter)

    found_bins = set()
    for slot in range(12):
        if not vl[slot]:
            continue
        v = iou(g, bx[slot])
        assert v >= 0.5999
        expect_bin = slot // 3
        got_bin = min(int((v - 0.5999) / 0.1), 3)
        assert got_bin == expect_bin, (slot, v)
        found_bins.add(expect_bin)
    assert {0, 1, 2} <= found_bins  # generous pool fills the easy bins


def test_truncate_boxes():
    b = Boxes(
        xyxy=jnp.zeros((2, 10, 4)), valid=jnp.ones((2, 10), bool),
        size=jnp.ones((2, 2)), fields={"scores": jnp.zeros((2, 10))},
    )
    t = truncate_boxes(b, 4)
    assert t.xyxy.shape == (2, 4, 4) and t.get_field("scores").shape == (2, 4)
    assert truncate_boxes(b, 20).xyxy.shape == (2, 10, 4)


def test_artificial_proposals_detector_train():
    c = _small_cfg(**{"FEW_SHOT.ADD_ARTIFICIAL_PROPOSALS": True})
    model = build_detection_model(c)
    images, supp, targets = _inputs()
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, supp,
                           targets, train=True, rng=jax.random.PRNGKey(1))
    losses = model.apply(variables, images, supp, targets, train=True,
                         rng=jax.random.PRNGKey(2))
    assert all(np.isfinite(float(v)) for v in losses.values())
