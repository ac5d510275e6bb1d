"""Siamese detector forward smoke tests (the test the reference never had —
its test_detectors.py only covers the legacy single-arg forward, SURVEY §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneshotdet_tpu.config import cfg
from oneshotdet_tpu.models import build_detection_model
from oneshotdet_tpu.structures import Boxes, ImageBatch


@pytest.fixture(scope="module")
def small_cfg():
    c = cfg.clone()
    c.merge_from_file("/root/reference/configs/fcos/2019_10_25_vanilla_siamse_backbone.yaml")
    # shrink capacities for CPU test speed
    c.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 200
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 100
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 64
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 32
    c.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 32
    c.TPU.MAX_GT_BOXES = 4
    c.TPU.NMS_PRE_TOPK = 256
    c.TPU.COMPUTE_DTYPE = "float32"
    return c


@pytest.fixture(scope="module")
def model_and_vars(small_cfg):
    model = build_detection_model(small_cfg)
    b = 2
    rng = np.random.RandomState(0)
    images = ImageBatch(
        pixels=jnp.asarray(rng.randn(b, 64, 64, 3).astype(np.float32)),
        sizes=jnp.array([[64.0, 64.0], [48.0, 56.0]]),
    )
    supp = ImageBatch(
        pixels=jnp.asarray(rng.randn(b, 32, 32, 3).astype(np.float32)),
        sizes=jnp.array([[32.0, 32.0], [32.0, 24.0]]),
    )
    targets = Boxes(
        xyxy=jnp.tile(jnp.array([[[8.0, 8.0, 40.0, 40.0]] + [[0.0] * 4] * 3]), (b, 1, 1)),
        valid=jnp.tile(jnp.array([[True, False, False, False]]), (b, 1)),
        size=images.sizes_wh(),
        fields={"labels": jnp.tile(jnp.array([[1, 0, 0, 0]]), (b, 1))},
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        images, supp, targets, train=True, rng=jax.random.PRNGKey(1),
    )
    return model, variables, images, supp, targets


def test_train_forward_losses(model_and_vars):
    model, variables, images, supp, targets = model_and_vars
    losses = model.apply(
        variables, images, supp, targets, train=True, rng=jax.random.PRNGKey(2)
    )
    expected = {"loss_cls", "loss_reg", "loss_centerness", "loss_classifier", "loss_box_reg"}
    assert set(losses.keys()) == expected
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_train_losses_differentiable(model_and_vars):
    model, variables, images, supp, targets = model_and_vars

    def total(params):
        losses = model.apply(
            {"params": params, "constants": variables["constants"]},
            images, supp, targets, train=True, rng=jax.random.PRNGKey(2),
        )
        return sum(losses.values())

    g = jax.grad(total)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    norms = [float(jnp.abs(x).sum()) for x in flat]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) // 2  # most params get gradient


def test_eval_forward_detections(model_and_vars):
    model, variables, images, supp, _ = model_and_vars
    dets = model.apply(
        variables, images, supp, target_ids=jnp.array([7, 9]), train=False
    )
    assert dets.xyxy.shape == (2, 32, 4)
    labels = np.asarray(dets.get_field("labels"))
    assert (labels[0] == 7).all() and (labels[1] == 9).all()
    scores = np.asarray(dets.get_field("scores"))
    assert np.isfinite(scores).all()
    # detections are clipped to image bounds (image 1 true size h=48, w=56)
    v = np.asarray(dets.valid)
    if v[1].any():
        arr = np.asarray(dets.xyxy)[1][v[1]]
        assert arr[:, 2].max() <= 55.0 + 1e-4  # x2 < w
        assert arr[:, 3].max() <= 47.0 + 1e-4  # y2 < h


def test_rpn_only_mode(small_cfg):
    c = small_cfg.clone()
    c.MODEL.RPN_ONLY = True
    model = build_detection_model(c)
    b = 1
    images = ImageBatch(pixels=jnp.zeros((b, 64, 64, 3)), sizes=jnp.array([[64.0, 64.0]]))
    supp = ImageBatch(pixels=jnp.zeros((b, 32, 32, 3)), sizes=jnp.array([[32.0, 32.0]]))
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, supp, train=False)
    out = model.apply(variables, images, supp, train=False)
    assert out.xyxy.shape[0] == 1  # proposals-only path returns Boxes
