"""MASK_ON / KEYPOINT_ON end-to-end wiring (ref roi_heads/roi_heads.py:29-55
CombinedROIHeads; mask_head/loss.py; keypoint_head/loss.py) — previously the
heads existed but were unreachable from a config (VERDICT round 1, Missing #2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneshotdet_tpu.config import cfg
from oneshotdet_tpu.models import build_detection_model
from oneshotdet_tpu.models.mask_head import project_gt_rasters
from oneshotdet_tpu.structures import Boxes, ImageBatch


def _small_cfg():
    c = cfg.clone()
    c.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 64
    c.MODEL.RETINANET.USE_C5 = False
    c.MODEL.FCOS.CENTER_SAMPLE = True
    c.FEW_SHOT.SIAMESE_BACKBONE = False
    c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
    c.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 64
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 32
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 16
    c.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 8
    c.TPU.MAX_GT_BOXES = 4
    c.TPU.MASK_RASTER = 16
    c.TPU.NMS_PRE_TOPK = 128
    c.TPU.COMPUTE_DTYPE = "float32"
    c.MODEL.MASK_ON = True
    c.MODEL.KEYPOINT_ON = True
    c.MODEL.ROI_KEYPOINT_HEAD.CONV_LAYERS = (32, 32)   # tiny for CPU test
    c.MODEL.ROI_MASK_HEAD.CONV_LAYERS = (32, 32)
    c.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 7
    c.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION = 7
    c.MODEL.ROI_MASK_HEAD.POOLER_SCALES = (0.125, 0.0625)
    c.MODEL.ROI_KEYPOINT_HEAD.POOLER_SCALES = (0.125,)
    c.MODEL.ROI_KEYPOINT_HEAD.NUM_CLASSES = 5
    return c


@pytest.fixture(scope="module")
def mask_model():
    c = _small_cfg()
    model = build_detection_model(c)
    b = 1
    rng = np.random.RandomState(0)
    images = ImageBatch(
        pixels=jnp.asarray(rng.randn(b, 64, 64, 3).astype(np.float32)),
        sizes=jnp.array([[64.0, 64.0]]),
    )
    supp = ImageBatch(
        pixels=jnp.asarray(rng.randn(b, 32, 32, 3).astype(np.float32)),
        sizes=jnp.array([[32.0, 32.0]]),
    )
    s = c.TPU.MASK_RASTER
    rasters = np.zeros((b, 4, s, s), np.float32)
    rasters[:, 0, : s // 2] = 1.0            # top half of the gt box
    kps = np.zeros((b, 4, 5, 3), np.float32)
    kps[:, 0, :, 0] = np.linspace(10, 35, 5)  # x
    kps[:, 0, :, 1] = 20.0                    # y
    kps[:, 0, :, 2] = 2.0                     # visible
    targets = Boxes(
        xyxy=jnp.tile(jnp.array([[[8.0, 8.0, 40.0, 40.0]] + [[0.0] * 4] * 3]), (b, 1, 1)),
        valid=jnp.tile(jnp.array([[True, False, False, False]]), (b, 1)),
        size=images.sizes_wh(),
        fields={
            "labels": jnp.tile(jnp.array([[1, 0, 0, 0]]), (b, 1)),
            "masks": jnp.asarray(rasters),
            "keypoints": jnp.asarray(kps),
        },
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, images, supp, targets,
        train=True, rng=jax.random.PRNGKey(1),
    )
    return model, variables, images, supp, targets


def test_mask_keypoint_params_exist(mask_model):
    model, variables, *_ = mask_model
    assert "mask_head" in variables["params"]
    assert "keypoint_head" in variables["params"]


def test_mask_keypoint_train_losses(mask_model):
    model, variables, images, supp, targets = mask_model
    losses = model.apply(variables, images, supp, targets, train=True,
                         rng=jax.random.PRNGKey(2))
    assert "loss_mask" in losses and "loss_kp" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_mask"]) > 0.0


def test_mask_losses_differentiable(mask_model):
    model, variables, images, supp, targets = mask_model

    def total(params):
        losses = model.apply(
            {"params": params, "constants": variables["constants"]},
            images, supp, targets, train=True, rng=jax.random.PRNGKey(2),
        )
        return losses["loss_mask"] + losses["loss_kp"]

    g = jax.grad(total)(variables["params"])
    gm = jax.tree_util.tree_leaves(g["mask_head"])
    assert any(float(jnp.abs(x).max()) > 0 for x in gm)


def test_mask_keypoint_eval_fields(mask_model):
    model, variables, images, supp, _ = mask_model
    dets = model.apply(variables, images, supp, train=False)
    probs = dets.get_field("mask_probs")
    assert probs.shape[:2] == dets.valid.shape
    assert probs.shape[2] == probs.shape[3]            # square mask grid
    assert float(probs.min()) >= 0.0 and float(probs.max()) <= 1.0
    kxy = dets.get_field("keypoints_xy")
    assert kxy.shape[:2] == dets.valid.shape and kxy.shape[2] == 5


def test_project_gt_rasters_identity_and_offset():
    # identity: proposal == gt box -> raster reproduced (up to bilinear)
    s = 8
    raster = np.zeros((1, s, s), np.float32)
    raster[0, : s // 2] = 1.0
    gt = jnp.array([[10.0, 10.0, 30.0, 30.0]])
    out = project_gt_rasters(jnp.asarray(raster), gt, gt, s)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[0, -1]), 0.0, atol=1e-5)
    # proposal entirely outside the gt box -> all zeros
    far = jnp.array([[50.0, 50.0, 60.0, 60.0]])
    out2 = project_gt_rasters(jnp.asarray(raster), gt, far, s)
    np.testing.assert_allclose(np.asarray(out2), 0.0, atol=1e-6)
    # proposal = lower half of gt -> sees only the raster's lower (zero) half
    lower = jnp.array([[10.0, 20.0, 30.0, 30.0]])
    out3 = project_gt_rasters(jnp.asarray(raster), gt, lower, s)
    assert float(out3.mean()) < 0.2


def test_compute_on_dataset_surfaces_mask_and_keypoints(mask_model):
    """engine/inference.py: MASK_ON/KEYPOINT_ON eval results must carry
    mask_probs + keypoints_xy/scores per detection (consumed by the segm and
    keypoints COCOeval passes, ref coco_eval.py prepare_for_coco_*)."""
    import numpy as np

    from oneshotdet_tpu.engine.inference import compute_on_dataset

    model, variables, images, supp, _ = mask_model
    batch = {
        "query_pixels": np.asarray(images.pixels),
        "query_sizes": np.asarray(images.sizes),
        "supp_pixels": np.asarray(supp.pixels),
        "supp_sizes": np.asarray(supp.sizes),
        "target_ids": np.array([1]),
        "idxs": np.array([0]),
        "img_ids": np.array([0]),
    }
    results = compute_on_dataset(model, variables, [batch])
    r = results[0]
    n = len(r["boxes"])
    assert r["mask_probs"].shape[0] == n and r["mask_probs"].ndim == 3
    assert r["keypoints_xy"].shape == (n, 5, 2)
    assert r["keypoints_scores"].shape == (n, 5)
