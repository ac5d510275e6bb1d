"""TPU.EVAL_ROI_TOPK — opt-in stage-2 proposal compaction (VERDICT r2 #4).

Correctness property: stage-1 postprocess outputs are score-sorted, so
truncating a capacity-N proposal set to its first K slots must be
bit-identical to running stage 1 with capacity K in the first place; the
entire downstream (ROIAlign -> ROI head -> final NMS) then agrees exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneshotdet_tpu.config import cfg
from oneshotdet_tpu.models import build_detection_model
from oneshotdet_tpu.structures import ImageBatch


def _cfg(post_top_n, topk):
    c = cfg.clone()
    c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    c.MODEL.RETINANET.USE_C5 = False
    c.FEW_SHOT.SIAMESE_BACKBONE = True
    c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 256
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = post_top_n
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 32
    c.TPU.NMS_PRE_TOPK = 512
    c.TPU.COMPUTE_DTYPE = "float32"
    c.TPU.HOST_S2D = False
    c.TPU.EVAL_ROI_TOPK = topk
    return c


def _run(c, pixels, supp_pixels):
    model = build_detection_model(c)
    images = ImageBatch(pixels=pixels, sizes=jnp.array([[96.0, 128.0]] * 2))
    supp = ImageBatch(pixels=supp_pixels, sizes=jnp.array([[64.0, 64.0]] * 2))
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, supp,
                           train=False)
    dets = model.apply(variables, images, supp,
                       target_ids=jnp.ones((2,), jnp.int32), train=False)
    return (np.asarray(dets.xyxy), np.asarray(dets.get_field("scores")),
            np.asarray(dets.valid))


def test_compaction_equals_smaller_stage1_capacity():
    rng = np.random.RandomState(3)
    pixels = jnp.asarray(rng.randn(2, 96, 128, 3).astype(np.float32))
    supp = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))

    full_topk = _run(_cfg(post_top_n=128, topk=64), pixels, supp)
    small_cap = _run(_cfg(post_top_n=64, topk=0), pixels, supp)

    np.testing.assert_array_equal(full_topk[2], small_cap[2])
    np.testing.assert_allclose(full_topk[0], small_cap[0], rtol=0, atol=0)
    np.testing.assert_allclose(full_topk[1], small_cap[1], rtol=0, atol=0)


def test_topk_zero_is_identity():
    rng = np.random.RandomState(4)
    pixels = jnp.asarray(rng.randn(2, 96, 128, 3).astype(np.float32))
    supp = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    off = _run(_cfg(post_top_n=64, topk=0), pixels, supp)
    same = _run(_cfg(post_top_n=64, topk=64), pixels, supp)  # k == capacity
    np.testing.assert_array_equal(off[2], same[2])
    np.testing.assert_allclose(off[0], same[0], atol=0)
