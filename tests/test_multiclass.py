"""Multi-class episode batching: one query backbone+FPN pass amortized over
S support classes (engine/inference.py::make_multiclass_eval_step).

The evaluation protocol revisits each query image once per class (reference
data/datasets/coco.py:181-203 — dataset length = Σ_cat #imgs(cat)) and
fusion happens after the query backbone (generalized_rcnn.py:270 vs
:307-311), so the batched path must produce, for every class s, exactly the
detections the unbatched cached-support path produces when run against that
class's support alone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneshotdet_tpu.config import cfg
from oneshotdet_tpu.engine.inference import (
    make_cached_support_eval_steps,
    make_multiclass_eval_step,
)
from oneshotdet_tpu.models import build_detection_model
from oneshotdet_tpu.structures import ImageBatch
from oneshotdet_tpu.utils.synthetic import make_episodic_batch


def _small_cfg():
    c = cfg.clone()
    c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    c.MODEL.RETINANET.USE_C5 = False
    c.FEW_SHOT.SIAMESE_BACKBONE = True
    c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
    c.FEW_SHOT.SUPP_ROIALIGN = True
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 50
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 16
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 16
    c.TPU.NMS_PRE_TOPK = 128
    c.TPU.COMPUTE_DTYPE = "float32"
    return c


def _setup(c, b=2, s_classes=3, seed=0):
    model = build_detection_model(c)
    batch = make_episodic_batch(b, (64, 64), (32, 32), max_gt=4, seed=seed)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("img_ids", "idxs")}
    images = ImageBatch(pixels=jbatch["query_pixels"],
                        sizes=jbatch["query_sizes"])
    supp = ImageBatch(pixels=jbatch["supp_pixels"],
                      sizes=jbatch["supp_sizes"])
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, supp,
                           train=False)

    # one support crop per class, computed at batch 1 (class-level features)
    support_step, query_step = make_cached_support_eval_steps(model)
    rng = np.random.RandomState(seed + 100)
    per_class = []
    for s in range(s_classes):
        sp = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
        ss = jnp.asarray([[32.0, 32.0]])
        per_class.append(support_step(variables, sp, ss))
    n_levels = len(per_class[0][0])
    pooled_stack = [jnp.stack([pc[0][lvl] for pc in per_class])
                    for lvl in range(n_levels)]          # (S, 1, 1, 1, C)
    s7_stack = jnp.stack([pc[1] for pc in per_class])    # (S, 1, shot, 7, 7, C)
    tids = jnp.arange(1, s_classes + 1, dtype=jnp.int32)
    return model, variables, jbatch, per_class, pooled_stack, s7_stack, tids, query_step


def test_multiclass_matches_per_class():
    """detect-all-S-classes-in-one-pass == S independent cached-support runs."""
    c = _small_cfg()
    b, s_classes = 2, 3
    (model, variables, jbatch, per_class, pooled_stack, s7_stack, tids,
     query_step) = _setup(c, b, s_classes)

    mc_step = make_multiclass_eval_step(model)
    mc_xyxy, mc_scores, mc_labels, mc_valid = mc_step(
        variables, jbatch, pooled_stack, s7_stack, tids)
    assert mc_xyxy.shape[:2] == (s_classes, b)

    for s in range(s_classes):
        pooled_b = [jnp.tile(p, (b, 1, 1, 1)) for p in per_class[s][0]]
        s7_b = jnp.tile(per_class[s][1], (b, 1, 1, 1, 1))
        sbatch = dict(jbatch)
        sbatch["target_ids"] = jnp.full((b,), s + 1, jnp.int32)
        xyxy, scores, labels, valid = query_step(
            variables, sbatch, pooled_b, s7_b)
        np.testing.assert_array_equal(np.asarray(mc_valid[s]),
                                      np.asarray(valid))
        np.testing.assert_array_equal(np.asarray(mc_labels[s]),
                                      np.asarray(labels))
        v = np.asarray(valid)
        np.testing.assert_allclose(np.asarray(mc_xyxy[s])[v],
                                   np.asarray(xyxy)[v],
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(mc_scores[s])[v],
                                   np.asarray(scores)[v],
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_multiclass_matches_per_class_topk_preset():
    """Same equivalence under the fast-eval preset lever (EVAL_ROI_TOPK)."""
    c = _small_cfg()
    c.TPU.EVAL_ROI_TOPK = 8
    b, s_classes = 2, 2
    (model, variables, jbatch, per_class, pooled_stack, s7_stack, tids,
     query_step) = _setup(c, b, s_classes, seed=7)

    mc_step = make_multiclass_eval_step(model)
    mc_xyxy, mc_scores, mc_labels, mc_valid = mc_step(
        variables, jbatch, pooled_stack, s7_stack, tids)

    for s in range(s_classes):
        pooled_b = [jnp.tile(p, (b, 1, 1, 1)) for p in per_class[s][0]]
        s7_b = jnp.tile(per_class[s][1], (b, 1, 1, 1, 1))
        sbatch = dict(jbatch)
        sbatch["target_ids"] = jnp.full((b,), s + 1, jnp.int32)
        xyxy, scores, labels, valid = query_step(
            variables, sbatch, pooled_b, s7_b)
        np.testing.assert_array_equal(np.asarray(mc_valid[s]),
                                      np.asarray(valid))
        v = np.asarray(valid)
        np.testing.assert_allclose(np.asarray(mc_xyxy[s])[v],
                                   np.asarray(xyxy)[v],
                                   rtol=1e-5, atol=1e-4)


@pytest.mark.slow
def test_multiclass_on_data_mesh():
    """The multi-class step shards the query batch over the 8-device mesh."""
    from oneshotdet_tpu.parallel import make_mesh

    c = _small_cfg()
    b, s_classes = 8, 2
    (model, variables, jbatch, per_class, pooled_stack, s7_stack, tids,
     _) = _setup(c, b, s_classes, seed=3)

    assert len(jax.devices()) >= 8
    mesh = make_mesh(("data",))
    mc_step = make_multiclass_eval_step(model, mesh=mesh)
    mc_xyxy, mc_scores, mc_labels, mc_valid = mc_step(
        variables, jbatch, pooled_stack, s7_stack, tids)
    assert mc_xyxy.shape[:2] == (s_classes, b)
    assert np.isfinite(np.asarray(mc_xyxy)).all()
    assert np.isfinite(np.asarray(mc_scores)).all()
