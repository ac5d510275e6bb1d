"""Learnability: the full train loop can overfit one synthetic episode.

The reference has no such test (SURVEY.md §4 — its e2e evidence is the
README train command); in THIS build environment trained-weight AP parity is
unprovable (no datasets/checkpoints, BASELINE.md §validation boundary), so
the strongest available trainability evidence is: run the real jitted train
step (engine/trainer.py, same step the CLI and dryrun use) repeatedly on one
fixed episodic batch and show the total loss collapses. Covers the gradient
path end-to-end: backbone -> fusion -> FCOS losses -> ROI-head losses
(reference hot loop: maskrcnn_benchmark/engine/trainer.py:62-96).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneshotdet_tpu.config import cfg
from oneshotdet_tpu.engine import create_train_state, make_train_step
from oneshotdet_tpu.engine.trainer import batch_to_inputs
from oneshotdet_tpu.models import build_detection_model
from oneshotdet_tpu.solver import make_optimizer
from oneshotdet_tpu.utils.synthetic import make_episodic_batch


def _tiny_train_cfg():
    c = cfg.clone()
    c.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    c.MODEL.RETINANET.USE_C5 = False
    c.MODEL.FCOS.CENTER_SAMPLE = True
    c.MODEL.FCOS.LOC_LOSS_TYPE = "giou"
    c.FEW_SHOT.SIAMESE_BACKBONE = True
    c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
    c.FEW_SHOT.SUPP_ROIALIGN = True
    c.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 128
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 32
    c.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    c.TPU.MAX_GT_BOXES = 8
    c.TPU.NMS_PRE_TOPK = 256
    c.TPU.COMPUTE_DTYPE = "float32"
    # leave the stem trainable so the loss can keep falling on random-ish
    # pixels (the reference default FREEZE_CONV_BODY_AT=2 is covered by
    # test_engine.py::test_optimizer_frozen_params_never_move)
    c.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 0
    c.SOLVER.BASE_LR = 5e-3
    c.SOLVER.WARMUP_ITERS = 0
    c.SOLVER.STEPS = (10_000,)
    return c


@pytest.mark.slow
def test_overfit_single_episode_loss_drops():
    c = _tiny_train_cfg()
    model = build_detection_model(c)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_episodic_batch(
            batch_size=2, query_hw=(96, 96), supp_hw=(64, 64), max_gt=8, seed=7
        ).items()
        if k not in ("img_ids", "idxs")
    }
    images, supp, targets = batch_to_inputs(batch)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        images, supp, targets, train=True, rng=jax.random.PRNGKey(1),
    )
    optimizer, _ = make_optimizer(c, variables["params"])
    state = create_train_state(model, optimizer, variables)
    train_step = jax.jit(make_train_step(model, optimizer), donate_argnums=(0,))
    rng = jax.random.PRNGKey(2)

    losses = []
    for _ in range(25):
        state, metrics = train_step(state, batch, rng)
        losses.append(float(metrics["loss_total"]))
    losses = np.asarray(losses)

    assert np.isfinite(losses).all(), losses
    # median of the last 5 steps well below the first step: the episode is
    # being memorised, i.e. gradients flow through every loss term
    first, tail = losses[0], float(np.median(losses[-5:]))
    assert tail < 0.55 * first, (first, tail, losses.round(3).tolist())
    # and it should keep improving past the halfway point, not plateau at
    # a trivial early win (e.g. centerness collapsing alone)
    mid = float(np.median(losses[10:15]))
    assert tail <= mid + 1e-3, (mid, tail, losses.round(3).tolist())
