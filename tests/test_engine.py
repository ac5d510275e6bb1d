import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneshotdet_tpu.config import cfg
from oneshotdet_tpu.solver import make_optimizer, make_param_labels, warmup_multistep_schedule


def test_warmup_multistep_schedule_linear():
    s = warmup_multistep_schedule(1.0, (100, 200), gamma=0.1,
                                  warmup_factor=1 / 3, warmup_iters=10,
                                  warmup_method="linear")
    assert float(s(0)) == pytest.approx(1 / 3)
    assert float(s(5)) == pytest.approx(1 / 3 * 0.5 + 0.5)
    assert float(s(10)) == pytest.approx(1.0)
    assert float(s(150)) == pytest.approx(0.1)
    assert float(s(250)) == pytest.approx(0.01)


def test_warmup_constant():
    s = warmup_multistep_schedule(2.0, (), warmup_factor=0.25, warmup_iters=100,
                                  warmup_method="constant")
    assert float(s(50)) == pytest.approx(0.5)
    assert float(s(100)) == pytest.approx(2.0)


def test_param_labels_bias_and_frozen():
    params = {
        "backbone": {
            "body": {
                "stem": {"conv1": {"kernel": jnp.zeros(1)}},
                "layer1_0": {"conv1": {"kernel": jnp.zeros(1)}},
                "layer2_0": {"conv1": {"kernel": jnp.zeros(1)}},
            },
            "fpn": {"fpn_inner2": {"kernel": jnp.zeros(1), "bias": jnp.zeros(1)}},
        },
        "fcos_head": {"cls_logits": {"kernel": jnp.zeros(1), "bias": jnp.zeros(1)}},
    }
    labels = make_param_labels(params, untrained_keywords=(), freeze_conv_body_at=2)
    assert labels["backbone"]["body"]["stem"]["conv1"]["kernel"] == "frozen"
    assert labels["backbone"]["body"]["layer1_0"]["conv1"]["kernel"] == "frozen"
    assert labels["backbone"]["body"]["layer2_0"]["conv1"]["kernel"] == "weight"
    assert labels["backbone"]["fpn"]["fpn_inner2"]["bias"] == "bias"
    assert labels["fcos_head"]["cls_logits"]["kernel"] == "weight"


def test_param_labels_untrained_keyword():
    params = {"roi_head": {"fc6": {"kernel": jnp.zeros(1)}},
              "fcos_head": {"cls_logits": {"kernel": jnp.zeros(1)}}}
    labels = make_param_labels(params, untrained_keywords=("roi_head",),
                               freeze_conv_body_at=0)
    assert labels["roi_head"]["fc6"]["kernel"] == "frozen"
    assert labels["fcos_head"]["cls_logits"]["kernel"] == "weight"


def test_optimizer_frozen_params_never_move():
    c = cfg.clone()
    c.SOLVER.BASE_LR = 0.1
    c.SOLVER.WARMUP_ITERS = 0
    params = {
        "backbone": {"body": {"stem": {"conv1": {"kernel": jnp.ones(4)}},
                              "layer2_0": {"conv1": {"kernel": jnp.ones(4)}}}},
    }
    tx, _ = make_optimizer(c, params)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["backbone"]["body"]["stem"]["conv1"]["kernel"]).sum()) == 0
    assert float(jnp.abs(updates["backbone"]["body"]["layer2_0"]["conv1"]["kernel"]).sum()) > 0


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    """The full DP train step on the virtual 8-device CPU mesh."""
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    assert len(jax.devices()) >= 8
    dryrun_multichip(8)


@pytest.mark.slow
def test_mesh_sharded_eval_8_devices():
    """compute_on_dataset over a data mesh: batch 8 sharded 1-per-device."""
    import numpy as np

    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.engine.inference import compute_on_dataset
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.parallel import make_mesh
    from oneshotdet_tpu.structures import ImageBatch
    from oneshotdet_tpu.utils.synthetic import make_episodic_batch

    c = cfg.clone()
    c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    c.MODEL.RETINANET.USE_C5 = False
    c.FEW_SHOT.SIAMESE_BACKBONE = True
    c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 50
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 16
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 16
    c.TPU.NMS_PRE_TOPK = 128
    c.TPU.COMPUTE_DTYPE = "float32"
    model = build_detection_model(c)

    assert len(jax.devices()) >= 8
    mesh = make_mesh(("data",))
    batch = make_episodic_batch(8, (64, 64), (32, 32), max_gt=4)
    batch["idxs"] = np.arange(8)
    batch["img_ids"] = np.arange(8)

    images = ImageBatch(pixels=jnp.asarray(batch["query_pixels"]),
                        sizes=jnp.asarray(batch["query_sizes"]))
    supp = ImageBatch(pixels=jnp.asarray(batch["supp_pixels"]),
                      sizes=jnp.asarray(batch["supp_sizes"]))
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, supp,
                           train=False)

    results = compute_on_dataset(model, variables, [batch], mesh=mesh)
    assert sorted(results.keys()) == list(range(8))
    for r in results.values():
        assert r["boxes"].ndim == 2 and r["boxes"].shape[1] == 4


@pytest.mark.slow
def test_mesh_sharded_eval_with_fast_eval_levers():
    """The round-3 opt-in levers (TPU.QUANT=int8 + TPU.EVAL_ROI_TOPK, the
    fast-eval preset) compose with the data-mesh sharded eval path."""
    import numpy as np

    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.engine.inference import compute_on_dataset
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.parallel import make_mesh
    from oneshotdet_tpu.structures import ImageBatch
    from oneshotdet_tpu.utils.synthetic import make_episodic_batch

    c = cfg.clone()
    c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    c.MODEL.RETINANET.USE_C5 = False
    c.FEW_SHOT.SIAMESE_BACKBONE = True
    c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 50
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 16
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 16
    c.TPU.NMS_PRE_TOPK = 128
    c.TPU.COMPUTE_DTYPE = "float32"
    c.TPU.QUANT = "int8"
    c.TPU.EVAL_ROI_TOPK = 8
    model = build_detection_model(c)

    assert len(jax.devices()) >= 8
    mesh = make_mesh(("data",))
    batch = make_episodic_batch(8, (64, 64), (32, 32), max_gt=4)
    batch["idxs"] = np.arange(8)
    batch["img_ids"] = np.arange(8)

    images = ImageBatch(pixels=jnp.asarray(batch["query_pixels"]),
                        sizes=jnp.asarray(batch["query_sizes"]))
    supp = ImageBatch(pixels=jnp.asarray(batch["supp_pixels"]),
                      sizes=jnp.asarray(batch["supp_sizes"]))
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, supp,
                           train=False)

    results = compute_on_dataset(model, variables, [batch], mesh=mesh)
    assert sorted(results.keys()) == list(range(8))
    for r in results.values():
        assert r["boxes"].ndim == 2 and r["boxes"].shape[1] == 4
        assert np.isfinite(r["boxes"]).all()


@pytest.mark.slow
def test_cached_support_eval_matches_plain():
    """compute_on_dataset(cache_supports=True) must produce identical
    detections: the support branch is bit-identical, just hoisted out of
    the per-batch loop."""
    import numpy as np

    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.engine.inference import compute_on_dataset
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.utils.synthetic import make_episodic_batch

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
    model = build_detection_model(c)

    batches = []
    for seed in range(2):
        batch = make_episodic_batch(2, (64, 64), (32, 32), max_gt=4, seed=seed)
        batch["target_ids"] = np.array([1, 2], np.int32)
        batch["idxs"] = np.arange(2) + 2 * seed
        batch["img_ids"] = batch["idxs"]
        batches.append(batch)
    # same class -> same support tensor across batches (CHOOSE_SELECTED-like)
    batches[1]["supp_pixels"] = batches[0]["supp_pixels"].copy()
    batches[1]["supp_sizes"] = batches[0]["supp_sizes"].copy()

    from oneshotdet_tpu.structures import ImageBatch
    images = ImageBatch(pixels=jnp.asarray(batches[0]["query_pixels"]),
                        sizes=jnp.asarray(batches[0]["query_sizes"]))
    supp = ImageBatch(pixels=jnp.asarray(batches[0]["supp_pixels"]),
                      sizes=jnp.asarray(batches[0]["supp_sizes"]))
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, supp,
                           train=False)

    plain = compute_on_dataset(model, variables, batches)
    cached = compute_on_dataset(model, variables, batches, cache_supports=True)
    assert sorted(plain.keys()) == sorted(cached.keys())
    for k in plain:
        np.testing.assert_allclose(plain[k]["boxes"], cached[k]["boxes"],
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(plain[k]["scores"], cached[k]["scores"],
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_graft_entry_forward():
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    fn, example_args = entry()
    out = jax.jit(fn)(*example_args)
    jax.block_until_ready(out)
    assert out[0].shape[0] == 1
