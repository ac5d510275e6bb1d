"""Serving-export roundtrip tests (oneshotdet_tpu/export.py).

The artifact contract: export -> serialize -> deserialize in-process, then
the deserialized program's detections match the live model.apply exactly.
(The reference has no serving-export surface at all — its demo predictor
re-runs the python model per frame, SURVEY §3.4.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneshotdet_tpu import export as oexport
from oneshotdet_tpu.config import cfg
from oneshotdet_tpu.models import build_detection_model
from oneshotdet_tpu.structures import ImageBatch


@pytest.fixture(scope="module")
def setup():
    c = cfg.clone()
    c.merge_from_file(
        "/root/reference/configs/fcos/2019_10_25_vanilla_siamse_backbone.yaml")
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 100
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 32
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 32
    c.TPU.NMS_PRE_TOPK = 256
    c.TPU.COMPUTE_DTYPE = "float32"
    model = build_detection_model(c)
    b = 2
    rng = np.random.RandomState(3)
    images = ImageBatch(
        pixels=jnp.asarray(rng.randn(b, 64, 64, 3).astype(np.float32)),
        sizes=jnp.array([[64.0, 64.0], [48.0, 56.0]]),
    )
    supp = ImageBatch(
        pixels=jnp.asarray(rng.randn(b, 32, 32, 3).astype(np.float32)),
        sizes=jnp.array([[32.0, 32.0], [32.0, 24.0]]),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, supp,
                           train=False)
    return c, model, variables, images, supp


@pytest.mark.slow
def test_export_full_roundtrip(setup, tmp_path):
    c, model, variables, images, supp = setup
    b = images.batch_size
    tids = jnp.ones((b,), jnp.int32)

    exp = oexport.export_eval(c, variables, batch=b, query_hw=(64, 64),
                              supp_hw=(32, 32), kind="full")
    path = str(tmp_path / "eval.stablehlo")
    oexport.save(exp, path)
    reloaded = oexport.load(path)
    assert "cpu" in reloaded.platforms

    xyxy, scores, valid = jax.jit(reloaded.call)(
        images.pixels, images.sizes, supp.pixels, supp.sizes, tids)

    dets = model.apply(variables, images, supp, target_ids=tids, train=False)
    # the reloaded module is recompiled from serialized StableHLO — XLA may
    # fuse differently than the live jit, so equality holds to float eps,
    # not bitwise
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(dets.valid))
    np.testing.assert_allclose(np.asarray(xyxy), np.asarray(dets.xyxy),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(scores),
                               np.asarray(dets.get_field("scores")),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_export_cached_support_roundtrip(setup, tmp_path):
    c, model, variables, images, supp = setup
    b = images.batch_size
    tids = jnp.ones((b,), jnp.int32)

    pair = oexport.export_eval(c, variables, batch=b, query_hw=(64, 64),
                               supp_hw=(32, 32), kind="cached_support")
    base = str(tmp_path / "serve.stablehlo")
    oexport.save(pair, base)
    exp_support = oexport.load(base + ".support")
    exp_detect = oexport.load(base + ".detect")

    pooled, s7 = jax.jit(exp_support.call)(supp.pixels, supp.sizes)
    xyxy, scores, valid = jax.jit(exp_detect.call)(
        images.pixels, images.sizes, pooled, s7, tids)

    # live reference: the same cached-support path on the live model
    pooled_ref, s7_ref = model.apply(
        variables, supp, b,
        method=lambda m, s, n: m.compute_support_features(s, n))
    dets = model.apply(
        variables, images, pooled_ref, s7_ref, tids,
        method=lambda m, im, p, s, t: m.detect_with_support(im, p, s, t))
    # the reloaded module is recompiled from serialized StableHLO — XLA may
    # fuse differently than the live jit, so equality holds to float eps,
    # not bitwise
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(dets.valid))
    np.testing.assert_allclose(np.asarray(xyxy), np.asarray(dets.xyxy),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(scores),
                               np.asarray(dets.get_field("scores")),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_export_compiled_executable_roundtrip(setup, tmp_path):
    """save_compiled/load_compiled: the serialized PjRt EXECUTABLE (the
    serving cold-start fast path — no tracing, no XLA compile at load)
    produces the same detections as the live model."""
    c, model, variables, images, supp = setup
    b = images.batch_size
    tids = jnp.ones((b,), jnp.int32)

    pair = oexport.export_eval(c, variables, batch=b, query_hw=(64, 64),
                               supp_hw=(32, 32), kind="cached_support")
    base = str(tmp_path / "serve.stablehlo")
    oexport.save(pair, base)
    assert oexport.save_compiled(pair, base), \
        "executable serialization unsupported on this backend"

    sup_call = oexport.load_compiled(base + ".support")
    det_call = oexport.load_compiled(base + ".detect")
    assert sup_call is not None and det_call is not None

    pooled, s7 = sup_call(supp.pixels, supp.sizes)
    xyxy, scores, valid = det_call(images.pixels, images.sizes, pooled, s7,
                                   tids)

    pooled_ref, s7_ref = model.apply(
        variables, supp, b,
        method=lambda m, s, n: m.compute_support_features(s, n))
    dets = model.apply(
        variables, images, pooled_ref, s7_ref, tids,
        method=lambda m, im, p, s, t: m.detect_with_support(im, p, s, t))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(dets.valid))
    np.testing.assert_allclose(np.asarray(xyxy), np.asarray(dets.xyxy),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(scores),
                               np.asarray(dets.get_field("scores")),
                               rtol=1e-5, atol=1e-5)

    # a mismatched-platform artifact is refused (portable fallback kicks in)
    import pickle
    with open(base + ".support.exec", "rb") as f:
        d = pickle.loads(f.read())
    d["platform"] = "not_a_platform"
    with open(base + ".support.exec", "wb") as f:
        f.write(pickle.dumps(d))
    assert oexport.load_compiled(base + ".support") is None
