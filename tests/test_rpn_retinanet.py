import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneshotdet_tpu.models.anchor_generator import AnchorGenerator, generate_cell_anchors
from oneshotdet_tpu.models.retinanet import RetinaNetModule
from oneshotdet_tpu.models.rpn import RPNModule
from oneshotdet_tpu.structures import Boxes


def test_cell_anchors_caffe2_convention():
    # stride 16, size 32, ratio 1 -> the classic 32x32 anchor centered on 7.5
    # base [0,0,15,15] ctr 7.5; scale 2 -> w=32 -> 7.5 +- 15.5 = [-8, 23]
    a = generate_cell_anchors(16, (32.0,), (1.0,))
    assert a.shape == (1, 4)
    np.testing.assert_allclose(a[0], [-8.0, -8.0, 23.0, 23.0])
    # 3 ratios -> 3 anchors with ~equal area
    a3 = generate_cell_anchors(16, (32.0,), (0.5, 1.0, 2.0))
    areas = (a3[:, 2] - a3[:, 0] + 1) * (a3[:, 3] - a3[:, 1] + 1)
    assert np.abs(areas / 1024.0 - 1).max() < 0.15


def test_grid_anchors_shapes_and_offsets():
    gen = AnchorGenerator((32, 64), (0.5, 1.0, 2.0), (8, 16), 0.0)
    per_level = gen.grid_anchors([(4, 4), (2, 2)])
    assert per_level[0].shape == (4 * 4 * 3, 4)
    assert per_level[1].shape == (2 * 2 * 3, 4)
    # second cell of level 0 shifted by stride 8 in x
    np.testing.assert_allclose(
        np.asarray(per_level[0][3]) - np.asarray(per_level[0][0]), [8, 0, 8, 0]
    )


def test_anchor_visibility():
    gen = AnchorGenerator((32,), (1.0,), (8,), straddle_thresh=0.0)
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0], [-5.0, 0.0, 10.0, 10.0],
                         [0.0, 0.0, 70.0, 10.0]])
    vis = np.asarray(gen.visibility(anchors, (64, 64)))
    np.testing.assert_array_equal(vis, [True, False, False])


@pytest.fixture(scope="module")
def pyramid():
    rng = np.random.RandomState(0)
    shapes = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    return [jnp.asarray(rng.randn(2, h, w, 64).astype(np.float32)) for h, w in shapes]


def _targets(b=2):
    return Boxes(
        xyxy=jnp.tile(jnp.array([[[4.0, 4.0, 30.0, 30.0]]]), (b, 1, 1)),
        valid=jnp.ones((b, 1), bool),
        size=jnp.tile(jnp.array([[64.0, 64.0]]), (b, 1)),
        fields={"labels": jnp.ones((b, 1), jnp.int32)},
    )


def test_rpn_module_train_and_eval(pyramid):
    # train/test capacity split: the reference builds a train/test
    # postprocessor pair (rpn.py:128-141); __call__ picks by `train`
    m = RPNModule(pre_nms_top_n=64, post_nms_top_n=32, fpn_post_nms_top_n=32,
                  pre_nms_top_n_train=64, post_nms_top_n_train=48,
                  fpn_post_nms_top_n_train=48)
    sizes = jnp.tile(jnp.array([[64.0, 64.0]]), (2, 1))
    v = m.init(jax.random.PRNGKey(0), pyramid, sizes, _targets(), train=True,
               rng=jax.random.PRNGKey(1))
    props, losses = m.apply(v, pyramid, sizes, _targets(), train=True,
                            rng=jax.random.PRNGKey(2))
    assert set(losses) == {"loss_objectness", "loss_rpn_box_reg"}
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert props.xyxy.shape[1] == 48  # TRAIN capacities, not test's 32
    props, losses = m.apply(v, pyramid, sizes, train=False)
    assert losses == {}
    assert props.xyxy.shape[1] == 32
    assert bool(props.valid.any())


def test_rpn_per_image_visibility(pyramid):
    """Anchor straddle masks are computed per image (ref anchor_generator
    add_visibility_to runs per BoxList), not from image 0's size."""
    m = RPNModule(pre_nms_top_n=64, post_nms_top_n=32, fpn_post_nms_top_n=32,
                  pre_nms_top_n_train=64, post_nms_top_n_train=32,
                  fpn_post_nms_top_n_train=32)
    # image 1 much smaller than image 0: more anchors straddle -> must not
    # inherit image 0's (permissive) mask
    sizes = jnp.array([[64.0, 64.0], [16.0, 16.0]])
    v = m.init(jax.random.PRNGKey(0), pyramid, sizes, _targets(), train=True,
               rng=jax.random.PRNGKey(1))
    _, losses = m.apply(v, pyramid, sizes, _targets(), train=True,
                        rng=jax.random.PRNGKey(2))
    assert all(np.isfinite(float(x)) for x in losses.values())
    # direct check on the vmapped mask
    from oneshotdet_tpu.models.anchor_generator import AnchorGenerator

    gen = AnchorGenerator(m.anchor_sizes, m.aspect_ratios, m.anchor_strides,
                          m.straddle_thresh)
    shapes = [(f.shape[1], f.shape[2]) for f in pyramid]
    anchors = jnp.concatenate(gen.grid_anchors(shapes), axis=0)
    vis = jax.vmap(lambda wh: gen.visibility(anchors, (wh[0], wh[1])))(sizes)
    assert int(vis[1].sum()) < int(vis[0].sum())


def test_retinanet_module_train_and_eval(pyramid):
    m = RetinaNetModule(num_classes=1, pre_nms_top_n=32, detections_per_img=16)
    sizes = jnp.tile(jnp.array([[64.0, 64.0]]), (2, 1))
    v = m.init(jax.random.PRNGKey(0), pyramid, sizes, _targets(), train=True)
    _, losses = m.apply(v, pyramid, sizes, _targets(), train=True)
    assert set(losses) == {"loss_retina_cls", "loss_retina_reg"}
    assert all(np.isfinite(float(x)) for x in losses.values())
    dets, _ = m.apply(v, pyramid, sizes, train=False)
    assert dets.xyxy.shape == (2, 16, 4)
