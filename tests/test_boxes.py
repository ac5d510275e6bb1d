import jax.numpy as jnp
import numpy as np

from oneshotdet_tpu.structures import (
    Boxes,
    box_area,
    box_iou,
    cat_boxes,
    compact_boxes,
    masked_box_iou,
)


def make_boxes(arr, size=(100.0, 80.0), valid=None):
    arr = jnp.asarray(arr, jnp.float32)
    if valid is None:
        valid = jnp.ones(arr.shape[0], bool)
    return Boxes(xyxy=arr, valid=jnp.asarray(valid), size=jnp.asarray(size, jnp.float32))


def test_area_to_remove_convention():
    # reference: width = x2 - x1 + 1 (bounding_box.py:226-233)
    b = make_boxes([[0, 0, 9, 9], [10, 10, 10, 10]])
    np.testing.assert_allclose(np.asarray(b.area()), [100.0, 1.0])


def test_iou_identity_and_disjoint():
    a = jnp.array([[0, 0, 9, 9]], jnp.float32)
    b = jnp.array([[0, 0, 9, 9], [20, 20, 29, 29], [5, 0, 14, 9]], jnp.float32)
    iou = np.asarray(box_iou(a, b))
    assert iou.shape == (1, 3)
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 0.0)
    # overlap: inter = 5x10 = 50, union = 100 + 100 - 50
    np.testing.assert_allclose(iou[0, 2], 50.0 / 150.0)


def test_masked_iou_zeroes_invalid():
    a = jnp.array([[0, 0, 9, 9], [0, 0, 9, 9]], jnp.float32)
    av = jnp.array([True, False])
    iou = np.asarray(masked_box_iou(a, av, a, av))
    assert iou[0, 0] == 1.0
    assert iou[0, 1] == 0.0 and iou[1, 0] == 0.0 and iou[1, 1] == 0.0


def test_clip_to_image():
    b = make_boxes([[-5, -5, 200, 300]], size=(100.0, 80.0))  # size is (w, h)
    c = np.asarray(b.clip_to_image().xyxy)
    np.testing.assert_allclose(c[0], [0, 0, 99, 79])


def test_resize():
    b = make_boxes([[10, 20, 30, 40]], size=(100.0, 80.0))
    r = b.resize(jnp.array([200.0, 160.0]))
    np.testing.assert_allclose(np.asarray(r.xyxy)[0], [20, 40, 60, 80])
    np.testing.assert_allclose(np.asarray(r.size), [200, 160])


def test_flip_lr():
    # reference transpose: x1' = w - x2 - 1 (bounding_box.py:141-149)
    b = make_boxes([[10, 20, 30, 40]], size=(100.0, 80.0))
    f = np.asarray(b.transpose_flip_lr().xyxy)
    np.testing.assert_allclose(f[0], [100 - 30 - 1, 20, 100 - 10 - 1, 40])


def test_xywh_roundtrip():
    b = make_boxes([[10, 20, 30, 40]])
    xywh = np.asarray(b.to_xywh())
    np.testing.assert_allclose(xywh[0], [10, 20, 21, 21])
    back = Boxes.from_xywh(xywh, b.valid, b.size)
    np.testing.assert_allclose(np.asarray(back.xyxy), np.asarray(b.xyxy))


def test_cat_and_compact():
    a = make_boxes([[0, 0, 1, 1], [2, 2, 3, 3]], valid=[True, False])
    b = make_boxes([[4, 4, 5, 5]], valid=[True])
    a = a.with_field("scores", jnp.array([0.9, 0.1]))
    b = b.with_field("scores", jnp.array([0.5]))
    c = cat_boxes(a, b)
    assert c.capacity == 3
    assert int(c.num_valid()) == 2
    d = compact_boxes(c, out_capacity=2)
    arr = np.asarray(d.xyxy)
    np.testing.assert_allclose(arr[0], [0, 0, 1, 1])
    np.testing.assert_allclose(arr[1], [4, 4, 5, 5])
    np.testing.assert_allclose(np.asarray(d.get_field("scores")), [0.9, 0.5])
    assert bool(d.valid.all())


def test_remove_small():
    b = make_boxes([[0, 0, 0, 0], [0, 0, 10, 10]])
    r = b.remove_small(2.0)
    np.testing.assert_array_equal(np.asarray(r.valid), [False, True])
