import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneshotdet_tpu.models.keypoint_head import (
    KeypointHead,
    heatmaps_to_keypoints,
    keypoint_head_loss,
    keypoints_to_heatmap_targets,
)
from oneshotdet_tpu.models.mask_head import (
    MaskHead,
    mask_head_loss,
    paste_mask_in_image,
    project_masks_on_boxes,
)
from oneshotdet_tpu.models.mobilenet import MobileNetV2


def test_mask_head_shapes_and_loss():
    head = MaskHead(num_classes=2)
    x = jnp.zeros((4, 14, 14, 256))
    v = head.init(jax.random.PRNGKey(0), x)
    logits = head.apply(v, x)
    assert logits.shape == (4, 28, 28, 2)

    targets = jnp.zeros((4, 28, 28))
    labels = jnp.array([1, 1, 0, 1])
    valid = jnp.array([True, True, True, False])
    loss = float(mask_head_loss(logits, targets, labels, valid))
    assert np.isfinite(loss) and loss > 0


def test_project_masks_on_boxes():
    mask = np.zeros((1, 20, 20), np.float32)
    mask[0, 5:15, 5:15] = 1.0
    out = np.asarray(
        project_masks_on_boxes(jnp.asarray(mask), jnp.array([[5.0, 5.0, 14.0, 14.0]]), 8)
    )
    assert out.shape == (1, 8, 8)
    assert out.mean() > 0.9  # box interior is all mask


def test_paste_mask_in_image():
    m = np.ones((4, 4), np.float32)
    out = paste_mask_in_image(m, (2, 2, 5, 5), 10, 10)
    assert out.shape == (10, 10)
    assert out[3, 3] == 1 and out[0, 0] == 0


def test_keypoint_head_roundtrip():
    head = KeypointHead(num_keypoints=17)
    x = jnp.zeros((2, 14, 14, 256))
    v = head.init(jax.random.PRNGKey(0), x)
    logits = head.apply(v, x)
    assert logits.shape == (2, 56, 56, 17)

    boxes = jnp.array([[0.0, 0.0, 55.0, 55.0], [10.0, 10.0, 30.0, 30.0]])
    kps = jnp.zeros((2, 17, 3)).at[:, :, 2].set(2.0).at[0, 0, :2].set(28.0)
    idx, valid = keypoints_to_heatmap_targets(kps, boxes, 56)
    assert bool(valid[0, 0])
    loss = float(keypoint_head_loss(logits, idx, valid))
    assert np.isfinite(loss)

    coords, scores = heatmaps_to_keypoints(logits, boxes)
    assert coords.shape == (2, 17, 2)
    c = np.asarray(coords)
    assert (c[0, :, 0] >= 0).all() and (c[0, :, 0] <= 56).all()


def test_mobilenet_v2_stages():
    m = MobileNetV2()
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    shapes = [o.shape for o in outs]
    assert shapes == [
        (1, 16, 16, 24),
        (1, 8, 8, 32),
        (1, 4, 4, 96),
        (1, 2, 2, 320),
    ]
