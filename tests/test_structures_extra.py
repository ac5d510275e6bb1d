import numpy as np
import pytest

from oneshotdet_tpu.structures.keypoint import FLIP_LEFT_RIGHT, PersonKeypoints
from oneshotdet_tpu.structures.segmentation_mask import (
    BinaryMaskList,
    PolygonList,
    SegmentationMask,
)


def test_polygon_rasterize_and_convert():
    # a 4x4 square polygon in a 10x10 image
    poly = [[2, 2, 6, 2, 6, 6, 2, 6]]
    seg = SegmentationMask([poly], (10, 10), mode="poly")
    masks = seg.convert("mask")
    m = masks.instances.masks[0]
    assert m.shape == (10, 10)
    assert m[4, 4] == 1 and m[0, 0] == 0


def test_polygon_flip_resize_crop():
    poly = [[2.0, 2.0, 6.0, 2.0, 6.0, 6.0, 2.0, 6.0]]
    pl = PolygonList([poly], (10, 10))
    flipped = pl.transpose(0)
    xs = flipped.instances[0].polygons[0][0::2]
    np.testing.assert_allclose(sorted(xs)[0], 10 - 6 - 1)
    resized = pl.resize((20, 20))
    np.testing.assert_allclose(resized.instances[0].polygons[0][0], 4.0)
    cropped = pl.crop((1, 1, 8, 8))
    np.testing.assert_allclose(cropped.instances[0].polygons[0][0], 1.0)


def test_binary_mask_ops():
    masks = np.zeros((1, 8, 8), np.uint8)
    masks[0, 2:4, 2:4] = 1
    bm = BinaryMaskList(masks, (8, 8))
    f = bm.transpose(0)
    assert f.masks[0, 2, 4] == 1  # mirrored column
    r = bm.resize((16, 16))
    assert r.masks.shape == (1, 16, 16)
    c = bm.crop((2, 2, 5, 5))
    assert c.masks[0, 0, 0] == 1


def test_person_keypoints_flip_swaps_left_right():
    kp = np.zeros((1, 17, 3), np.float32)
    left_eye = PersonKeypoints.NAMES.index("left_eye")
    right_eye = PersonKeypoints.NAMES.index("right_eye")
    kp[0, left_eye] = (10, 5, 2)
    kp[0, right_eye] = (30, 5, 2)
    k = PersonKeypoints(kp, (40, 40))
    f = k.transpose(FLIP_LEFT_RIGHT)
    # after flip, the left-eye slot holds the mirrored right eye
    np.testing.assert_allclose(f.keypoints[0, left_eye, 0], 40 - 30 - 1)
    np.testing.assert_allclose(f.keypoints[0, right_eye, 0], 40 - 10 - 1)


def test_keypoints_resize():
    kp = np.zeros((1, 17, 3), np.float32)
    kp[0, 0] = (10, 20, 2)
    k = PersonKeypoints(kp, (40, 40)).resize((80, 80))
    np.testing.assert_allclose(k.keypoints[0, 0, :2], (20, 40))
