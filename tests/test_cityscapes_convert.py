"""Cityscapes -> COCO converter test (reference tools/cityscapes/ had no
tests; this drives the full walk -> contours -> json path on a synthetic
gtFine tree)."""

import importlib.util
import json
import os
import sys

import numpy as np
from PIL import Image

_TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools", "cityscapes")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_TOOLS, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_instances2dict_with_polygons(tmp_path):
    i2d = _load("instances2dict_with_polygons")
    img = np.zeros((20, 30), np.int32)
    img[2:8, 3:12] = 26000      # car #0
    img[10:18, 15:28] = 24001   # person #1
    img[0:2, 0:2] = 7           # road (no instance id) — ignored
    p = tmp_path / "x_instanceIds.png"
    Image.fromarray(img).save(p)

    out = i2d.instances2dict_with_polygons([str(p)])[str(p.resolve())]
    assert len(out["car"]) == 1 and len(out["person"]) == 1
    car = out["car"][0]
    assert car["pixelCount"] == 6 * 9
    xs = car["contours"][0][::2]
    ys = car["contours"][0][1::2]
    assert min(xs) == 3 and max(xs) == 11 and min(ys) == 2 and max(ys) == 7
    assert i2d.get_label_id(26000) == 26 and i2d.get_label_id(7) == 7


def test_convert_cityscapes_instance_only(tmp_path):
    conv = _load("convert_cityscapes_to_coco")
    city = tmp_path / "gtFine_trainvaltest" / "gtFine" / "val" / "ffm"
    city.mkdir(parents=True)

    img = np.zeros((16, 16), np.int32)
    img[4:12, 4:12] = 26000  # one car
    Image.fromarray(img).save(city / "ffm_000_gtFine_instanceIds.png")
    (city / "ffm_000_gtFine_polygons.json").write_text(
        json.dumps({"imgWidth": 16, "imgHeight": 16, "objects": []}))

    out_dir = tmp_path / "out"
    conv.convert_cityscapes_instance_only(
        str(tmp_path), str(out_dir),
        sets=["gtFine_val"], ann_dirs=["gtFine_trainvaltest/gtFine/val"])

    result = json.loads((out_dir / "instancesonly_filtered_gtFine_val.json")
                        .read_text())
    assert len(result["images"]) == 1
    assert result["images"][0]["file_name"] == "ffm_000_leftImg8bit.png"
    assert result["categories"] == [{"id": 1, "name": "car"}]
    (ann,) = result["annotations"]
    assert ann["area"] == 64 and ann["iscrowd"] == 0
    # tight box 4..11 with the +1 TO_REMOVE size convention
    assert ann["bbox"] == [4, 4, 8, 8]


def test_poly_to_box_and_xywh():
    conv = _load("convert_cityscapes_to_coco")
    box = conv.poly_to_box([[1, 2, 5, 2, 5, 9, 1, 9]])
    assert box == [1, 2, 5, 9]
    assert conv.xyxy_to_xywh(box) == (1, 2, 5, 8)
