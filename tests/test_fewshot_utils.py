"""Drive the offline few-shot prep scripts end-to-end on synthetic data
(reference fewshot_utils/ had no tests)."""

import importlib.util
import json
import os
import pickle
import sys

import numpy as np
import pytest
from PIL import Image

_FS = os.path.join(os.path.dirname(__file__), "..", "fewshot_utils")


def _load(name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_FS, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def tiny_coco(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(4):
        arr = rng.randint(0, 255, (120, 140, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:04d}.jpg")
        images.append({"id": i + 1, "file_name": f"{i:04d}.jpg",
                       "width": 140, "height": 120})
        annotations.append({
            "id": ann_id, "image_id": i + 1, "category_id": 7,
            "bbox": [10, 10, 100, 90], "area": 9000.0, "iscrowd": 0,
            "segmentation": [[10, 10, 110, 10, 110, 100, 10, 100]],
        })
        ann_id += 1
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 7, "name": "thing"}],
    }))
    return str(ann), str(img_dir)


def test_voc2coco(tmp_path):
    voc = tmp_path / "VOC2007"
    (voc / "ImageSets" / "Main").mkdir(parents=True)
    (voc / "Annotations").mkdir()
    (voc / "ImageSets" / "Main" / "test.txt").write_text("000001\n")
    (voc / "Annotations" / "000001.xml").write_text("""
<annotation><size><width>200</width><height>150</height></size>
<object><name>dog</name><difficult>0</difficult>
<bndbox><xmin>11</xmin><ymin>21</ymin><xmax>110</xmax><ymax>120</ymax></bndbox>
</object></annotation>""")
    out = tmp_path / "out.json"
    _load("voc2coco").convert(str(voc), "test", str(out))
    coco = json.loads(out.read_text())
    assert len(coco["images"]) == 1 and len(coco["annotations"]) == 1
    (ann,) = coco["annotations"]
    # VOC 1-based pixel convention -> 0-based with +1 sizes
    assert ann["bbox"] == [10.0, 20.0, 100.0, 100.0]
    names = {c["name"]: c["id"] for c in coco["categories"]}
    assert ann["category_id"] == names["dog"]


def test_save_supp(tiny_coco, tmp_path, monkeypatch):
    ann, img_dir = tiny_coco
    out = tmp_path / "supps"
    monkeypatch.setattr(sys, "argv",
                        ["x", "--ann-file", ann, "--img-dir", img_dir,
                         "--out", str(out), "--per-class", "2",
                         "--min-area", "100"])
    _load("save_supp").main()
    files = sorted(os.listdir(out))
    assert files == ["1_0.jpg", "1_1.jpg"]
    w, h = Image.open(out / "1_0.jpg").size
    assert (w, h) == (100, 90)  # bbox crop


def test_create_masked_supps(tiny_coco, tmp_path, monkeypatch):
    ann, img_dir = tiny_coco
    out = tmp_path / "masked"
    monkeypatch.setattr(sys, "argv",
                        ["x", "--ann-file", ann, "--img-dir", img_dir,
                         "--out", str(out), "--per-class", "1",
                         "--min-area", "100"])
    _load("create_masked_supps").main()
    assert sorted(os.listdir(out)) == ["1_0.jpg"]


@pytest.mark.slow
def test_try_similar(tiny_coco, tmp_path, monkeypatch):
    ann, img_dir = tiny_coco
    out = tmp_path / "sim" / "sim.pkl"
    monkeypatch.setattr(sys, "argv",
                        ["x", "--ann-file", ann, "--img-dir", img_dir,
                         "--out", str(out), "--min-area", "100"])
    _load("try_similar").main()
    with open(out, "rb") as f:
        sim = pickle.load(f)
    assert 7 in sim
    # every query image ranks the OTHER images' supports, never its own
    for img_id, per_cat in sim[7].items():
        for ann_id, s in per_cat[7].items():
            assert -1.001 <= s <= 1.001


@pytest.mark.slow
def test_feature_dist_close_dict(tiny_coco, tmp_path):
    """tools/feature_dist.py (ref tools/feature_dist.py): whole-query-image
    vs support-crop embeddings -> the CHOOSE_CLOSE similarity pickle, which
    the train dataset then loads and uses for support selection."""
    _TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
    spec = importlib.util.spec_from_file_location(
        "feature_dist", os.path.join(_TOOLS, "feature_dist.py"))
    fd = importlib.util.module_from_spec(spec)
    sys.modules["feature_dist"] = fd
    spec.loader.exec_module(fd)

    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.data.datasets.coco import COCODataset

    ann, img_dir = tiny_coco
    c = cfg.clone()
    c.FEW_SHOT.TRAINING_EXCL_CATS = []
    c.INPUT.SUPP_AREA_THRESHOLD = 100
    ds = COCODataset(c, ann, img_dir, is_train=True, transforms=None)
    close = fd.compute_close_dict(ds, c.INPUT.PIXEL_MEAN, size=64, batch=4)

    assert 7 in close
    for qid, per_cat in close[7].items():
        ranked = per_cat[7]
        assert ranked, "every query must see at least one candidate"
        for ann_id, s in ranked.items():
            # self-exclusion: a query never ranks its own image's support
            assert ds.coco.anns[ann_id]["image_id"] != qid
            assert -1.001 <= s <= 1.001

    # the pickle drives CHOOSE_CLOSE support selection end-to-end
    pkl = tmp_path / "sim.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(close, f)
    c2 = c.clone()
    c2.FEW_SHOT.CHOOSE_CLOSE = True
    c2.FEW_SHOT.SUPP_SIM_FILE = str(pkl)
    ds2 = COCODataset(c2, ann, img_dir, is_train=True, transforms=None)
    assert ds2.close_dict is not None
    qid = ds2.ids[0]
    supports = ds2.get_close_item_from_cat(qid, 7, shot=1)
    assert len(supports) == 1
