import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneshotdet_tpu.ops.roi_align import roi_pool
from oneshotdet_tpu.solver.adabound import adabound
from oneshotdet_tpu.utils.metric_logger import MetricLogger, SmoothedValue
from oneshotdet_tpu.utils.registry import Registry


def test_roi_pool_max_semantics():
    feat = jnp.asarray(np.arange(64, dtype=np.float32).reshape(1, 8, 8, 1))
    rois = jnp.array([[0, 0.0, 0.0, 15.0, 15.0]])
    out = np.asarray(roi_pool(feat, rois, (2, 2), 0.5))[..., 0]
    np.testing.assert_allclose(out[0], [[27, 31], [59, 63]])


def test_adabound_converges_to_bounded_steps():
    tx = adabound(learning_rate=0.1, final_lr=0.01, gamma=1e-3)
    params = {"w": jnp.array([1.0])}
    state = tx.init(params)
    g = {"w": jnp.array([1.0])}
    for _ in range(5):
        updates, state = tx.update(g, state, params)
    assert np.isfinite(float(updates["w"][0]))
    assert updates["w"][0] < 0  # descent direction


def test_registry():
    r = Registry()

    @r.register("foo")
    def foo():
        return 1

    r.register("bar", lambda: 2)
    assert r["foo"]() == 1
    assert r["bar"]() == 2
    with pytest.raises(AssertionError):
        r.register("foo", lambda: 3)


def test_backbone_registry_builds():
    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.models.registry import BACKBONES, build_backbone

    assert "R-50-FPN-RETINANET" in BACKBONES
    c = cfg.clone()
    c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    m = build_backbone(c, jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    outs = m.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert len(outs) == 5


def test_smoothed_value():
    s = SmoothedValue(window_size=3)
    for v in (1, 2, 3, 4):
        s.update(v)
    assert s.median == 3
    assert s.global_avg == 2.5
    m = MetricLogger()
    m.update(loss=1.0, acc=0.5)
    assert "loss" in str(m)


def test_voc_dataset_xml(tmp_path):
    from oneshotdet_tpu.data.datasets.voc import PascalVOCDataset

    (tmp_path / "Annotations").mkdir()
    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "ImageSets" / "Main").mkdir(parents=True)
    xml = """<annotation>
      <size><width>100</width><height>80</height><depth>3</depth></size>
      <object><name>dog</name><difficult>0</difficult>
        <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>50</xmax><ymax>60</ymax></bndbox>
      </object>
      <object><name>cat</name><difficult>1</difficult>
        <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>20</xmax><ymax>20</ymax></bndbox>
      </object>
    </annotation>"""
    (tmp_path / "Annotations" / "000001.xml").write_text(xml)
    from PIL import Image

    Image.new("RGB", (100, 80)).save(tmp_path / "JPEGImages" / "000001.jpg")
    (tmp_path / "ImageSets" / "Main" / "test.txt").write_text("000001\n")

    ds = PascalVOCDataset(str(tmp_path), "test")
    assert len(ds) == 1
    gt = ds.get_groundtruth(0)
    np.testing.assert_allclose(gt["boxes"][0], [9, 19, 49, 59])  # 1-based -> 0-based
    assert gt["labels"][0] == 12  # dog
    assert gt["difficult"].tolist() == [False, True]
    info, _ = ds.get_img_info(0)
    assert info["width"] == 100


def test_concat_and_list_datasets(tmp_path):
    from PIL import Image

    from oneshotdet_tpu.data.datasets.voc import ConcatDataset, ListDataset

    paths = []
    for i in range(3):
        p = tmp_path / f"im{i}.jpg"
        Image.new("RGB", (10 + i, 10)).save(p)
        paths.append(str(p))
    d1 = ListDataset(paths[:2])
    d2 = ListDataset(paths[2:])
    cat = ConcatDataset([d1, d2])
    assert len(cat) == 3
    assert cat.get_img_info(2)[0]["width"] == 12
    item = cat[1]
    assert item["idx"] == 1


def test_perf_table_collect_and_render(tmp_path):
    """tools/perf_table.py: bench logs and driver BENCH_r*.json both parse;
    later sources win; render produces one row per metric."""
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "perf_table",
        os.path.join(os.path.dirname(__file__), "..", "tools", "perf_table.py"),
    )
    pt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pt)

    log = tmp_path / "bench.log"
    log.write_text(
        'noise\n'
        '{"metric": "oneshot_eval_images_per_sec_per_chip", "value": 120.0, '
        '"unit": "images/sec", "vs_baseline": 0.19, '
        '"mfu_vs_v5e_bf16_peak": 0.25}\n'
        '{"metric": "oneshot_p50_latency_ms", "value": 34.0, "unit": "ms"}\n'
    )
    driver = tmp_path / "BENCH_r09.json"
    driver.write_text(json.dumps({
        "rc": 0,
        "tail": '{"metric": "oneshot_eval_images_per_sec_per_chip", '
                '"value": 150.0, "unit": "images/sec", "vs_baseline": 0.24}\n',
        "parsed": {"metric": "oneshot_eval_images_per_sec_per_chip",
                   "value": 150.0, "unit": "images/sec", "vs_baseline": 0.24},
    }))

    recs = pt.collect([str(log), str(driver)])  # later file wins
    assert recs["oneshot_eval_images_per_sec_per_chip"]["value"] == 150.0
    assert recs["oneshot_p50_latency_ms"]["value"] == 34.0
    table = pt.render(recs)
    assert "**150.0**" in table and "**34.0**" in table
    assert table.count("\n") == 3  # header + separator + 2 rows
