"""catalog:// / model-zoo weight resolution tests.

Covers oneshotdet_tpu/utils/model_zoo.py (reference
maskrcnn_benchmark/utils/model_zoo.py:20-66 + utils/checkpoint.py:133-145)
and the ModelCatalog table in oneshotdet_tpu/data/paths_catalog.py
(reference config/paths_catalog.py:149-208). Everything runs offline via
file:// URLs.
"""

import os

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from oneshotdet_tpu.data.paths_catalog import ModelCatalog
from oneshotdet_tpu.engine import TrainState
from oneshotdet_tpu.utils.checkpoint import Checkpointer
from oneshotdet_tpu.utils.model_zoo import cache_url, resolve_weight_path


def test_model_catalog_imagenet_url():
    # reference paths_catalog.py:189-194 (get_c2_imagenet_pretrained)
    assert ModelCatalog.get("ImageNetPretrained/MSRA/R-50") == (
        "https://dl.fbaipublicfiles.com/detectron/ImageNetPretrained/MSRA/R-50.pkl")
    assert ModelCatalog.get("ImageNetPretrained/FAIR/20171220/X-101-32x8d") == (
        "https://dl.fbaipublicfiles.com/detectron/ImageNetPretrained/20171220/X-101-32x8d.pkl")


def test_model_catalog_detectron_url():
    # reference paths_catalog.py:196-208 (12_2017_baselines layout)
    url = ModelCatalog.get("Caffe2Detectron/COCO/35857345/e2e_faster_rcnn_R-50-FPN_1x")
    assert url == (
        "https://dl.fbaipublicfiles.com/detectron/35857345/12_2017_baselines/"
        "e2e_faster_rcnn_R-50-FPN_1x.yaml.01_36_30.cUF7QR7I/output/train/"
        "coco_2014_train%3Acoco_2014_valminusminival/generalized_rcnn/model_final.pkl")
    # keypoint models get the keypoints_ dataset tag
    kp = ModelCatalog.get("Caffe2Detectron/COCO/37697547/e2e_keypoint_rcnn_R-50-FPN_1x")
    assert "keypoints_coco_2014_train%3Akeypoints_coco_2014_valminusminival" in kp


def test_model_catalog_unknown_name():
    with pytest.raises(RuntimeError, match="not present in the catalog"):
        ModelCatalog.get("NoSuchFamily/whatever")


def test_cache_url_file_scheme(tmp_path):
    src = tmp_path / "weights.pkl"
    src.write_bytes(b"payload")
    cache_dir = tmp_path / "cache"
    cached = cache_url(src.as_uri(), model_dir=str(cache_dir))
    assert os.path.exists(cached)
    assert open(cached, "rb").read() == b"payload"
    # second call is a cache hit (source may vanish)
    src.unlink()
    assert cache_url(src.as_uri(), model_dir=str(cache_dir)) == cached


def test_cache_url_fragment_names_file(tmp_path):
    # reference model_zoo.py:44-46: the URL fragment names the cached file
    src = tmp_path / "blob.bin"
    src.write_bytes(b"x")
    cached = cache_url(src.as_uri() + "#renamed.pkl", model_dir=str(tmp_path / "c"))
    assert os.path.basename(cached) == "renamed.pkl"


def test_cache_url_model_final_disambiguation(tmp_path):
    # all Detectron checkpoints are model_final.pkl; path becomes the name
    # (reference model_zoo.py:47-53)
    d = tmp_path / "35857345" / "output"
    d.mkdir(parents=True)
    (d / "model_final.pkl").write_bytes(b"m")
    cached = cache_url((d / "model_final.pkl").as_uri(), model_dir=str(tmp_path / "c"))
    name = os.path.basename(cached)
    assert name != "model_final.pkl" and "35857345" in name


def test_cache_url_hash_verification(tmp_path):
    import hashlib
    src = tmp_path / "f.bin"
    src.write_bytes(b"data")
    good = hashlib.sha256(b"data").hexdigest()[:8]
    cached = cache_url(src.as_uri() + f"#w-{good}.pth", model_dir=str(tmp_path / "c1"))
    assert os.path.exists(cached)
    with pytest.raises(RuntimeError, match="invalid hash"):
        cache_url(src.as_uri() + "#w-deadbeef.pth", model_dir=str(tmp_path / "c2"))


def test_resolve_weight_path_passthrough(tmp_path):
    p = str(tmp_path / "local.pth")
    assert resolve_weight_path(p) == p


def test_resolve_weight_path_custom_catalog(tmp_path):
    # cfg.PATHS_CATALOG points at a user module whose ModelCatalog wins
    # (reference checkpoint.py:135-137 import_file mechanism)
    src = tmp_path / "custom.pkl"
    src.write_bytes(b"custom")
    catalog_py = tmp_path / "my_catalog.py"
    catalog_py.write_text(
        "class ModelCatalog:\n"
        "    @staticmethod\n"
        "    def get(name):\n"
        f"        return {src.as_uri()!r}\n")

    class _Cfg:
        PATHS_CATALOG = str(catalog_py)

    resolved = resolve_weight_path("catalog://Anything/at-all", cfg=_Cfg(),
                                   model_dir=str(tmp_path / "cache"))
    assert open(resolved, "rb").read() == b"custom"


def test_checkpointer_loads_catalog_url(tmp_path, monkeypatch):
    """End-to-end: WEIGHT as a file:// URL to a reference .pth resolves
    through the model-zoo cache and loads (checkpoint.py:133-145)."""
    torch = pytest.importorskip("torch")

    sd = {"backbone.body.stem.conv1.weight": torch.full((4, 3, 7, 7), 3.0)}
    src = tmp_path / "ref.pth"
    torch.save({"model": sd}, str(src))
    monkeypatch.setenv("ONESHOT_MODEL_ZOO", str(tmp_path / "zoo"))

    params = {"backbone": {"body": {"stem": {"conv1": {"kernel": jnp.zeros((7, 7, 3, 4))}}}}}
    tx = optax.sgd(0.1)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       constants={}, opt_state=tx.init(params))
    ckptr = Checkpointer(str(tmp_path / "out"))
    loaded = ckptr.load(state, f=src.as_uri(), resume=False)
    np.testing.assert_allclose(
        np.asarray(loaded.params["backbone"]["body"]["stem"]["conv1"]["kernel"]), 3.0)
    # the cached copy must keep the .pth suffix so the loader dispatches
    assert any(f.endswith(".pth") for f in os.listdir(tmp_path / "zoo"))
