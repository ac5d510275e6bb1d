import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from oneshotdet_tpu.engine import TrainState
from oneshotdet_tpu.utils.checkpoint import Checkpointer, merge_with_unload
from oneshotdet_tpu.utils.torch_import import convert_state_dict, map_reference_key


def _make_state(value=1.0, step=5):
    params = {"a": {"kernel": jnp.full((2, 2), value)}, "b": {"bias": jnp.full((3,), value)}}
    tx = optax.sgd(0.1, momentum=0.9)
    return TrainState(
        step=jnp.asarray(step, jnp.int32),
        params=params,
        constants={"bn": {"running_mean": jnp.full((3,), value)}},
        opt_state=tx.init(params),
    )


def test_checkpoint_roundtrip(tmp_path):
    ckptr = Checkpointer(str(tmp_path))
    state = _make_state(2.0)
    ckptr.save("model_0000005", state)
    assert ckptr.has_checkpoint()

    fresh = _make_state(0.0)
    loaded = ckptr.load(fresh, resume=True)
    assert int(loaded.step) == 5
    np.testing.assert_allclose(np.asarray(loaded.params["a"]["kernel"]), 2.0)
    np.testing.assert_allclose(np.asarray(loaded.constants["bn"]["running_mean"]), 2.0)


def test_checkpoint_last_checkpoint_precedence(tmp_path):
    ckptr = Checkpointer(str(tmp_path))
    ckptr.save("model_1", _make_state(1.0))
    ckptr.save("model_2", _make_state(2.0))
    loaded = ckptr.load(_make_state(0.0), f=str(tmp_path / "model_1"))
    # last_checkpoint tag (model_2) wins over the explicit f (checkpoint.py:53-57)
    np.testing.assert_allclose(np.asarray(loaded.params["a"]["kernel"]), 2.0)


def test_checkpoint_no_resume_keeps_step(tmp_path):
    ckptr = Checkpointer(str(tmp_path))
    ckptr.save("model_1", _make_state(1.0, step=5))
    loaded = ckptr.load(_make_state(0.0, step=0), resume=False)
    assert int(loaded.step) == 0  # fresh step preserved (FEW_SHOT.RESUME off)


def test_unload_keyword():
    loaded = {"roi_head": {"fc6": {"kernel": jnp.ones(2)}},
              "backbone": {"conv": {"kernel": jnp.ones(2)}}}
    fresh = jax.tree_util.tree_map(jnp.zeros_like, loaded)
    merged = merge_with_unload(loaded, fresh, ("roi_head",))
    np.testing.assert_allclose(np.asarray(merged["roi_head"]["fc6"]["kernel"]), 0.0)
    np.testing.assert_allclose(np.asarray(merged["backbone"]["conv"]["kernel"]), 1.0)


# ---------------------------------------------------------------------------
# torch state-dict import
# ---------------------------------------------------------------------------
def test_map_reference_keys():
    assert map_reference_key("module.backbone.body.stem.conv1.weight") == (
        "params", ("backbone", "body", "stem", "conv1", "kernel"), "conv")
    assert map_reference_key("backbone.body.layer2.3.bn1.running_var") == (
        "constants", ("backbone", "body", "layer2_3", "bn1", "running_var"), "none")
    assert map_reference_key("backbone.body.layer1.0.downsample.0.weight") == (
        "params", ("backbone", "body", "layer1_0", "downsample_conv", "kernel"), "conv")
    assert map_reference_key("backbone.fpn.fpn_inner2.weight")[1] == (
        "backbone", "fpn", "fpn_inner2", "kernel")
    assert map_reference_key("backbone.fpn.top_blocks.p6.bias")[1] == (
        "backbone", "fpn", "top_p6", "bias")
    # tower index 3 = conv of block 1; index 4 = GN of block 1
    assert map_reference_key("rpn.head.cls_tower.3.weight")[1] == (
        "fcos_head", "cls_tower_1", "Conv_0", "kernel")
    assert map_reference_key("rpn.head.cls_tower.4.weight")[1] == (
        "fcos_head", "cls_tower_1", "GroupNorm_0", "scale")
    assert map_reference_key("rpn.head.scales.2.scale") == (
        "params", ("fcos_head", "scale_2", "scale"), "scalar")
    assert map_reference_key("roi_heads.box.compress_dim_conv.3.weight")[1] == (
        "roi_head", "compress_1", "kernel")
    assert map_reference_key("roi_heads.box.fc6.weight") == (
        "params", ("roi_head", "fc6", "kernel"), "linear")
    assert map_reference_key("supp_backbone.body.stem.bn1.num_batches_tracked") is None


def test_convert_state_dict_transposes():
    sd = {
        "backbone.body.stem.conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
        "roi_heads.box.fc6.weight": np.zeros((1024, 6272), np.float32),
        "rpn.head.scales.0.scale": np.array([1.5], np.float32),
        "backbone.body.stem.bn1.weight": np.ones(64, np.float32),
    }
    variables, matched, unmatched = convert_state_dict(sd)
    assert not unmatched
    assert variables["params"]["backbone"]["body"]["stem"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert variables["params"]["roi_head"]["fc6"]["kernel"].shape == (6272, 1024)
    assert variables["params"]["fcos_head"]["scale_0"]["scale"].shape == ()
    assert variables["constants"]["backbone"]["body"]["stem"]["bn1"]["weight"].shape == (64,)


@pytest.mark.slow
def test_convert_covers_full_model():
    """Every param/constant of the real model must be reachable from some
    reference key (no silent initialization gaps on import)."""
    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.structures import ImageBatch

    c = cfg.clone()
    c.FEW_SHOT.SIAMESE_BACKBONE = True
    c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
    c.MODEL.RETINANET.USE_C5 = False
    c.TPU.COMPUTE_DTYPE = "float32"
    model = build_detection_model(c)
    imgs = ImageBatch(pixels=jnp.zeros((1, 64, 64, 3)), sizes=jnp.array([[64.0, 64.0]]))
    supp = ImageBatch(pixels=jnp.zeros((1, 64, 64, 3)), sizes=jnp.array([[64.0, 64.0]]))
    variables = model.init({"params": jax.random.PRNGKey(0)}, imgs, supp, train=False)

    # generate the torch-side key list from our own tree via reverse mapping
    def tree_paths(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from tree_paths(v, prefix + (k,))
            else:
                yield prefix + (k,)

    # build candidate torch keys and convert them; then verify every flax
    # path was produced
    candidates = {}
    for net in ("backbone", "supp_backbone"):
        candidates[f"{net}.body.stem.conv1.weight"] = np.zeros((64, 3, 7, 7))
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            candidates[f"{net}.body.stem.bn1.{leaf}"] = np.zeros(64)
        blocks = {1: 3, 2: 4, 3: 6, 4: 3}
        for s, n in blocks.items():
            for b in range(n):
                for conv in (1, 2, 3):
                    candidates[f"{net}.body.layer{s}.{b}.conv{conv}.weight"] = np.zeros((1, 1, 1, 1))
                    for leaf in ("weight", "bias", "running_mean", "running_var"):
                        candidates[f"{net}.body.layer{s}.{b}.bn{conv}.{leaf}"] = np.zeros(1)
                if b == 0:
                    candidates[f"{net}.body.layer{s}.{b}.downsample.0.weight"] = np.zeros((1, 1, 1, 1))
                    for leaf in ("weight", "bias", "running_mean", "running_var"):
                        candidates[f"{net}.body.layer{s}.{b}.downsample.1.{leaf}"] = np.zeros(1)
        for i in (2, 3, 4):
            for leaf in ("weight", "bias"):
                candidates[f"{net}.fpn.fpn_inner{i}.{leaf}"] = np.zeros((1, 1, 1, 1)) if leaf == "weight" else np.zeros(1)
                candidates[f"{net}.fpn.fpn_layer{i}.{leaf}"] = np.zeros((1, 1, 1, 1)) if leaf == "weight" else np.zeros(1)
        for p in (6, 7):
            candidates[f"{net}.fpn.top_blocks.p{p}.weight"] = np.zeros((1, 1, 1, 1))
            candidates[f"{net}.fpn.top_blocks.p{p}.bias"] = np.zeros(1)
    for tower in ("cls_tower", "bbox_tower"):
        for i in range(4):
            candidates[f"rpn.head.{tower}.{3 * i}.weight"] = np.zeros((1, 1, 1, 1))
            candidates[f"rpn.head.{tower}.{3 * i}.bias"] = np.zeros(1)
            candidates[f"rpn.head.{tower}.{3 * i + 1}.weight"] = np.zeros(1)
            candidates[f"rpn.head.{tower}.{3 * i + 1}.bias"] = np.zeros(1)
    for head in ("cls_logits", "bbox_pred", "centerness"):
        candidates[f"rpn.head.{head}.weight"] = np.zeros((1, 1, 1, 1))
        candidates[f"rpn.head.{head}.bias"] = np.zeros(1)
    for i in range(5):
        candidates[f"rpn.head.scales.{i}.scale"] = np.zeros(1)
    for idx in (0, 1, 3, 4):
        candidates[f"roi_heads.box.compress_dim_conv.{idx}.weight"] = (
            np.zeros((1, 1, 1, 1)) if idx in (0, 3) else np.zeros(1))
        candidates[f"roi_heads.box.compress_dim_conv.{idx}.bias"] = np.zeros(1)
    for idx in (0, 1):
        candidates[f"roi_heads.box.feature_aggreg.{idx}.weight"] = (
            np.zeros((1, 1, 1, 1)) if idx == 0 else np.zeros(1))
        candidates[f"roi_heads.box.feature_aggreg.{idx}.bias"] = np.zeros(1)
    for lin in ("fc6", "fc7"):
        candidates[f"roi_heads.box.{lin}.weight"] = np.zeros((1, 1))
        candidates[f"roi_heads.box.{lin}.bias"] = np.zeros(1)
    for lin in ("cls_score", "bbox_pred"):
        candidates[f"roi_heads.box.predictor.{lin}.weight"] = np.zeros((1, 1))
        candidates[f"roi_heads.box.predictor.{lin}.bias"] = np.zeros(1)

    converted, matched, unmatched = convert_state_dict(candidates)
    assert not unmatched, unmatched

    got_params = set(tree_paths(converted["params"]))
    want_params = set(tree_paths(jax.device_get(variables["params"])))
    missing = want_params - got_params
    assert not missing, sorted(missing)[:20]

    got_const = set(tree_paths(converted["constants"]))
    want_const = set(tree_paths(jax.device_get(variables["constants"])))
    missing_c = want_const - got_const
    assert not missing_c, sorted(missing_c)[:20]


def test_checkpointer_pth_load(tmp_path):
    """Checkpointer.load dispatches reference .pth files through the
    torch importer and overlays matching weights."""
    torch = pytest.importorskip("torch")

    sd = {"backbone.body.stem.conv1.weight": torch.full((4, 3, 7, 7), 2.0)}
    path = str(tmp_path / "ref.pth")
    torch.save({"model": sd}, path)

    params = {"backbone": {"body": {"stem": {"conv1": {"kernel": jnp.zeros((7, 7, 3, 4))}}}},
              "fcos_head": {"cls_logits": {"bias": jnp.ones((1,))}}}
    tx = optax.sgd(0.1)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       constants={}, opt_state=tx.init(params))
    ckptr = Checkpointer(str(tmp_path / "out"))
    loaded = ckptr.load(state, f=path, resume=False)
    np.testing.assert_allclose(
        np.asarray(loaded.params["backbone"]["body"]["stem"]["conv1"]["kernel"]), 2.0)
    # unmatched params keep fresh values
    np.testing.assert_allclose(
        np.asarray(loaded.params["fcos_head"]["cls_logits"]["bias"]), 1.0)
