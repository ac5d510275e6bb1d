import os
import textwrap

import pytest

from oneshotdet_tpu.config import cfg


def test_defaults_present():
    assert cfg.MODEL.FCOS.FPN_STRIDES == [8, 16, 32, 64, 128]
    assert cfg.MODEL.ROI_HEADS.BBOX_REG_WEIGHTS == (10.0, 10.0, 5.0, 5.0)
    assert cfg.INPUT.PIXEL_MEAN == [102.9801, 115.9465, 122.7717]
    assert cfg.FEW_SHOT.SECOND_STAGE_METHOD == "matching"


def test_merge_from_list():
    c = cfg.clone()
    c.merge_from_list(["MODEL.RPN_ONLY", "True", "SOLVER.BASE_LR", "0.01"])
    assert c.MODEL.RPN_ONLY is True
    assert c.SOLVER.BASE_LR == 0.01
    with pytest.raises(KeyError):
        c.merge_from_list(["MODEL.NO_SUCH_KEY", "1"])


def test_freeze():
    c = cfg.clone()
    c.freeze()
    with pytest.raises(AttributeError):
        c.MODEL.RPN_ONLY = True
    c.defrost()
    c.MODEL.RPN_ONLY = True


def test_reference_yaml_loads(tmp_path):
    """The reference one-shot yaml must load unchanged (API compatibility)."""
    ref = "/root/reference/configs/fcos/2019_10_25_vanilla_siamse_backbone.yaml"
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    c = cfg.clone()
    c.merge_from_file(ref)
    assert c.MODEL.BACKBONE.CONV_BODY == "R-50-FPN-RETINANET"
    assert c.MODEL.FCOS.LOC_LOSS_TYPE == "giou"
    assert c.FEW_SHOT.SIAMESE_BACKBONE is True
    assert c.FEW_SHOT.SECOND_STAGE_METHOD == "concat"
    assert c.INPUT.SUPP_MAX_SIZE_TRAIN == 400
    assert c.MODEL.ROI_BOX_HEAD.POOLER_SCALES == (
        0.125, 0.0625, 0.03125, 0.015625, 0.0078125)


def test_all_shipped_and_reference_yamls_load():
    """Config-smoke sweep (reference tests/test_configs.py pattern): every
    yaml under configs/, plus every reference yaml, merges cleanly."""
    import glob

    here = os.path.join(os.path.dirname(__file__), "..", "configs")
    files = sorted(glob.glob(os.path.join(here, "*.yaml")))
    if os.path.isdir("/root/reference/configs"):
        files += sorted(glob.glob("/root/reference/configs/**/*.yaml",
                                  recursive=True))
    assert files
    for f in files:
        c = cfg.clone()
        c.merge_from_file(f)
        assert c.MODEL.META_ARCHITECTURE == "GeneralizedRCNN", f


def test_fast_eval_preset_sets_round3_levers():
    """The fast-eval preset differs from the flagship ONLY by the opt-in
    eval levers — same model keys, so the same checkpoints load. Since the
    round-3 on-chip measurement, the preset is bf16 + TPU.EVAL_ROI_TOPK=512
    (int8 measured SLOWER end-to-end on v5e: 171.6 vs 194.2 img/s at
    topk512 — see the preset header and README perf table)."""
    here = os.path.join(os.path.dirname(__file__), "..", "configs")
    base = cfg.clone()
    base.merge_from_file(os.path.join(here, "oneshot_fcos_r50.yaml"))
    fast = cfg.clone()
    fast.merge_from_file(os.path.join(here, "oneshot_fcos_r50_fast_eval.yaml"))
    assert fast.TPU.QUANT == "none"
    assert fast.TPU.EVAL_ROI_TOPK == 512
    fast.TPU.QUANT = base.TPU.QUANT
    fast.TPU.EVAL_ROI_TOPK = base.TPU.EVAL_ROI_TOPK
    assert str(fast) == str(base)


def test_tuple_coercion(tmp_path):
    y = tmp_path / "t.yaml"
    y.write_text(textwrap.dedent("""
        SOLVER:
          STEPS: [100, 200]
    """))
    c = cfg.clone()
    c.merge_from_file(str(y))
    assert c.SOLVER.STEPS == (100, 200)
