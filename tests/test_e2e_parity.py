"""Full-model end-to-end parity: the reference GeneralizedRCNN (torch CPU,
random weights, CUDA ops backed by our numpy ROIAlign oracle and a python
greedy NMS) vs this framework's detector with the imported state dict.

If detections match here, checkpoint-evaluation parity ("AP50 within 0.5")
reduces to data-pipeline equivalence.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _greedy_nms_torch(boxes, scores, thresh):
    order = torch.argsort(scores, descending=True)
    keep = []
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = torch.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = torch.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = torch.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = torch.minimum(boxes[i, 3], boxes[:, 3])
        w = (xx2 - xx1 + 1).clamp(min=0)
        h = (yy2 - yy1 + 1).clamp(min=0)
        inter = w * h
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou > thresh
        suppressed[i] = True
    return torch.tensor(keep, dtype=torch.long)


def _roi_align_stub(inp, rois, spatial_scale, pooled_h, pooled_w, sampling_ratio):
    from oneshotdet_tpu.ops.roi_align import roi_align_reference

    out = roi_align_reference(
        inp.detach().numpy(), rois.detach().numpy(),
        (pooled_h, pooled_w), float(spatial_scale), int(sampling_ratio),
    )
    return torch.from_numpy(out)


@pytest.mark.slow
def test_full_detector_eval_parity():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import oneshotdet_tpu.config.node as node

    if "yacs" not in sys.modules:
        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")
        yacs_config.CfgNode = node.CfgNode
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config
    stub = sys.modules.setdefault(
        "maskrcnn_benchmark._C", types.ModuleType("maskrcnn_benchmark._C")
    )
    stub.nms = _greedy_nms_torch
    stub.roi_align_forward = _roi_align_stub
    # other parity tests may have imported reference modules while a raising
    # _C stub was installed; refresh their frozen `from _C import nms` bindings
    for mod_name, attr in [
        ("maskrcnn_benchmark.layers", "nms"),
        ("maskrcnn_benchmark.structures.boxlist_ops", "_box_nms"),
    ]:
        mod = sys.modules.get(mod_name)
        if mod is not None and hasattr(mod, attr):
            setattr(mod, attr, _greedy_nms_torch)

    from maskrcnn_benchmark.config import cfg as ref_cfg_base
    from maskrcnn_benchmark.modeling.detector.detectors import build_detection_model as ref_build
    from maskrcnn_benchmark.structures.image_list import to_image_list

    rc = ref_cfg_base.clone()
    rc.MODEL.DEVICE = "cpu"
    rc.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    rc.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    rc.MODEL.RETINANET.USE_C5 = False
    rc.MODEL.FCOS.CENTER_SAMPLE = True
    rc.MODEL.FCOS.LOC_LOSS_TYPE = "giou"
    rc.MODEL.RPN.USE_FPN = True
    rc.MODEL.ROI_HEADS.USE_FPN = True
    rc.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    rc.MODEL.ROI_BOX_HEAD.POOLER_SCALES = (0.125, 0.0625, 0.03125, 0.015625, 0.0078125)
    rc.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
    rc.MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR = "FPN2ROIFeatureExtractor"
    rc.MODEL.ROI_BOX_HEAD.PREDICTOR = "FPNPredictor"
    rc.FEW_SHOT.SIAMESE_BACKBONE = True
    rc.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
    rc.FEW_SHOT.SUPP_ROIALIGN = True
    # small capacities so the python-ROIAlign reference run stays fast
    rc.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    rc.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 24
    rc.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 16

    torch.manual_seed(0)
    ref_model = ref_build(rc)
    ref_model.eval()
    # randomize FrozenBN buffers so folding is actually exercised
    sd = ref_model.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if "running_mean" in k:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        elif "running_var" in k:
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    ref_model.load_state_dict(sd)

    g2 = torch.Generator().manual_seed(2)
    query = torch.randn(1, 3, 64, 96, generator=g2)
    supp = torch.randn(1, 3, 32, 32, generator=g2)
    images = to_image_list([query[0]], 32)
    images_supp = to_image_list([supp[0]], 32)

    with torch.no_grad():
        ref_dets = ref_model(
            images, images_supp, None, device="cpu", target_ids=[3]
        )[0]
    ref_xyxy = ref_dets.bbox.numpy()
    ref_scores = ref_dets.get_field("scores").numpy()

    # ---- ours -------------------------------------------------------------
    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.structures import ImageBatch
    from oneshotdet_tpu.utils.torch_import import convert_state_dict

    c = cfg.clone()
    c.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    c.MODEL.RETINANET.USE_C5 = False
    c.MODEL.FCOS.CENTER_SAMPLE = True
    c.MODEL.FCOS.LOC_LOSS_TYPE = "giou"
    c.FEW_SHOT.SIAMESE_BACKBONE = True
    c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
    c.FEW_SHOT.SUPP_ROIALIGN = True
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 24
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 16
    c.TPU.NMS_PRE_TOPK = 4096
    c.TPU.STRICT_LEVEL_TOPK = True  # bit-parity mode: keep per-level pre-NMS caps
    c.TPU.COMPUTE_DTYPE = "float32"

    model = build_detection_model(c)
    converted, matched, unmatched = convert_state_dict(
        {k: v.numpy() for k, v in ref_model.state_dict().items()}
    )
    assert not unmatched, unmatched[:10]

    imgs = ImageBatch(
        pixels=jnp.asarray(query.numpy().transpose(0, 2, 3, 1)),
        sizes=jnp.array([[64.0, 96.0]]),
    )
    supp_b = ImageBatch(
        pixels=jnp.asarray(supp.numpy().transpose(0, 2, 3, 1)),
        sizes=jnp.array([[32.0, 32.0]]),
    )
    ours = model.apply(
        {"params": converted["params"], "constants": converted["constants"]},
        imgs, supp_b, target_ids=jnp.array([3]), train=False,
    )
    v = np.asarray(ours.valid)[0]
    our_xyxy = np.asarray(ours.xyxy)[0][v]
    our_scores = np.asarray(ours.get_field("scores"))[0][v]

    assert len(our_xyxy) == len(ref_xyxy), (len(our_xyxy), len(ref_xyxy))
    ro = np.argsort(-ref_scores)
    oo = np.argsort(-our_scores)
    np.testing.assert_allclose(our_scores[oo], ref_scores[ro], rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(our_xyxy[oo], ref_xyxy[ro], rtol=1e-3, atol=2e-2)
