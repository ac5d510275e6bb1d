"""End-to-end postprocessing parity vs the reference implementations.

Runs the reference's FCOSPostProcessor and second-stage PostProcessor
(torch CPU, with boxlist_nms routed to a python greedy NMS implementing the
CUDA kernel's semantics) against our padded/static implementations on
identical inputs, and compares kept box sets. This covers SURVEY §7's
"hard part #1": NMS + top-k under static shapes.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _greedy_nms_torch(boxes, scores, thresh):
    """CUDA-kernel-semantics greedy NMS in torch (suppress iou > thresh)."""
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


@pytest.fixture(scope="module")
def ref_env():
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
    if "maskrcnn_benchmark._C" not in sys.modules:
        stub = types.ModuleType("maskrcnn_benchmark._C")
        stub.nms = lambda boxes, scores, thresh: _greedy_nms_torch(boxes, scores, thresh)
        sys.modules["maskrcnn_benchmark._C"] = stub
    else:
        sys.modules["maskrcnn_benchmark._C"].nms = (
            lambda boxes, scores, thresh: _greedy_nms_torch(boxes, scores, thresh)
        )
        # consumers bind `from _C import nms as _box_nms` at import time
        # (structures/boxlist_ops.py:8); rebind in any already-imported one
        # so this file passes regardless of which parity test ran first
        for m in list(sys.modules.values()):
            if getattr(m, "_box_nms", None) is not None and (
                getattr(m, "__name__", "").startswith("maskrcnn_benchmark")
            ):
                m._box_nms = sys.modules["maskrcnn_benchmark._C"].nms
    from maskrcnn_benchmark.config import cfg as ref_cfg

    c = ref_cfg.clone()
    c.MODEL.DEVICE = "cpu"
    return c


@pytest.mark.slow
def test_fcos_postprocessor_parity(ref_env):
    """Reference FCOSPostProcessor (RPN mode) vs our fcos_postprocess."""
    from maskrcnn_benchmark.modeling.rpn.fcos.inference import make_fcos_postprocessor

    import jax.numpy as jnp

    from oneshotdet_tpu.models.fcos import compute_locations, fcos_postprocess

    c = ref_env.clone()
    c.MODEL.RPN_ONLY = False  # RPN-as-proposals parameterization
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 50
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 24
    c.MODEL.RPN.NMS_THRESH = 0.8

    ref_post = make_fcos_postprocessor(c, is_train=False)
    ref_post.eval()

    shapes = [(8, 12), (4, 6), (2, 3), (1, 2), (1, 1)]
    strides = [8, 16, 32, 64, 128]
    g = torch.Generator().manual_seed(7)
    box_cls = [torch.randn(1, 1, h, w, generator=g) for h, w in shapes]
    box_reg = [torch.rand(1, 4, h, w, generator=g) * s for (h, w), s in zip(shapes, strides)]
    ctr = [torch.randn(1, 1, h, w, generator=g) for h, w in shapes]
    image_sizes = [(64, 96)]  # (h, w)

    locations_t = []
    for (h, w), s in zip(shapes, strides):
        ys, xs = torch.meshgrid(
            torch.arange(h, dtype=torch.float32) * s + s // 2,
            torch.arange(w, dtype=torch.float32) * s + s // 2,
            indexing="ij",
        )
        locations_t.append(torch.stack([xs.reshape(-1), ys.reshape(-1)], dim=1))

    with torch.no_grad():
        ref_boxes = ref_post(locations_t, box_cls, box_reg, ctr, image_sizes)[0]
    ref_xyxy = ref_boxes.bbox.numpy()
    ref_scores = ref_boxes.get_field("scores").numpy()

    locations = compute_locations(shapes, strides)
    logits = [jnp.asarray(x.numpy().transpose(0, 2, 3, 1)) for x in box_cls]
    bbox = [jnp.asarray(x.numpy().transpose(0, 2, 3, 1)) for x in box_reg]
    ctrn = [jnp.asarray(x.numpy().transpose(0, 2, 3, 1)) for x in ctr]
    ours = fcos_postprocess(
        locations, logits, bbox, ctrn, jnp.array([[96.0, 64.0]]),
        pre_nms_top_n=50, nms_thresh=0.8, post_top_n=24, nms_pre_topk=4096,
    )
    v = np.asarray(ours.valid)[0]
    our_xyxy = np.asarray(ours.xyxy)[0][v]
    our_scores = np.asarray(ours.get_field("scores"))[0][v]

    assert len(our_xyxy) == len(ref_xyxy), (len(our_xyxy), len(ref_xyxy))
    # compare as score-sorted sets
    ro = np.argsort(-ref_scores)
    oo = np.argsort(-our_scores)
    np.testing.assert_allclose(our_scores[oo], ref_scores[ro], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(our_xyxy[oo], ref_xyxy[ro], rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_second_stage_postprocessor_parity(ref_env):
    """Reference PostProcessor (decode + NMS + label stamping) vs ours."""
    from maskrcnn_benchmark.modeling.roi_heads.box_head.inference import (
        make_roi_box_post_processor,
    )
    from maskrcnn_benchmark.structures.bounding_box import BoxList

    import jax.numpy as jnp

    from oneshotdet_tpu.models.roi_head import roi_head_postprocess
    from oneshotdet_tpu.ops.box_coder import BoxCoder
    from oneshotdet_tpu.structures import Boxes

    c = ref_env.clone()
    c.FEW_SHOT.SECOND_STAGE_CLS_LOSS = "ce_loss"
    c.MODEL.ROI_HEADS.SCORE_THRESH = 0.0
    c.MODEL.ROI_HEADS.NMS = 0.5
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 16
    ref_post = make_roi_box_post_processor(c)
    ref_post.eval()

    g = torch.Generator().manual_seed(9)
    n = 20
    xy = torch.rand(n, 2, generator=g) * 50
    wh = torch.rand(n, 2, generator=g) * 30 + 5
    props = torch.cat([xy, xy + wh], dim=1)
    logits = torch.randn(n, 2, generator=g)
    deltas = torch.randn(n, 8, generator=g) * 0.3

    boxlist = BoxList(props, (96, 64), mode="xyxy")
    with torch.no_grad():
        ref_out = ref_post((logits, deltas), [boxlist], target_ids=[5])[0]
    ref_xyxy = ref_out.bbox.numpy()
    ref_scores = ref_out.get_field("scores").numpy()
    ref_labels = ref_out.get_field("labels").numpy()

    proposals = Boxes(
        xyxy=jnp.asarray(props.numpy())[None],
        valid=jnp.ones((1, n), bool),
        size=jnp.array([[96.0, 64.0]]),
        fields={},
    )
    ours = roi_head_postprocess(
        jnp.asarray(logits.numpy()), jnp.asarray(deltas.numpy()), proposals,
        jnp.array([5]), BoxCoder((10.0, 10.0, 5.0, 5.0)),
        score_thresh=0.0, nms_thresh=0.5, detections_per_img=16,
        cls_loss_type="ce_loss",
    )
    v = np.asarray(ours.valid)[0]
    our_xyxy = np.asarray(ours.xyxy)[0][v]
    our_scores = np.asarray(ours.get_field("scores"))[0][v]
    our_labels = np.asarray(ours.get_field("labels"))[0][v]

    assert len(our_xyxy) == len(ref_xyxy)
    ro = np.argsort(-ref_scores)
    oo = np.argsort(-our_scores)
    np.testing.assert_allclose(our_scores[oo], ref_scores[ro], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(our_xyxy[oo], ref_xyxy[ro], rtol=1e-3, atol=1e-3)
    assert (our_labels == 5).all() and (ref_labels == 5).all()


@pytest.mark.slow
def test_fcos_loss_parity(ref_env):
    """Reference FCOSLossComputation vs our fcos_targets + fcos_losses."""
    from maskrcnn_benchmark.modeling.rpn.fcos.loss import make_fcos_loss_evaluator
    from maskrcnn_benchmark.structures.bounding_box import BoxList

    import jax.numpy as jnp

    from oneshotdet_tpu.models.fcos import compute_locations, fcos_losses, fcos_targets

    c = ref_env.clone()
    c.MODEL.FCOS.CENTER_SAMPLE = True
    c.MODEL.FCOS.POS_RADIUS = 1.5
    c.MODEL.FCOS.LOC_LOSS_TYPE = "giou"
    c.LOSS.FOCAL_LOSS = "SIGMOID"
    ref_loss = make_fcos_loss_evaluator(c)

    shapes = [(8, 12), (4, 6), (2, 3), (1, 2), (1, 1)]
    strides = [8, 16, 32, 64, 128]
    g = torch.Generator().manual_seed(11)
    box_cls = [torch.randn(2, 1, h, w, generator=g) for h, w in shapes]
    box_reg = [torch.rand(2, 4, h, w, generator=g) * s + 1 for (h, w), s in zip(shapes, strides)]
    ctr = [torch.randn(2, 1, h, w, generator=g) for h, w in shapes]

    gt = [
        BoxList(torch.tensor([[4.0, 4.0, 40.0, 40.0], [10.0, 20.0, 90.0, 60.0]]),
                (96, 64), mode="xyxy"),
        BoxList(torch.tensor([[30.0, 8.0, 60.0, 30.0]]), (96, 64), mode="xyxy"),
    ]
    for t in gt:
        t.add_field("labels", torch.ones(len(t), dtype=torch.long))

    locations_t = []
    for (h, w), s in zip(shapes, strides):
        ys, xs = torch.meshgrid(
            torch.arange(h, dtype=torch.float32) * s + s // 2,
            torch.arange(w, dtype=torch.float32) * s + s // 2,
            indexing="ij",
        )
        locations_t.append(torch.stack([xs.reshape(-1), ys.reshape(-1)], dim=1))

    ref_cls, ref_reg, ref_ctr = ref_loss(locations_t, box_cls, box_reg, ctr, gt)

    locations = compute_locations(shapes, strides)
    gt_xyxy = jnp.array([
        [[4.0, 4.0, 40.0, 40.0], [10.0, 20.0, 90.0, 60.0]],
        [[30.0, 8.0, 60.0, 30.0], [0.0, 0.0, 0.0, 0.0]],
    ])
    gt_labels = jnp.array([[1, 1], [1, 0]])
    gt_valid = jnp.array([[True, True], [True, False]])
    labels, reg_t = fcos_targets(locations, strides, gt_xyxy, gt_labels, gt_valid,
                                 center_sample=True, radius=1.5)
    logits = [jnp.asarray(x.numpy().transpose(0, 2, 3, 1)) for x in box_cls]
    bbox = [jnp.asarray(x.numpy().transpose(0, 2, 3, 1)) for x in box_reg]
    ctrn = [jnp.asarray(x.numpy().transpose(0, 2, 3, 1)) for x in ctr]
    our_cls, our_reg, our_ctr = fcos_losses(
        logits, bbox, ctrn, labels, reg_t, 2.0, 0.25, "giou", "SIGMOID"
    )

    np.testing.assert_allclose(float(our_cls), float(ref_cls), rtol=2e-4)
    np.testing.assert_allclose(float(our_reg), float(ref_reg), rtol=2e-4)
    np.testing.assert_allclose(float(our_ctr), float(ref_ctr), rtol=2e-4)
