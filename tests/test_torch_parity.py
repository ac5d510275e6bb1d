"""Numerical parity against the reference's own torch modules.

Builds the reference backbone/FPN/FCOS-head/ROI-head (torch CPU, random
weights), exports the state dict through our converter, and compares
activations. This is the strongest parity check available without trained
weights: it catches conv padding/stride conventions, FrozenBN folding,
GN epsilon, flatten order, and weight-layout transposes.

The reference package needs its CUDA extension and yacs at import time;
both are stubbed (the extension is only *called* on GPU paths we don't run).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # stub yacs with our CfgNode (compatible subset)
    if "yacs" not in sys.modules:
        import oneshotdet_tpu.config.node as node

        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")
        yacs_config.CfgNode = node.CfgNode
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config
    # stub the CUDA extension module (attributes bound at import time but
    # never called on the CPU paths we exercise)
    if "maskrcnn_benchmark._C" not in sys.modules:
        stub = types.ModuleType("maskrcnn_benchmark._C")
        def _unavailable(*a, **k):
            raise RuntimeError("CUDA extension stub called")
        for fname in ("nms", "roi_align_forward", "roi_align_backward",
                      "roi_pool_forward", "roi_pool_backward",
                      "sigmoid_focalloss_forward", "sigmoid_focalloss_backward"):
            setattr(stub, fname, _unavailable)
        sys.modules["maskrcnn_benchmark._C"] = stub
    from maskrcnn_benchmark.config import cfg as ref_cfg

    c = ref_cfg.clone()
    c.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    c.MODEL.RETINANET.USE_C5 = False
    c.MODEL.DEVICE = "cpu"
    return c


@pytest.mark.slow
def test_backbone_fpn_activation_parity(ref_modules):
    from maskrcnn_benchmark.modeling.backbone import build_backbone

    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu.models import ResNetFPN
    from oneshotdet_tpu.utils.torch_import import convert_state_dict

    ref_cfg = ref_modules
    torch.manual_seed(0)
    ref_model = build_backbone(ref_cfg)
    ref_model.eval()
    # randomize the FrozenBN buffers too (defaults are identity)
    sd = ref_model.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if "running_mean" in k:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        elif "running_var" in k:
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
        elif k.endswith("bn1.weight") or ".bn" in k and k.endswith("weight"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    ref_model.load_state_dict(sd)

    x = torch.randn(1, 3, 64, 96, generator=g)
    with torch.no_grad():
        ref_out = ref_model(x)

    named = {f"backbone.{k}": v.numpy() for k, v in ref_model.state_dict().items()}
    converted, matched, unmatched = convert_state_dict(named)
    assert not unmatched, unmatched[:10]

    model = ResNetFPN(depth=50, out_channels=256, use_c5_for_p6=False)
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), x_nhwc)
    variables = {
        "params": converted["params"]["backbone"],
        "constants": converted["constants"]["backbone"],
    }
    ours = model.apply(variables, x_nhwc)

    assert len(ref_out) == len(ours) == 5
    for lvl, (r, o) in enumerate(zip(ref_out, ours)):
        r_np = r.numpy()
        o_np = np.asarray(o).transpose(0, 3, 1, 2)
        assert r_np.shape == o_np.shape, (lvl, r_np.shape, o_np.shape)
        diff = np.abs(r_np - o_np).max()
        scale = np.abs(r_np).max() + 1e-6
        assert diff / scale < 2e-5, f"level {lvl}: rel diff {diff / scale}"


@pytest.mark.slow
def test_fcos_head_activation_parity(ref_modules):
    from maskrcnn_benchmark.modeling.rpn.fcos.fcos import FCOSHead as RefFCOSHead

    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu.models.fcos import FCOSHead
    from oneshotdet_tpu.utils.torch_import import convert_state_dict

    ref_cfg = ref_modules
    torch.manual_seed(2)
    ref_head = RefFCOSHead(ref_cfg, 256)
    ref_head.eval()
    # non-trivial scales
    with torch.no_grad():
        for i, s in enumerate(ref_head.scales):
            s.scale.fill_(0.8 + 0.1 * i)

    g = torch.Generator().manual_seed(3)
    feats = [torch.randn(1, 256, 8 // (2 ** i) or 1, 12 // (2 ** i) or 1, generator=g)
             for i in range(5)]
    with torch.no_grad():
        ref_logits, ref_bbox, ref_ctr = ref_head(feats)

    named = {f"rpn.head.{k}": v.numpy() for k, v in ref_head.state_dict().items()}
    converted, matched, unmatched = convert_state_dict(named)
    assert not unmatched, unmatched[:10]

    head = FCOSHead(num_convs=4, num_classes=1, num_levels=5)
    feats_nhwc = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats]
    variables = {"params": converted["params"]["fcos_head"]}
    logits, bbox, ctr = head.apply(variables, feats_nhwc)

    for lvl in range(5):
        for r, o in [(ref_logits[lvl], logits[lvl]), (ref_bbox[lvl], bbox[lvl]),
                     (ref_ctr[lvl], ctr[lvl])]:
            r_np = r.numpy()
            o_np = np.asarray(o).transpose(0, 3, 1, 2)
            assert r_np.shape == o_np.shape
            rel = np.abs(r_np - o_np).max() / (np.abs(r_np).max() + 1e-6)
            assert rel < 2e-5, f"level {lvl}: rel {rel}"


@pytest.mark.slow
def test_roi_head_activation_parity(ref_modules):
    """compress -> aggreg -> fc6/fc7 -> predictor vs ROIBoxHeadNet."""
    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu.models.roi_head import ROIBoxHeadNet
    from oneshotdet_tpu.utils.torch_import import convert_state_dict

    ref_cfg = ref_modules.clone()
    ref_cfg.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
    ref_cfg.FEW_SHOT.SECOND_STAGE_CLS_LOSS = "ce_loss"
    ref_cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    ref_cfg.MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR = "FPN2ROIFeatureExtractor"
    ref_cfg.MODEL.ROI_BOX_HEAD.PREDICTOR = "FPNPredictor"
    ref_cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES = (0.125, 0.0625, 0.03125, 0.015625, 0.0078125)
    ref_cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2

    from maskrcnn_benchmark.modeling.roi_heads.box_head.box_head import ROIBoxHead

    torch.manual_seed(4)
    ref_head = ROIBoxHead(ref_cfg, 256)
    ref_head.eval()

    g = torch.Generator().manual_seed(5)
    n = 6
    roi_feats = torch.randn(n, 256, 7, 7, generator=g)
    supp_feats = torch.randn(n, 256, 7, 7, generator=g)

    with torch.no_grad():
        x = torch.cat((roi_feats, supp_feats), dim=1)
        x = ref_head.compress_dim_conv(x)
        x = ref_head.feature_aggreg(x)
        x = x.view(x.size(0), -1)
        x = torch.nn.functional.relu(ref_head.fc6(x))
        x = torch.nn.functional.relu(ref_head.fc7(x))
        ref_logits, ref_deltas = ref_head.predictor(x)

    named = {f"roi_heads.box.{k}": v.numpy() for k, v in ref_head.state_dict().items()}
    converted, matched, unmatched = convert_state_dict(named)
    assert not unmatched, unmatched[:10]

    net = ROIBoxHeadNet(num_classes=2, num_bbox_reg=2)
    rf = jnp.asarray(roi_feats.numpy().transpose(0, 2, 3, 1))
    sf = jnp.asarray(supp_feats.numpy().transpose(0, 2, 3, 1))
    variables = {"params": converted["params"]["roi_head"]}
    logits, deltas = net.apply(variables, rf, sf)

    rel_l = np.abs(ref_logits.numpy() - np.asarray(logits)).max() / (
        np.abs(ref_logits.numpy()).max() + 1e-6)
    rel_d = np.abs(ref_deltas.numpy() - np.asarray(deltas)).max() / (
        np.abs(ref_deltas.numpy()).max() + 1e-6)
    assert rel_l < 2e-5, rel_l
    assert rel_d < 2e-5, rel_d
