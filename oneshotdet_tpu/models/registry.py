"""Model component registries (reference: maskrcnn_benchmark/modeling/registry.py).

Builders take (cfg) and return a flax Module (or module factory). The
flagship entries mirror the reference's registered names so configs port
unchanged (backbone/backbone.py:13-95).
"""

from __future__ import annotations

from ..utils.registry import Registry

BACKBONES = Registry()
RPN_HEADS = Registry()
ROI_BOX_FEATURE_EXTRACTORS = Registry()
ROI_BOX_PREDICTORS = Registry()
ROI_KEYPOINT_FEATURE_EXTRACTORS = Registry()
ROI_MASK_FEATURE_EXTRACTORS = Registry()
META_ARCHITECTURES = Registry()


def _resnet_fpn_retinanet(cfg, dtype):
    from .fpn import ResNetFPN

    depth = 101 if "101" in cfg.MODEL.BACKBONE.CONV_BODY else 50
    return ResNetFPN(
        depth=depth,
        out_channels=cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS,
        use_c5_for_p6=cfg.MODEL.RETINANET.USE_C5,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        dtype=dtype,
    )


BACKBONES.register("R-50-FPN-RETINANET", _resnet_fpn_retinanet)
BACKBONES.register("R-101-FPN-RETINANET", _resnet_fpn_retinanet)


def build_backbone(cfg, dtype):
    name = cfg.MODEL.BACKBONE.CONV_BODY
    assert name in BACKBONES, f"{name} not registered in BACKBONES"
    return BACKBONES[name](cfg, dtype)


def _mnv2_fpn_retinanet(cfg, dtype):
    from flax import linen as nn

    from .fpn import FPN
    from .mobilenet import MobileNetV2

    class _MNV2FPN(nn.Module):
        dtype_: object = dtype

        @nn.compact
        def __call__(self, x):
            cs = MobileNetV2(dtype=self.dtype_, name="body")(x)
            return FPN(
                out_channels=cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS,
                use_c5_for_p6=False, dtype=self.dtype_, name="fpn",
            )(cs)

    return _MNV2FPN()


BACKBONES.register("MNV2-FPN-RETINANET", _mnv2_fpn_retinanet)
