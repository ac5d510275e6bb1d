from . import fbnet  # registers FBNet backbone/rpn/roi builders
from .detector import DetectorConfig, GeneralizedRCNN, build_detection_model, detector_config_from_cfg
from .fcos import FCOSHead, compute_locations, fcos_losses, fcos_postprocess, fcos_targets
from .fpn import FPN, ResNetFPN
from .resnet import ResNet, frozen_param_paths
from .roi_head import ROIBoxHeadNet, predictor_num_classes

__all__ = [
    "DetectorConfig",
    "GeneralizedRCNN",
    "build_detection_model",
    "detector_config_from_cfg",
    "FCOSHead",
    "compute_locations",
    "fcos_losses",
    "fcos_postprocess",
    "fcos_targets",
    "FPN",
    "ResNetFPN",
    "ResNet",
    "frozen_param_paths",
    "ROIBoxHeadNet",
    "predictor_num_classes",
]
