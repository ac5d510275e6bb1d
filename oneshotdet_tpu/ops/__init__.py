from .box_coder import BoxCoder
from .losses import (
    bce_with_logits,
    cross_entropy,
    iou_loss,
    sigmoid_focal_loss,
    smooth_l1_loss,
    softmax_focal_loss,
)
from .nms import nms, nms_keep_mask, soft_nms
from .roi_align import roi_align, roi_align_reference

__all__ = [
    "BoxCoder",
    "bce_with_logits",
    "cross_entropy",
    "iou_loss",
    "sigmoid_focal_loss",
    "smooth_l1_loss",
    "softmax_focal_loss",
    "nms",
    "nms_keep_mask",
    "soft_nms",
    "roi_align",
    "roi_align_reference",
]
