from .boxes import (
    TO_REMOVE,
    Boxes,
    box_area,
    box_iou,
    cat_boxes,
    compact_boxes,
    masked_box_iou,
)
from .image_batch import ImageBatch, to_image_batch

__all__ = [
    "TO_REMOVE",
    "Boxes",
    "box_area",
    "box_iou",
    "cat_boxes",
    "compact_boxes",
    "masked_box_iou",
    "ImageBatch",
    "to_image_batch",
]
