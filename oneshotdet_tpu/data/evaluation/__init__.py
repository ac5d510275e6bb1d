from .coco_eval import do_coco_evaluation
from .voc_eval import eval_detection_voc


def evaluate(dataset, predictions, output_folder=None, logger=None, iou_type="bbox",
             box_only=False):
    """Dispatch matching the reference evaluation/__init__.py:7-27."""
    return do_coco_evaluation(dataset, predictions, output_folder, logger,
                              box_only=box_only)


__all__ = ["evaluate", "do_coco_evaluation", "eval_detection_voc"]
