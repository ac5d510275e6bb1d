"""One-shot COCO-protocol evaluation.

Reimplements do_coco_evaluation + prepare_for_coco_detection
(data/datasets/evaluation/coco/coco_eval.py:14-177): each episode (query
image, class) is evaluated against a *custom* ground truth that contains only
that image's annotations of the episode class, with image ids remapped to the
episode index. Unlike the reference, the GT source is the evaluated
dataset's own annotation file rather than a hardcoded absolute path
(coco_eval.py:78 — an acknowledged wart).

``predictions`` is a list aligned with dataset order; each element is a dict
  {"boxes": (N, 4) xyxy at network input scale, "scores": (N,),
   "input_size": (w, h) the size the boxes live in}
or None for skipped images.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from .coco_metrics import COCOEvalNumpy


def _xyxy_to_xywh(boxes: np.ndarray) -> np.ndarray:
    out = boxes.copy()
    out[:, 2] = boxes[:, 2] - boxes[:, 0] + 1  # TO_REMOVE convert (BoxList)
    out[:, 3] = boxes[:, 3] - boxes[:, 1] + 1
    return out


def do_coco_evaluation(
    dataset,
    predictions: List[Optional[dict]],
    output_folder: Optional[str] = None,
    logger=None,
):
    gt: Dict = defaultdict(list)
    dt: Dict = defaultdict(list)
    custom_gt = {"images": [], "annotations": [], "categories": []}
    coco_results = []
    img_ids = []
    seen_cats = set()

    for episode_id, prediction in enumerate(predictions):
        original_id = dataset.id_to_img_map[episode_id]
        img_info, cur_cat = dataset.get_img_info(episode_id)
        width, height = img_info["width"], img_info["height"]
        seen_cats.add(cur_cat)
        img_ids.append(episode_id)

        info = dict(img_info)
        info["id"] = episode_id
        custom_gt["images"].append(info)

        ann_ids = dataset.coco.getAnnIds(
            imgIds=original_id, catIds=cur_cat, iscrowd=False
        )
        for ann in dataset.coco.loadAnns(ann_ids):
            item = dict(ann)
            item["image_id"] = episode_id
            item["category_id"] = cur_cat
            custom_gt["annotations"].append(item)
            gt[(episode_id, cur_cat)].append(
                {
                    "bbox": list(map(float, ann["bbox"])),
                    "area": float(ann.get("area", ann["bbox"][2] * ann["bbox"][3])),
                    "iscrowd": int(ann.get("iscrowd", 0)),
                }
            )

        if prediction is None or len(prediction["boxes"]) == 0:
            continue

        boxes = np.asarray(prediction["boxes"], np.float64)
        scores = np.asarray(prediction["scores"], np.float64)
        in_w, in_h = prediction["input_size"]
        # resize back to original image size (coco_eval.py:144)
        sx, sy = width / in_w, height / in_h
        boxes = boxes * np.array([sx, sy, sx, sy])
        xywh = _xyxy_to_xywh(boxes)
        for k in range(len(xywh)):
            rec = {
                "image_id": episode_id,
                "category_id": int(cur_cat),
                "bbox": [float(v) for v in xywh[k]],
                "score": float(scores[k]),
            }
            coco_results.append(rec)
            dt[(episode_id, cur_cat)].append(rec)

    if output_folder:
        os.makedirs(output_folder, exist_ok=True)
        with open(os.path.join(output_folder, "coco_custom_gt.json"), "w") as f:
            json.dump(custom_gt, f)
        with open(os.path.join(output_folder, "coco_custom_result.json"), "w") as f:
            json.dump(coco_results, f)
        with open(os.path.join(output_folder, "coco_ids.json"), "w") as f:
            json.dump(img_ids, f)

    evaluator = COCOEvalNumpy(gt, dt, sorted(seen_cats), img_ids)
    results = evaluator.evaluate_and_accumulate().summarize()

    msg = "  ".join(f"{k}={v:.4f}" for k, v in results.items())
    if logger:
        logger.info("COCO-style one-shot eval: " + msg)
    else:
        print("COCO-style one-shot eval: " + msg, flush=True)
    if output_folder:
        with open(os.path.join(output_folder, "coco_results.json"), "w") as f:
            json.dump(results, f, indent=2)
    return results


def compute_thresholds_for_classes(gt, dt, cat_ids, img_ids):
    """Best-F-measure score threshold per class
    (coco_eval.py compute_thresholds_for_classes)."""
    ev = COCOEvalNumpy(gt, dt, cat_ids, img_ids).evaluate_and_accumulate()
    precision = ev.eval["precision"][0, :, :, 0, -1]  # IoU=0.5, area all, maxDet max
    recall = np.linspace(0, 1, precision.shape[0])[:, None]
    f1 = 2 * precision * recall / np.maximum(precision + recall, 1e-6)
    return f1.max(axis=0)
