"""PASCAL VOC detection evaluation (chainercv-style).

Reimplements evaluation/voc/voc_eval.py:12-66 (prec/rec at :69 and
calc_detection_voc_ap), including the integer-box +1 widening before IoU and
the optional 11-point 2007 metric.

Inputs are numpy dicts per image:
  pred: {"boxes": (N,4) xyxy, "scores": (N,), "labels": (N,)}
  gt:   {"boxes": (M,4) xyxy, "labels": (M,), "difficult": (M,)}
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

import numpy as np


def _iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) IoU; boxes already widened by the caller."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-10)


def calc_detection_voc_prec_rec(gt_list: List[dict], pred_list: List[dict],
                                iou_thresh: float = 0.5):
    n_pos = defaultdict(int)
    score = defaultdict(list)
    match = defaultdict(list)

    for gt, pred in zip(gt_list, pred_list):
        pred_bbox = np.asarray(pred["boxes"], np.float64).reshape(-1, 4)
        pred_label = np.asarray(pred["labels"]).reshape(-1)
        pred_score = np.asarray(pred["scores"]).reshape(-1)
        gt_bbox = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)
        gt_label = np.asarray(gt["labels"]).reshape(-1)
        gt_difficult = np.asarray(
            gt.get("difficult", np.zeros(len(gt_bbox), bool))
        ).reshape(-1).astype(bool)

        for l in np.unique(np.concatenate((pred_label, gt_label)).astype(int)):
            pm = pred_label == l
            pb, ps = pred_bbox[pm], pred_score[pm]
            order = ps.argsort()[::-1]
            pb, ps = pb[order], ps[order]

            gm = gt_label == l
            gb, gd = gt_bbox[gm], gt_difficult[gm]
            n_pos[l] += int(np.logical_not(gd).sum())
            score[l].extend(ps.tolist())

            if len(pb) == 0:
                continue
            if len(gb) == 0:
                match[l].extend([0] * len(pb))
                continue

            # integer-box widening (voc_eval.py:107-111)
            pb = pb.copy()
            pb[:, 2:] += 1
            gb = gb.copy()
            gb[:, 2:] += 1
            iou = _iou_xyxy(pb, gb)
            gt_index = iou.argmax(axis=1)
            gt_index[iou.max(axis=1) < iou_thresh] = -1

            selec = np.zeros(len(gb), bool)
            for gi in gt_index:
                if gi >= 0:
                    if gd[gi]:
                        match[l].append(-1)
                    else:
                        if not selec[gi]:
                            match[l].append(1)
                        else:
                            match[l].append(0)
                    selec[gi] = True
                else:
                    match[l].append(0)

    n_fg = max(n_pos.keys()) + 1 if n_pos else 1
    prec = [None] * n_fg
    rec = [None] * n_fg
    for l in n_pos.keys():
        score_l = np.array(score[l])
        match_l = np.array(match[l], np.int8)
        order = score_l.argsort()[::-1]
        match_l = match_l[order]
        tp = np.cumsum(match_l == 1)
        fp = np.cumsum(match_l == 0)
        prec[l] = tp / np.maximum(fp + tp, 1e-10)
        rec[l] = tp / n_pos[l] if n_pos[l] > 0 else None
    return prec, rec


def calc_detection_voc_ap(prec, rec, use_07_metric=False):
    n_fg = len(prec)
    ap = np.empty(n_fg)
    for l in range(n_fg):
        if prec[l] is None or rec[l] is None:
            ap[l] = np.nan
            continue
        if use_07_metric:
            ap[l] = 0
            for t in np.arange(0.0, 1.1, 0.1):
                if np.sum(rec[l] >= t) == 0:
                    p = 0.0
                else:
                    p = np.max(np.nan_to_num(prec[l])[rec[l] >= t])
                ap[l] += p / 11
        else:
            mpre = np.concatenate(([0], np.nan_to_num(prec[l]), [0]))
            mrec = np.concatenate(([0], rec[l], [1]))
            mpre = np.maximum.accumulate(mpre[::-1])[::-1]
            i = np.where(mrec[1:] != mrec[:-1])[0]
            ap[l] = np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1])
    return ap


def eval_detection_voc(pred_list, gt_list, iou_thresh=0.5, use_07_metric=False):
    prec, rec = calc_detection_voc_prec_rec(gt_list, pred_list, iou_thresh)
    ap = calc_detection_voc_ap(prec, rec, use_07_metric)
    return {"ap": ap, "map": float(np.nanmean(ap))}
