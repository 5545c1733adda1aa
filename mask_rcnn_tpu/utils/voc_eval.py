"""VOC-style instance segmentation AP (reference
utils/evaluations/eval_instance_segmentation_voc.py:13-181 parity, without
chainercv).

Greedy per-image matching of score-sorted predictions to unmatched gts at
mask IoU >= thresh, per-class precision/recall, then VOC AP — either the
11-point 2007 metric or the continuous AUC metric.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

import numpy as np


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter / union) if union else 0.0


def calc_detection_voc_ap(prec, rec, use_07_metric=False) -> np.ndarray:
    """Per-class AP from precision/recall curves (chainercv-compatible)."""
    n = len(prec)
    ap = np.empty(n)
    for k in range(n):
        if prec[k] is None or rec[k] is None:
            ap[k] = np.nan
            continue
        if use_07_metric:
            ap[k] = 0.0
            for t in np.arange(0.0, 1.1, 0.1):
                if np.sum(rec[k] >= t) == 0:
                    p = 0.0
                else:
                    p = np.max(np.nan_to_num(prec[k])[rec[k] >= t])
                ap[k] += p / 11
        else:
            mpre = np.concatenate(([0], np.nan_to_num(prec[k]), [0]))
            mrec = np.concatenate(([0], rec[k], [1]))
            mpre = np.maximum.accumulate(mpre[::-1])[::-1]
            i = np.where(mrec[1:] != mrec[:-1])[0]
            ap[k] = np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1])
    return ap


def eval_instseg_voc(
    pred_masks,
    pred_labels,
    pred_scores,
    gt_masks,
    gt_labels,
    iou_thresh: float = 0.5,
    use_07_metric: bool = False,
) -> Dict:
    """Returns {'ap': (K,) array, 'map': float}."""
    n_pos: Dict[int, int] = defaultdict(int)
    score: Dict[int, List[float]] = defaultdict(list)
    match: Dict[int, List[int]] = defaultdict(list)

    for p_masks, p_labels, p_scores, g_masks, g_labels in zip(
        pred_masks, pred_labels, pred_scores, gt_masks, gt_labels
    ):
        p_labels = np.asarray(p_labels)
        g_labels = np.asarray(g_labels)
        for lbl in np.unique(np.concatenate([p_labels, g_labels])):
            pi = np.flatnonzero(p_labels == lbl)
            gi = np.flatnonzero(g_labels == lbl)
            n_pos[lbl] += len(gi)
            if len(pi) == 0:
                continue
            order = np.argsort(-np.asarray(p_scores)[pi], kind="stable")
            pi = pi[order]
            taken = np.zeros(len(gi), bool)
            for p in pi:
                score[lbl].append(float(np.asarray(p_scores)[p]))
                best, best_iou = -1, iou_thresh
                for j, g in enumerate(gi):
                    if taken[j]:
                        continue
                    iou = mask_iou(p_masks[p], g_masks[g])
                    if iou >= best_iou:
                        best, best_iou = j, iou
                if best >= 0:
                    taken[best] = True
                    match[lbl].append(1)
                else:
                    match[lbl].append(0)

    n_fg = max(n_pos.keys(), default=-1) + 1
    prec: List = [None] * n_fg
    rec: List = [None] * n_fg
    for lbl in n_pos:
        s = np.asarray(score[lbl])
        m = np.asarray(match[lbl])
        order = np.argsort(-s, kind="stable")
        m = m[order]
        tp = np.cumsum(m == 1)
        fp = np.cumsum(m == 0)
        prec[lbl] = tp / np.maximum(tp + fp, 1)
        rec[lbl] = tp / n_pos[lbl] if n_pos[lbl] > 0 else None

    ap = calc_detection_voc_ap(prec, rec, use_07_metric)
    return {"ap": ap, "map": float(np.nanmean(ap))}
