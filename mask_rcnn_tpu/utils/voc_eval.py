"""VOC-style instance segmentation AP (reference
utils/evaluations/eval_instance_segmentation_voc.py:13-181 parity, without
chainercv).

Per-image matching follows chainercv's selec logic exactly: each score-sorted
prediction is assigned its argmax-IoU gt of the class (if IoU >= thresh); the
prediction counts as a TP only if that specific gt is not already selected,
otherwise as an FP. Difficult gts yield match=-1 (excluded from both TP and
FP). Per-class precision/recall, then VOC AP — either the 11-point 2007
metric or the continuous AUC metric.
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
    gt_difficults=None,
    iou_thresh: float = 0.5,
    use_07_metric: bool = False,
) -> Dict:
    """Returns {'ap': (K,) array, 'map': float}."""
    n_pos: Dict[int, int] = defaultdict(int)
    score: Dict[int, List[float]] = defaultdict(list)
    match: Dict[int, List[int]] = defaultdict(list)

    if gt_difficults is None:
        gt_difficults = [None] * len(gt_masks)

    for p_masks, p_labels, p_scores, g_masks, g_labels, g_difficult in zip(
        pred_masks, pred_labels, pred_scores, gt_masks, gt_labels, gt_difficults
    ):
        p_labels = np.asarray(p_labels)
        p_scores = np.asarray(p_scores)
        g_labels = np.asarray(g_labels)
        if g_difficult is None:
            g_difficult = np.zeros(len(g_labels), bool)
        else:
            g_difficult = np.asarray(g_difficult, bool)
        for lbl in np.unique(np.concatenate([p_labels, g_labels]).astype(int)):
            pi = np.flatnonzero(p_labels == lbl)
            gi = np.flatnonzero(g_labels == lbl)
            diff_l = g_difficult[gi]
            n_pos[lbl] += int(np.logical_not(diff_l).sum())
            order = np.argsort(-p_scores[pi], kind="stable")
            pi = pi[order]
            score[lbl].extend(p_scores[pi].tolist())
            if len(pi) == 0:
                continue
            if len(gi) == 0:
                match[lbl].extend([0] * len(pi))
                continue
            # argmax-IoU assignment per prediction (chainercv selec logic):
            # a TP requires the argmax gt itself to be unselected — a better-
            # but-taken gt does NOT fall through to the next-best gt.
            iou = np.array(
                [[mask_iou(p_masks[p], g_masks[g]) for g in gi] for p in pi]
            )
            gt_index = iou.argmax(axis=1)
            gt_index[iou.max(axis=1) < iou_thresh] = -1
            selec = np.zeros(len(gi), bool)
            for gt_idx in gt_index:
                if gt_idx >= 0:
                    if diff_l[gt_idx]:
                        match[lbl].append(-1)
                    elif not selec[gt_idx]:
                        match[lbl].append(1)
                    else:
                        match[lbl].append(0)
                    selec[gt_idx] = True
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
        with np.errstate(divide="ignore", invalid="ignore"):
            prec[lbl] = tp / (tp + fp)
        rec[lbl] = tp / n_pos[lbl] if n_pos[lbl] > 0 else None

    ap = calc_detection_voc_ap(prec, rec, use_07_metric)
    return {"ap": ap, "map": float(np.nanmean(ap))}
