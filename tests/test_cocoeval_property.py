"""Property test: the native COCOeval vs an independent brute-force scorer.

The repo's ``utils/cocoeval.py`` re-implements the pycocotools COCOeval
protocol (the reference scores with pycocotools,
reference utils/evaluations/eval_instance_segmentation_coco.py:67-177) with
vectorized matching, packed-bit popcount IoU and optional C++ hot loops.
pycocotools itself is not installed in this environment, so this file pins
the protocol with a deliberately NAIVE, loop-by-loop transcription of the
published COCOeval algorithm (cocoeval.py evaluateImg/accumulate) sharing
NO code with utils/cocoeval.py: pixel-count IoU via plain sums, per-det
greedy scan, per-threshold python loops, textbook 101-point interpolation.
Random tiny scenes fuzz crowds, area ranges, score ties, explicit gt_areas
(the COCO 'area' field differs from the decoded-mask pixel count) and
maxDets truncation, asserting the full precision/recall tables match.
"""

import numpy as np
import pytest

from mask_rcnn_tpu.utils.cocoeval import (
    AREA_RANGES,
    COCOEvaluation,
    IOU_THRESHS,
    MAX_DETS,
    REC_THRESHS,
)

# ---------------------------------------------------------------------------
# The naive scorer: a direct transcription of the published COCOeval
# algorithm. Everything is plain python loops over unpacked boolean masks.
# ---------------------------------------------------------------------------


def naive_mask_iou(det_mask, gt_mask, crowd):
    inter = int(np.logical_and(det_mask, gt_mask).sum())
    da = int(det_mask.sum())
    ga = int(gt_mask.sum())
    union = da if crowd else da + ga - inter
    return inter / union if union > 0 else 0.0


def naive_evaluate(scenes, categories):
    """scenes: list of dicts with det_masks/det_labels/det_scores/gt_masks/
    gt_labels/gt_crowds/gt_areas (gt_areas may be None -> pixel count).

    Returns (precision, recall) tables shaped like the native scorer's:
    precision (T, R, K, A, M), recall (T, K, A, M), -1 where undefined.
    """
    t_n, r_n = len(IOU_THRESHS), len(REC_THRESHS)
    k_n, a_n, m_n = len(categories), len(AREA_RANGES), len(MAX_DETS)
    precision = -np.ones((t_n, r_n, k_n, a_n, m_n))
    recall = -np.ones((t_n, k_n, a_n, m_n))

    for ki, cat in enumerate(categories):
        # per-image, per-category det/gt selections in protocol order
        imgs = []
        for sc in scenes:
            d_in_cat = [i for i in range(len(sc["det_labels"]))
                        if sc["det_labels"][i] == cat]
            g_in_cat = [j for j in range(len(sc["gt_labels"]))
                        if sc["gt_labels"][j] == cat]
            if not d_in_cat and not g_in_cat:
                continue  # image contributes no record for this category
            # dets sorted by descending score, stable (pycocotools
            # kind='mergesort')
            d_in_cat.sort(key=lambda i: -sc["det_scores"][i])
            imgs.append((sc, d_in_cat, g_in_cat))

        for ai, (lo, hi) in enumerate(AREA_RANGES.values()):
            for mi, max_det in enumerate(MAX_DETS):
                all_scores, all_tp, all_fp = [], [], []
                n_gt = 0
                any_img = False
                for sc, d_idx_full, g_idx in imgs:
                    any_img = True
                    d_idx = d_idx_full[:max_det]
                    crowds = [bool(sc["gt_crowds"][j]) for j in g_idx]
                    if sc["gt_areas"] is not None:
                        g_area = [float(sc["gt_areas"][j]) for j in g_idx]
                    else:
                        g_area = [float(sc["gt_masks"][j].sum())
                                  for j in g_idx]
                    g_ig = [crowds[t] or g_area[t] < lo or g_area[t] > hi
                            for t in range(len(g_idx))]
                    # gts sorted ignored-last, stable
                    g_order = sorted(range(len(g_idx)),
                                     key=lambda t: (g_ig[t],))
                    n_gt += sum(1 for t in range(len(g_idx)) if not g_ig[t])

                    ious = [
                        [naive_mask_iou(sc["det_masks"][di],
                                        sc["gt_masks"][g_idx[t]],
                                        crowds[t])
                         for t in g_order]
                        for di in d_idx
                    ]
                    d_area = [float(sc["det_masks"][di].sum())
                              for di in d_idx]
                    d_out = [a < lo or a > hi for a in d_area]

                    for ti, thr in enumerate(IOU_THRESHS):
                        # matched flags indexed by position-within-g_idx
                        gt_matched = [False] * len(g_idx)
                        tp_row, fp_row = [], []
                        for dpos in range(len(d_idx)):
                            best = min(thr, 1 - 1e-10)
                            m = -1
                            for gpos in range(len(g_order)):
                                gi = g_order[gpos]
                                if gt_matched[gi] and not crowds[gi]:
                                    continue
                                if m > -1 and not g_ig[m] and g_ig[gi]:
                                    break
                                if ious[dpos][gpos] < best:
                                    continue
                                best = ious[dpos][gpos]
                                m = gi
                            if m == -1:
                                ig = d_out[dpos]
                                tp, fp = False, not ig
                            else:
                                gt_matched[m] = True
                                ig = g_ig[m]
                                tp, fp = not ig, False
                            tp_row.append(tp)
                            fp_row.append(fp)
                        all_tp.append((ti, [sc["det_scores"][i]
                                            for i in d_idx], tp_row, fp_row))
                # accumulate (textbook): global stable sort by -score
                if not any_img or n_gt == 0:
                    continue
                for ti in range(t_n):
                    entries = []  # (score, insertion order, tp, fp)
                    order_counter = 0
                    for (tti, scores, tps, fps) in all_tp:
                        if tti != ti:
                            continue
                        for s, tp, fp in zip(scores, tps, fps):
                            entries.append((s, order_counter, tp, fp))
                            order_counter += 1
                    entries.sort(key=lambda e: (-e[0], e[1]))
                    tp_c = fp_c = 0
                    rc, pr = [], []
                    for (_, _, tp, fp) in entries:
                        tp_c += int(tp)
                        fp_c += int(fp)
                        rc.append(tp_c / n_gt)
                        pr.append(tp_c / max(tp_c + fp_c, np.spacing(1)))
                    recall[ti, ki, ai, mi] = rc[-1] if rc else 0
                    # envelope
                    for i in range(len(pr) - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    q = np.zeros(r_n)
                    for ri, rt in enumerate(REC_THRESHS):
                        # first index with rc >= rt ('left' searchsorted)
                        pi = next((i for i, r in enumerate(rc) if r >= rt),
                                  len(rc))
                        if pi < len(pr):
                            q[ri] = pr[pi]
                    precision[ti, :, ki, ai, mi] = q
    return precision, recall


# ---------------------------------------------------------------------------
# Scene fuzzer
# ---------------------------------------------------------------------------


def random_scene(rng, h=28, w=36, n_cats=3, max_gt=5, max_det=14,
                 tie_scores=True, explicit_areas=False):
    def rand_mask():
        m = np.zeros((h, w), bool)
        y1 = rng.randint(0, h - 4)
        x1 = rng.randint(0, w - 4)
        m[y1:y1 + rng.randint(2, h // 2), x1:x1 + rng.randint(2, w // 2)] = 1
        return m

    g = rng.randint(0, max_gt + 1)
    d = rng.randint(0, max_det + 1)
    gt_masks = [rand_mask() for _ in range(g)]
    gt_labels = rng.randint(0, n_cats, g).tolist()
    gt_crowds = (rng.rand(g) < 0.25).tolist()
    gt_areas = None
    if explicit_areas and g:
        # real COCO: 'area' comes from the annotation, not the decoded
        # mask; skew some into other area buckets
        gt_areas = [float(m.sum()) * rng.choice([0.5, 1.0, 40.0])
                    for m in gt_masks]
    det_masks = []
    for _ in range(d):
        if g and rng.rand() < 0.5:
            # perturbation of a gt mask -> plausible IoUs incl. exact ties
            base = gt_masks[rng.randint(g)].copy()
            if rng.rand() < 0.5:
                base[rng.randint(h), rng.randint(w)] ^= True
            det_masks.append(base)
        else:
            det_masks.append(rand_mask())
    det_labels = rng.randint(0, n_cats, d).tolist()
    if tie_scores:
        det_scores = (rng.randint(1, 5, d) / 4.0).tolist()  # heavy ties
    else:
        det_scores = rng.rand(d).tolist()
    return {
        "det_masks": det_masks,
        "det_labels": det_labels,
        "det_scores": det_scores,
        "gt_masks": gt_masks,
        "gt_labels": gt_labels,
        "gt_crowds": gt_crowds,
        "gt_areas": gt_areas,
    }


@pytest.mark.parametrize("seed", range(8))
def test_native_matches_bruteforce(seed):
    rng = np.random.RandomState(seed)
    n_scenes = rng.randint(2, 6)
    explicit = seed % 2 == 1
    scenes = [
        random_scene(rng, tie_scores=True, explicit_areas=explicit)
        for _ in range(n_scenes)
    ]

    ev = COCOEvaluation(iou_type="segm")
    for sc in scenes:
        ev.add(
            pred_masks=np.asarray(sc["det_masks"], bool).reshape(
                len(sc["det_masks"]), 28, 36
            ) if sc["det_masks"] else np.zeros((0, 1, 1), bool),
            pred_labels=np.asarray(sc["det_labels"], np.int64),
            pred_scores=np.asarray(sc["det_scores"], np.float64),
            gt_masks=np.asarray(sc["gt_masks"], bool).reshape(
                len(sc["gt_masks"]), 28, 36
            ) if sc["gt_masks"] else np.zeros((0, 1, 1), bool),
            gt_labels=np.asarray(sc["gt_labels"], np.int64),
            gt_crowds=np.asarray(sc["gt_crowds"], bool),
            gt_areas=(
                np.asarray(sc["gt_areas"], np.float64)
                if sc["gt_areas"] is not None else None
            ),
        )
    cats, precision, recall = ev._evaluate_all()

    naive_p, naive_r = naive_evaluate(scenes, cats)
    np.testing.assert_allclose(recall, naive_r, atol=1e-12, err_msg=(
        f"recall tables diverge (seed {seed})"
    ))
    np.testing.assert_allclose(precision, naive_p, atol=1e-12, err_msg=(
        f"precision tables diverge (seed {seed})"
    ))


def test_bruteforce_sanity_perfect_prediction():
    """Self-check of the naive scorer: perfect predictions -> AP 1 at the
    'all' area range and maxDets=100."""
    rng = np.random.RandomState(0)
    sc = random_scene(rng, max_gt=3, max_det=0)
    while not sc["gt_masks"] or all(sc["gt_crowds"]):
        sc = random_scene(rng, max_gt=3, max_det=0)
    sc["det_masks"] = [m.copy() for m in sc["gt_masks"]]
    sc["det_labels"] = list(sc["gt_labels"])
    sc["det_scores"] = [0.9] * len(sc["gt_masks"])
    cats = sorted(set(sc["gt_labels"]))
    precision, recall = naive_evaluate([sc], cats)
    ai = list(AREA_RANGES).index("all")
    mi = MAX_DETS.index(100)
    for ki, cat in enumerate(cats):
        has_real_gt = any(
            l == cat and not c
            for l, c in zip(sc["gt_labels"], sc["gt_crowds"])
        )
        if has_real_gt:
            assert recall[:, ki, ai, mi].min() == 1.0
            assert precision[:, :, ki, ai, mi].min() == 1.0
