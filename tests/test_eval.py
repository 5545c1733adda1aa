import numpy as np

from mask_rcnn_tpu.utils.cocoeval import COCOEvaluation, eval_instseg_coco
from mask_rcnn_tpu.utils.voc_eval import eval_instseg_voc


def box_mask(h, w, y1, x1, y2, x2):
    m = np.zeros((h, w), bool)
    m[y1:y2, x1:x2] = True
    return m


def test_coco_perfect_predictions():
    gt_masks = [np.stack([box_mask(64, 64, 5, 5, 60, 40),
                          box_mask(64, 64, 10, 45, 30, 60)])]
    gt_labels = [np.array([0, 1])]
    res = eval_instseg_coco(
        [gt_masks[0].copy()], gt_labels, [np.array([0.9, 0.8])],
        gt_masks, gt_labels,
    )
    assert res["map/iou=0.50:0.95/area=all/maxDets=100"] == 1.0
    assert res["map/iou=0.50/area=all/maxDets=100"] == 1.0
    assert res["mar/iou=0.50:0.95/area=all/maxDets=100"] == 1.0


def test_coco_false_positive_halves_ap():
    """One gt; pred = [match@high score is wrong order...] two preds: a
    perfect one at lower score and a spurious one at higher score ->
    precision at recall 1 is 0.5, AP(101pt) ~ 0.5."""
    gt_m = [np.stack([box_mask(64, 64, 5, 5, 40, 40)])]
    gt_l = [np.array([0])]
    preds = np.stack([
        box_mask(64, 64, 50, 50, 60, 60),  # spurious, no overlap
        box_mask(64, 64, 5, 5, 40, 40),  # perfect
    ])
    res = eval_instseg_coco(
        [preds], [np.array([0, 0])], [np.array([0.9, 0.5])], gt_m, gt_l
    )
    got = res["map/iou=0.50:0.95/area=all/maxDets=100"]
    # recall hits 1.0 with precision 1/2; pycocotools 101-pt AP = 0.5
    np.testing.assert_allclose(got, 0.5, atol=0.01)


def test_coco_missed_gt_lowers_recall():
    gt_m = [np.stack([box_mask(64, 64, 5, 5, 40, 40),
                      box_mask(64, 64, 45, 45, 63, 63)])]
    gt_l = [np.array([0, 0])]
    preds = gt_m[0][:1]
    res = eval_instseg_coco(
        [preds], [np.array([0])], [np.array([0.9])], gt_m, gt_l
    )
    np.testing.assert_allclose(
        res["mar/iou=0.50:0.95/area=all/maxDets=100"], 0.5, atol=0.01
    )
    np.testing.assert_allclose(
        res["map/iou=0.50:0.95/area=all/maxDets=100"], 0.5, atol=0.02
    )


def test_coco_crowd_not_counted_as_fp():
    """A det matching only a crowd gt is ignored (neither TP nor FP)."""
    crowd = box_mask(64, 64, 0, 0, 64, 32)
    real = box_mask(64, 64, 10, 40, 30, 60)
    gt_m = [np.stack([real, crowd])]
    gt_l = [np.array([0, 0])]
    preds = np.stack([real, box_mask(64, 64, 2, 2, 60, 30)])
    res = eval_instseg_coco(
        [preds], [np.array([0, 0])], [np.array([0.8, 0.9])],
        gt_m, gt_l, gt_crowds=[np.array([False, True])],
    )
    # the crowd-matching det is ignored; the real det is a perfect match
    assert res["map/iou=0.50:0.95/area=all/maxDets=100"] == 1.0


def test_coco_per_class_arrays():
    gt_m = [np.stack([box_mask(32, 32, 2, 2, 30, 16),
                      box_mask(32, 32, 2, 18, 30, 30)])]
    gt_l = [np.array([3, 7])]
    res = eval_instseg_coco(
        [gt_m[0].copy()], gt_l, [np.array([0.9, 0.9])], gt_m, gt_l
    )
    assert res["class_ids"] == [3, 7]
    ap = res["ap/iou=0.50:0.95/area=all/maxDets=100"]
    assert ap.shape == (2,)
    np.testing.assert_allclose(ap, [1.0, 1.0])


def test_voc_eval_perfect_and_degraded():
    gt_masks = [
        [box_mask(48, 48, 4, 4, 40, 24), box_mask(48, 48, 8, 28, 40, 44)]
    ]
    gt_labels = [np.array([0, 1])]
    res = eval_instseg_voc(
        [gt_masks[0]], gt_labels, [np.array([0.9, 0.8])],
        gt_masks, gt_labels,
    )
    np.testing.assert_allclose(res["map"], 1.0)

    # shift one prediction to miss -> its class AP drops to 0
    bad = [box_mask(48, 48, 4, 4, 40, 24), box_mask(48, 48, 0, 0, 6, 6)]
    res2 = eval_instseg_voc(
        [bad], gt_labels, [np.array([0.9, 0.8])], gt_masks, gt_labels
    )
    np.testing.assert_allclose(res2["ap"][0], 1.0)
    np.testing.assert_allclose(res2["ap"][1], 0.0)


def test_coco_match_ignored_noncrowd_gt_single_match():
    """pycocotools rematch rule: only crowd gts may absorb multiple dets.
    An area-ignored NON-crowd gt matches at most one det; a second det
    stays unmatched (and becomes an FP if itself in-range)."""
    from mask_rcnn_tpu.utils.cocoeval import _match_image

    ious = np.array([[0.9], [0.8]])  # two dets both overlap the one gt
    threshs = np.array([0.5])
    gt_ignore = np.array([True])
    det_in_range = np.zeros(2, bool)

    # non-crowd ignored gt: det0 matches (ignored), det1 unmatched -> FP
    dtm, dt_ig = _match_image(
        ious, np.array([0.9, 0.8]), gt_ignore, np.array([False]),
        det_in_range, threshs,
    )
    assert dtm[0, 0] == 0 and dt_ig[0, 0]
    assert dtm[0, 1] == -1 and not dt_ig[0, 1]

    # crowd gt: both dets match it and are ignored
    dtm, dt_ig = _match_image(
        ious, np.array([0.9, 0.8]), gt_ignore, np.array([True]),
        det_in_range, threshs,
    )
    assert dtm[0, 0] == 0 and dt_ig[0, 0]
    assert dtm[0, 1] == 0 and dt_ig[0, 1]


def test_voc_eval_argmax_gt_assignment():
    """chainercv semantics (eval_instance_segmentation_voc.py): a prediction
    is assigned its argmax-IoU gt; if that gt is already selected the
    prediction is an FP even when a different untaken gt also clears the
    IoU threshold."""
    g1 = box_mask(48, 48, 0, 0, 32, 32)
    g2 = box_mask(48, 48, 0, 8, 32, 40)  # heavy overlap with g1
    gt_masks = [[g1, g2]]
    gt_labels = [np.array([0, 0])]
    # both predictions argmax to g1 (p2 overlaps g1 slightly more than g2)
    p1 = g1
    p2 = box_mask(48, 48, 0, 2, 32, 34)
    res = eval_instseg_voc(
        [[p1, p2]], gt_labels, [np.array([0.9, 0.8])], gt_masks, gt_labels
    )
    # p1 TP on g1; p2's argmax gt is g1 (taken) -> FP, even though
    # IoU(p2, g2) >= 0.5. prec = [1, 1/2], rec = [1/2, 1/2] -> AP = 0.5
    np.testing.assert_allclose(res["ap"][0], 0.5)


def test_voc_eval_difficult_gt_ignored():
    """Difficult gts: matched predictions are neither TP nor FP, and the
    difficult gt doesn't count toward n_pos."""
    g1 = box_mask(48, 48, 0, 0, 20, 20)
    g2 = box_mask(48, 48, 24, 24, 44, 44)
    gt_masks = [[g1, g2]]
    gt_labels = [np.array([0, 0])]
    res = eval_instseg_voc(
        [[g1, g2]], gt_labels, [np.array([0.9, 0.8])], gt_masks, gt_labels,
        gt_difficults=[np.array([False, True])],
    )
    # g2 is difficult: its perfect prediction is ignored; g1's is a TP over
    # n_pos=1 -> AP = 1.0
    np.testing.assert_allclose(res["ap"][0], 1.0)


def test_coco_bbox_mode():
    ev = COCOEvaluation("bbox")
    gt_b = np.array([[5.0, 5.0, 40.0, 40.0]], np.float64)
    ev.add(
        None, np.array([0]), np.array([0.9]), None, np.array([0]),
        pred_bboxes=gt_b.copy(), gt_bboxes=gt_b,
    )
    res = ev.results()
    assert res["map/iou=0.50:0.95/area=all/maxDets=100"] == 1.0


def test_coco_evaluation_retains_only_compact_records():
    """Streaming ingestion must not retain full-resolution masks: the
    per-image records (IoU matrices + scores + areas) must be orders of
    magnitude smaller than the ingested mask bytes — this is what bounds
    RSS on a COCO-minival-scale sweep."""
    ev = COCOEvaluation("segm")
    h, w = 800, 1280  # ~1 MP, COCO scale
    mask_bytes = 0
    for i in range(3):
        rng = np.random.RandomState(i)
        pred = rng.rand(20, h, w) > 0.7
        gt = rng.rand(4, h, w) > 0.7
        mask_bytes += pred.nbytes + gt.nbytes
        ev.add(
            pred, rng.randint(0, 3, 20), rng.rand(20),
            gt, rng.randint(0, 3, 4),
        )

    def record_bytes(obj):
        if isinstance(obj, np.ndarray):
            return obj.nbytes
        if isinstance(obj, dict):
            return sum(record_bytes(v) for v in obj.values())
        if isinstance(obj, (list, tuple)):
            return sum(record_bytes(v) for v in obj)
        return 64  # scalar bound

    retained = record_bytes(ev._per_image)
    assert retained < mask_bytes / 1000, (retained, mask_bytes)
    assert np.isfinite(
        ev.results()["map/iou=0.50:0.95/area=all/maxDets=100"]
    )


def _rand_image_preds(seed, h=64, w=64):
    rng = np.random.RandomState(seed)
    d, g = rng.randint(1, 6), rng.randint(1, 4)
    return (
        rng.rand(d, h, w) > 0.6,
        rng.randint(0, 3, d),
        rng.rand(d),
        rng.rand(g, h, w) > 0.6,
        rng.randint(0, 3, g),
    )


def test_coco_merge_state_equals_single_accumulator():
    """Pooled distributed evaluation: scoring the union of two shards'
    compact states must equal scoring all images in one accumulator."""
    full = COCOEvaluation("segm")
    a = COCOEvaluation("segm")
    b = COCOEvaluation("segm")
    for i in range(8):
        args = _rand_image_preds(i)
        full.add(*args)
        (a if i % 2 == 0 else b).add(*args)
    a.merge_state(b.get_state())
    ra, rf = a.results(), full.results()
    assert ra["class_ids"] == rf["class_ids"]
    for k in ("map/iou=0.50:0.95/area=all/maxDets=100",
              "map/iou=0.50/area=all/maxDets=100",
              "mar/iou=0.50:0.95/area=all/maxDets=100"):
        np.testing.assert_allclose(ra[k], rf[k], rtol=1e-12)


def test_voc_merge_state_equals_single_accumulator():
    from mask_rcnn_tpu.utils.voc_eval import VOCEvaluation

    full = VOCEvaluation()
    a = VOCEvaluation()
    b = VOCEvaluation()
    for i in range(8):
        pm, pl, ps, gm, gl = _rand_image_preds(100 + i)
        full.add(pm, pl, ps, gm, gl)
        (a if i % 3 == 0 else b).add(pm, pl, ps, gm, gl)
    a.merge_state(b.get_state())
    ra, rf = a.results(), full.results()
    np.testing.assert_allclose(ra["map"], rf["map"], rtol=1e-12)
    np.testing.assert_allclose(
        np.nan_to_num(ra["ap"]), np.nan_to_num(rf["ap"]), rtol=1e-12
    )
