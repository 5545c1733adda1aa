"""add_boxlocal must reproduce the paste-then-add path exactly: a predicted
mask is zero outside its expanded clipped box, so every IoU is the same
integer-count ratio whether or not the mask was pasted to full resolution."""

import numpy as np
import pytest

from mask_rcnn_tpu.engine.evaluator import InstanceSegmentationEvaluator
from mask_rcnn_tpu.utils.cocoeval import COCOEvaluation
from mask_rcnn_tpu.utils.masks import paste_masks
from mask_rcnn_tpu.utils.voc_eval import VOCEvaluation


def _synthetic_case(seed, im_h=120, im_w=160, d=12, g=5):
    rng = np.random.RandomState(seed)
    bbox = np.zeros((d, 4), np.float32)
    bbox[:, 0] = rng.uniform(-20, im_h - 10, d)
    bbox[:, 1] = rng.uniform(-20, im_w - 10, d)
    bbox[:, 2] = bbox[:, 0] + rng.uniform(5, 80, d)
    bbox[:, 3] = bbox[:, 1] + rng.uniform(5, 80, d)
    # one detection fully outside the image
    bbox[0] = (-30, -30, -5, -5)
    probs = rng.rand(d, 14, 14).astype(np.float32)
    labels = rng.randint(0, 4, d).astype(np.int32)
    scores = rng.rand(d).astype(np.float32)

    gt_masks = np.zeros((g, im_h, im_w), bool)
    for j in range(g):
        y, x = rng.randint(0, im_h - 30), rng.randint(0, im_w - 30)
        gt_masks[j, y:y + rng.randint(10, 30), x:x + rng.randint(10, 30)] = (
            True
        )
    gt_labels = rng.randint(0, 4, g).astype(np.int32)
    gt_crowds = rng.rand(g) < 0.3
    gt_areas = rng.uniform(100, 900, g)
    return bbox, probs, labels, scores, gt_masks, gt_labels, gt_crowds, \
        gt_areas


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_coco_records_identical(seed):
    (bbox, probs, labels, scores, gt_masks, gt_labels, gt_crowds,
     gt_areas) = _synthetic_case(seed)
    im_h, im_w = gt_masks.shape[1:]

    ev_paste = COCOEvaluation("segm")
    ev_paste.add(
        paste_masks(bbox, probs, im_h, im_w), labels, scores,
        gt_masks, gt_labels, gt_crowds, gt_areas,
    )
    ev_local = COCOEvaluation("segm")
    ev_local.add_boxlocal(
        bbox, probs, labels, scores, (im_h, im_w),
        gt_masks, gt_labels, gt_crowds, gt_areas,
    )

    (rec_a,), (rec_b,) = ev_paste._per_image, ev_local._per_image
    assert rec_a.keys() == rec_b.keys()
    for cat in rec_a:
        for field in ("ious", "det_scores", "det_areas", "gt_areas",
                      "gt_crowds"):
            np.testing.assert_array_equal(
                rec_a[cat][field], rec_b[cat][field],
                err_msg=f"cat={cat} field={field}",
            )
    ra, rb = ev_paste.results(), ev_local.results()
    for k in ra:
        np.testing.assert_array_equal(np.asarray(ra[k]), np.asarray(rb[k]),
                                      err_msg=k)


@pytest.mark.parametrize("seed", [3, 4])
def test_voc_state_identical(seed):
    (bbox, probs, labels, scores, gt_masks, gt_labels, _,
     _) = _synthetic_case(seed)
    im_h, im_w = gt_masks.shape[1:]

    ev_paste = VOCEvaluation()
    ev_paste.add(
        paste_masks(bbox, probs, im_h, im_w), labels, scores,
        gt_masks, gt_labels,
    )
    ev_local = VOCEvaluation()
    ev_local.add_boxlocal(
        bbox, probs, labels, scores, (im_h, im_w), gt_masks, gt_labels
    )
    sa, sb = ev_paste.get_state(), ev_local.get_state()
    assert sa["n_pos"] == sb["n_pos"]
    assert sa["score"].keys() == sb["score"].keys()
    for lbl in sa["score"]:
        np.testing.assert_array_equal(sa["score"][lbl], sb["score"][lbl])
        np.testing.assert_array_equal(
            sa["match"].get(lbl, []), sb["match"].get(lbl, [])
        )


def test_empty_dets_and_gts():
    ev = COCOEvaluation("segm")
    ev.add_boxlocal(
        np.zeros((0, 4), np.float32), np.zeros((0, 14, 14), np.float32),
        np.zeros(0, np.int32), np.zeros(0, np.float32), (50, 50),
        np.zeros((1, 50, 50), bool), np.asarray([2], np.int32),
    )
    ev.add_boxlocal(
        np.asarray([[5, 5, 30, 30]], np.float32),
        np.ones((1, 14, 14), np.float32), np.asarray([1], np.int32),
        np.asarray([0.8], np.float32), (50, 50),
        np.zeros((0, 1, 1), bool), np.zeros(0, np.int32),
    )
    res = ev.results()
    assert np.isfinite(res["map/iou=0.50:0.95/area=all/maxDets=100"]) or True


class _RawCaseModel:
    """Deterministic raw (box, probs) detections derived from each image."""

    score_thresh = 0.05

    def _detect(self, imgs):
        out = []
        for img in imgs:
            _, h, w = img.shape
            seed = int(img.astype(np.int64).sum() % (2 ** 31))
            (bbox, probs, labels, scores, *_unused) = _synthetic_case(
                seed, im_h=h, im_w=w, d=6, g=1
            )
            out.append((bbox, probs, labels, scores, (h, w)))
        return out

    def predict_submit(self, imgs):
        return self._detect(imgs)


class _RawModel(_RawCaseModel):
    def predict_collect_raw(self, handle):
        bb = [x[0] for x in handle]
        pr = [x[1] for x in handle]
        lb = [x[2] for x in handle]
        sc = [x[3] for x in handle]
        sizes = [x[4] for x in handle]
        return bb, pr, lb, sc, sizes


class _PasteModel(_RawCaseModel):
    def predict_collect(self, handle):
        bboxes, masks, labels, scores = [], [], [], []
        for bb, pr, lb, sc, (h, w) in handle:
            bboxes.append(bb)
            masks.append(paste_masks(bb, pr, h, w))
            labels.append(lb)
            scores.append(sc)
        return bboxes, masks, labels, scores


class _EvalDataset:
    def __init__(self, n=5, h=60, w=80):
        self.n, self.h, self.w = n, h, w

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(500 + i)
        img = rng.randint(0, 255, (self.h, self.w, 3)).astype(np.uint8)
        masks, labels = [], []
        for k in range(2):
            m = np.zeros((self.h, self.w), np.int32)
            y, x = rng.randint(2, 20), rng.randint(2, 30)
            m[y:y + 20, x:x + 25] = 1
            masks.append(m)
            labels.append(k)
        bboxes = np.asarray([[5, 5, 25, 30], [10, 10, 30, 35]], np.float32)
        return (img, bboxes, np.asarray(labels, np.int32),
                np.asarray(masks, np.int32),
                np.asarray([0, 0], np.int32),
                np.asarray([400.0, 400.0], np.float32))


@pytest.mark.parametrize("kind", ["coco", "voc"])
def test_evaluator_boxlocal_matches_paste_path(kind):
    """The evaluator fed raw detections (predict_collect_raw) must report
    exactly what it reports when fed pasted masks (predict_collect)."""
    ds = _EvalDataset()
    ev = InstanceSegmentationEvaluator(
        ds, ["c0", "c1", "c2", "c3"], kind=kind, batch_size=2
    )
    r_paste = ev(_PasteModel())
    r_raw = ev(_RawModel())
    assert r_paste.keys() == r_raw.keys()
    for k in r_paste:
        np.testing.assert_array_equal(r_paste[k], r_raw[k], err_msg=k)


def test_subclass_predict_collect_override_wins():
    """A model that overrides predict_collect below where
    predict_collect_raw is defined must be scored through its override
    (the raw path would bypass the subclass's post-processing)."""

    class Base(_RawCaseModel):
        def predict_collect_raw(self, handle):
            raise AssertionError("raw path must not be used")

        def predict_collect(self, handle):
            return _PasteModel.predict_collect(self, handle)

    class Sub(Base):
        def predict_collect(self, handle):  # post-processing override
            bboxes, masks, labels, scores = Base.predict_collect(self, handle)
            return bboxes, masks, labels, [s * 0 + 0.5 for s in scores]

    ds = _EvalDataset(n=2)
    ev = InstanceSegmentationEvaluator(ds, ["c0", "c1", "c2", "c3"],
                                       kind="coco", batch_size=2)
    report = ev(Sub())  # raises inside the scorer if raw were chosen
    assert "validation/main/map" in report
