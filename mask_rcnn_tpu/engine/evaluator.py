"""Evaluation + visualization-report hooks (reference extensions layer
parity: InstanceSegmentationCOCOEvaluator / VOCEvaluator / VisReport,
extensions/*.py)."""

from __future__ import annotations

import os
import os.path as osp
from typing import Dict, Optional, Sequence

import numpy as np

from mask_rcnn_tpu.utils.cocoeval import COCOEvaluation
from mask_rcnn_tpu.utils.voc_eval import VOCEvaluation
from mask_rcnn_tpu.utils.visualizations import (
    get_tile_image,
    visualize_instance_segmentation,
)


class InstanceSegmentationEvaluator:
    """Runs model.predict over a dataset and computes COCO or VOC metrics.

    Report keys mirror the reference extensions
    (instance_segmentation_coco_evaluator.py:54-70): 'validation/main/map',
    'validation/main/map@0.5', 'validation/main/map@0.75' (COCO), per-class
    'validation/main/ap/<class>'.
    """

    def __init__(
        self,
        dataset,
        class_names: Sequence[str],
        kind: str = "coco",
        batch_size: int = 2,
        use_07_metric: bool = False,
        max_examples: Optional[int] = None,
        pool_detections: bool = False,
    ):
        """``pool_detections``: with multiple processes, gather the compact
        per-image match records from every shard and score them globally —
        exact global mAP, identical on every rank. Off by default for
        reference parity (chainermn's evaluator averages per-rank metric
        reports instead, which differs slightly for non-divisible shards;
        docs/parity.md)."""
        assert kind in ("coco", "voc")
        self.dataset = dataset
        self.class_names = list(class_names)
        self.kind = kind
        self.batch_size = batch_size
        self.use_07_metric = use_07_metric
        self.max_examples = max_examples
        self.pool_detections = pool_detections

    def __call__(self, model) -> Dict[str, float]:
        import jax

        n = len(self.dataset)
        if self.max_examples:
            n = min(n, self.max_examples)
        # Distributed evaluation: each process scores a strided shard of the
        # dataset and the per-process reports are averaged below — the same
        # contract as the reference's chainermn.create_multi_node_evaluator
        # (examples/train_common.py:271-272), which also averages per-rank
        # metric reports rather than pooling detections globally.
        pi, pc = jax.process_index(), jax.process_count()
        indices = list(range(n))[pi::pc]
        # Sharded (single-process) inference pads the batch to the mesh
        # size anyway — feed it full mesh-wide batches.
        batch_size = self.batch_size
        mesh = getattr(model, "mesh", None)
        if mesh is not None:
            batch_size = max(batch_size, mesh.devices.size)

        # Streaming accumulation: each batch's full-resolution masks are
        # matched into compact per-(image, class) IoU/score records right
        # after predict and then freed — a COCO-minival-scale sweep (5k
        # images x 100 dets x ~1 MP bool masks would be ~100+ GB as lists)
        # stays at a bounded RSS. Reference analog: streaming
        # apply_to_iterator -> eval_instseg_coco
        # (extensions/instance_segmentation_coco_evaluator.py:36-52).
        # Scoring runs on a worker thread (bounded queue) so the IoU
        # matching of batch i overlaps the device predict of batch i+1 —
        # numpy/cv2 release the GIL, so the sweep is pipelined, not serial.
        import queue as queue_mod
        import threading

        ev = (
            COCOEvaluation("segm")
            if self.kind == "coco"
            else VOCEvaluation(use_07_metric=self.use_07_metric)
        )
        n_added = 0
        q: queue_mod.Queue = queue_mod.Queue(maxsize=2)
        failure = []

        def scorer():
            failed = False
            while True:
                item = q.get()
                if item is None:
                    return
                if failed:
                    continue  # keep draining so the producer never blocks
                try:
                    for fn, args in item:
                        getattr(ev, fn)(*args)
                except BaseException as e:  # surfaced after join
                    failure.append(e)
                    failed = True

        t = threading.Thread(target=scorer, daemon=True)
        t.start()

        def gt_extras(e):
            """(crowds, areas) of an example tuple. The dataset's
            return_crowd/return_area flags say which optional fields are
            present — guessing positionally would read a crowd-less
            areas-only 5-tuple's areas as crowd flags (every gt becomes an
            ignored crowd and the mAP is silently garbage)."""
            rc = getattr(self.dataset, "return_crowd", None)
            ra = getattr(self.dataset, "return_area", None)
            if rc is None and ra is None:
                if len(e) > 5:
                    return e[4], e[5]
                if len(e) > 4:
                    raise ValueError(
                        "dataset yields a 5-tuple but exposes no "
                        "return_crowd/return_area attributes — cannot tell "
                        "whether element 4 is crowd flags or areas"
                    )
                return None, None
            j = 4
            crowds = areas = None
            if rc:
                crowds = e[j]
                j += 1
            if ra:
                areas = e[j]
            return crowds, areas

        def enqueue(examples, results):
            nonlocal n_added
            bboxes, masks, labels, scores = results
            work = []
            for e, mk, lb, sc in zip(examples, masks, labels, scores):
                gt_mask = np.asarray(e[3], bool)
                if self.kind == "coco":
                    crowds, areas = gt_extras(e)
                    work.append(("add", (
                        mk, lb, sc, gt_mask, e[2], crowds, areas,
                    )))
                else:
                    work.append(("add", (mk, lb, sc, gt_mask, e[2])))
                n_added += 1
            q.put(work)

        def enqueue_raw(examples, results):
            """Box-local scoring: masks never pasted to full resolution
            (``add_boxlocal`` computes the identical integer-count IoUs
            from each detection's box crop)."""
            nonlocal n_added
            bboxes, probs, labels, scores, sizes = results
            work = []
            for e, bb, pr, lb, sc, size in zip(
                examples, bboxes, probs, labels, scores, sizes
            ):
                gt_mask = np.asarray(e[3], bool)
                if self.kind == "coco":
                    crowds, areas = gt_extras(e)
                    work.append(("add_boxlocal", (
                        bb, pr, lb, sc, size, gt_mask, e[2], crowds, areas,
                    )))
                else:
                    work.append(("add_boxlocal",
                                 (bb, pr, lb, sc, size, gt_mask, e[2])))
                n_added += 1
            q.put(work)

        # Double-buffered sweep: batch i+1 is decoded and dispatched to the
        # device before batch i's detections are fetched and pasted, so host
        # decode + paste + transfers overlap device compute (the api layer's
        # predict_submit/predict_collect split; results are bitwise identical
        # to sequential predict — tests/test_api_stream.py). Models without
        # the split (bare test stubs) fall back to blocking predict.
        submit = getattr(model, "predict_submit", None)
        collect_raw = getattr(model, "predict_collect_raw", None)

        def _definer(name):
            for k in type(model).__mro__:
                if name in vars(k):
                    return k
            return None

        # Prefer raw (paste-free) collection, but never shadow a subclass
        # that overrides predict_collect below where predict_collect_raw is
        # defined — such an override post-processes detections and must
        # stay authoritative for evaluation.
        raw_cls, collect_cls = _definer("predict_collect_raw"), _definer(
            "predict_collect"
        )
        use_raw = collect_raw is not None and (
            collect_cls is None or (
                raw_cls is not None and issubclass(raw_cls, collect_cls)
            )
        )
        inst = getattr(model, "__dict__", {})
        if "predict_collect" in inst and "predict_collect_raw" not in inst:
            use_raw = False  # instance-level override wins likewise
        if use_raw:
            collect, ingest = collect_raw, enqueue_raw
        else:
            collect, ingest = getattr(model, "predict_collect", None), enqueue
        pipelined = submit is not None and collect is not None
        pending = None  # (handle, examples) with one device batch in flight
        sweep_error = None
        try:
            try:
                for start in range(0, len(indices), batch_size):
                    examples = [
                        self.dataset[i]
                        for i in indices[start:start + batch_size]
                    ]
                    imgs = [e[0].transpose(2, 0, 1).astype(np.float32)
                            for e in examples]
                    if pipelined:
                        handle = submit(imgs)
                        if pending is not None:
                            ingest(pending[1], collect(pending[0]))
                        pending = (handle, examples)
                    else:
                        enqueue(examples, model.predict(imgs))
                    if failure:
                        pending = None
                        break
                if pending is not None:
                    ingest(pending[1], collect(pending[0]))
            finally:
                q.put(None)
                t.join()
            if failure:
                raise RuntimeError(
                    "evaluation scoring failed"
                ) from failure[0]
        except BaseException as e:
            # Multi-process: raising here would skip the collectives below
            # and leave every other rank blocked in process_allgather
            # forever. Exchange failure flags first (all ranks reach that
            # collective), then raise everywhere.
            if pc == 1:
                raise
            sweep_error = e
        if pc > 1:
            from jax.experimental import multihost_utils

            flags = np.asarray(
                multihost_utils.process_allgather(
                    np.asarray([sweep_error is not None], np.int32)
                )
            ).reshape(-1)
            if flags.any():
                bad = np.flatnonzero(flags).tolist()
                if sweep_error is not None:
                    raise RuntimeError(
                        f"evaluation failed on process(es) {bad}"
                    ) from sweep_error
                raise RuntimeError(
                    f"evaluation failed on process(es) {bad}"
                )

        if pc > 1 and self.pool_detections:
            # Exact global metric: gather every shard's compact records
            # (collective, all ranks participate) and score the union
            # locally — every rank then computes the identical global mAP.
            n_added = self._pool_states(ev, n_added)

        # An empty shard (more processes than examples) reports no keys —
        # it must still reach the collective aggregation below, where its
        # all-NaN vector is ignored by the nanmean.
        report = {}
        if n_added and self.kind == "coco":
            res = ev.results()
            report["validation/main/map"] = res[
                "map/iou=0.50:0.95/area=all/maxDets=100"
            ]
            report["validation/main/map@0.5"] = res[
                "map/iou=0.50/area=all/maxDets=100"
            ]
            report["validation/main/map@0.75"] = res[
                "map/iou=0.75/area=all/maxDets=100"
            ]
            class_ap = res["ap/iou=0.50:0.95/area=all/maxDets=100"]
            for cid, ap in zip(res["class_ids"], class_ap):
                if 0 <= cid < len(self.class_names):
                    report[
                        f"validation/main/ap/{self.class_names[cid]}"
                    ] = float(ap)
        elif n_added:
            res = ev.results()
            report["validation/main/map"] = res["map"]
            for cid, ap in enumerate(res["ap"]):
                if not np.isnan(ap) and cid < len(self.class_names):
                    report[
                        f"validation/main/ap/{self.class_names[cid]}"
                    ] = float(ap)
        if pc > 1 and not self.pool_detections:
            report = self._aggregate_reports(report)
        return report

    @staticmethod
    def _pool_states(ev, n_added: int) -> int:
        """Allgather every process's compact accumulator state and rebuild
        ``ev`` from the shards in rank order — every rank reconstructs the
        records in the SAME order, so tied detection scores break the same
        way everywhere and the pooled metric is bit-identical across ranks.
        Returns the global example count. Ragged pickle payloads ride two
        fixed-shape collectives (max-length, then padded bytes)."""
        import pickle

        from jax.experimental import multihost_utils

        payload = np.frombuffer(
            pickle.dumps((n_added, ev.get_state())), np.uint8
        )
        # int32 lengths: jax's default x64-disabled config silently
        # downcasts int64 operands, so make the 2 GiB-per-shard bound
        # explicit instead of letting a giant payload wrap and corrupt
        # the slicing below.
        assert len(payload) < 2**31, (
            f"pooled eval shard state is {len(payload)} bytes; the "
            "allgather length protocol caps shards at 2 GiB"
        )
        lengths = np.asarray(
            multihost_utils.process_allgather(
                np.asarray([len(payload)], np.int32)
            )
        ).reshape(-1)
        padded = np.zeros(int(lengths.max()), np.uint8)
        padded[: len(payload)] = payload
        gathered = np.asarray(
            multihost_utils.process_allgather(padded)
        )  # (pc, max_len)

        total = 0
        for rank, (row, ln) in enumerate(zip(gathered, lengths)):
            count, state = pickle.loads(bytes(row[: int(ln)]))
            total += count
            if rank == 0:
                ev.set_state(state)
            else:
                ev.merge_state(state)
        return total

    # -- multi-host report averaging --------------------------------------
    _SCALAR_KEYS = (
        "validation/main/map",
        "validation/main/map@0.5",
        "validation/main/map@0.75",
    )

    def _report_to_vector(self, report: Dict[str, float]) -> np.ndarray:
        vec = np.full(
            len(self._SCALAR_KEYS) + len(self.class_names), np.nan,
            np.float32,
        )
        for i, k in enumerate(self._SCALAR_KEYS):
            if k in report:
                vec[i] = report[k]
        for cid, name in enumerate(self.class_names):
            k = f"validation/main/ap/{name}"
            if k in report:
                vec[len(self._SCALAR_KEYS) + cid] = report[k]
        return vec

    def _vector_to_report(self, vec: np.ndarray) -> Dict[str, float]:
        report = {}
        for i, k in enumerate(self._SCALAR_KEYS):
            if np.isfinite(vec[i]):
                report[k] = float(vec[i])
        for cid, name in enumerate(self.class_names):
            v = vec[len(self._SCALAR_KEYS) + cid]
            if np.isfinite(v):
                report[f"validation/main/ap/{name}"] = float(v)
        return report

    def _aggregate_reports(self, report: Dict[str, float]):
        """Average per-process reports (NaN = key absent on that process).
        All processes must call this collectively."""
        from jax.experimental import multihost_utils

        gathered = np.asarray(
            multihost_utils.process_allgather(self._report_to_vector(report))
        )  # (pc, len)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN cols
            mean = np.nanmean(gathered, axis=0)
        return self._vector_to_report(mean)


class VisReport:
    """GT-vs-prediction tile renderer (reference
    extensions/instance_segmentation_vis_report.py:16-98)."""

    def __init__(self, dataset, class_names, out_dir,
                 indices: Sequence[int] = (0, 1, 2, 3, 4, 5, 6, 7, 8),
                 score_thresh: float = 0.7):
        self.dataset = dataset
        self.class_names = list(class_names)
        self.out_dir = out_dir
        self.indices = [i for i in indices if i < len(dataset)]
        self.score_thresh = score_thresh

    def __call__(self, model, iteration: int = 0):
        import cv2

        panels = []
        for i in self.indices:
            e = self.dataset[i]
            img = e[0]
            chw = img.transpose(2, 0, 1).astype(np.float32)
            bboxes, masks, labels, scores = model.predict([chw])
            keep = scores[0] >= self.score_thresh
            panel = visualize_instance_segmentation(
                img, e[1], e[2], np.asarray(e[3], bool),
                bboxes[0][keep], labels[0][keep], masks[0][keep],
                scores[0][keep], n_class=len(self.class_names),
            )
            panels.append(panel)
        if not panels:
            return None
        tile = get_tile_image(panels)
        vis_dir = osp.join(self.out_dir, "visualizations")
        os.makedirs(vis_dir, exist_ok=True)
        out_bgr = tile[:, :, ::-1]
        cv2.imwrite(
            osp.join(vis_dir, "iteration=%08d.jpg" % iteration), out_bgr
        )
        cv2.imwrite(osp.join(vis_dir, "latest.jpg"), out_bgr)
        return tile
