"""User-facing model API: the reference's ``MaskRCNNResNet`` surface
(models/mask_rcnn_resnet.py:30-116 + MaskRCNN.predict, models/mask_rcnn.py:307)
on top of the jitted TPU graph.

Host responsibilities: image resize/normalize (cv2, matching ``prepare``,
mask_rcnn.py:152-176), shape bucketing/padding (bounded jit recompiles), and
final mask pasting. Device: everything else, one compiled program per input
bucket.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from mask_rcnn_tpu.models.mask_rcnn import (
    MaskRCNNConfig,
    init_params,
    predict_step,
)
from mask_rcnn_tpu.models import rpn as rpn_mod
from mask_rcnn_tpu.utils.masks import paste_masks
from mask_rcnn_tpu.data.loader import round_up


@functools.lru_cache(maxsize=8)
def _compiled_predict(cfg: MaskRCNNConfig, mesh=None):
    """Module-level compiled-predict cache (bounded LRU).

    Each entry is a jitted function holding per-shape executables; the
    bound keeps a long-lived server sweeping many distinct configs
    (e.g. per-request ``score_thresh`` clones, which rebuild the config)
    from accumulating executables forever — eviction just means a
    recompile if an old config comes back.

    Keyed on the (hashable, frozen) config + optional mesh so every
    ``MaskRCNNResNet`` instance with the same config — in particular the
    fresh ``from_config`` wrapper the training loop builds per evaluation —
    reuses one jitted function and its per-shape executable cache instead of
    recompiling (jit caches per function object). With a mesh, inference is
    batch-sharded over the 'data' axis (params replicated) so evaluation
    uses every device the training step uses — replacing the reference's
    chainermn.create_multi_node_evaluator device spread
    (examples/train_common.py:271-272).
    """

    def fn(params, images, sizes, scales):
        return predict_step(params, cfg, images, sizes, scales)

    if mesh is None:
        return jax.jit(fn)
    from mask_rcnn_tpu.parallel import make_parallel_predict_step

    return make_parallel_predict_step(fn, mesh)


def find_imagenet_npz(n_layers: int) -> str:
    """Locate the chainer ImageNet ResNet npz the reference auto-downloads
    (resnet_extractor.py:104-107). Search order: $MASK_RCNN_TPU_IMAGENET_NPZ,
    the chainer dataset cache, ~/data/models. No egress here, so a miss is
    an actionable error instead of a download."""
    import os
    import os.path as osp

    from mask_rcnn_tpu.utils.detectron_import import IMAGENET_NPZ_SOURCES

    url, md5, fname = IMAGENET_NPZ_SOURCES[n_layers]
    env = os.environ.get("MASK_RCNN_TPU_IMAGENET_NPZ")
    candidates = [env] if env else []
    candidates += [
        osp.expanduser(f"~/.chainer/dataset/pfnet/chainer/models/{fname}"),
        osp.expanduser(f"~/data/models/{fname}"),
    ]
    for c in candidates:
        if c and osp.exists(c):
            return c
    raise FileNotFoundError(
        f"ImageNet ResNet-{n_layers} weights not found (searched "
        f"{candidates}). Fetch {url} (md5 {md5}) and place it at one of "
        "those paths or set MASK_RCNN_TPU_IMAGENET_NPZ."
    )


def resolve_pretrained_params(spec: str, like, config: "MaskRCNNConfig"):
    """Reference ``pretrained_model`` surface: 'auto' (ImageNet backbone,
    mask_rcnn_resnet.py:69-72), 'auto:<npz>' / 'imagenet:<npz>' (explicit
    ImageNet npz), '<model>.pkl' (Detectron blobs), 'chainer:<npz>' (a
    reference ``snapshot_model.npz``; also auto-detected by layout
    sniffing, so a migrating user's trained snapshot loads through
    ``--pretrained-model``/demo/evaluate unchanged — the reference loads
    its own snapshots in the constructor, mask_rcnn_resnet.py:115-116),
    or a snapshot npz saved by this framework."""
    from mask_rcnn_tpu.utils.detectron_import import (
        import_chainer_npz,
        import_detectron_pkl,
        import_imagenet_npz,
        is_chainer_snapshot,
    )
    from mask_rcnn_tpu.utils.checkpoint import conform_params, load_params

    if spec == "auto" or spec.startswith(("auto:", "imagenet:")):
        path = (
            spec.split(":", 1)[1]
            if ":" in spec
            else find_imagenet_npz(config.n_layers)
        )
        return import_imagenet_npz(path, like, config.n_layers)
    if spec.endswith(".pkl"):
        return import_detectron_pkl(
            spec, n_fg_class=config.n_fg_class, n_layers=config.n_layers
        )
    explicit_chainer = spec.startswith("chainer:")
    path = spec.split(":", 1)[1] if explicit_chainer else spec
    if explicit_chainer or is_chainer_snapshot(path):
        return conform_params(
            import_chainer_npz(path, config.n_layers), like
        )
    return load_params(spec, like)


class MaskRCNNResNet:
    """Mask R-CNN R-50/101-C4 with the reference's constructor surface.

    Reference parity: same ``predict`` contract — input is a list of
    (3, H, W) float32 RGB images (0-255), output is per-image ``(bboxes
    (R,4) y1x1y2x2, masks (R,H,W) bool, labels (R,) 0-based, scores
    (R,))`` — and the same defaults, with one deliberate deviation:
    ``pad_to_bucket`` defaults True, so mixed-size sweeps compile at most
    two inference graphs (one per orientation bucket) instead of one per
    rounded image size. The extra margin is mean-level padding; detections
    match the tight path within float tolerance
    (tests/test_eval_infra.py::test_pad_to_bucket_predictions_match).
    Pass ``pad_to_bucket=False`` for tight 32-aligned padding.
    """

    # class-level defaults so partially-constructed instances (tests,
    # from_config before older pickles) degrade safely
    score_thresh = 0.05
    mesh = None
    pad_to_bucket = True
    uint8_input = False

    def __init__(
        self,
        n_layers: int = 50,
        n_fg_class: Optional[int] = None,
        pretrained_model: Optional[str] = None,
        min_size: int = 600,
        max_size: int = 1000,
        ratios=(0.5, 1.0, 2.0),
        anchor_scales=(4.0, 8.0, 16.0, 32.0),
        mean=(123.152, 115.903, 103.063),
        roi_size: int = 14,
        pooling_func: str = "align",
        proposal_creator_params: Optional[dict] = None,
        rng_seed: int = 0,
        compute_dtype: str = "float32",
        mesh=None,
        pad_to_bucket: bool = True,
        uint8_input: bool = False,
    ):
        if n_fg_class is None:
            raise ValueError("n_fg_class is required")
        pcp = dict(
            min_size=0.0, n_test_pre_nms=6000, n_test_post_nms=1000
        )
        if proposal_creator_params:
            pcp.update(proposal_creator_params)
        self.config = MaskRCNNConfig(
            n_fg_class=n_fg_class,
            n_layers=n_layers,
            min_size=min_size,
            max_size=max_size,
            ratios=tuple(ratios),
            anchor_scales=tuple(float(s) for s in anchor_scales),
            mean=tuple(mean),
            roi_size=roi_size,
            pooling=pooling_func,
            proposal=rpn_mod.ProposalConfig(**pcp),
            compute_dtype=compute_dtype,
        )
        self.params = init_params(
            jax.random.PRNGKey(rng_seed), self.config
        )
        if pretrained_model:
            self.params = resolve_pretrained_params(
                pretrained_model, self.params, self.config
            )
        self.score_thresh = 0.05
        self.mesh = mesh
        self.pad_to_bucket = pad_to_bucket
        self.uint8_input = uint8_input

    @classmethod
    def from_config(
        cls, config: MaskRCNNConfig, params, mesh=None,
        pad_to_bucket: bool = True, uint8_input: bool = False,
    ) -> "MaskRCNNResNet":
        """Wrap existing (cfg, params) — used by the trainer's evaluation
        hooks to run inference on in-training parameters. Compiled graphs
        are shared across instances (module-level cache), so building a
        fresh wrapper per evaluation costs nothing."""
        model = cls.__new__(cls)
        model.config = config
        model.params = params
        model.score_thresh = 0.05
        model.mesh = mesh
        model.pad_to_bucket = pad_to_bucket
        model.uint8_input = uint8_input
        return model

    # -- reference-compatible knobs -------------------------------------
    @property
    def n_class(self):
        return self.config.n_class

    def use_preset(self, preset: str):
        """'visualize' -> score 0.7; 'evaluate' -> 0.05 (chainercv idiom)."""
        self.score_thresh = {"visualize": 0.7, "evaluate": 0.05}[preset]

    # -- preprocessing ---------------------------------------------------
    def prepare(self, imgs: Sequence[np.ndarray]):
        """Resize so min side = min_size capped by max_size; subtract mean.

        Matches reference ``prepare`` (models/mask_rcnn.py:152-176). With
        ``uint8_input`` the resize runs on uint8 and mean subtraction moves
        on-device (4x less H2D; up to 0.5/255 per-pixel rounding vs the
        reference's float32 resize, so float stays the parity default).
        """
        prepared, sizes, scales = [], [], []
        mean = np.asarray(self.config.mean, np.float32)
        for img in imgs:
            if img.ndim != 3:
                raise ValueError("expected (3, H, W) images")
            _, h, w = img.shape
            scale = 1.0
            if self.config.min_size:
                scale = self.config.min_size / min(h, w)
            if self.config.max_size and scale * max(h, w) > self.config.max_size:
                scale = self.config.max_size / max(h, w)
            hwc = img.transpose(1, 2, 0)
            if self.uint8_input:
                hwc = cv2.resize(
                    np.clip(hwc, 0, 255).astype(np.uint8), None,
                    fx=scale, fy=scale,
                )
            else:
                hwc = cv2.resize(
                    hwc.astype(np.float32), None, fx=scale, fy=scale
                ) - mean
            prepared.append(hwc)
            sizes.append((h, w))
            scales.append(scale)
        return prepared, sizes, scales

    # -- compiled graph cache -------------------------------------------
    def _get_predict_fn(self):
        cfg = self.config
        if self.score_thresh < cfg.score_thresh:
            # The compiled decode graph drops candidates at
            # cfg.score_thresh (0.05, reference parity) before the host
            # filter ever sees them, so a lower model.score_thresh (the
            # chainercv idiom for recall sweeps) would silently return the
            # 0.05 results. Rebuild the graph with the lower in-graph
            # cutoff instead — one extra compile, cached per threshold.
            import dataclasses

            cfg = dataclasses.replace(
                cfg, score_thresh=float(self.score_thresh)
            )
        return _compiled_predict(cfg, self.mesh)

    # -- inference -------------------------------------------------------
    def predict_submit(self, imgs: Sequence[np.ndarray]):
        """Prepare + pad + dispatch the compiled graph WITHOUT waiting.

        Returns an opaque handle for :meth:`predict_collect`. JAX dispatch
        is asynchronous, so the device (and, in a tunneled setup, the
        upload) runs while the host goes on to prepare the next batch —
        the building block of :meth:`predict_stream`'s double buffering.
        """
        prepared, sizes, scales = self.prepare(imgs)
        n = len(prepared)
        # With a mesh, pad the batch to a multiple of the device count so
        # the 'data' axis shards evenly; pad rows are dropped below.
        nb = n
        if self.mesh is not None:
            nb = round_up(n, self.mesh.devices.size)
        if self.pad_to_bucket:
            # Pad to the loader's static orientation buckets so a whole
            # dataset sweep compiles at most two graphs (vs one per
            # distinct rounded size). The extra rows/cols are zeros
            # (= pixel mean); the reference's ragged concat pads the same
            # way, just to the batch max instead of the bucket.
            from mask_rcnn_tpu.data.loader import bucket_shape

            shapes = [
                bucket_shape(p.shape[0], p.shape[1],
                             self.config.min_size, self.config.max_size)
                for p in prepared
            ]
            hp = max(s[0] for s in shapes)
            wp = max(s[1] for s in shapes)
        else:
            hp = round_up(max(p.shape[0] for p in prepared), 32)
            wp = round_up(max(p.shape[1] for p in prepared), 32)
        if self.uint8_input:
            # margin at the rounded mean -> ~0 after on-device subtraction
            x = np.empty((nb, hp, wp, 3), np.uint8)
            x[:] = np.round(np.asarray(self.config.mean)).astype(np.uint8)
        else:
            x = np.zeros((nb, hp, wp, 3), np.float32)
        for i, p in enumerate(prepared):
            x[i, : p.shape[0], : p.shape[1]] = p
        sizes_a = np.ones((nb, 2), np.float32)
        sizes_a[:n] = np.asarray(sizes, np.float32)
        scales_a = np.ones((nb,), np.float32)
        scales_a[:n] = np.asarray(scales, np.float32)

        fn = self._get_predict_fn()
        out = fn(
            self.params,
            jnp.asarray(x),
            jnp.asarray(sizes_a),
            jnp.asarray(scales_a),
        )
        return out, sizes, n

    def predict_collect(
        self, handle
    ) -> Tuple[List[np.ndarray], List[np.ndarray], List[np.ndarray],
               List[np.ndarray]]:
        """Block on a :meth:`predict_submit` handle and run the host-side
        postprocessing (score threshold + full-resolution mask paste)."""
        out, sizes, n = handle
        out = jax.device_get(out)

        bboxes, masks, labels, scores = [], [], [], []
        for i in range(n):
            valid = out["valid"][i] & (out["scores"][i] >= self.score_thresh)
            bbox = out["boxes"][i][valid].astype(np.float32)
            label = out["labels"][i][valid].astype(np.int32)
            score = out["scores"][i][valid].astype(np.float32)
            probs = out["mask_probs"][i][valid].astype(np.float32)
            im_h, im_w = sizes[i]
            mask = paste_masks(bbox, probs, im_h, im_w)
            bboxes.append(bbox)
            masks.append(mask)
            labels.append(label)
            scores.append(score)
        return bboxes, masks, labels, scores

    def predict_collect_raw(self, handle):
        """Block on a :meth:`predict_submit` handle WITHOUT pasting masks.

        Returns ``(bboxes, mask_probs, labels, scores, sizes)`` per image
        — the (R, M, M) roi probabilities plus boxes, from which
        ``utils.masks.paste_masks`` would produce the full-image masks.
        Evaluation consumes this directly (``add_boxlocal``): mask IoU
        only needs each detection's box-local pixels, so the sweep skips
        the full-resolution paste entirely.
        """
        out, sizes, n = handle
        out = jax.device_get(out)
        bboxes, probs_l, labels, scores = [], [], [], []
        for i in range(n):
            valid = out["valid"][i] & (out["scores"][i] >= self.score_thresh)
            bboxes.append(out["boxes"][i][valid].astype(np.float32))
            labels.append(out["labels"][i][valid].astype(np.int32))
            scores.append(out["scores"][i][valid].astype(np.float32))
            probs_l.append(out["mask_probs"][i][valid].astype(np.float32))
        return bboxes, probs_l, labels, scores, sizes[:n]

    def predict(
        self, imgs: Sequence[np.ndarray]
    ) -> Tuple[List[np.ndarray], List[np.ndarray], List[np.ndarray],
               List[np.ndarray]]:
        return self.predict_collect(self.predict_submit(imgs))

    def predict_stream(self, batches, depth: int = 2):
        """Pipelined inference over an iterable of image batches.

        Yields one ``predict`` result tuple per input batch, in order,
        keeping up to ``depth`` batches in flight: later batches are
        prepared on the host and dispatched to the device before earlier
        results are fetched, so host preprocessing, the host<->device
        transfers, and the full-resolution mask paste all overlap the
        device compute of in-flight batches. Through a high-latency link
        (the dev tunnel) a depth > 2 also overlaps the upload of batch
        i+2 with the download of batch i. Per-batch results are identical
        to :meth:`predict` (same compiled graph, same postprocessing) —
        this reorders only the host<->device synchronization.

        The reference's serving loop is strictly sequential per call
        (reference examples/coco/speedtest.py:29-34); this is the
        TPU-native replacement for real serving/evaluation sweeps.
        """
        from collections import deque

        if depth < 1:
            raise ValueError("depth must be >= 1")
        pending = deque()
        for imgs in batches:
            pending.append(self.predict_submit(imgs))
            if len(pending) >= depth:
                yield self.predict_collect(pending.popleft())
        while pending:
            yield self.predict_collect(pending.popleft())
