"""Synthetic-SBD seam tests: the on-disk SBD root generator feeding the
REAL training stack and the full unmodified VOC driver journey.

The COCO twin is tests/test_coco_rehearsal.py; this closes the VOC/SBD
user journey (reference flow: examples/voc/train.py:14-35 ->
examples/voc/evaluate.py), previously exercised only piecewise (SBD .mat
fixture decode + a VOC-like overfit script).
"""

import glob
import json
import os
import os.path as osp
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.mark.medium
def test_synthetic_sbd_feeds_real_train_step(tmp_path):
    """SBD root on disk -> SBDInstanceSegmentationDataset -> TrainLoader
    -> one jitted train step with finite losses: the GTcls/GTinst .mat
    decode output is consumable by the production batch path."""
    from mask_rcnn_tpu.data import (
        MaskRCNNTransform,
        SBDInstanceSegmentationDataset,
        TrainLoader,
    )
    from mask_rcnn_tpu.data.synthetic import make_synthetic_sbd_root
    from mask_rcnn_tpu.engine import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from mask_rcnn_tpu.models import MaskRCNNConfig, ProposalConfig
    from mask_rcnn_tpu.models import init_params
    from mask_rcnn_tpu.models.targets import (
        AnchorTargetConfig,
        ProposalTargetConfig,
    )

    root = make_synthetic_sbd_root(str(tmp_path / "SBD"))
    ds = SBDInstanceSegmentationDataset("train", root=root)
    assert len(ds) == 8 and len(ds.class_names) == 20

    cfg = MaskRCNNConfig(
        n_fg_class=len(ds.class_names),
        min_size=64,
        max_size=96,
        anchor_scales=(1.0, 2.0),
        proposal=ProposalConfig(
            n_train_pre_nms=64, n_train_post_nms=16,
            n_test_pre_nms=64, n_test_post_nms=16,
        ),
        detections_per_im=4,
    )
    loader = TrainLoader(
        ds,
        MaskRCNNTransform(64, 96, cfg.mean, train=True,
                          rng=np.random.RandomState(0)),
        batch_size=2,
        max_boxes=4,
        min_size=64,
        max_size=96,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    optimizer, _ = make_optimizer(params, base_lr=0.01, total_steps=4)
    state = create_train_state(params, optimizer)
    step = make_train_step(
        cfg, optimizer,
        proposal_cfg=ProposalTargetConfig(n_sample=8),
        anchor_cfg=AnchorTargetConfig(n_sample=16),
    )
    batch = next(iter(loader.epoch(0)))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    assert np.isfinite(loss) and loss > 0


def test_sbd_root_local_splits_win_but_vendored_stay_default(tmp_path):
    """A root carrying SDS-layout ImageSets/Main/*.txt lists (synthetic
    rehearsal roots, custom re-splits) drives the dataset; a root without
    them (the stock benchmark_RELEASE download) keeps the vendored FCIS
    5623/5732 lists the published numbers use."""
    from mask_rcnn_tpu.data import SBDInstanceSegmentationDataset
    from mask_rcnn_tpu.data.synthetic import make_synthetic_sbd_root

    root = make_synthetic_sbd_root(
        str(tmp_path / "SBD"), n_train=3, n_val=2
    )
    assert len(SBDInstanceSegmentationDataset("train", root=root)) == 3
    assert len(SBDInstanceSegmentationDataset("val", root=root)) == 2
    # no root-local lists -> vendored FCIS ids (file presence not needed
    # for construction)
    bare = tmp_path / "bare"
    os.makedirs(bare)
    ds = SBDInstanceSegmentationDataset("train", root=str(bare))
    assert len(ds) == 5623 and ds.ids[0] == "2008_000008"


@pytest.mark.slow
def test_voc_driver_journey_on_synthetic_root(tmp_path):
    """The whole unmodified VOC user journey — voc/train.py ->
    evaluate.py -> demo.py -> summarize_logs.py — against a generated SBD
    root, exactly as examples/check_voc_rehearsal.py runs it on the chip
    (tiny shapes and step count here; the artifact contract is the
    assertion)."""
    res = subprocess.run(
        [sys.executable,
         osp.join(REPO, "examples", "check_voc_rehearsal.py"),
         "--min-size", "64", "--max-size", "96", "--max-epoch", "2",
         "--min-map", "-1", "--workdir", str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, timeout=1500,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS",)},
    )
    assert res.returncode == 0, res.stdout[-6000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["check"] == "voc_rehearsal"
    log_dir = summary["log_dir"]
    for name in ("params.yaml", "log", "snapshot_model.npz",
                 "snapshot_model.npz.eval_result.yaml"):
        assert osp.exists(osp.join(log_dir, name))
    assert glob.glob(osp.join(log_dir, "visualizations", "*.jpg"))
