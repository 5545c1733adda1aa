"""Rebuilding a model from a log dir's params.yaml (examples/demo.py,
shared by evaluate) must understand both this framework's ``model_config``
dict and a reference log dir's flat serialized argparse namespace
(reference examples/train_common.py:286-288, examples/demo.py:39-76), so a
migrating user can point demo/evaluate at a reference-trained run
unchanged — including ResNet-101 runs, where a wrong depth default makes
the snapshot import fail."""

import os.path as osp
import sys

import yaml

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "examples"))


def _capture_build(monkeypatch, tmp_path, params_yaml):
    import demo
    from mask_rcnn_tpu.models import api

    with open(osp.join(str(tmp_path), "params.yaml"), "w") as f:
        yaml.safe_dump(params_yaml, f)

    captured = {}

    def fake_model(**kwargs):
        captured.update(kwargs)
        return "model"

    monkeypatch.setattr(api, "MaskRCNNResNet", fake_model)
    model, loaded = demo.build_model_from_log_dir(str(tmp_path))
    assert model == "model" and loaded == params_yaml
    return captured


def test_reference_flat_params_yaml_resnet101(monkeypatch, tmp_path):
    captured = _capture_build(
        monkeypatch,
        tmp_path,
        {
            # the reference's flat keys (no model_config dict)
            "model": "resnet101",
            "dataset": "voc",
            "class_names": [f"c{i}" for i in range(20)],
            "min_size": 600,
            "max_size": 1000,
            "anchor_scales": [4, 8, 16, 32],
            "roi_size": 14,
            "pooling_func": "align",
        },
    )
    assert captured["n_layers"] == 101
    assert captured["n_fg_class"] == 20
    assert captured["min_size"] == 600
    assert captured["max_size"] == 1000
    assert captured["anchor_scales"] == (4, 8, 16, 32)
    assert captured["roi_size"] == 14
    assert captured["pooling_func"] == "align"
    assert captured["pretrained_model"] == osp.join(
        str(tmp_path), "snapshot_model.npz"
    )


def test_reference_flat_params_unknown_model_rejected(monkeypatch, tmp_path):
    # substring sniffing would silently map resnet152 onto 50/101; the
    # rebuild must fail loudly instead, mirroring the reference's
    # int(model.lstrip('resnet')) contract
    import pytest

    with pytest.raises(ValueError, match="resnet152"):
        _capture_build(
            monkeypatch, tmp_path,
            {"model": "resnet152", "dataset": "voc",
             "class_names": [f"c{i}" for i in range(20)]},
        )


def test_native_model_config_mean_restored(monkeypatch, tmp_path):
    # the converter's log dir stores the Detectron pixel mean; the rebuild
    # must restore it (examples/coco/convert_caffe2.py writes model_config)
    mean = [122.7717, 115.9465, 102.9801]
    captured = _capture_build(
        monkeypatch,
        tmp_path,
        {
            "dataset": "coco",
            "model_config": {
                "n_fg_class": 80,
                "n_layers": 50,
                "min_size": 800,
                "max_size": 1333,
                "anchor_scales": [2, 4, 8, 16, 32],
                "roi_size": 14,
                "mean": mean,
                "pooling": "align",
            },
        },
    )
    assert captured["mean"] == tuple(mean)
    assert captured["n_layers"] == 50
    assert captured["min_size"] == 800


def test_load_params_non_npz_is_actionable(tmp_path):
    import pytest

    from mask_rcnn_tpu.utils.checkpoint import load_params

    junk = tmp_path / "junk.bin"
    junk.write_bytes(b"not an npz")
    with pytest.raises(ValueError, match="Accepted pretrained_model forms"):
        load_params(str(junk))


def test_snapshot_sniff_rejects_non_zip(tmp_path):
    from mask_rcnn_tpu.utils.detectron_import import is_chainer_snapshot

    not_zip = tmp_path / "weights.npy"
    not_zip.write_bytes(b"\x93NUMPY not a zip")
    assert not is_chainer_snapshot(str(not_zip))
    assert not is_chainer_snapshot(str(tmp_path))  # a directory
    assert not is_chainer_snapshot(str(tmp_path / "missing.npz"))
