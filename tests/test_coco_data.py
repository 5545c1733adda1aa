"""COCO dataset loader against a synthetic on-disk mini-COCO."""

import json
import os
import os.path as osp

import cv2
import numpy as np
import pytest

from mask_rcnn_tpu.data.coco import (
    COCOInstanceSegmentationDataset,
    polygons_to_mask,
    segmentation_to_mask,
)
from mask_rcnn_tpu.utils.rle import encode_mask, mask_to_rle_counts


@pytest.fixture(scope="module")
def mini_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "train2014"
    ann_dir = root / "annotations"
    os.makedirs(img_dir)
    os.makedirs(ann_dir)

    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, 4):
        h, w = 60, 80
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        name = f"COCO_train2014_{img_id:012d}.jpg"
        cv2.imwrite(str(img_dir / name), img)
        images.append(
            {"id": img_id, "file_name": name, "height": h, "width": w}
        )
        # one polygon annotation
        y1, x1 = 10, 10 + img_id
        y2, x2 = 40, 50
        poly = [x1, y1, x2, y1, x2, y2, x1, y2]
        annotations.append({
            "id": ann_id, "image_id": img_id, "category_id": 18,
            "segmentation": [poly], "iscrowd": 0,
            "area": (x2 - x1) * (y2 - y1),
        })
        ann_id += 1
        # one uncompressed-RLE crowd annotation on image 1
        if img_id == 1:
            m = np.zeros((h, w), np.uint8)
            m[45:55, 60:75] = 1
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 44,
                "segmentation": {
                    "size": [h, w],
                    "counts": mask_to_rle_counts(m).tolist(),
                },
                "iscrowd": 1, "area": int(m.sum()),
            })
            ann_id += 1
    # image 4 has no annotations -> must be filtered
    images.append({"id": 4, "file_name": "COCO_train2014_000000000004.jpg",
                   "height": 60, "width": 80})
    cv2.imwrite(str(img_dir / images[-1]["file_name"]),
                np.zeros((60, 80, 3), np.uint8))

    categories = [
        {"id": 18, "name": "dog"},
        {"id": 44, "name": "bottle"},
    ]
    with open(ann_dir / "instances_train2014.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)
    return str(root)


def test_polygon_rasterization():
    mask = polygons_to_mask([[2, 3, 10, 3, 10, 12, 2, 12]], 20, 20)
    assert mask[5, 5] == 1 and mask[0, 0] == 0
    # area close to the rectangle (inclusive edges)
    assert 70 <= mask.sum() <= 100


def test_polygon_rasterization_pil_parity():
    """Boundary-pixel semantics must match the reference pipeline
    (datasets/coco.py:137-143): per-polygon PIL ImageDraw.polygon with
    outline=1, fill=1 — bit-exact, including sub-pixel vertices and
    overlapping polygons."""
    import PIL.Image
    import PIL.ImageDraw

    rng = np.random.RandomState(0)
    for _ in range(5):
        polys = [
            (rng.rand(rng.randint(3, 8) * 2) * 28.0).tolist()
            for _ in range(rng.randint(1, 4))
        ]
        want_img = PIL.Image.fromarray(np.zeros((30, 32), np.uint8))
        for seg in polys:
            xy = [tuple(p) for p in np.array(seg).reshape(-1, 2)]
            PIL.ImageDraw.Draw(want_img).polygon(xy=xy, outline=1, fill=1)
        np.testing.assert_array_equal(
            polygons_to_mask(polys, 30, 32), np.asarray(want_img)
        )


def test_rle_segmentation_decode():
    m = np.zeros((8, 9), np.uint8)
    m[2:5, 3:7] = 1
    rle = encode_mask(m)
    got = segmentation_to_mask(
        {"size": [8, 9], "counts": rle["counts"]}, 8, 9
    )
    np.testing.assert_array_equal(got, m)


def test_dataset_contract(mini_coco):
    ds = COCOInstanceSegmentationDataset("train", root=mini_coco)
    assert len(ds) == 3  # image without annotations filtered
    assert ds.class_names == ("dog", "bottle")
    img, bboxes, labels, masks = ds[0]
    assert img.shape == (60, 80, 3) and img.dtype == np.uint8
    assert bboxes.shape == (1, 4)  # crowd excluded by default
    assert labels.tolist() == [0]
    assert masks.shape == (1, 60, 80)
    # bbox matches the mask extent
    ys, xs = np.where(masks[0])
    np.testing.assert_allclose(
        bboxes[0], [ys.min(), xs.min(), ys.max() + 1, xs.max() + 1]
    )


def test_dataset_crowd_returns(mini_coco):
    ds = COCOInstanceSegmentationDataset(
        "train", root=mini_coco, use_crowd=True, return_crowd=True,
        return_area=True,
    )
    img, bboxes, labels, masks, crowds, areas = ds[0]
    assert len(bboxes) == 2
    assert crowds.tolist() == [0, 1]
    assert areas.shape == (2,)
    assert labels.tolist() == [0, 1]


def test_download_verifies_present_archives(mini_coco, capsys):
    """Egress-less download(): prints sources and md5-checks any archive
    already on disk (reference cached_download md5 behavior,
    datasets/coco.py:24-50)."""
    import hashlib
    import os.path as osp

    ds = COCOInstanceSegmentationDataset("train", root=mini_coco)
    name = "instances_train-val2014.zip"
    url, want_md5 = ds.DOWNLOAD_URLS[name]
    path = osp.join(ds.root, name)
    with open(path, "wb") as f:
        f.write(b"not the real archive")
    ds.download()
    out = capsys.readouterr().out
    assert url in out
    assert "md5 MISMATCH" in out

    # an archive whose md5 matches reports OK
    actual = hashlib.md5(b"not the real archive").hexdigest()
    ds.DOWNLOAD_URLS = dict(ds.DOWNLOAD_URLS)
    ds.DOWNLOAD_URLS[name] = (url, actual)
    ds.download()
    assert "md5 OK" in capsys.readouterr().out


def test_download_checks_subdirectory_locations(mini_coco, capsys):
    """Archives placed at the documented subdirectory path
    ('annotations/instances_minival2014.json.zip') must be md5-checked,
    not only root-level basenames."""
    import hashlib
    import os.path as osp

    ds = COCOInstanceSegmentationDataset("train", root=mini_coco)
    name = "annotations/instances_minival2014.json.zip"
    url, want_md5 = ds.DOWNLOAD_URLS[name]
    path = osp.join(ds.root, name)
    with open(path, "wb") as f:
        f.write(b"zip at the documented location")
    ds.DOWNLOAD_URLS = dict(ds.DOWNLOAD_URLS)
    ds.DOWNLOAD_URLS[name] = (
        url, hashlib.md5(b"zip at the documented location").hexdigest()
    )
    ds.download()
    assert "md5 OK" in capsys.readouterr().out
