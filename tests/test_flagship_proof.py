"""Dataset-generator invariants for tools/flagship_proof.py.

The proof tool's synthetic COCO dataset must be a valid training/eval
input: COCO-schema files, polygon segmentations consistent with their
bboxes/areas, val2017 DISJOINT from train2017 (r3: fresh scenes, not a
subset), and drawn pixels that actually contain the annotated shapes (the
loader rasterizes the polygons; the renderer drew them — they must agree).
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from flagship_proof import _poly_area, make_dataset  # noqa: E402


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("proofds"))
    make_dataset(root, n_train=4, n_val=2, size=256, seed=7)
    return root


def test_coco_schema_and_split(dataset):
    ann_dir = os.path.join(dataset, "data/coco")
    train = json.load(open(os.path.join(ann_dir, "instances_train2017.json")))
    val = json.load(open(os.path.join(ann_dir, "instances_val2017.json")))
    assert len(train["images"]) == 4
    assert len(val["images"]) == 2
    assert {c["id"] for c in train["categories"]} == {1, 2, 3, 4}
    # val is DISJOINT from train: no shared image ids or annotations
    train_ids = {im["id"] for im in train["images"]}
    val_ids = {im["id"] for im in val["images"]}
    assert not (train_ids & val_ids)
    assert {a["image_id"] for a in train["annotations"]} <= train_ids
    assert {a["image_id"] for a in val["annotations"]} <= val_ids
    assert len(val["annotations"]) >= 2  # 2-4 shapes per image
    # each split's files exist only in its own directory
    for im in val["images"]:
        v = os.path.join(ann_dir, "val2017", im["file_name"])
        assert os.path.getsize(v) > 0
        assert not os.path.exists(
            os.path.join(ann_dir, "train2017", im["file_name"]))
    for im in train["images"]:
        assert os.path.getsize(
            os.path.join(ann_dir, "train2017", im["file_name"])) > 0


def test_annotation_geometry(dataset):
    ann_dir = os.path.join(dataset, "data/coco")
    train = json.load(open(os.path.join(ann_dir, "instances_train2017.json")))
    assert len(train["annotations"]) >= 4  # 2-4 shapes/img, placement retries
    for a in train["annotations"]:
        poly = a["segmentation"][0]
        xs, ys = poly[0::2], poly[1::2]
        x, y, w, h = a["bbox"]
        assert x >= 0 and y >= 0 and x + w <= 256 and y + h <= 256
        assert min(xs) == pytest.approx(x) and max(xs) == pytest.approx(x + w)
        assert min(ys) == pytest.approx(y) and max(ys) == pytest.approx(y + h)
        # area consistent with the polygon (and sane vs its bbox)
        assert a["area"] == pytest.approx(_poly_area(poly))
        assert 0.3 * w * h <= a["area"] <= w * h + 1e-6


def test_pixels_match_annotations(dataset):
    """The drawn image must contain the annotated shape: inside each bbox
    the dominant saturated color matches the category's fill."""
    from PIL import Image

    ann_dir = os.path.join(dataset, "data/coco")
    train = json.load(open(os.path.join(ann_dir, "instances_train2017.json")))
    fills = {1: (205, 40, 30), 2: (40, 185, 60), 3: (35, 70, 215),
             4: (230, 200, 40)}
    by_img = {}
    for a in train["annotations"]:
        by_img.setdefault(a["image_id"], []).append(a)
    for im in train["images"]:
        arr = np.asarray(Image.open(
            os.path.join(ann_dir, "train2017", im["file_name"])), np.int32)
        for a in by_img.get(im["id"], []):
            x, y, w, h = (int(round(v)) for v in a["bbox"])
            cx, cy = x + w // 2, y + h // 2
            center = arr[cy - 2:cy + 3, cx - 2:cx + 3].reshape(-1, 3)
            dist = np.abs(center.mean(0) - np.array(fills[a["category_id"]]))
            # JPEG quality 92: generous tolerance, but the fill colors are
            # >100 apart channel-wise so misclassification would fail this
            assert dist.max() < 40, (a["category_id"], center.mean(0))
