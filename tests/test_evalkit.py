"""COCO reader, AP evaluator, and results interchange tests."""

import numpy as np
import pytest

from maskrcnn_tpu.evalkit import mask_rle as M
from maskrcnn_tpu.evalkit.coco import COCODataset
from maskrcnn_tpu.evalkit.cocoeval import COCOEvaluator
from maskrcnn_tpu.evalkit.results import (
    build_results_proto, detections_to_coco_results, load_results_proto,
    proto_to_coco_results, save_results_proto)
from maskrcnn_tpu.pipeline.detector import Detection


def seg_for_box(x, y, w, h, H, W):
    m = np.zeros((H, W), np.uint8)
    m[int(y):int(y + h), int(x):int(x + w)] = 1
    r = M.encode(m)
    return {"size": [H, W], "counts": M.to_coco_counts(r)}


def make_dataset(n_images=3, boxes_per_image=2):
    images, annotations = [], []
    ann_id = 1
    gt = {}
    for i in range(1, n_images + 1):
        images.append({"id": i, "width": 100, "height": 100,
                       "file_name": f"{i}.jpg"})
        gt[i] = []
        for b in range(boxes_per_image):
            x, y, w, h = 10 + 30 * b, 20, 20, 40
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": 7 if b else 3,
                "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                "segmentation": seg_for_box(x, y, w, h, 100, 100),
            })
            gt[i].append((x, y, w, h, 7 if b else 3))
            ann_id += 1
    data = {"images": images, "annotations": annotations,
            "categories": [{"id": 3, "name": "cat"}, {"id": 7, "name": "dog"}]}
    return COCODataset(data), gt


def perfect_results(dataset, gt, with_segm=True):
    rows = []
    for img_id, boxes in gt.items():
        for (x, y, w, h, cat) in boxes:
            row = {"image_id": img_id, "category_id": cat,
                   "bbox": [x, y, w, h], "score": 0.99}
            if with_segm:
                row["segmentation"] = seg_for_box(x, y, w, h, 100, 100)
            rows.append(row)
    return rows


def test_dataset_indexing():
    ds, gt = make_dataset()
    assert len(ds) == 3
    assert ds.sorted_category_ids == [3, 7]
    assert ds.class_id_for_category(3) == 1
    assert ds.category_for_class_id(2) == 7
    assert ds.class_label(1) == "cat"
    ids = [im.id for im in ds.iter_images(limit=2)]
    assert ids == [1, 2]
    assert len(ds.annotations_for(1)) == 2


@pytest.mark.parametrize("iou_type", ["bbox", "segm"])
def test_perfect_detections_ap1(iou_type):
    ds, gt = make_dataset()
    ev = COCOEvaluator(ds, perfect_results(ds, gt), iou_type)
    stats = ev.summarize(verbose=False)
    assert stats[0] == pytest.approx(1.0), stats  # AP@[.5:.95]
    assert stats[1] == pytest.approx(1.0)         # AP@0.5
    assert stats[8] == pytest.approx(1.0)         # AR@100


def test_no_detections_ap0():
    ds, gt = make_dataset()
    ev = COCOEvaluator(ds, [], "bbox")
    stats = ev.summarize(verbose=False)
    assert stats[0] == pytest.approx(0.0)


def test_half_detections():
    ds, gt = make_dataset()
    rows = [r for r in perfect_results(ds, gt) if r["category_id"] == 3]
    ev = COCOEvaluator(ds, rows, "bbox")
    stats = ev.summarize(verbose=False)
    # category 'cat' scores 1.0, 'dog' scores 0.0 -> mean 0.5
    assert stats[0] == pytest.approx(0.5)


def test_low_iou_detection_only_counts_at_loose_thresholds():
    ds, gt = make_dataset(n_images=1, boxes_per_image=1)
    # shift the box so IoU ≈ 0.6: counts at 0.5/0.55/0.6 but not above
    rows = [{"image_id": 1, "category_id": 3, "bbox": [10, 28, 20, 40],
             "score": 0.9}]
    ev = COCOEvaluator(ds, rows, "bbox")
    stats = ev.summarize(verbose=False)
    assert stats[1] == pytest.approx(1.0)   # AP@0.5
    assert 0.0 < stats[0] < 1.0             # averaged over IoU thresholds


def test_false_positive_with_higher_score_halves_precision():
    ds, gt = make_dataset(n_images=1, boxes_per_image=1)
    rows = [
        {"image_id": 1, "category_id": 3, "bbox": [10, 20, 20, 40],
         "score": 0.8},
        {"image_id": 1, "category_id": 3, "bbox": [70, 70, 20, 20],
         "score": 0.9},  # FP ranked first
    ]
    ev = COCOEvaluator(ds, rows, "bbox")
    stats = ev.summarize(verbose=False)
    # precision is 0 until the TP at rank 2 -> interpolated AP = 0.5
    assert stats[1] == pytest.approx(0.5, abs=0.01)


def test_crowd_gt_is_ignored_not_penalized():
    ds, gt = make_dataset(n_images=1, boxes_per_image=1)
    # add a crowd region; detections matching it are neither TP nor FP
    ds.anns_by_image[1].append({
        "id": 99, "image_id": 1, "category_id": 3,
        "bbox": [60, 60, 30, 30], "area": 900, "iscrowd": 1,
        "segmentation": seg_for_box(60, 60, 30, 30, 100, 100)})
    rows = [
        {"image_id": 1, "category_id": 3, "bbox": [10, 20, 20, 40],
         "score": 0.9},
        {"image_id": 1, "category_id": 3, "bbox": [62, 62, 28, 28],
         "score": 0.8},  # falls in crowd -> ignored
    ]
    ev = COCOEvaluator(ds, rows, "bbox")
    stats = ev.summarize(verbose=False)
    assert stats[1] == pytest.approx(1.0)


def test_results_proto_roundtrip(tmp_path):
    ds, gt = make_dataset(n_images=1)
    dets = [Detection(box=(20.0, 10.0, 60.0, 30.0), class_id=1, score=0.9)]
    msg = build_results_proto({1: dets}, ds)
    p = str(tmp_path / "r.pb")
    save_results_proto(msg, p)
    msg2 = load_results_proto(p)
    rows = proto_to_coco_results(msg2, ds)
    assert rows[0]["category_id"] == 3
    np.testing.assert_allclose(rows[0]["bbox"], [10, 20, 20, 40], atol=1e-6)


def test_detections_to_coco_results_with_mask():
    ds, gt = make_dataset(n_images=1)
    mask = np.zeros((100, 100), bool)
    mask[20:60, 10:30] = True
    dets = [Detection(box=(20.0, 10.0, 60.0, 30.0), class_id=2, score=0.7,
                      mask=mask)]
    rows = detections_to_coco_results(1, dets, ds)
    assert rows[0]["category_id"] == 7
    seg = rows[0]["segmentation"]
    back = M.decode(M.from_coco_segmentation(seg, 100, 100))
    np.testing.assert_array_equal(back.astype(bool), mask)
