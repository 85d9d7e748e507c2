"""COCO reader, AP evaluator, and results interchange tests."""

import json
import os

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


def _golden_cases():
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "cocoeval_golden.json")
    with open(path) as f:
        return json.load(f)["cases"]


@pytest.mark.parametrize("case", _golden_cases(),
                         ids=lambda c: c["name"])
def test_pycocotools_golden(case):
    """Known-answer fixtures: 12-stat vectors derived by hand-executing
    pycocotools' published algorithm on protocol corner cases (crowd
    re-matching, ignored-gt priority, inclusive area bounds, per-image
    maxDets capping, out-of-range FP suppression)."""
    ds = COCODataset({"images": case["images"],
                      "annotations": case["annotations"],
                      "categories": case["categories"]})
    ev = COCOEvaluator(ds, case["results"], case.get("iou_type", "bbox"))
    stats = ev.summarize(verbose=False)
    np.testing.assert_allclose(stats, case["expected_stats"], atol=1e-9)


def test_match_native_vs_numpy_fuzz():
    """The native C++ matcher and the vectorized numpy fallback must agree
    exactly (dtm / d_ignore / n_gt) on randomized inputs."""
    from maskrcnn_tpu.evalkit.cocoeval import AREA_RNG, match_all_areas
    from maskrcnn_tpu.native import get_evalmatch_lib
    if get_evalmatch_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    area_rngs = np.asarray(list(AREA_RNG.values()))
    for trial in range(60):
        D = int(rng.integers(0, 12))
        G = int(rng.integers(0, 9))
        # Quantized IoUs make exact ties common, stressing tie-break rules.
        ious = rng.integers(0, 11, size=(D, G)).astype(np.float64) / 10.0
        g_areas = rng.choice([100.0, 1024.0, 5000.0, 9216.0, 20000.0], G)
        d_areas = rng.choice([100.0, 1024.0, 5000.0, 9216.0, 20000.0], D)
        g_crowd = rng.random(G) < 0.3
        g_ignore = rng.random(G) < 0.2
        nat = match_all_areas(ious, g_areas, g_crowd, g_ignore, d_areas,
                              area_rngs)
        ref = match_all_areas(ious, g_areas, g_crowd, g_ignore, d_areas,
                              area_rngs, force_numpy=True)
        np.testing.assert_array_equal(nat["dtm"], ref["dtm"],
                                      err_msg=f"trial {trial}")
        np.testing.assert_array_equal(nat["d_ignore"], ref["d_ignore"],
                                      err_msg=f"trial {trial}")
        np.testing.assert_array_equal(nat["n_gt"], ref["n_gt"])


def test_evaluator_stats_native_vs_numpy(monkeypatch):
    """Full-evaluator differential: stats with the native matcher equal
    stats with the numpy fallback on a randomized dataset."""
    import maskrcnn_tpu.evalkit.cocoeval as ce
    rng = np.random.default_rng(7)
    images, anns, results = [], [], []
    ann_id = 1
    for img in range(1, 9):
        images.append({"id": img, "width": 640, "height": 480,
                       "file_name": f"{img}.jpg"})
        for _ in range(int(rng.integers(0, 6))):
            x, y = rng.uniform(0, 500), rng.uniform(0, 380)
            w, h = rng.uniform(4, 120), rng.uniform(4, 90)
            anns.append({"id": ann_id, "image_id": img,
                         "category_id": int(rng.choice([3, 7])),
                         "bbox": [x, y, w, h], "area": w * h,
                         "iscrowd": int(rng.random() < 0.2)})
            ann_id += 1
        for _ in range(int(rng.integers(0, 8))):
            base = anns[int(rng.integers(0, len(anns)))] if anns else None
            if base is not None and rng.random() < 0.6:
                bx, by, bw, bh = base["bbox"]
                bbox = [bx + rng.normal(0, 6), by + rng.normal(0, 6),
                        max(3.0, bw * rng.uniform(0.7, 1.3)),
                        max(3.0, bh * rng.uniform(0.7, 1.3))]
            else:
                bbox = [rng.uniform(0, 500), rng.uniform(0, 380),
                        rng.uniform(4, 120), rng.uniform(4, 90)]
            results.append({"image_id": img,
                            "category_id": int(rng.choice([3, 7])),
                            "bbox": bbox, "score": float(rng.random())})
    ds = COCODataset({"images": images, "annotations": anns,
                      "categories": [{"id": 3, "name": "a"},
                                     {"id": 7, "name": "b"}]})
    stats_native = COCOEvaluator(ds, results, "bbox").summarize(verbose=False)
    monkeypatch.setattr(ce, "get_evalmatch_lib", lambda: None)
    stats_numpy = COCOEvaluator(ds, results, "bbox").summarize(verbose=False)
    np.testing.assert_allclose(stats_native, stats_numpy, atol=0)


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
