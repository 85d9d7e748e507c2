"""RLE codec: native vs numpy agreement, COCO string format, IoU."""

import numpy as np
import pytest

import maskrcnn_tpu.native as native
from maskrcnn_tpu.evalkit import mask_rle as M


def random_mask(rng, h=37, w=23):
    return (rng.random((h, w)) > 0.6).astype(np.uint8)


def test_native_builds():
    # The toolchain is present in this image; the native core must build.
    assert native.native_available(), "g++ build of librle.so failed"


def test_encode_decode_roundtrip(rng):
    for _ in range(5):
        m = random_mask(rng)
        r = M.encode(m)
        np.testing.assert_array_equal(M.decode(r), m)


def test_area(rng):
    m = random_mask(rng)
    assert M.area(M.encode(m)) == int(m.sum())


def test_edge_masks():
    for m in (np.zeros((5, 4), np.uint8), np.ones((5, 4), np.uint8)):
        r = M.encode(m)
        np.testing.assert_array_equal(M.decode(r), m)
        assert M.area(r) == int(m.sum())


def test_iou_masks_matches_dense(rng):
    dts = [random_mask(rng) for _ in range(4)]
    gts = [random_mask(rng) for _ in range(3)]
    got = M.iou_masks([M.encode(m) for m in dts], [M.encode(m) for m in gts])
    for i, d in enumerate(dts):
        for j, g in enumerate(gts):
            inter = np.logical_and(d, g).sum()
            union = np.logical_or(d, g).sum()
            np.testing.assert_allclose(got[i, j], inter / union, rtol=1e-12)


def test_iou_crowd_semantics(rng):
    d = random_mask(rng)
    g = np.ones_like(d)
    got = M.iou_masks([M.encode(d)], [M.encode(g)], iscrowd=[True])
    # crowd: intersection / dt area == 1.0 when gt covers everything
    np.testing.assert_allclose(got[0, 0], 1.0)


def test_iou_boxes(rng):
    dt = np.array([[0, 0, 10, 10], [5, 5, 10, 10]], float)
    gt = np.array([[0, 0, 10, 10]], float)
    got = M.iou_boxes(dt, gt)
    np.testing.assert_allclose(got[0, 0], 1.0)
    np.testing.assert_allclose(got[1, 0], 25.0 / 175.0)
    crowd = M.iou_boxes(dt, gt, iscrowd=[True])
    np.testing.assert_allclose(crowd[1, 0], 25.0 / 100.0)


def test_coco_counts_string_roundtrip(rng):
    m = random_mask(rng, 19, 11)
    r = M.encode(m)
    s = M.to_coco_counts(r)
    assert isinstance(s, str)
    r2 = M.from_coco_counts(s, r.h, r.w)
    np.testing.assert_array_equal(r.counts, r2.counts)
    np.testing.assert_array_equal(M.decode(r2), m)


def test_polygon_rasterize_square():
    # A 4x4 axis-aligned square occupying pixels [1..4] x [1..4].
    r = M.from_polygons([[1, 1, 5, 1, 5, 5, 1, 5]], 8, 8)
    m = M.decode(r)
    want = np.zeros((8, 8), np.uint8)
    want[1:5, 1:5] = 1
    np.testing.assert_array_equal(m, want)


def test_polygon_triangle_area_close():
    # Right triangle with legs 20 -> area 200; rasterized should be close.
    r = M.from_polygons([[0, 0, 20, 0, 0, 20]], 32, 32)
    assert abs(M.area(r) - 200) < 25


def test_native_and_numpy_agree(rng, monkeypatch):
    m = random_mask(rng)
    r_native = M.encode(m)
    monkeypatch.setattr(M, "get_rle_lib", lambda: None)
    r_np = M.encode(m)
    np.testing.assert_array_equal(r_native.counts, r_np.counts)
    np.testing.assert_array_equal(M.decode(r_np), m)
    got_np = M.iou_masks([r_np], [r_np])
    np.testing.assert_allclose(got_np[0, 0], 1.0)


def test_from_coco_segmentation_variants(rng):
    m = random_mask(rng, 10, 10)
    r = M.encode(m)
    # uncompressed dict
    seg_u = {"size": [10, 10], "counts": r.counts.tolist()}
    np.testing.assert_array_equal(
        M.decode(M.from_coco_segmentation(seg_u, 10, 10)), m)
    # compressed dict
    seg_c = {"size": [10, 10], "counts": M.to_coco_counts(r)}
    np.testing.assert_array_equal(
        M.decode(M.from_coco_segmentation(seg_c, 10, 10)), m)
    with pytest.raises(TypeError):
        M.from_coco_segmentation(42, 10, 10)


def test_encode_region_matches_full_canvas(rng):
    """encode_region (O(box area), the segm results fast path) must be
    bit-identical to encode() of the materialized full canvas — including
    boxes touching every border, full-height regions (adjacent canvas
    columns merge into one run), empty regions, and all-ones regions."""
    from maskrcnn_tpu.evalkit.mask_rle import encode, encode_region

    H, W = 41, 29
    cases = []
    for _ in range(60):
        bh, bw = int(rng.integers(1, H + 1)), int(rng.integers(1, W + 1))
        y0 = int(rng.integers(0, H - bh + 1))
        x0 = int(rng.integers(0, W - bw + 1))
        cases.append(((rng.random((bh, bw)) < 0.5).astype(np.uint8), y0, x0))
    # adversarial: full-height region (column-boundary merge), one-pixel
    # corners, all-zero, all-one, bottom-right pixel set (trailing-run edge)
    cases += [
        ((rng.random((H, 5)) < 0.7).astype(np.uint8), 0, 10),
        (np.ones((H, 3), np.uint8), 0, W - 3),
        (np.ones((1, 1), np.uint8), H - 1, W - 1),
        (np.ones((1, 1), np.uint8), 0, 0),
        (np.zeros((7, 7), np.uint8), 5, 5),
        (np.ones((H, W), np.uint8), 0, 0),
        (np.zeros((0, 0), np.uint8), 3, 3),
    ]
    for region, y0, x0 in cases:
        canvas = np.zeros((H, W), np.uint8)
        if region.size:
            canvas[y0:y0 + region.shape[0], x0:x0 + region.shape[1]] = region
        want = encode(canvas)
        got = encode_region(region, y0, x0, H, W)
        np.testing.assert_array_equal(
            got.counts, want.counts,
            err_msg=f"region {region.shape} at ({y0},{x0})")


def test_paste_region_matches_full_paste(rng):
    """paste_mask_region must reproduce paste_mask's clipped box region
    exactly (native core shared; PIL fallback crops the full paste)."""
    from maskrcnn_tpu.pipeline.detector import (paste_mask,
                                                paste_mask_region,
                                                paste_window)

    H, W = 97, 123
    yy, xx = np.mgrid[0:28, 0:28]
    for _ in range(25):
        cy, cx = rng.uniform(8, 20, 2)
        r = rng.uniform(5, 14)
        soft = np.clip(1.2 - np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2) / r,
                       0, 1).astype(np.float32)
        # boxes deliberately allowed to stick out of the canvas
        y1 = rng.uniform(-20, H - 5)
        x1 = rng.uniform(-20, W - 5)
        box = (y1, x1, y1 + rng.uniform(3, 80), x1 + rng.uniform(3, 80))
        full = paste_mask(soft, box, (H, W))
        region, ry, rx = paste_mask_region(soft, box, (H, W))
        wy1, wx1, wy2, wx2 = paste_window(box, (H, W))
        assert (ry, rx) == (wy1, wx1)
        if region.size == 0:
            assert full.sum() == 0
            continue
        np.testing.assert_array_equal(
            region, full[wy1:wy2, wx1:wx2])
        # nothing outside the window
        outside = full.copy()
        outside[wy1:wy2, wx1:wx2] = False
        assert outside.sum() == 0


def test_unmold_rle_mode_matches_mask_mode():
    """unmold(paste_masks='rle') must serialize to the same COCO rows as
    the full-canvas path (detections_to_coco_results equivalence)."""
    import jax

    from maskrcnn_tpu.core.config import tiny_test_config
    from maskrcnn_tpu.evalkit.coco import COCODataset
    from maskrcnn_tpu.evalkit.results import detections_to_coco_results
    from maskrcnn_tpu.pipeline.detector import MaskRCNNDetector
    from maskrcnn_tpu.pipeline.preprocess import LetterboxWindow

    rng = np.random.default_rng(5)
    cfg = tiny_test_config()
    det = MaskRCNNDetector.from_random(cfg)
    d = 6
    rows = rng.uniform(0.1, 0.9, (d, 6)).astype(np.float32)
    rows[:, 2:4] = rows[:, :2] + 0.08  # y2x2 > y1x1
    rows[:, 4] = rng.integers(1, cfg.num_classes, d)
    rows[:, 5] = rng.uniform(0.7, 1.0, d)
    masks = rng.random((d, cfg.mask_size, cfg.mask_size)).astype(np.float32)
    valid = np.ones(d, bool)
    win = LetterboxWindow(y1=14, x1=0, y2=114, x2=128, scale=0.8,
                          orig_height=125, orig_width=160)

    ds = COCODataset({
        "images": [{"id": 1, "width": 160, "height": 125,
                    "file_name": "x.jpg"}],
        "annotations": [],
        "categories": [{"id": c, "name": f"c{c}"}
                       for c in range(1, cfg.num_classes)]})
    via_mask = detections_to_coco_results(
        1, det.unmold(rows, masks, valid, win, paste_masks=True), ds)
    via_rle = detections_to_coco_results(
        1, det.unmold(rows, masks, valid, win, paste_masks="rle"), ds)
    assert len(via_mask) == len(via_rle) == d
    for a, b in zip(via_mask, via_rle):
        assert a["bbox"] == b["bbox"] and a["score"] == b["score"]
        assert a["segmentation"] == b["segmentation"]
