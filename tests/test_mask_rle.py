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
