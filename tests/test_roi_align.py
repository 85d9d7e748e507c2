"""Pyramid ROIAlign vs a scalar crop_and_resize + level-assignment oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from maskrcnn_tpu.ops.roi_align import pyramid_roi_align, roi_levels
from tests.oracles import oracle_crop_and_resize


IMAGE_SHAPE = (128, 128)
CANONICAL = 224.0


def make_pyramid(rng, c=8, base=32):
    return [rng.standard_normal((base // (2 ** l), base // (2 ** l), c))
            .astype(np.float32) for l in range(4)]


def oracle_level(roi):
    """Reference PyramidROIAlignLayer.swift:373-377."""
    h = roi[2] - roi[0]
    w = roi[3] - roi[1]
    ratio = CANONICAL / np.sqrt(IMAGE_SHAPE[0] * IMAGE_SHAPE[1])
    val = np.log2(np.sqrt(w * h) / ratio) + 4.0 if w * h > 0 else float("-inf")
    if not np.isfinite(val):
        return None  # padding
    return int(min(5, max(2, np.floor(val + 0.5)))) - 2


def random_rois(rng, n, pad_frac=0.2):
    yx1 = rng.uniform(0, 0.7, size=(n, 2))
    wh = rng.uniform(0.02, 0.3, size=(n, 2))
    rois = np.concatenate([yx1, np.minimum(yx1 + wh, 1.0)], axis=1)
    k = int(n * pad_frac)
    if k:
        rois[rng.choice(n, k, replace=False)] = 0.0
    return rois.astype(np.float32)


def test_level_assignment(rng):
    rois = random_rois(rng, 100)
    lvl, valid = roi_levels(jnp.asarray(rois), IMAGE_SHAPE, CANONICAL)
    lvl, valid = np.asarray(lvl), np.asarray(valid)
    for i, roi in enumerate(rois):
        want = oracle_level(roi)
        if want is None:
            assert not valid[i]
        else:
            assert valid[i] and lvl[i] == want, (i, roi, lvl[i], want)


@pytest.mark.parametrize("crop", [7, 14])
def test_pyramid_roi_align_matches_crop_and_resize(rng, crop):
    feats = make_pyramid(rng)
    rois = random_rois(rng, 40)
    out = np.asarray(pyramid_roi_align(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois), crop,
        IMAGE_SHAPE, CANONICAL))
    assert out.shape == (40, crop, crop, feats[0].shape[-1])
    for i, roi in enumerate(rois):
        lv = oracle_level(roi)
        if lv is None:
            assert np.all(out[i] == 0.0), f"padding roi {i} must yield zeros"
            continue
        want = oracle_crop_and_resize(feats[lv], roi, (crop, crop))
        np.testing.assert_allclose(out[i], want, rtol=1e-4, atol=1e-4)


def test_inverted_roi_still_finite(rng):
    # y2 < y1 gives negative area -> treated as padding (zero output).
    feats = make_pyramid(rng)
    rois = np.array([[0.5, 0.5, 0.2, 0.9]], np.float32)
    out = np.asarray(pyramid_roi_align(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois), 7,
        IMAGE_SHAPE, CANONICAL))
    assert np.isfinite(out).all()
    assert np.all(out == 0.0)


def test_bf16_features_supported(rng):
    feats = make_pyramid(rng)
    rois = random_rois(rng, 8, pad_frac=0.0)
    out = pyramid_roi_align(
        [jnp.asarray(f, jnp.bfloat16) for f in feats], jnp.asarray(rois), 7,
        IMAGE_SHAPE, CANONICAL)
    assert out.dtype == jnp.bfloat16
    ref = np.asarray(pyramid_roi_align(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois), 7,
        IMAGE_SHAPE, CANONICAL))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref, rtol=0.05, atol=0.05)
