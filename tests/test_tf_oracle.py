"""Cross-framework oracle tests against REAL TensorFlow.

The reference's de-facto correctness oracle is its `--compare` path, which
runs the same weights through TF/Keras and diffs the COCO AP tables
(`Sources/maskrcnn/EvaluateCommand.swift:124-127`,
`Sources/maskrcnn/Python/COCOEval/task.py:99-105`). SURVEY.md §7 hard-part
#2 pins our ROIAlign parity target to `tf.image.crop_and_resize` semantics
for the same reason. The other unit tests validate against hand-written
numpy transcriptions (`tests/oracles.py`); this module closes the loop by
checking the transcriptions AND the production ops against TensorFlow
itself. Skipped wholesale when TF is not importable (it is not a package
dependency — only a test oracle).
"""

from __future__ import annotations

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from maskrcnn_tpu.ops.nms import nms_padded  # noqa: E402
from maskrcnn_tpu.ops.roi_align import pyramid_roi_align  # noqa: E402
from tests.oracles import oracle_crop_and_resize  # noqa: E402
from tests.test_roi_align import (IMAGE_SHAPE, CANONICAL,  # noqa: E402
                                  make_pyramid, oracle_level, random_rois)


def tf_crop(image: np.ndarray, boxes: np.ndarray, crop: int) -> np.ndarray:
    out = tf.image.crop_and_resize(
        image[None].astype(np.float32),
        boxes.astype(np.float32),
        box_indices=np.zeros((len(boxes),), np.int32),
        crop_size=(crop, crop),
        method="bilinear",
        extrapolation_value=0.0)
    return np.asarray(out)


def test_numpy_transcription_matches_tf(rng):
    """The scalar oracle in tests/oracles.py == tf.image.crop_and_resize,
    including out-of-range sample handling (extrapolation to 0)."""
    image = rng.standard_normal((23, 31, 5)).astype(np.float32)
    boxes = np.concatenate([
        random_rois(rng, 24, pad_frac=0.0),
        # out-of-range / inverted boxes exercise the extrapolation branch
        np.array([[-0.3, -0.2, 0.5, 0.6],
                  [0.4, 0.5, 1.4, 1.2],
                  [0.8, 0.8, 0.1, 0.2]], np.float32),
    ]).astype(np.float32)
    for crop in (1, 7, 14):
        want = tf_crop(image, boxes, crop)
        for i, box in enumerate(boxes):
            got = oracle_crop_and_resize(image, box, (crop, crop))
            np.testing.assert_allclose(got, want[i], rtol=1e-5, atol=1e-5,
                                       err_msg=f"box {i} crop {crop}")


@pytest.mark.parametrize("crop", [7, 14])
def test_pyramid_roi_align_matches_tf(rng, crop):
    """Production pyramid ROIAlign == TF crop_and_resize on the level each
    ROI is assigned to (the reference's own comparison target)."""
    feats = make_pyramid(rng)
    rois = random_rois(rng, 40)
    out = np.asarray(pyramid_roi_align(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois), crop,
        IMAGE_SHAPE, CANONICAL))
    for i, roi in enumerate(rois):
        lv = oracle_level(roi)
        if lv is None:  # padding ROI -> zero output
            np.testing.assert_array_equal(out[i], 0.0)
            continue
        want = tf_crop(feats[lv], roi[None], crop)[0]
        np.testing.assert_allclose(out[i], want, rtol=1e-4, atol=1e-4,
                                   err_msg=f"roi {i} level {lv}")


def test_greedy_nms_matches_tf(rng):
    """nms_padded (XLA path) selects exactly what tf.image.non_max_suppression
    selects, in the same order, across IoU thresholds and output caps.

    Both implement greedy descending-score NMS with strict-greater
    suppression (`Utils.swift:203` in the reference; TF's
    non_max_suppression kernel). Boxes here all have positive area — the
    zero-area-skip divergence (reference semantics, kept by nms_padded) is
    covered by tests/test_nms.py against the scalar oracle.
    """
    n = 600
    yx1 = rng.uniform(0, 0.8, size=(n, 2))
    wh = rng.uniform(0.05, 0.4, size=(n, 2))
    boxes = np.concatenate([yx1, np.minimum(yx1 + wh, 1.0)],
                           axis=1).astype(np.float32)
    scores = np.sort(rng.uniform(0.01, 1.0, n).astype(np.float32))[::-1]
    for thresh in (0.3, 0.5, 0.7):
        for max_out in (10, 100, n):
            want = np.asarray(tf.image.non_max_suppression(
                boxes, scores, max_output_size=max_out,
                iou_threshold=thresh))
            idx, valid = nms_padded(
                jnp.asarray(boxes), jnp.ones((n,), jnp.bool_),
                thresh, max_out, impl="xla")
            got = np.asarray(idx)[np.asarray(valid)]
            np.testing.assert_array_equal(
                got, want, err_msg=f"thresh {thresh} max_out {max_out}")
