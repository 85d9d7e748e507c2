"""Property-based tests (hypothesis) for host-side codecs and geometry.

These cover the pure-host components where random structured inputs find
edge cases example tests miss: the RLE codec (both the native C++ core and
the numpy fallback must satisfy the same algebra), letterbox window
geometry, and mask pasting bounds.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from maskrcnn_tpu.evalkit import mask_rle as M
from maskrcnn_tpu.pipeline.detector import paste_mask
from maskrcnn_tpu.pipeline.preprocess import compute_window

common = settings(max_examples=60, deadline=None)


@common
@given(st.integers(1, 40), st.integers(1, 40), st.randoms(use_true_random=False))
def test_rle_roundtrip_and_algebra(h, w, rnd):
    rng = np.random.default_rng(rnd.getrandbits(32))
    mask = (rng.random((h, w)) > rng.uniform(0.05, 0.95)).astype(np.uint8)
    rle = M.encode(mask)
    # counts algebra: alternating background/foreground runs covering h*w
    counts = np.asarray(rle.counts, np.int64)
    assert counts.sum() == h * w
    assert (counts[1:] > 0).all()  # only the leading background may be 0
    assert M.area(rle) == int(mask.sum())
    np.testing.assert_array_equal(M.decode(rle), mask)
    # fortran-order input must encode identically
    rle_f = M.encode(np.asfortranarray(mask))
    assert list(rle_f.counts) == list(rle.counts)


@common
@given(st.integers(1, 30), st.integers(1, 30), st.integers(1, 6),
       st.randoms(use_true_random=False))
def test_rle_iou_properties(h, w, n, rnd):
    rng = np.random.default_rng(rnd.getrandbits(32))
    masks = [(rng.random((h, w)) > 0.6).astype(np.uint8) for _ in range(n)]
    rles = [M.encode(m) for m in masks]
    iscrowd = [0] * n
    iou = M.iou_masks(rles, rles, iscrowd)
    assert iou.shape == (n, n)
    assert ((iou >= -1e-9) & (iou <= 1 + 1e-9)).all()
    # self-IoU is 1 for nonempty masks, 0 for empty ones
    for i, m in enumerate(masks):
        assert abs(iou[i, i] - (1.0 if m.any() else 0.0)) < 1e-9
    # symmetry (no crowds)
    np.testing.assert_allclose(iou, iou.T, atol=1e-9)


@common
@given(st.integers(1, 4000), st.integers(1, 4000),
       st.sampled_from([64, 128, 256, 1024]))
def test_letterbox_window_invariants(h, w, size):
    win = compute_window(h, w, size)
    assert 0 <= win.y1 <= win.y2 <= size
    assert 0 <= win.x1 <= win.x2 <= size
    assert win.y2 - win.y1 >= 1 and win.x2 - win.x1 >= 1
    # the scaled long edge fills the canvas (within rounding)
    assert max(win.y2 - win.y1, win.x2 - win.x1) >= size - 1
    # aspect preserved within 1px rounding on each axis (except where the
    # >=1px clamp kicks in for extreme ratios)
    assert (abs((win.y2 - win.y1) - h * win.scale) <= 0.51
            or win.y2 - win.y1 == 1)
    assert (abs((win.x2 - win.x1) - w * win.scale) <= 0.51
            or win.x2 - win.x1 == 1)


@common
@given(st.floats(-50, 500), st.floats(-50, 600), st.floats(1, 520),
       st.floats(1, 680), st.randoms(use_true_random=False))
def test_paste_mask_bounds(y1, x1, bh, bw, rnd):
    rng = np.random.default_rng(rnd.getrandbits(32))
    mask = rng.random((28, 28)).astype(np.float32)
    shape = (480, 640)
    canvas = paste_mask(mask, (y1, x1, y1 + bh, x1 + bw), shape)
    assert canvas.shape == shape and canvas.dtype == np.dtype(bool)
    # nothing outside the (clipped, rounded) box region
    yy1 = max(int(round(y1)) - 1, 0)
    xx1 = max(int(round(x1)) - 1, 0)
    yy2 = min(int(round(y1 + bh)) + 1, shape[0])
    xx2 = min(int(round(x1 + bw)) + 1, shape[1])
    outside = canvas.copy()
    outside[yy1:yy2, xx1:xx2] = False
    assert not outside.any()
