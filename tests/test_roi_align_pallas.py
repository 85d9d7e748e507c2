"""Pallas pyramid ROIAlign vs the XLA flat-gather implementation.

The XLA path is itself oracle-tested against scalar crop_and_resize
(test_roi_align.py), so equality here transitively proves the kernel."""

import numpy as np
import jax.numpy as jnp
import pytest

from maskrcnn_tpu.ops.roi_align import pyramid_roi_align
from maskrcnn_tpu.ops.roi_align_pallas import pyramid_roi_align_pallas

IMAGE_SHAPE = (128, 128)
CANONICAL = 224.0


def make_batched_pyramid(rng, b=2, c=8, base=64):
    return [rng.standard_normal((b, base // (2 ** l), base // (2 ** l), c))
            .astype(np.float32) for l in range(4)]


def mixed_rois(rng, n):
    """Normal + padding + extreme-aspect (slow path) + edge-touching ROIs."""
    yx1 = rng.uniform(0, 0.7, size=(n, 2))
    wh = rng.uniform(0.02, 0.3, size=(n, 2))
    rois = np.concatenate([yx1, np.minimum(yx1 + wh, 1.0)], axis=1)
    rois[0] = 0.0                                # padding row
    rois[1] = [0.4, 0.02, 0.42, 0.98]            # aspect ~48 -> oversize
    rois[2] = [0.02, 0.45, 0.97, 0.47]           # tall sliver
    rois[3] = [0.0, 0.0, 1.0, 1.0]               # full image (P5)
    rois[4] = [0.9, 0.9, 1.0, 1.0]               # bottom-right corner
    rois[5] = [0.0, 0.0, 0.015, 0.015]           # tiny (P2, sub-cell)
    return rois.astype(np.float32)


@pytest.mark.parametrize("crop", [7, 14])
def test_pallas_matches_xla(rng, crop):
    feats = make_batched_pyramid(rng)
    b = feats[0].shape[0]
    rois = np.stack([mixed_rois(rng, 24) for _ in range(b)])

    got = np.asarray(pyramid_roi_align_pallas(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois), crop,
        IMAGE_SHAPE, CANONICAL, interpret=True))

    want = np.stack([
        np.asarray(pyramid_roi_align(
            [jnp.asarray(f[i]) for f in feats], jnp.asarray(rois[i]), crop,
            IMAGE_SHAPE, CANONICAL))
        for i in range(b)])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=3e-5)


def test_pallas_block_override_crop7(rng):
    """block=(16, 32) forces the single-block DMA path for pool-7 (off by
    default per docs/PERF.md negative result #10) — must stay exact."""
    feats = make_batched_pyramid(rng)
    rois = np.stack([mixed_rois(rng, 24)])
    got = np.asarray(pyramid_roi_align_pallas(
        [jnp.asarray(f[:1]) for f in feats], jnp.asarray(rois), 7,
        IMAGE_SHAPE, CANONICAL, interpret=True, block=(16, 32)))
    want = np.asarray(pyramid_roi_align_pallas(
        [jnp.asarray(f[:1]) for f in feats], jnp.asarray(rois), 7,
        IMAGE_SHAPE, CANONICAL, interpret=True, block=(0, 0)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=3e-5)


def test_pallas_chunked_scan_path(rng):
    """More ROIs than one chunk -> the lax.scan path, same results."""
    feats = make_batched_pyramid(rng, b=1, c=8, base=32)
    rois = mixed_rois(rng, 40)[None]
    got = np.asarray(pyramid_roi_align_pallas(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois), 7,
        IMAGE_SHAPE, CANONICAL, chunk=16, interpret=True))
    want = np.asarray(pyramid_roi_align(
        [jnp.asarray(f[0]) for f in feats], jnp.asarray(rois[0]), 7,
        IMAGE_SHAPE, CANONICAL))
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=3e-5)
