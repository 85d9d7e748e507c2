"""Data-parallel sharding over the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from maskrcnn_tpu.core.anchors import generate_anchors
from maskrcnn_tpu.core.config import tiny_test_config
from maskrcnn_tpu.models.mask_rcnn import forward, init_mask_rcnn
from maskrcnn_tpu.parallel.mesh import (
    data_parallel_forward, dryrun_step, make_mesh, replicate, shard_batch)
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (full-model jits / subprocess)


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


def test_dp_forward_matches_single_device(rng):
    cfg = tiny_test_config()
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(generate_anchors(cfg))
    images = jnp.asarray(rng.uniform(0, 255, (8, 128, 128, 3)), jnp.float32)

    single = forward(params, images, anchors, cfg)

    mesh = make_mesh(8)
    out = data_parallel_forward(
        mesh, cfg, replicate(mesh, params), shard_batch(mesh, images),
        replicate(mesh, anchors))

    np.testing.assert_allclose(
        np.asarray(single["detections"]), np.asarray(out["detections"]),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(single["valid"]), np.asarray(out["valid"]))


def test_dryrun_step_runs():
    dryrun_step(4)


def test_detector_data_parallel_matches_single(rng):
    """MaskRCNNDetector(data_parallel=N) == single-device, incl. the
    pad-to-mesh-multiple path for uneven batches."""
    from maskrcnn_tpu.pipeline.detector import MaskRCNNDetector

    cfg = tiny_test_config()
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    det1 = MaskRCNNDetector(cfg, params)
    det4 = MaskRCNNDetector(cfg, params, data_parallel=4)

    # 6 images over a 4-device mesh: exercises tail padding (6 -> 8)
    images = [rng.uniform(0, 255, (97, 128, 3)).astype(np.uint8)
              for _ in range(6)]
    r1 = det1.detect_images(images, paste_masks=False)
    r4 = det4.detect_images(images, paste_masks=False)

    assert len(r1) == len(r4) == 6
    for a, b in zip(r1, r4):
        assert len(a) == len(b)
        for da, db in zip(a, b):
            assert da.class_id == db.class_id
            np.testing.assert_allclose(da.score, db.score, rtol=1e-5)
            np.testing.assert_allclose(da.box, db.box, rtol=1e-4, atol=1e-3)


def test_detector_dp_uint8_wire_preserves_dtype(rng, monkeypatch):
    """uint8_wire + --dp with an uneven batch: the pad must use the
    batch's OWN dtype (a float32 zero-pad silently promoted the whole
    batch back to f32, defeating the 4x-smaller transfer — r04 review
    finding); results must match the f32-wire DP run."""
    from maskrcnn_tpu.pipeline.detector import MaskRCNNDetector

    cfg = tiny_test_config()
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    det = MaskRCNNDetector(cfg, params, data_parallel=4)

    seen_dtypes = []
    orig = det._run_batch_dp

    def spy(images, paste_size=None):
        out = orig(images, paste_size)
        seen_dtypes.append(np.asarray(images).dtype)
        return out

    monkeypatch.setattr(det, "_run_batch_dp", spy)
    s = cfg.image_height
    canvases = [rng.uniform(0, 255, (s, s, 3)).astype(np.float32)
                for _ in range(3)]  # 3 over 4 devices -> pad 1
    windows = [None] * 3
    from maskrcnn_tpu.pipeline.preprocess import compute_window
    windows = [compute_window(s, s, s) for _ in range(3)]
    r_u8 = det.detect_canvases(canvases, windows, paste_masks=False,
                               uint8_wire=True)
    assert seen_dtypes[-1] == np.uint8  # pad did NOT promote to f32
    # sanity only: runs end-to-end and detects things. Per-detection
    # equality with the f32 wire does NOT hold at random weights (±0.5
    # LSB flips near-tie detections); at trained weights the AP delta is
    # exactly 0.0 (docs/uint8_wire_ap_r04.json).
    assert len(r_u8) == 3 and any(len(a) for a in r_u8)
