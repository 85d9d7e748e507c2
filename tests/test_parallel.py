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
