"""Data-parallel sharding over the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from maskrcnn_tpu.core.anchors import generate_anchors
from maskrcnn_tpu.core.config import tiny_test_config
from maskrcnn_tpu.models.mask_rcnn import forward, init_mask_rcnn
from maskrcnn_tpu.parallel.mesh import (
    data_parallel_forward, dryrun_step, make_mesh, replicate, shard_batch)


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
