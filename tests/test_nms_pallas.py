"""Pallas NMS kernel vs the XLA formulation (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from maskrcnn_tpu.ops.nms import nms_padded
from maskrcnn_tpu.ops.nms_pallas import nms_keep_pallas
from tests.test_boxes import random_boxes


@pytest.mark.parametrize("n", [40, 300])
def test_pallas_kernel_matches_xla(rng, n):
    boxes = jnp.asarray(random_boxes(rng, n, degenerate_frac=0.1))
    valid = jnp.ones((n,), bool)
    _, _, keep_x = nms_padded(boxes, valid, 0.7, 100, tile_size=128,
                              return_mask=True, impl="xla")
    keep_p = nms_keep_pallas(boxes, valid, 0.7, 100, tile_size=128,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(keep_x), np.asarray(keep_p))


def test_auto_impl_on_cpu_uses_xla(rng):
    # On the CPU test backend, impl="auto" must fall back to the XLA path
    # (the Mosaic kernel only compiles for TPU).
    boxes = jnp.asarray(random_boxes(rng, 64))
    idx, vout = nms_padded(boxes, jnp.ones(64, bool), 0.5, 32, tile_size=128)
    assert idx.shape == (32,)
