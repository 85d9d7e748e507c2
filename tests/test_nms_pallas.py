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
    idx_x, vout_x, keep_x = nms_padded(boxes, valid, 0.7, 100,
                                       tile_size=128, return_mask=True,
                                       impl="xla")
    keep_p = nms_keep_pallas(boxes, valid, 0.7, 100, tile_size=128,
                             interpret=True)
    # The kernel's early exit stops the tile walk at the 100th selection;
    # flags after that point are dead (the contract is the first max_out
    # selections — ops/nms.py docstring). Compare the live prefix exactly,
    # and the compacted contract end-to-end.
    kx, kp = np.asarray(keep_x), np.asarray(keep_p)
    kept_at = np.nonzero(np.cumsum(kx) == 100)[0]
    live = (kept_at[0] + 1) if len(kept_at) else n
    tile_end = min(-(-live // 128) * 128, n)  # exit is tile-granular
    np.testing.assert_array_equal(kx[:tile_end], kp[:tile_end])
    assert not kp[tile_end:].any()

    from maskrcnn_tpu.ops.nms import _compact
    idx_p, vout_p = _compact(jnp.asarray(kp), n, 100, False)
    np.testing.assert_array_equal(np.asarray(idx_x), np.asarray(idx_p))
    np.testing.assert_array_equal(np.asarray(vout_x), np.asarray(vout_p))


def test_auto_impl_on_cpu_uses_xla(rng):
    # On the CPU test backend, impl="auto" must fall back to the XLA path
    # (the Mosaic kernel only compiles for TPU).
    boxes = jnp.asarray(random_boxes(rng, 64))
    idx, vout = nms_padded(boxes, jnp.ones(64, bool), 0.5, 32, tile_size=128)
    assert idx.shape == (32,)


def test_pallas_buffer_tail_chunk(rng):
    """cap=1000 -> 7 full 128-row buffer chunks + a 104-row static tail.

    Production proposal NMS hits this shape. Tiny boxes keep almost
    everything, so the kept-buffer fills past row 896 and later tiles must
    be cross-suppressed by keepers living in the tail chunk.
    """
    n, max_out = 1536, 1000
    yx1 = rng.uniform(0, 1, size=(n, 2)).astype(np.float32)
    b = np.concatenate([yx1, yx1 + 0.02], axis=1)
    # Tiny random boxes keep at ~95%, so the kept-buffer crosses row 896
    # (into the tail chunk) around candidate ~940 and the early exit fires
    # around ~1050. Duplicate boxes ranked ~900-950 onto candidates 960-1010
    # — processed while 896 < cnt < max_out, so their suppressors live in
    # the tail chunk and the walk is still running.
    b[960:1010] = b[900:950]
    boxes = jnp.asarray(b)
    valid = jnp.ones((n,), bool)
    idx_x, vout_x, keep_x = nms_padded(boxes, valid, 0.5, max_out,
                                       tile_size=128, impl="xla",
                                       return_mask=True)
    kx = np.asarray(keep_x)
    # Preconditions for the scenario (guard against helper drift): the
    # duplicates' originals must rank past 896, and the 1000th keep must
    # come after index 1010.
    assert kx[:900].sum() > 896 - 64 and kx[:900].sum() < 896
    assert np.nonzero(np.cumsum(kx) == max_out)[0][0] > 1010
    assert not kx[960:1010].any()  # duplicates were suppressed

    keep_p = nms_keep_pallas(boxes, valid, 0.5, max_out, tile_size=128,
                             interpret=True)
    from maskrcnn_tpu.ops.nms import _compact
    idx_p, vout_p = _compact(keep_p, n, max_out, False)
    np.testing.assert_array_equal(np.asarray(idx_x), np.asarray(idx_p))
    np.testing.assert_array_equal(np.asarray(vout_x), np.asarray(vout_p))
