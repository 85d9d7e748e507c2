"""NMS: blockwise TPU formulation must match greedy sequential reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from maskrcnn_tpu.ops.nms import nms_padded, nms_gather
from tests.oracles import oracle_nms
from tests.test_boxes import random_boxes


def run_both(boxes, valid, thresh, max_out, tile_size=128):
    idx, vout = nms_padded(
        jnp.asarray(boxes), jnp.asarray(valid), thresh, max_out,
        tile_size=tile_size)
    idx = np.asarray(idx)
    vout = np.asarray(vout)
    got = [int(i) for i, v in zip(idx, vout) if v]
    cand = [i for i in range(len(boxes)) if valid[i]]
    want = oracle_nms(boxes, cand, thresh, max_out)
    return got, want


@pytest.mark.parametrize("n", [1, 7, 128, 300, 1000])
@pytest.mark.parametrize("thresh", [0.3, 0.7])
def test_nms_matches_greedy(rng, n, thresh):
    boxes = random_boxes(rng, n, degenerate_frac=0.1)
    valid = np.ones(n, bool)
    got, want = run_both(boxes, valid, thresh, max_out=min(n, 100))
    assert got == want


def test_nms_respects_validity_mask(rng):
    boxes = random_boxes(rng, 200)
    valid = rng.random(200) > 0.5
    got, want = run_both(boxes, valid, 0.5, max_out=50)
    assert got == want
    assert all(valid[i] for i in got)


def test_nms_max_out_truncates(rng):
    # Many near-identical clusters -> more survivors than max_out.
    base = random_boxes(rng, 40)
    boxes = np.concatenate([base + rng.normal(0, 1e-4, base.shape)
                            for _ in range(5)]).astype(np.float32)
    valid = np.ones(len(boxes), bool)
    got, want = run_both(boxes, valid, 0.5, max_out=10)
    assert got == want
    assert len(got) <= 10


def test_nms_zero_area_never_selected():
    boxes = np.zeros((10, 4), np.float32)
    boxes[3] = [0.1, 0.1, 0.5, 0.5]
    valid = np.ones(10, bool)
    got, want = run_both(boxes, valid, 0.5, max_out=5)
    assert got == want == [3]


def test_nms_gather_sentinel_rows_zero(rng):
    boxes = random_boxes(rng, 16)
    idx, vout = nms_padded(jnp.asarray(boxes), jnp.ones(16, bool), 0.01, 16)
    out = np.asarray(nms_gather(jnp.asarray(boxes), idx))
    assert (out[~np.asarray(vout)] == 0).all()


def test_nms_tile_boundary_equivalence(rng):
    # Same input, different tile sizes -> identical result.
    boxes = random_boxes(rng, 500, degenerate_frac=0.05)
    valid = np.ones(500, bool)
    a, _ = run_both(boxes, valid, 0.6, 200, tile_size=128)
    b, _ = run_both(boxes, valid, 0.6, 200, tile_size=256)
    assert a == b
