"""Box op unit tests against numpy oracles of the reference semantics."""

import numpy as np
import jax.numpy as jnp

from maskrcnn_tpu.ops import boxes as B
from tests.oracles import oracle_apply_box_deltas, oracle_iou


def random_boxes(rng, n, degenerate_frac=0.0):
    yx1 = rng.uniform(0, 0.8, size=(n, 2))
    wh = rng.uniform(0.01, 0.3, size=(n, 2))
    b = np.concatenate([yx1, yx1 + wh], axis=1).astype(np.float32)
    if degenerate_frac:
        k = int(n * degenerate_frac)
        idx = rng.choice(n, size=k, replace=False)
        b[idx] = 0.0  # zero-area padding rows
    return b


def test_apply_box_deltas_matches_oracle(rng):
    boxes = random_boxes(rng, 200)
    deltas = rng.normal(0, 0.2, size=(200, 4)).astype(np.float32)
    got = np.asarray(B.apply_box_deltas(jnp.asarray(boxes), jnp.asarray(deltas)))
    want = oracle_apply_box_deltas(boxes, deltas)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_clip(rng):
    boxes = rng.normal(0.5, 1.0, size=(64, 4)).astype(np.float32)
    got = np.asarray(B.clip_boxes(jnp.asarray(boxes)))
    assert got.min() >= 0.0 and got.max() <= 1.0
    np.testing.assert_allclose(got, np.clip(boxes, 0, 1))


def test_iou_matches_oracle(rng):
    a = random_boxes(rng, 40, degenerate_frac=0.2)
    b = random_boxes(rng, 30, degenerate_frac=0.2)
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    want = np.zeros((40, 30), np.float32)
    for i in range(40):
        for j in range(30):
            want[i, j] = oracle_iou(a[i], b[j])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_iou_degenerate_inert():
    a = np.zeros((3, 4), np.float32)
    b = np.array([[0.0, 0.0, 1.0, 1.0]], np.float32)
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    assert (got == 0).all()
