"""Fused Pallas stem kernel vs the plain jnp stem (oracle), interpret mode.

The kernel fuses conv1 (7x7/2, explicit pad 3 — the Matterport
ZeroPadding2D(3) contract), inference BatchNorm, ReLU and the 3x3/2 SAME
maxpool; the oracle is the exact nn-layer chain from models/resnet.py.
Numerics differ only by rounding order (the kernel keeps f32 through the
pool where the oracle rounds the conv output to bf16 first), so comparison
is tolerance-based.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from maskrcnn_tpu.models import nn
from maskrcnn_tpu.ops import stem_pallas


def _random_stem_params(rng):
    return {
        "conv1": {
            "kernel": jnp.asarray(
                rng.standard_normal((7, 7, 3, 64)) * 0.05, jnp.float32),
            "bias": jnp.asarray(
                rng.standard_normal(64) * 0.5, jnp.float32),
        },
        "bn_conv1": {
            "gamma": jnp.asarray(
                rng.uniform(0.5, 1.5, 64), jnp.float32),
            "beta": jnp.asarray(
                rng.standard_normal(64) * 0.3, jnp.float32),
            "moving_mean": jnp.asarray(
                rng.standard_normal(64) * 2.0, jnp.float32),
            "moving_variance": jnp.asarray(
                rng.uniform(0.5, 4.0, 64), jnp.float32),
        },
    }


def _oracle_stem(params, images, dtype=jnp.bfloat16):
    x = images.astype(dtype)
    x = nn.conv2d(x, params["conv1"], stride=2, padding=[(3, 3), (3, 3)],
                  dtype=dtype)
    x = nn.relu(nn.bn_apply(x, params, "bn_conv1", None))
    return nn.max_pool(x, 3, 2, padding="SAME")


@pytest.mark.parametrize("shape", [(2, 128, 128, 3), (1, 64, 96, 3)])
def test_stem_kernel_matches_oracle(shape):
    rng = np.random.default_rng(0)
    params = _random_stem_params(rng)
    # mean-subtracted-image-scale inputs (O(100), like the real contract)
    images = jnp.asarray(rng.uniform(-124, 132, shape), jnp.float32)

    want = np.asarray(_oracle_stem(params, images), np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            stem_pallas.apply_stem_pallas(params, images), np.float32)

    assert got.shape == want.shape == (
        shape[0], shape[1] // 4, shape[2] // 4, 64)
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=0.04 * scale)


def test_stem_supported_gating():
    assert not stem_pallas.stem_supported((2, 100, 100, 3), jnp.bfloat16,
                                          None)  # not /32
    assert not stem_pallas.stem_supported((2, 128, 128, 3), jnp.float32,
                                          None)  # wrong dtype
    assert not stem_pallas.stem_supported(
        (2, 128, 128, 3), jnp.bfloat16, {"use_batch_stats": True})  # training


def test_packed_weights_zero_outside_window():
    src, ok = stem_pallas._packed_index_table()
    # every original tap must appear exactly 4 times (once per (pr, ps)
    # output parity is wrong — once per (u,v) covering it); count coverage:
    # each (dy, dx, c) source row must be hit exactly once per parity pair.
    counts = np.zeros((147, 2, 2), np.int64)
    for r in range(432):
        for pr in range(2):
            for ps in range(2):
                if ok[r, pr, ps]:
                    counts[src[r, pr, ps], pr, ps] += 1
    assert (counts == 1).all()
