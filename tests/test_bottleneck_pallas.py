"""Fused bottleneck-chain kernel vs the XLA resnet blocks (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maskrcnn_tpu.models import nn
from maskrcnn_tpu.models.resnet import _bottleneck
from maskrcnn_tpu.ops.bottleneck_pallas import (fold_bottleneck_chain,
                                                fused_bottleneck_chain)


def make_stage_params(rng, key, stage, cin, mid, cout, letters):
    params = {}
    keys = iter(jax.random.split(key, 64))
    c = cin
    for i, letter in enumerate(letters):
        base = f"res{stage}{letter}_branch"
        bnb = f"bn{stage}{letter}_branch"
        params[base + "2a"] = nn.conv_init(next(keys), 1, 1, c, mid)
        params[bnb + "2a"] = _rand_bn(rng, mid)
        params[base + "2b"] = nn.conv_init(next(keys), 3, 3, mid, mid)
        params[bnb + "2b"] = _rand_bn(rng, mid)
        params[base + "2c"] = nn.conv_init(next(keys), 1, 1, mid, cout)
        params[bnb + "2c"] = _rand_bn(rng, cout)
        if i == 0:
            params[base + "1"] = nn.conv_init(next(keys), 1, 1, c, cout)
            params[bnb + "1"] = _rand_bn(rng, cout)
        c = cout
    return params


def _rand_bn(rng, c):
    return {
        "gamma": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
        "beta": jnp.asarray(rng.uniform(-0.3, 0.3, c), jnp.float32),
        "moving_mean": jnp.asarray(rng.uniform(-0.2, 0.2, c), jnp.float32),
        "moving_variance": jnp.asarray(rng.uniform(0.5, 2.0, c), jnp.float32),
    }


@pytest.mark.parametrize("tile_rows", [8, 32])
def test_chain_matches_xla_blocks(rng, tile_rows):
    stage, cin, mid, cout = 2, 8, 8, 16
    letters = "abc"
    params = make_stage_params(rng, jax.random.PRNGKey(1), stage, cin, mid,
                               cout, letters)
    x = jnp.asarray(rng.standard_normal((2, 32, 24, cin)), jnp.float32)

    want = x.astype(jnp.bfloat16)
    for i, letter in enumerate(letters):
        want = _bottleneck(want, params, stage, letter, i == 0, 1,
                           jnp.bfloat16, None)
    want = np.asarray(want.astype(jnp.float32))

    blocks = fold_bottleneck_chain(params, stage, letters)
    got = fused_bottleneck_chain(x, blocks, tile_rows=tile_rows,
                                 interpret=True)
    got = np.asarray(got.astype(jnp.float32))

    assert got.shape == want.shape
    # bf16 accumulation order differs (9 shifted matmuls vs lax conv);
    # tolerance is bf16-grade relative to the activation scale.
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.03 * scale, rtol=0.05)


def test_chain_adapts_tile_to_awkward_height(rng):
    """H=40 with preferred tile 32 -> auto-shrinks to a divisor (20)."""
    stage, cin, mid, cout = 3, 16, 8, 16
    params = make_stage_params(rng, jax.random.PRNGKey(2), stage, cin, mid,
                               cout, "bc")
    # identity blocks only: drop the projection entry
    for k in ("res3b_branch1", "bn3b_branch1"):
        params.pop(k, None)
    x = jnp.asarray(rng.standard_normal((1, 40, 16, cin)), jnp.float32)

    want = x.astype(jnp.bfloat16)
    for letter in "bc":
        want = _bottleneck(want, params, stage, letter, False, 1,
                           jnp.bfloat16, None)
    want = np.asarray(want.astype(jnp.float32))

    blocks = fold_bottleneck_chain(params, stage, "bc")
    got = np.asarray(fused_bottleneck_chain(
        x, blocks, tile_rows=32, interpret=True).astype(jnp.float32))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.03 * scale, rtol=0.05)
