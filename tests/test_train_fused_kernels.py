"""Training-path Pallas kernels (custom_vjp wrappers) — VERDICT r03 #3.

The fused stem / bottleneck-chain kernels run forward-only; for frozen-BN
fine-tuning they are wrapped in `jax.custom_vjp` whose backward is the vjp
of the equivalent XLA sub-graph (models/resnet.py). These tests pin down,
in interpret mode on CPU:

  * the wrapper's GRADIENTS are bit-identical to the pure XLA path's
    (the bwd literally IS `jax.vjp` of that path);
  * the wrapper's forward matches the XLA forward to kernel tolerance;
  * `make_optimizer` freezes every BatchNorm layer (gamma/beta/moving
    stats) when `train_bn == "frozen"` — Matterport sets
    `layer.trainable=False` on BN in that recipe, and the frozen-stats
    forward otherwise backprops nonzero gradients into the moving stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from maskrcnn_tpu.models import nn, resnet


def _stem_params(rng):
    return {
        "conv1": {
            "kernel": jnp.asarray(
                rng.standard_normal((7, 7, 3, 64)) * 0.05, jnp.float32),
            "bias": jnp.asarray(
                rng.standard_normal(64) * 0.5, jnp.float32),
        },
        "bn_conv1": {
            "gamma": jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.float32),
            "beta": jnp.asarray(
                rng.standard_normal(64) * 0.3, jnp.float32),
            "moving_mean": jnp.asarray(
                rng.standard_normal(64) * 2.0, jnp.float32),
            "moving_variance": jnp.asarray(
                rng.uniform(0.5, 4.0, 64), jnp.float32),
        },
    }


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {jax.tree_util.keystr(p): v
          for p, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(la) == len(lb)
    for path, va in la:
        np.testing.assert_array_equal(np.asarray(va, np.float32),
                                      np.asarray(lb[jax.tree_util.keystr(
                                          path)], np.float32), err_msg=path)


def test_stem_fused_diff_grads_bitmatch_xla():
    rng = np.random.default_rng(0)
    params = _stem_params(rng)
    images = jnp.asarray(rng.uniform(-124, 132, (1, 64, 64, 3)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((1, 16, 16, 64)), jnp.bfloat16)

    def loss_fused(p, im):
        return jnp.sum(resnet._stem_fused_diff(p, im).astype(jnp.float32)
                       * cot.astype(jnp.float32))

    def loss_xla(p, im):
        return jnp.sum(
            resnet._stem_xla(p, im, jnp.bfloat16, None).astype(jnp.float32)
            * cot.astype(jnp.float32))

    with pltpu.force_tpu_interpret_mode():
        gp_f, gi_f = jax.grad(loss_fused, argnums=(0, 1))(params, images)
    gp_x, gi_x = jax.grad(loss_xla, argnums=(0, 1))(params, images)
    # the custom bwd IS jax.vjp of _stem_xla -> gradients are bit-identical
    _assert_tree_equal(gp_f, gp_x)
    np.testing.assert_array_equal(np.asarray(gi_f), np.asarray(gi_x))
    # and the moving statistics DO receive nonzero gradients here — the
    # reason make_optimizer must freeze them under train_bn="frozen"
    assert float(jnp.abs(gp_x["bn_conv1"]["moving_mean"]).max()) > 0


def test_stem_fused_diff_forward_matches_xla():
    rng = np.random.default_rng(1)
    params = _stem_params(rng)
    images = jnp.asarray(rng.uniform(-124, 132, (1, 64, 64, 3)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(resnet._stem_fused_diff(params, images), np.float32)
    want = np.asarray(resnet._stem_xla(params, images, jnp.bfloat16, None),
                      np.float32)
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=0.04 * scale)


def _chain_params(rng, stage, letters, cin, m, cout):
    def conv(kh, kw, ci, co):
        return {"kernel": jnp.asarray(
            rng.standard_normal((kh, kw, ci, co)) * 0.05, jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(co) * 0.1, jnp.float32)}

    def bn(c):
        return {"gamma": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
                "beta": jnp.asarray(
                    rng.standard_normal(c) * 0.2, jnp.float32),
                "moving_mean": jnp.asarray(
                    rng.standard_normal(c) * 0.5, jnp.float32),
                "moving_variance": jnp.asarray(
                    rng.uniform(0.5, 2.0, c), jnp.float32)}

    p = {}
    c_in = cin
    for letter in letters:
        base = f"res{stage}{letter}_branch"
        bnb = f"bn{stage}{letter}_branch"
        p[base + "2a"] = conv(1, 1, c_in, m)
        p[bnb + "2a"] = bn(m)
        p[base + "2b"] = conv(3, 3, m, m)
        p[bnb + "2b"] = bn(m)
        p[base + "2c"] = conv(1, 1, m, cout)
        p[bnb + "2c"] = bn(cout)
        if letter == "a":
            p[base + "1"] = conv(1, 1, c_in, cout)
            p[bnb + "1"] = bn(cout)
        c_in = cout
    return p


def test_chain_fused_diff_grads_bitmatch_xla():
    rng = np.random.default_rng(2)
    stage, letters = 2, "ab"
    params = _chain_params(rng, stage, letters, cin=32, m=16, cout=64)
    x = jnp.asarray(rng.standard_normal((1, 16, 128, 32)), jnp.bfloat16)
    cot = jnp.asarray(rng.standard_normal((1, 16, 128, 64)), jnp.bfloat16)

    def loss_fused(p, xx):
        y = resnet._chain_fused_diff(stage, letters, 8, p, xx)
        return jnp.sum(y.astype(jnp.float32) * cot.astype(jnp.float32))

    def loss_xla(p, xx):
        y = xx
        for letter in letters:
            y = resnet._bottleneck(y, p, stage, letter, letter == "a", 1,
                                   jnp.bfloat16, None)
        return jnp.sum(y.astype(jnp.float32) * cot.astype(jnp.float32))

    with pltpu.force_tpu_interpret_mode():
        gp_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    gp_x, gx_x = jax.grad(loss_xla, argnums=(0, 1))(params, x)
    _assert_tree_equal(gp_f, gp_x)
    np.testing.assert_array_equal(np.asarray(gx_f, np.float32),
                                  np.asarray(gx_x, np.float32))


def test_chain_keys_cover_blocks():
    keys = resnet._chain_keys(2, "abc")
    assert "res2a_branch1" in keys and "bn2a_branch1" in keys
    assert "res2b_branch2c" in keys and "res2c_branch2b" in keys
    assert not any("branch1" in k and "2b" in k.split("_")[0][-2:]
                   for k in keys if k.startswith("res2b"))
    assert len(keys) == 2 * (4 + 3 + 3)


def test_make_optimizer_freezes_bn_when_frozen():
    from maskrcnn_tpu.core.config import tiny_test_config
    from maskrcnn_tpu.train.step import make_optimizer

    params = {
        "res2a_branch2a": {"kernel": jnp.zeros((1, 1, 4, 8)),
                           "bias": jnp.zeros((8,))},
        "bn2a_branch2a": {"gamma": jnp.ones((8,)), "beta": jnp.zeros((8,)),
                          "moving_mean": jnp.zeros((8,)),
                          "moving_variance": jnp.ones((8,))},
        "mrcnn_class_logits": {"kernel": jnp.zeros((8, 2)),
                               "bias": jnp.zeros((2,))},
    }
    # batch-BN from-scratch: "all" short-circuits to None (no masking)
    _, mask_fn = make_optimizer(tiny_test_config(), "all")
    assert mask_fn(params) is None
    # frozen-BN fine-tuning: every BN weight masked out, convs still on
    cfg = tiny_test_config().replace(train_bn="frozen")
    _, mask_fn = make_optimizer(cfg, "all")
    mask = mask_fn(params)
    assert mask is not None
    assert all(not v for v in mask["bn2a_branch2a"].values())
    assert all(v for v in mask["res2a_branch2a"].values())
    assert all(v for v in mask["mrcnn_class_logits"].values())
    # and regex freezing still composes with it
    _, mask_fn = make_optimizer(cfg, "heads")
    mask = mask_fn(params)
    assert not any(mask["res2a_branch2a"].values())
    assert all(v for v in mask["mrcnn_class_logits"].values())
