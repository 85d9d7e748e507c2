"""Model graph tests: layer semantics, shapes, full-forward smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maskrcnn_tpu.core.anchors import generate_anchors
from maskrcnn_tpu.core.config import tiny_test_config
from maskrcnn_tpu.models import nn
from maskrcnn_tpu.models.mask_rcnn import forward, init_mask_rcnn
from maskrcnn_tpu.models.resnet import apply_resnet, init_resnet
from maskrcnn_tpu.models.fpn import apply_fpn, init_fpn
from maskrcnn_tpu.models.rpn import apply_rpn, init_rpn


def test_conv2d_transpose_is_keras_deconv(rng):
    # For kernel == stride == 2 (the mask-head deconv), Keras Conv2DTranspose
    # computes out[2i+di, 2j+dj, o] = sum_c in[i,j,c] * K[di,dj,c,o] with our
    # HWIO kernel layout. Verify numerically.
    x = rng.standard_normal((1, 3, 3, 4)).astype(np.float32)
    k = rng.standard_normal((2, 2, 4, 5)).astype(np.float32)
    p = {"kernel": jnp.asarray(k), "bias": jnp.zeros(5)}
    out = np.asarray(nn.conv2d_transpose(
        jnp.asarray(x), p, stride=2, dtype=jnp.float32))
    want = np.zeros((1, 6, 6, 5), np.float32)
    for i in range(3):
        for j in range(3):
            for di in range(2):
                for dj in range(2):
                    want[0, 2 * i + di, 2 * j + dj] += x[0, i, j] @ k[di, dj]
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_upsample2x_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = np.asarray(nn.upsample2x_nearest(x))[0, :, :, 0]
    np.testing.assert_array_equal(
        y, [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]])


def test_batch_norm_inference(rng):
    x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    p = {"gamma": jnp.full(8, 2.0), "beta": jnp.full(8, 1.0),
         "moving_mean": jnp.full(8, 0.5), "moving_variance": jnp.full(8, 4.0)}
    y = np.asarray(nn.batch_norm(jnp.asarray(x), p, eps=0.0))
    np.testing.assert_allclose(y, (x - 0.5) / 2.0 * 2.0 + 1.0, rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("arch,n_params", [("resnet50", 106), ("resnet101", 208)])
def test_resnet_param_count(arch, n_params):
    params = init_resnet(jax.random.PRNGKey(0), arch)
    # Layer-name count: conv1+bn_conv1 (2) + 6 per bottleneck block
    # (+2 extra for the 4 conv blocks' shortcut): r50 2+16*6+8=106,
    # r101 2+33*6+8=208.
    assert len(params) == n_params, len(params)
    assert "res2a_branch1" in params
    if arch == "resnet101":
        assert "res4w_branch2c" in params  # 22 identity blocks end at 'w'
    else:
        assert "res4f_branch2c" in params


def test_backbone_fpn_rpn_shapes(rng):
    cfg = tiny_test_config()
    key = jax.random.PRNGKey(0)
    p = {}
    p.update(init_resnet(key, cfg.architecture))
    p.update(init_fpn(key, cfg.fpn_channels))
    p.update(init_rpn(key, cfg.fpn_channels, cfg.anchors_per_location))
    img = jnp.asarray(rng.uniform(-128, 128, (1, 128, 128, 3)), jnp.float32)
    c2, c3, c4, c5 = apply_resnet(p, img, cfg.architecture)
    assert c2.shape == (1, 32, 32, 256)
    assert c5.shape == (1, 4, 4, 2048)
    pyr = apply_fpn(p, c2, c3, c4, c5)
    for lvl, (fh, fw) in zip(pyr, cfg.feature_shapes):
        assert lvl.shape == (1, fh, fw, cfg.fpn_channels), (lvl.shape, fh, fw)
    logits, deltas = apply_rpn(p, pyr)
    assert logits.shape == (1, cfg.num_anchors, 2)
    assert deltas.shape == (1, cfg.num_anchors, 4)


def test_full_forward_smoke(rng):
    cfg = tiny_test_config()
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(generate_anchors(cfg))
    images = jnp.asarray(rng.uniform(0, 255, (2, 128, 128, 3)), jnp.float32)

    out = forward(params, images, anchors, cfg)
    # Random init must produce live proposals (guards against activation
    # blow-up making every decoded box NaN/degenerate).
    assert np.asarray(out["roi_valid"]).sum() > 0
    assert out["detections"].shape == (2, cfg.max_detections, 6)
    assert out["masks"].shape == (2, cfg.max_detections, cfg.mask_size,
                                  cfg.mask_size)
    assert out["rois"].shape == (2, cfg.max_proposals, 4)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v, np.float32)).all(), k
    det = np.asarray(out["detections"])
    valid = np.asarray(out["valid"])
    # Invalid rows are fully zero; valid rows have class_id >= 1.
    assert (det[~valid] == 0).all()
    if valid.any():
        assert (det[valid][:, 4] >= 1).all()
    # Masks in [0,1], padding rows zero.
    masks = np.asarray(out["masks"])
    assert masks.min() >= 0.0 and masks.max() <= 1.0
    assert (masks[~valid] == 0).all()

    # Determinism: same input twice -> bitwise-identical detections.
    out2 = forward(params, images, anchors, cfg)
    np.testing.assert_array_equal(det, np.asarray(out2["detections"]))


def test_mask_head_fused_class_select_matches_gather(rng):
    """The class_ids-fused final 1x1 conv must equal computing all class
    channels and gathering (TimeDistributedMaskLayer.swift:71-75)."""
    from maskrcnn_tpu.models import heads

    num_classes, n, pool, c = 7, 12, 14, 32
    params = heads.init_mask_head(jax.random.PRNGKey(3), num_classes,
                                  in_channels=c, channels=c)
    pooled = jnp.asarray(rng.standard_normal((n, pool, pool, c)), jnp.float32)
    class_ids = jnp.asarray(rng.integers(0, num_classes, n), jnp.int32)

    all_masks = heads.apply_mask_head(params, pooled, dtype=jnp.float32)
    gathered = np.take_along_axis(
        np.asarray(all_masks), np.asarray(class_ids)[:, None, None, None],
        axis=-1)[..., 0]
    fused = heads.apply_mask_head(params, pooled, dtype=jnp.float32,
                                  class_ids=class_ids)
    assert fused.shape == (n, 2 * pool, 2 * pool)
    np.testing.assert_allclose(np.asarray(fused), gathered,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_training_backbone_never_uses_pallas_kernels(rng, monkeypatch):
    """Frozen-BN fine-tuning has bn_ctx=None but still differentiates the
    backbone; inference=False must keep it off the (non-differentiable)
    Pallas kernels even where they'd otherwise be selected."""
    from maskrcnn_tpu.models.mask_rcnn import backbone_fpn
    from maskrcnn_tpu.ops import bottleneck_pallas, stem_pallas

    monkeypatch.setattr(stem_pallas, "stem_supported",
                        lambda *a, **k: True)
    monkeypatch.setattr(bottleneck_pallas, "chain_supported",
                        lambda *a, **k: True)
    # Fail loudly if the kernels are reached anyway.
    monkeypatch.setattr(stem_pallas, "apply_stem_pallas",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("stem kernel in training graph")))
    monkeypatch.setattr(bottleneck_pallas, "fused_bottleneck_chain",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("chain kernel in training graph")))

    cfg = tiny_test_config()
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)), jnp.float32)

    def loss(p):
        pyr = backbone_fpn(p, x, cfg, jnp.float32, bn_ctx=None,
                           inference=False)
        return sum(jnp.sum(f.astype(jnp.float32) ** 2) for f in pyr)

    g = jax.grad(loss)(params)
    assert np.isfinite(float(jax.tree.reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, jnp.float32(0))))
