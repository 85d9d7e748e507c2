"""Pallas pyramid ROIAlign vs the XLA flat-gather implementation.

The XLA path is itself oracle-tested against scalar crop_and_resize
(test_roi_align.py), so equality here transitively proves the kernel."""

import numpy as np
import jax.numpy as jnp
import pytest

from maskrcnn_tpu.ops.roi_align import pyramid_roi_align
from maskrcnn_tpu.ops.roi_align_pallas import pyramid_roi_align_pallas

pytestmark = pytest.mark.slow  # compile-heavy Pallas kernel tests

IMAGE_SHAPE = (128, 128)
CANONICAL = 224.0


def make_batched_pyramid(rng, b=2, c=8, base=64):
    return [rng.standard_normal((b, base // (2 ** l), base // (2 ** l), c))
            .astype(np.float32) for l in range(4)]


def mixed_rois(rng, n):
    """Normal + padding + extreme-aspect (slow path) + edge-touching ROIs."""
    yx1 = rng.uniform(0, 0.7, size=(n, 2))
    wh = rng.uniform(0.02, 0.3, size=(n, 2))
    rois = np.concatenate([yx1, np.minimum(yx1 + wh, 1.0)], axis=1)
    rois[0] = 0.0                                # padding row
    rois[1] = [0.4, 0.02, 0.42, 0.98]            # aspect ~48 -> oversize
    rois[2] = [0.02, 0.45, 0.97, 0.47]           # tall sliver
    rois[3] = [0.0, 0.0, 1.0, 1.0]               # full image (P5)
    rois[4] = [0.9, 0.9, 1.0, 1.0]               # bottom-right corner
    rois[5] = [0.0, 0.0, 0.015, 0.015]           # tiny (P2, sub-cell)
    return rois.astype(np.float32)


@pytest.mark.parametrize("crop", [7, 14])
def test_pallas_matches_xla(rng, crop):
    feats = make_batched_pyramid(rng)
    b = feats[0].shape[0]
    rois = np.stack([mixed_rois(rng, 24) for _ in range(b)])

    got = np.asarray(pyramid_roi_align_pallas(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois), crop,
        IMAGE_SHAPE, CANONICAL, interpret=True))

    want = np.stack([
        np.asarray(pyramid_roi_align(
            [jnp.asarray(f[i]) for f in feats], jnp.asarray(rois[i]), crop,
            IMAGE_SHAPE, CANONICAL))
        for i in range(b)])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=3e-5)


def test_pallas_block_override_crop7(rng):
    """block=(16, 32) forces the single-block DMA path for pool-7 (off by
    default per docs/PERF.md negative result #10) — must stay exact."""
    feats = make_batched_pyramid(rng)
    rois = np.stack([mixed_rois(rng, 24)])
    got = np.asarray(pyramid_roi_align_pallas(
        [jnp.asarray(f[:1]) for f in feats], jnp.asarray(rois), 7,
        IMAGE_SHAPE, CANONICAL, interpret=True, block=(16, 32)))
    want = np.asarray(pyramid_roi_align_pallas(
        [jnp.asarray(f[:1]) for f in feats], jnp.asarray(rois), 7,
        IMAGE_SHAPE, CANONICAL, interpret=True, block=(0, 0)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=3e-5)


def test_pallas_chunked_scan_path(rng):
    """More ROIs than one chunk -> the lax.scan path, same results."""
    feats = make_batched_pyramid(rng, b=1, c=8, base=32)
    rois = mixed_rois(rng, 40)[None]
    got = np.asarray(pyramid_roi_align_pallas(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois), 7,
        IMAGE_SHAPE, CANONICAL, chunk=16, interpret=True))
    want = np.asarray(pyramid_roi_align(
        [jnp.asarray(f[0]) for f in feats], jnp.asarray(rois[0]), 7,
        IMAGE_SHAPE, CANONICAL))
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=3e-5)


def test_fused_classifier_head(rng):
    """head_params fusion == pooled -> apply_classifier_head (BN folded)."""
    import jax
    from maskrcnn_tpu.models.heads import (apply_classifier_head,
                                           init_classifier_head)
    from maskrcnn_tpu.ops.roi_align_pallas import (pack_classifier_head,
                                                   unpack_classifier_head)

    c, num_classes = 8, 11
    feats = make_batched_pyramid(rng, b=2, c=c)
    b = feats[0].shape[0]
    rois = np.stack([mixed_rois(rng, 24) for _ in range(b)])
    params = init_classifier_head(jax.random.PRNGKey(3), num_classes,
                                  in_channels=c, pool_size=7, fc_dim=64)
    # non-trivial BN stats so the folding is actually exercised
    for bn in ("mrcnn_class_bn1", "mrcnn_class_bn2"):
        params[bn]["moving_mean"] = jnp.asarray(
            rng.standard_normal(params[bn]["moving_mean"].shape), jnp.float32)
        params[bn]["moving_variance"] = jnp.asarray(
            rng.uniform(0.5, 2.0, params[bn]["moving_variance"].shape),
            jnp.float32)
        params[bn]["gamma"] = jnp.asarray(
            rng.uniform(0.5, 1.5, params[bn]["gamma"].shape), jnp.float32)
        params[bn]["beta"] = jnp.asarray(
            rng.standard_normal(params[bn]["beta"].shape), jnp.float32)

    packed = pack_classifier_head(params, num_classes, dtype=jnp.float32)
    pooled, head_out = pyramid_roi_align_pallas(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois), 7,
        IMAGE_SHAPE, CANONICAL, interpret=True, head_params=packed)
    probs, deltas, logits = unpack_classifier_head(head_out, num_classes)

    flat = pooled.reshape((-1, 7, 7, c))
    want_probs, want_deltas = apply_classifier_head(
        params, flat, num_classes, dtype=jnp.float32)

    np.testing.assert_allclose(np.asarray(probs), np.asarray(want_probs),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(deltas), np.asarray(want_deltas),
                               rtol=2e-4, atol=2e-4)


def test_fused_classifier_head_chunked(rng):
    """Fusion through the lax.scan chunk path + partial-burst flush."""
    import jax
    from maskrcnn_tpu.models.heads import (apply_classifier_head,
                                           init_classifier_head)
    from maskrcnn_tpu.ops.roi_align_pallas import (pack_classifier_head,
                                                   unpack_classifier_head)

    c, num_classes = 8, 5
    feats = make_batched_pyramid(rng, b=1, c=c)
    rois = np.stack([np.concatenate(
        [mixed_rois(rng, 24) for _ in range(4)])])  # 96 ROIs, chunk 64
    params = init_classifier_head(jax.random.PRNGKey(5), num_classes,
                                  in_channels=c, pool_size=7, fc_dim=32)
    packed = pack_classifier_head(params, num_classes, dtype=jnp.float32)
    pooled, head_out = pyramid_roi_align_pallas(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois), 7,
        IMAGE_SHAPE, CANONICAL, interpret=True, head_params=packed,
        chunk=64)
    probs, deltas, _ = unpack_classifier_head(head_out, num_classes)
    want_probs, want_deltas = apply_classifier_head(
        params, pooled.reshape((-1, 7, 7, c)), num_classes,
        dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(want_probs),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(deltas), np.asarray(want_deltas),
                               rtol=2e-4, atol=2e-4)


def test_fused_mask_head(rng):
    """mask_params fusion == pooled -> apply_mask_head(class_ids)."""
    import jax
    from maskrcnn_tpu.models.heads import apply_mask_head, init_mask_head
    from maskrcnn_tpu.ops.roi_align_pallas import (pack_mask_head,
                                                   unpack_masks)

    c, num_classes = 8, 7
    feats = make_batched_pyramid(rng, b=2, c=c)
    b = feats[0].shape[0]
    rois = np.stack([mixed_rois(rng, 24) for _ in range(b)])
    class_ids = jnp.asarray(rng.integers(0, num_classes, (b, 24)), jnp.int32)
    params = init_mask_head(jax.random.PRNGKey(7), num_classes,
                            in_channels=c, channels=c)
    for i in range(1, 5):  # non-trivial BN stats to exercise the folding
        bn = params[f"mrcnn_mask_bn{i}"]
        bn["moving_mean"] = jnp.asarray(
            rng.standard_normal(c) * 0.1, jnp.float32)
        bn["moving_variance"] = jnp.asarray(
            rng.uniform(0.5, 2.0, c), jnp.float32)
        bn["gamma"] = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
        bn["beta"] = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    params["mrcnn_mask_deconv"]["bias"] = jnp.asarray(
        rng.standard_normal(c) * 0.1, jnp.float32)
    params["mrcnn_mask"]["bias"] = jnp.asarray(
        rng.standard_normal(num_classes) * 0.1, jnp.float32)

    packed = pack_mask_head(params, dtype=jnp.float32)
    pooled, mask_raw = pyramid_roi_align_pallas(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois), 14,
        IMAGE_SHAPE, CANONICAL, interpret=True, mask_params=packed,
        class_ids=class_ids)
    masks = unpack_masks(mask_raw, 14)  # (M, 28, 28)

    want = apply_mask_head(params, pooled.reshape((-1, 14, 14, c)),
                           dtype=jnp.float32,
                           class_ids=class_ids.reshape(-1))
    np.testing.assert_allclose(np.asarray(masks), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
