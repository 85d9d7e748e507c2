"""BN batch-stat training mode + post-training statistics calibration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from maskrcnn_tpu.core.anchors import generate_anchors
from maskrcnn_tpu.core.config import tiny_test_config
from maskrcnn_tpu.models.mask_rcnn import backbone_fpn, init_mask_rcnn, preprocess
from maskrcnn_tpu.train.calibrate import calibrate_bn_stats


@pytest.mark.slow
def test_calibrated_stats_match_batch_behavior(rng):
    cfg = tiny_test_config()
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(generate_anchors(cfg))
    images = rng.uniform(0, 255, (2, 128, 128, 3)).astype(np.float32)

    # Random-init moving stats are (0, 1) — calibration must replace them.
    cal = calibrate_bn_stats(params, [images, images], anchors, cfg)
    assert float(jnp.abs(cal["bn_conv1"]["moving_mean"]).sum()) > 0
    assert not np.allclose(np.asarray(cal["bn_conv1"]["moving_variance"]), 1.0)

    x = preprocess(jnp.asarray(images), cfg)
    # Frozen-stat inference with CALIBRATED stats ~ batch-stat forward on the
    # calibration distribution (same batch -> statistics agree closely).
    batch_mode = backbone_fpn(params, x, cfg, jnp.float32,
                              bn_ctx={"use_batch_stats": True})
    frozen_cal = backbone_fpn(cal, x, cfg, jnp.float32)
    for a, b in zip(batch_mode, frozen_cal):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).mean() + 1e-6
        assert np.abs(a - b).mean() / denom < 0.15

    # ... while the UNCALIBRATED frozen path is far off (the failure mode
    # that made from-scratch checkpoints detect nothing).
    frozen_raw = backbone_fpn(params, x, cfg, jnp.float32)
    worst = np.abs(np.asarray(frozen_raw[0]) - np.asarray(batch_mode[0])).mean()
    best = np.abs(np.asarray(frozen_cal[0]) - np.asarray(batch_mode[0])).mean()
    assert best < worst
