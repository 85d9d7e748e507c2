"""Post-training BatchNorm statistics calibration.

Training from scratch normalizes with live batch statistics
(`config.train_bn == "batch"`); the stored moving_mean/moving_variance are
never touched and still hold their (0, 1) init. Before such a model can run
the frozen-stat inference path, the moving statistics must be re-estimated —
the standard "precise BN" recalibration: run K batches through the network
in batch-stat mode, collect every BN layer's input statistics, aggregate
(mean of means; variance via the law of total variance), and write them into
the parameter pytree.

The collection pass reproduces the training forward (backbone + heads on
pooled ROIs) so head BNs see realistic inputs too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tpu.core.config import MaskRCNNConfig
from maskrcnn_tpu.models import heads as heads_mod
from maskrcnn_tpu.models import rpn as rpn_mod
from maskrcnn_tpu.models.mask_rcnn import backbone_fpn, preprocess
from maskrcnn_tpu.ops.proposals import generate_proposals
from maskrcnn_tpu.ops.roi_align import (build_flat_pyramid,
                                        pyramid_roi_align_flat)


@functools.partial(jax.jit, static_argnames=("config",))
def _collect_stats(params, images, anchors, config: MaskRCNNConfig):
    """One batch -> {bn_layer_name: (mean, var)} using batch statistics."""
    dtype = jnp.dtype(config.compute_dtype)
    b = images.shape[0]
    image_hw = (config.image_height, config.image_width)
    collect: dict = {}
    bn_ctx = {"use_batch_stats": True, "collect": collect}

    x = preprocess(images, config)
    pyramid = backbone_fpn(params, x, config, dtype, bn_ctx=bn_ctx,
                           inference=False)
    rpn_logits, rpn_deltas = rpn_mod.apply_rpn(params, pyramid, dtype=dtype)
    fg = rpn_logits[..., 1] - rpn_logits[..., 0]
    propose = functools.partial(
        generate_proposals,
        bbox_std_dev=config.bbox_std_dev,
        pre_nms_max_proposals=config.pre_nms_max_proposals,
        max_proposals=config.max_proposals,
        nms_threshold=config.proposal_nms_threshold,
        topk_recall=config.proposal_topk_recall)
    rois, _ = jax.vmap(propose, in_axes=(0, 0, None))(fg, rpn_deltas, anchors)

    flat_pyr = jax.vmap(lambda *f: build_flat_pyramid(f))(*pyramid[:4])
    pooled = jax.vmap(lambda f, r: pyramid_roi_align_flat(
        f, r, config.pool_size, image_hw,
        config.roi_canonical_scale))(flat_pyr, rois)
    heads_mod.apply_classifier_head(
        params, pooled.reshape((-1,) + pooled.shape[2:]), config.num_classes,
        dtype=dtype, bn_ctx=bn_ctx)
    mask_pooled = jax.vmap(lambda f, r: pyramid_roi_align_flat(
        f, r, config.mask_pool_size, image_hw,
        config.roi_canonical_scale))(flat_pyr, rois)
    heads_mod.apply_mask_head(
        params, mask_pooled.reshape((-1,) + mask_pooled.shape[2:]),
        dtype=dtype, bn_ctx=bn_ctx)
    return collect


def calibrate_bn_stats(params, image_batches, anchors,
                       config: MaskRCNNConfig):
    """Estimate fresh moving statistics from `image_batches` (iterable of
    (B, S, S, 3) arrays) and return an updated params pytree."""
    sums: dict[str, np.ndarray] = {}
    sq_sums: dict[str, np.ndarray] = {}
    count = 0
    for images in image_batches:
        stats = jax.device_get(
            _collect_stats(params, jnp.asarray(images), anchors, config))
        for name, (mean, var) in stats.items():
            mean = np.asarray(mean, np.float64)
            var = np.asarray(var, np.float64)
            sums[name] = sums.get(name, 0.0) + mean
            # E[x^2] = var + mean^2 (law of total variance across batches)
            sq_sums[name] = sq_sums.get(name, 0.0) + var + mean * mean
        count += 1
    if count == 0:
        raise ValueError("no calibration batches provided")

    new_params = dict(params)
    for name in sums:
        mean = sums[name] / count
        var = np.maximum(sq_sums[name] / count - mean * mean, 0.0)
        layer = dict(new_params[name])
        layer["moving_mean"] = jnp.asarray(mean, jnp.float32)
        layer["moving_variance"] = jnp.asarray(var, jnp.float32)
        new_params[name] = layer
    return new_params
