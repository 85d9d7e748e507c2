"""Region Proposal Network head, shared across pyramid levels.

Matterport `build_rpn_model` topology/names: 3x3x512 shared conv
(`rpn_conv_shared`, relu), 1x1 class conv (`rpn_class_raw`, 2 logits per
anchor) and 1x1 box conv (`rpn_bbox_pred`, 4 deltas per anchor). Channel
layout per spatial cell is [anchor0(...), anchor1(...), ...] so a row-major
(H, W, apl, ·) reshape matches the anchor table ordering (`core/anchors.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from maskrcnn_tpu.models import nn


def init_rpn(key, in_channels: int = 256, anchors_per_location: int = 3,
             shared_channels: int = 512) -> nn.Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "rpn_conv_shared": nn.conv_init(
            k1, 3, 3, in_channels, shared_channels),
        "rpn_class_raw": nn.conv_init(
            k2, 1, 1, shared_channels, 2 * anchors_per_location),
        "rpn_bbox_pred": nn.conv_init(
            k3, 1, 1, shared_channels, 4 * anchors_per_location),
    }


def apply_rpn_level(params, feature, dtype=jnp.bfloat16):
    """One pyramid level (B, H, W, C) -> logits (B, H*W*apl, 2),
    deltas (B, H*W*apl, 4)."""
    b, h, w, _ = feature.shape
    shared = nn.relu(nn.conv2d(feature, params["rpn_conv_shared"],
                               padding="SAME", dtype=dtype))
    logits = nn.conv2d(shared, params["rpn_class_raw"], padding="VALID",
                       dtype=dtype)
    deltas = nn.conv2d(shared, params["rpn_bbox_pred"], padding="VALID",
                       dtype=dtype)
    apl = logits.shape[-1] // 2
    return (logits.reshape(b, h * w * apl, 2).astype(jnp.float32),
            deltas.reshape(b, h * w * apl, 4).astype(jnp.float32))


def apply_rpn(params, pyramid, dtype=jnp.bfloat16):
    """All levels -> flat (B, A, 2) logits, (B, A, 4) deltas, anchor-ordered
    (levels outer — same contract as the anchor table)."""
    logits, deltas = [], []
    for feature in pyramid:
        lg, dl = apply_rpn_level(params, feature, dtype=dtype)
        logits.append(lg)
        deltas.append(dl)
    return jnp.concatenate(logits, axis=1), jnp.concatenate(deltas, axis=1)
