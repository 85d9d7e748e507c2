"""ROI heads: classifier/box head and mask head (Matterport names).

The reference runs these as *separate Core ML models* invoked recursively
from inside custom layers (`Classifier.mlmodel` via
`TimeDistributedClassifierLayer.swift:41-45`, `Mask.mlmodel` via
`TimeDistributedMaskLayer.swift:49-53`) because Core ML cannot express
per-ROI subgraphs inline. Here they are ordinary functions over the pooled
(N, pool, pool, C) batch — the TimeDistributed machinery disappears; the ROI
axis is just a batch axis feeding dense MXU matmuls.

Classifier head (`fpn_classifier_graph`): 7x7 VALID conv to 1024
(`mrcnn_class_conv1` — the "fc" layer), BN, relu; 1x1 conv to 1024
(`mrcnn_class_conv2`), BN, relu; then `mrcnn_class_logits` (softmax over
num_classes) and `mrcnn_bbox_fc` (per-class 4 deltas).

Mask head (`build_fpn_mask_graph`): 4x [3x3 conv 256 + BN + relu]
(`mrcnn_mask_conv1..4`/`mrcnn_mask_bn1..4`), 2x2 stride-2 deconv
(`mrcnn_mask_deconv`, relu), 1x1 conv to num_classes with sigmoid
(`mrcnn_mask`) -> (N, 28, 28, num_classes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from maskrcnn_tpu.models import nn


def init_classifier_head(key, num_classes: int, in_channels: int = 256,
                         pool_size: int = 7, fc_dim: int = 1024) -> nn.Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "mrcnn_class_conv1": nn.conv_init(
            k1, pool_size, pool_size, in_channels, fc_dim),
        "mrcnn_class_bn1": nn.bn_init(fc_dim),
        "mrcnn_class_conv2": nn.conv_init(k2, 1, 1, fc_dim, fc_dim),
        "mrcnn_class_bn2": nn.bn_init(fc_dim),
        "mrcnn_class_logits": nn.dense_init(k3, fc_dim, num_classes),
        "mrcnn_bbox_fc": nn.dense_init(k4, fc_dim, num_classes * 4),
    }


def apply_classifier_head(params, pooled, num_classes: int,
                          dtype=jnp.bfloat16, with_logits: bool = False,
                          bn_ctx=None):
    """(N, pool, pool, C) -> probs (N, num_classes) fp32,
    deltas (N, num_classes, 4) fp32 [, logits fp32 for training losses]."""
    n = pooled.shape[0]
    # The pool x pool VALID conv consumes the whole window: express it as one
    # (N, p*p*C) @ (p*p*C, fc) matmul — identical math (HWIO kernel reshape
    # matches the row-major activation reshape), much better MXU tiling than
    # a 7x7 conv at 1x1 output.
    k1 = params["mrcnn_class_conv1"]
    flat_k = k1["kernel"].reshape(-1, k1["kernel"].shape[-1])
    x = nn.dense(pooled.reshape(n, -1), {"kernel": flat_k, "bias": k1["bias"]},
                 dtype=dtype)
    x = nn.relu(nn.bn_apply(x.astype(jnp.dtype(dtype)), params,
                            "mrcnn_class_bn1", bn_ctx))  # (N, fc)
    # The 1x1 conv on a 1x1 spatial map IS a dense layer — skip the conv
    # lowering entirely.
    k2 = params["mrcnn_class_conv2"]
    x = nn.dense(x, {"kernel": k2["kernel"].reshape(k2["kernel"].shape[-2],
                                                    k2["kernel"].shape[-1]),
                     "bias": k2["bias"]}, dtype=dtype)
    x = nn.relu(nn.bn_apply(x.astype(jnp.dtype(dtype)), params,
                            "mrcnn_class_bn2", bn_ctx))
    shared = x  # (N, fc)

    logits = nn.dense(shared, params["mrcnn_class_logits"],
                      dtype=dtype).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    deltas = nn.dense(shared, params["mrcnn_bbox_fc"], dtype=dtype)
    deltas = deltas.astype(jnp.float32).reshape(n, num_classes, 4)
    if with_logits:
        return probs, deltas, logits
    return probs, deltas


def init_mask_head(key, num_classes: int, in_channels: int = 256,
                   channels: int = 256) -> nn.Params:
    keys = iter(jax.random.split(key, 8))
    params: nn.Params = {}
    cin = in_channels
    for i in range(1, 5):
        params[f"mrcnn_mask_conv{i}"] = nn.conv_init(
            next(keys), 3, 3, cin, channels)
        params[f"mrcnn_mask_bn{i}"] = nn.bn_init(channels)
        cin = channels
    params["mrcnn_mask_deconv"] = nn.conv_init(
        next(keys), 2, 2, channels, channels)
    params["mrcnn_mask"] = nn.conv_init(next(keys), 1, 1, channels,
                                        num_classes)
    return params


def apply_mask_head(params, pooled, dtype=jnp.bfloat16, bn_ctx=None,
                    class_ids=None):
    """(N, pool, pool, C) -> per-class sigmoid masks
    (N, 2*pool, 2*pool, num_classes) fp32.

    With `class_ids` (N,) int32, fuses the per-detection class-channel
    select (`TimeDistributedMaskLayer.swift:71-75`) INTO the final 1x1
    conv: only the detected class's 256-weight column is applied per ROI,
    returning (N, 2*pool, 2*pool) fp32 directly. Identical math to
    computing all num_classes channels and gathering one, but never
    materializes the (N, 2p, 2p, num_classes) tensor (813 MB fp32 at
    batch 32 x 100 detections) — the inference path always knows the
    class before the mask head runs."""
    x = pooled
    for i in range(1, 5):
        x = nn.conv2d(x, params[f"mrcnn_mask_conv{i}"], padding="SAME",
                      dtype=dtype)
        x = nn.relu(nn.bn_apply(x, params, f"mrcnn_mask_bn{i}", bn_ctx))
    x = nn.relu(nn.conv2d_transpose(x, params["mrcnn_mask_deconv"], stride=2,
                                    dtype=dtype))
    if class_ids is not None:
        k = params["mrcnn_mask"]  # kernel (1,1,C,num_classes), bias (nc,)
        kern = k["kernel"].reshape(k["kernel"].shape[-2],
                                   k["kernel"].shape[-1])
        w = jnp.take(kern, class_ids, axis=1).T.astype(jnp.dtype(dtype))
        b = jnp.take(k["bias"], class_ids)  # (N,)
        logits = jnp.einsum("nhwc,nc->nhw", x.astype(jnp.dtype(dtype)), w,
                            preferred_element_type=jnp.float32)
        return jax.nn.sigmoid(logits + b[:, None, None])
    x = nn.conv2d(x, params["mrcnn_mask"], padding="VALID", dtype=dtype)
    return jax.nn.sigmoid(x.astype(jnp.float32))
