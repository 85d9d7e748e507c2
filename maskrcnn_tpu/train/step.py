"""End-to-end Mask-RCNN training step (jit, static shapes, optax).

The reference cannot train at all (`TrainCommand.swift:4-15` is a stub).
This module implements the full two-stage training objective — RPN class +
box losses over balanced anchor samples, and head class/box/mask losses over
sampled proposals — as one differentiable jitted step. SGD + momentum with
weight decay and global-norm clipping (the Matterport recipe: lr 1e-3,
momentum 0.9, decay 1e-4, clip 5.0), with optional layer-freezing by name
prefix for stage-wise fine-tuning ("heads" → "all").
"""

from __future__ import annotations

import functools
import re
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from maskrcnn_tpu.core.config import MaskRCNNConfig
from maskrcnn_tpu.models import heads as heads_mod
from maskrcnn_tpu.models import rpn as rpn_mod
from maskrcnn_tpu.models.mask_rcnn import backbone_fpn, preprocess
from maskrcnn_tpu.ops.proposals import generate_proposals
from maskrcnn_tpu.ops.roi_align import (build_flat_pyramid,
                                        pyramid_roi_align_flat)
from maskrcnn_tpu.train import losses as L
from maskrcnn_tpu.train.targets import proposal_targets, rpn_targets

# Matterport's stage-wise fine-tuning layer regexes ("heads", "3+", ...).
FREEZE_PRESETS = {
    "all": r".*",
    "heads": r"(mrcnn_.*|rpn_.*|fpn_.*)",
    "3+": r"(res3.*|bn3.*|res4.*|bn4.*|res5.*|bn5.*|mrcnn_.*|rpn_.*|fpn_.*)",
    "4+": r"(res4.*|bn4.*|res5.*|bn5.*|mrcnn_.*|rpn_.*|fpn_.*)",
    "5+": r"(res5.*|bn5.*|mrcnn_.*|rpn_.*|fpn_.*)",
}


def compute_losses(params, batch: dict[str, jnp.ndarray],
                   anchors: jnp.ndarray, config: MaskRCNNConfig,
                   key: jax.Array):
    """Forward + all five losses for one batch.

    batch: images (B,S,S,3) RGB [0,255]; gt_boxes (B,G,4) normalized;
    gt_class_ids (B,G) int32 (0 = pad); gt_masks (B,G,M,M) mini-masks.
    Returns (total_loss, metrics dict).
    """
    dtype = jnp.dtype(config.compute_dtype)
    b = batch["images"].shape[0]
    image_hw = (config.image_height, config.image_width)

    bn_ctx = ({"use_batch_stats": True} if config.train_bn == "batch"
              else None)
    x = preprocess(batch["images"], config)
    backbone = functools.partial(backbone_fpn, config=config, dtype=dtype,
                                 bn_ctx=bn_ctx, inference=False)
    if config.train_remat_backbone:
        backbone = jax.checkpoint(backbone)
    pyramid = backbone(params, x)
    rpn_logits, rpn_deltas = rpn_mod.apply_rpn(params, pyramid, dtype=dtype)

    gt_valid = batch["gt_class_ids"] > 0

    # --- RPN targets + losses (per image) ---------------------------------
    keys = jax.random.split(key, b * 2).reshape(b, 2, 2)
    rpn_t = jax.vmap(
        functools.partial(
            rpn_targets,
            train_anchors=config.rpn_train_anchors_per_image,
            bbox_std_dev=config.bbox_std_dev,
            sampling_topk=config.train_sampling_topk),
        in_axes=(None, 0, 0, 0))(
        anchors, batch["gt_boxes"], batch["gt_class_ids"], keys[:, 0])

    loss_rpn_cls = jax.vmap(L.rpn_class_loss)(rpn_logits, rpn_t.labels).mean()
    loss_rpn_box = jax.vmap(L.rpn_bbox_loss)(
        rpn_deltas, rpn_t.pos_deltas, rpn_t.pos_idx, rpn_t.pos_valid).mean()

    # --- proposals (no gradient through NMS/decode, as in Matterport) -----
    fg = jax.nn.softmax(rpn_logits, axis=-1)[..., 1]
    propose = functools.partial(
        generate_proposals,
        bbox_std_dev=config.bbox_std_dev,
        pre_nms_max_proposals=config.pre_nms_max_proposals,
        max_proposals=config.max_proposals,
        nms_threshold=config.proposal_nms_threshold,
        topk_recall=config.proposal_topk_recall)
    rois, roi_valid = jax.vmap(propose, in_axes=(0, 0, None))(
        jax.lax.stop_gradient(fg), jax.lax.stop_gradient(rpn_deltas), anchors)

    # Append GT boxes to the proposal pool for target sampling (the standard
    # bootstrap: until the RPN produces high-IoU proposals, the heads would
    # otherwise see no positives at all and learn pure background — observed
    # as a converged-looking run that never detects anything).
    rois = jnp.concatenate([rois, batch["gt_boxes"]], axis=1)
    roi_valid = jnp.concatenate([roi_valid, gt_valid], axis=1)

    # --- sample proposals + targets ---------------------------------------
    sample = functools.partial(
        proposal_targets,
        num_rois=config.train_rois_per_image,
        positive_fraction=config.roi_positive_ratio,
        mask_size=config.mask_size,
        bbox_std_dev=config.bbox_std_dev)
    tgt = jax.vmap(sample)(
        rois, roi_valid, batch["gt_boxes"], batch["gt_class_ids"],
        batch["gt_masks"], keys[:, 1])

    t = config.train_rois_per_image
    flat_pyr = jax.vmap(lambda *f: build_flat_pyramid(f))(*pyramid[:4])

    align_cls = functools.partial(
        pyramid_roi_align_flat, crop_size=config.pool_size,
        image_shape=image_hw, canonical_scale=config.roi_canonical_scale)
    pooled = jax.vmap(lambda f, r: align_cls(f, r))(flat_pyr, tgt.rois)
    _, pred_deltas, cls_logits = heads_mod.apply_classifier_head(
        params, pooled.reshape((b * t,) + pooled.shape[2:]),
        config.num_classes, dtype=dtype, with_logits=True, bn_ctx=bn_ctx)

    flat_class = tgt.class_ids.reshape(b * t)
    loss_cls = L.mrcnn_class_loss(
        cls_logits, flat_class, tgt.roi_valid.reshape(b * t))
    loss_box = L.mrcnn_bbox_loss(
        pred_deltas, tgt.deltas.reshape(b * t, 4), flat_class)

    # --- mask head on the same sampled rois -------------------------------
    align_mask = functools.partial(
        pyramid_roi_align_flat, crop_size=config.mask_pool_size,
        image_shape=image_hw, canonical_scale=config.roi_canonical_scale)
    mask_pooled = jax.vmap(lambda f, r: align_mask(f, r))(flat_pyr, tgt.rois)
    pred_masks = heads_mod.apply_mask_head(
        params, mask_pooled.reshape((b * t,) + mask_pooled.shape[2:]),
        dtype=dtype, bn_ctx=bn_ctx)  # (B*T, m, m, C)
    loss_mask = L.mrcnn_mask_loss(
        pred_masks, tgt.masks.reshape(b * t, config.mask_size,
                                      config.mask_size), flat_class)

    total = loss_rpn_cls + loss_rpn_box + loss_cls + loss_box + loss_mask
    metrics = {
        "loss": total,
        "rpn_class_loss": loss_rpn_cls,
        "rpn_bbox_loss": loss_rpn_box,
        "mrcnn_class_loss": loss_cls,
        "mrcnn_bbox_loss": loss_box,
        "mrcnn_mask_loss": loss_mask,
    }
    return total, metrics


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(config: MaskRCNNConfig, trainable: str = "all"):
    """SGD+momentum with decoupled weight decay on kernels and a layer-name
    trainability mask (Matterport's layer-regex freezing).

    With `config.train_bn == "frozen"` every BatchNorm layer is frozen
    entirely (gamma/beta/moving stats) regardless of the layer regex —
    Matterport sets `layer.trainable = False` on all BN layers in that
    recipe, and the frozen-stats forward otherwise backprops nonzero
    gradients INTO the moving statistics (they are inputs to the normalize),
    which gradient descent must never update."""
    pattern = re.compile(FREEZE_PRESETS.get(trainable, trainable))
    freeze_bn = config.train_bn == "frozen"
    freeze_nothing = trainable == "all" and not freeze_bn

    def _is_bn(weights) -> bool:
        return set(weights) <= {"gamma", "beta",
                                "moving_mean", "moving_variance"}

    def trainable_mask(params):
        if freeze_nothing:
            return None  # train_step skips the 690-leaf grad multiply
        return {
            layer: {w: bool(pattern.fullmatch(layer))
                    and not (freeze_bn and _is_bn(weights))
                    for w in weights}
            for layer, weights in params.items()
        }

    def decay_mask(params):
        return {
            layer: {w: (w == "kernel" and bool(pattern.fullmatch(layer)))
                    for w in weights}
            for layer, weights in params.items()
        }

    # bf16 momentum (config.train_momentum_dtype) halves optimizer-state
    # HBM footprint/traffic; optax.trace rounds the accumulator each step
    # while the param update itself stays f32 (master params inherent).
    acc_dtype = (jnp.bfloat16
                 if config.train_momentum_dtype == "bfloat16" else None)
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.add_decayed_weights(config.weight_decay, mask=decay_mask),
        optax.sgd(config.learning_rate, momentum=0.9,
                  accumulator_dtype=acc_dtype),
    )
    # Freezing is applied by zeroing grads with trainable_mask in train_step.
    return tx, trainable_mask


def make_train_state(params, config: MaskRCNNConfig,
                     trainable: str = "all") -> tuple[TrainState, Any]:
    tx, mask_fn = make_optimizer(config, trainable)
    opt_state = tx.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32)), (tx,
                                                                     mask_fn)


@functools.partial(jax.jit, static_argnames=("config", "tx_and_mask"))
def train_step(state: TrainState, batch, anchors, key,
               config: MaskRCNNConfig, tx_and_mask):
    """One SGD step. `tx_and_mask` must be the static (tx, mask_fn) pair
    returned by `make_train_state` (hashable via closure identity)."""
    tx, mask_fn = tx_and_mask

    def loss_fn(p):
        return compute_losses(p, batch, anchors, config, key)

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    mask = mask_fn(state.params)
    if mask is not None:
        grads = jax.tree.map(
            lambda g, m: g * jnp.asarray(m, g.dtype), grads, mask)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), metrics
