"""Mask-RCNN loss functions (Matterport formulation), mask-weighted.

All losses are mean-over-valid with explicit validity masks instead of
dynamic filtering — the static-shape discipline of the inference path
carries over to training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(diff: jnp.ndarray) -> jnp.ndarray:
    ad = jnp.abs(diff)
    return jnp.where(ad < 1.0, 0.5 * ad * ad, ad - 0.5)


def _mean_over(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def rpn_class_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """(A, 2) logits vs (A,) labels in {1 pos, -1 neg, 0 ignore}."""
    target = (labels == 1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, target[:, None], axis=-1)[:, 0]
    return _mean_over(nll, labels != 0)


def rpn_bbox_loss(pred: jnp.ndarray, pos_deltas: jnp.ndarray,
                  pos_idx: jnp.ndarray,
                  pos_valid: jnp.ndarray) -> jnp.ndarray:
    """(A, 4) predicted deltas vs (K, 4) targets at the K sampled positive
    slots (`RPNTargets.pos_idx`) — identical to a mean over labels == 1,
    but reads only the K rows the loss actually uses."""
    sel = jnp.take(pred, pos_idx, axis=0).astype(jnp.float32)
    per = jnp.sum(smooth_l1(sel - pos_deltas), axis=-1)
    return _mean_over(per, pos_valid)


def mrcnn_class_loss(probs_logits: jnp.ndarray, class_ids: jnp.ndarray,
                     valid: jnp.ndarray) -> jnp.ndarray:
    """(T, C) class logits vs (T,) targets (0 = background), over valid rois."""
    logp = jax.nn.log_softmax(probs_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, class_ids[:, None], axis=-1)[:, 0]
    return _mean_over(nll, valid)


def mrcnn_bbox_loss(pred_deltas: jnp.ndarray, target_deltas: jnp.ndarray,
                    class_ids: jnp.ndarray) -> jnp.ndarray:
    """(T, C, 4) per-class predictions; loss at the target class, positives
    (class > 0) only."""
    t = pred_deltas.shape[0]
    sel = jnp.take_along_axis(
        pred_deltas.astype(jnp.float32),
        class_ids[:, None, None].repeat(4, axis=2), axis=1)[:, 0]
    per = jnp.sum(smooth_l1(sel - target_deltas), axis=-1)
    return _mean_over(per, class_ids > 0)


def mrcnn_mask_loss(pred_masks: jnp.ndarray, target_masks: jnp.ndarray,
                    class_ids: jnp.ndarray) -> jnp.ndarray:
    """(T, m, m, C) sigmoid masks; binary CE at the target class channel,
    positives only."""
    sel = jnp.take_along_axis(
        pred_masks.astype(jnp.float32),
        class_ids[:, None, None, None], axis=-1)[..., 0]  # (T, m, m)
    eps = 1e-7
    sel = jnp.clip(sel, eps, 1.0 - eps)
    bce = -(target_masks * jnp.log(sel)
            + (1.0 - target_masks) * jnp.log(1.0 - sel))
    per = jnp.mean(bce, axis=(1, 2))
    return _mean_over(per, class_ids > 0)
