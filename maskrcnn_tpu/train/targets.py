"""In-graph, static-shape training target assignment.

Training is a capability the reference explicitly lacks — its `train`
subcommand prints "Coming soon" (`Sources/maskrcnn/TrainCommand.swift:4-15`,
`README.md:130-132`). This module implements the Matterport-style two-stage
target assignment entirely under jit: no dynamic shapes, no host round trips.
All "sampling" is fixed-size index selection via `top_k` over masked random
scores, with validity masks instead of filtering.

Ground truth arrives padded: boxes (G, 4) normalized y1x1y2x2, class ids
(G,) int32 (0 = padding slot, NEGATIVE = crowd region — excluded from
matching, and anchors/proposals overlapping a crowd are neutralized rather
than trained as negatives, the Matterport convention), and instance masks as
mini-masks (G, M, M) in gt-box-relative coordinates (the memory-efficient
convention — a full-size mask per instance would be 1024² each).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from maskrcnn_tpu.ops.boxes import box_iou


def encode_box_deltas(boxes: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `apply_box_deltas`: the (dy, dx, log dh, log dw) that maps
    `boxes` onto `gt`. Shapes (..., 4)."""
    h = boxes[..., 2] - boxes[..., 0]
    w = boxes[..., 3] - boxes[..., 1]
    cy = boxes[..., 0] + 0.5 * h
    cx = boxes[..., 1] + 0.5 * w
    gh = gt[..., 2] - gt[..., 0]
    gw = gt[..., 3] - gt[..., 1]
    gcy = gt[..., 0] + 0.5 * gh
    gcx = gt[..., 1] + 0.5 * gw
    h = jnp.maximum(h, 1e-8)
    w = jnp.maximum(w, 1e-8)
    return jnp.stack([
        (gcy - cy) / h,
        (gcx - cx) / w,
        jnp.log(jnp.maximum(gh, 1e-8) / h),
        jnp.log(jnp.maximum(gw, 1e-8) / w),
    ], axis=-1)


class RPNTargets(NamedTuple):
    labels: jnp.ndarray      # (A,) int32: 1 pos, -1 neg, 0 neutral/unsampled
    pos_idx: jnp.ndarray     # (K,) int32 — sampled positive anchor slots
    pos_valid: jnp.ndarray   # (K,) bool — which pos_idx rows are real
    pos_deltas: jnp.ndarray  # (K, 4) fp32 — valid where pos_valid


def rpn_targets(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_class_ids: jnp.ndarray,
    key: jax.Array,
    *,
    train_anchors: int = 256,
    positive_fraction: float = 0.5,
    pos_iou: float = 0.7,
    neg_iou: float = 0.3,
    crowd_iou: float = 0.001,
    bbox_std_dev=(0.1, 0.1, 0.2, 0.2),
    sampling_topk: str = "approx",
) -> RPNTargets:
    """Label anchors against GT and subsample a balanced training set.

    Matterport semantics: an anchor is positive if IoU >= pos_iou with any
    real GT *or* it is the best anchor for some GT; negative if max IoU <
    neg_iou AND it does not overlap a crowd region (class id < 0) — crowd
    anchors are neutral, never hard negatives; neutral otherwise. At most
    `train_anchors * positive_fraction` positives are kept and negatives
    back-fill to the full `train_anchors` quota when positives are scarce;
    unsampled anchors get label 0.

    Box-delta targets are materialized ONLY at the K = train_anchors ×
    positive_fraction sampled positive slots (`pos_idx`/`pos_deltas`), not
    for all A anchors: the bbox loss never reads the other A − K rows, and
    the full-A matched-GT gather + encode they'd require measured 75% of
    this stage's cost at A = 262k (per-index-bound gather, ~14 ns × 262k —
    docs/rpn_targets_probe_r03.json). `sampling_topk` selects the
    subsample ranking kernel (see `MaskRCNNConfig.train_sampling_topk`).
    """
    a = anchors.shape[0]
    full_iou = box_iou(anchors, gt_boxes)  # (A, G)
    fg = (gt_class_ids > 0)[None, :]
    crowd = (gt_class_ids < 0)[None, :]
    iou = full_iou * fg.astype(full_iou.dtype)
    crowd_overlap = jnp.max(full_iou * crowd.astype(full_iou.dtype), axis=1)

    max_iou = jnp.max(iou, axis=1)
    argmax_gt = jnp.argmax(iou, axis=1)

    # Best anchor per GT is positive regardless of threshold (ties included,
    # Matterport keeps all anchors sharing the max IoU per GT).
    per_gt_best = jnp.max(iou, axis=0, keepdims=True)  # (1, G)
    is_best_for_gt = jnp.any(
        (iou >= per_gt_best - 1e-7) & (per_gt_best > 0.0), axis=1)

    pos = (max_iou >= pos_iou) | is_best_for_gt
    neg = (max_iou < neg_iou) & ~pos & (crowd_overlap < crowd_iou)

    # Fixed-size balanced subsample via randomized top-k; negatives back-fill
    # dynamically to train_anchors total when positives are scarce.
    k_pos = int(train_anchors * positive_fraction)
    kp, kn = jax.random.split(key)
    rand_p = jax.random.uniform(kp, (a,))
    rand_n = jax.random.uniform(kn, (a,))

    pos_score = jnp.where(pos, rand_p, -1.0)
    neg_score = jnp.where(neg, rand_n, -1.0)
    select = (jax.lax.top_k if sampling_topk == "exact"
              else jax.lax.approx_max_k)
    _, pos_idx = select(pos_score, min(k_pos, a))
    pos_sampled = jnp.zeros((a,), jnp.bool_).at[pos_idx].set(True) & pos
    n_pos = jnp.sum(pos_sampled.astype(jnp.int32))

    k_neg_max = min(train_anchors, a)
    _, neg_idx = select(neg_score, k_neg_max)
    take = jnp.arange(k_neg_max) < (train_anchors - n_pos)
    neg_sampled = jnp.zeros((a,), jnp.bool_).at[neg_idx].set(take) & neg

    labels = jnp.where(pos_sampled, 1, jnp.where(neg_sampled, -1, 0))

    # Deltas at the sampled positive slots only (see docstring): K-row
    # gathers instead of an A-row gather + A-row encode.
    pos_valid = jnp.take(pos_sampled, pos_idx)
    sel_anchors = jnp.take(anchors, pos_idx, axis=0)
    sel_gt = jnp.take(gt_boxes, jnp.take(argmax_gt, pos_idx), axis=0)
    std = jnp.asarray(bbox_std_dev, jnp.float32)
    pos_deltas = encode_box_deltas(sel_anchors, sel_gt) / std
    pos_deltas = pos_deltas * pos_valid[:, None]
    return RPNTargets(labels.astype(jnp.int32), pos_idx.astype(jnp.int32),
                      pos_valid, pos_deltas.astype(jnp.float32))


class ProposalTargets(NamedTuple):
    rois: jnp.ndarray          # (T, 4) sampled proposals
    roi_valid: jnp.ndarray     # (T,) bool — real sampled rois
    class_ids: jnp.ndarray     # (T,) int32 target class (0 = background/pad)
    deltas: jnp.ndarray        # (T, 4) — valid where class_ids > 0
    masks: jnp.ndarray         # (T, m, m) {0,1} targets — valid where class>0
    positive: jnp.ndarray      # (T,) bool


def _crop_minimask(minimask, rel_box, out_size):
    """Bilinear-sample a (M, M) gt mini-mask at a roi box given in gt-box
    relative coords -> (out, out). crop_and_resize grid with ZERO
    extrapolation outside the gt box — edge-clamping would replicate the
    (foreground-bearing, since COCO boxes are tight) border rows across any
    ROI overhang and train the mask head to extend masks past objects."""
    m = minimask.shape[0]
    y1, x1, y2, x2 = rel_box[0], rel_box[1], rel_box[2], rel_box[3]
    steps = jnp.arange(out_size, dtype=jnp.float32) / max(out_size - 1, 1)
    ys = (y1 + steps * (y2 - y1)) * (m - 1)
    xs = (x1 + steps * (x2 - x1)) * (m - 1)
    y_in = (ys >= 0.0) & (ys <= m - 1.0)
    x_in = (xs >= 0.0) & (xs <= m - 1.0)
    ys = jnp.clip(ys, 0.0, m - 1.0)
    xs = jnp.clip(xs, 0.0, m - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, m - 1)
    x1i = jnp.minimum(x0 + 1, m - 1)
    wy = ys - y0
    wx = xs - x0
    g = minimask.astype(jnp.float32)
    top = g[y0][:, x0] * (1 - wx)[None, :] + g[y0][:, x1i] * wx[None, :]
    bot = g[y1i][:, x0] * (1 - wx)[None, :] + g[y1i][:, x1i] * wx[None, :]
    out = top * (1 - wy)[:, None] + bot * wy[:, None]
    return out * (y_in[:, None] & x_in[None, :])


@functools.partial(
    jax.jit,
    static_argnames=("num_rois", "mask_size", "positive_fraction"))
def proposal_targets(
    proposals: jnp.ndarray,
    proposal_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_class_ids: jnp.ndarray,
    gt_minimasks: jnp.ndarray,
    key: jax.Array,
    *,
    num_rois: int = 200,
    positive_fraction: float = 0.33,
    pos_iou: float = 0.5,
    mask_size: int = 28,
    bbox_std_dev=(0.1, 0.1, 0.2, 0.2),
) -> ProposalTargets:
    """Sample proposals into a fixed-size training set with targets.

    Positives (IoU >= 0.5 with some GT) up to num_rois*positive_fraction;
    negatives (IoU < 0.5) fill the remainder. Positive rois get the matched
    GT's class, encoded deltas, and the GT mini-mask cropped to the roi.
    """
    gt_valid = gt_class_ids > 0
    full_iou = box_iou(proposals, gt_boxes)
    iou = full_iou * gt_valid[None, :]
    crowd = (gt_class_ids < 0)[None, :]
    crowd_overlap = jnp.max(full_iou * crowd.astype(full_iou.dtype), axis=1)
    max_iou = jnp.max(iou, axis=1)
    argmax_gt = jnp.argmax(iou, axis=1)

    pos = (max_iou >= pos_iou) & proposal_valid
    # proposals inside crowd regions are neither positives nor negatives
    # (Matterport's crowd exclusion)
    neg = (max_iou < pos_iou) & proposal_valid & (crowd_overlap < 0.001)

    k_pos = int(round(num_rois * positive_fraction))
    k_neg = num_rois - k_pos
    kp, kn = jax.random.split(key)
    p = proposals.shape[0]
    pos_score = jnp.where(pos, jax.random.uniform(kp, (p,)), -1.0)
    neg_score = jnp.where(neg, jax.random.uniform(kn, (p,)), -1.0)
    _, pos_idx = jax.lax.top_k(pos_score, min(k_pos, p))
    _, neg_idx = jax.lax.top_k(neg_score, min(k_neg, p))

    pos_ok = jnp.take(pos, pos_idx)
    neg_ok = jnp.take(neg, neg_idx)
    idx = jnp.concatenate([pos_idx, neg_idx])
    ok = jnp.concatenate([pos_ok, neg_ok])
    is_pos = jnp.concatenate(
        [pos_ok, jnp.zeros_like(neg_ok)])

    rois = jnp.take(proposals, idx, axis=0) * ok[:, None]
    gt_idx = jnp.take(argmax_gt, idx)
    matched_box = jnp.take(gt_boxes, gt_idx, axis=0)
    matched_class = jnp.take(gt_class_ids, gt_idx)

    class_ids = jnp.where(is_pos, matched_class, 0).astype(jnp.int32)
    std = jnp.asarray(bbox_std_dev, jnp.float32)
    deltas = encode_box_deltas(rois, matched_box) / std
    deltas = deltas * is_pos[:, None]

    # Mask targets: roi expressed in matched-gt-box relative coordinates.
    gh = jnp.maximum(matched_box[:, 2] - matched_box[:, 0], 1e-8)
    gw = jnp.maximum(matched_box[:, 3] - matched_box[:, 1], 1e-8)
    rel = jnp.stack([
        (rois[:, 0] - matched_box[:, 0]) / gh,
        (rois[:, 1] - matched_box[:, 1]) / gw,
        (rois[:, 2] - matched_box[:, 0]) / gh,
        (rois[:, 3] - matched_box[:, 1]) / gw,
    ], axis=1)
    minis = jnp.take(gt_minimasks, gt_idx, axis=0)  # (T, M, M)
    crop = jax.vmap(lambda mm, rb: _crop_minimask(mm, rb, mask_size))
    masks = crop(minis, rel)
    masks = (masks >= 0.5).astype(jnp.float32) * is_pos[:, None, None]

    return ProposalTargets(
        rois=rois.astype(jnp.float32),
        roi_valid=ok,
        class_ids=class_ids,
        deltas=deltas.astype(jnp.float32),
        masks=masks,
        positive=is_pos,
    )
