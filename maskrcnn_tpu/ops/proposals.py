"""RPN proposal generation: top-k → decode → clip → NMS, all static-shape.

TPU-native replacement for the reference's `ProposalLayer.evaluate`
(`Sources/Mask-RCNN-CoreML/ProposalLayer.swift:103-195`), whose hot spots —
a ~45 ms vDSP sort over 261k scores (`:131-133`) and a scalar greedy NMS —
become one `lax.top_k` and the tiled vectorized NMS of `ops/nms.py`.

Step parity with the reference:
  1. foreground scores = odd-strided slice of the (A, 2) class probs
     (`:124-126`) — here just `probs[:, 1]`;
  2. descending sort + clip to `pre_nms_max_proposals` (`:129-134`)
     == `lax.top_k(fg, pre_nms)`;
  3. gather deltas + anchors, scale deltas by bbox_std_dev (`:139-160`);
  4. apply deltas, clip to [0, 1] (`:162-166`);
  5. greedy IoU-0.7 NMS, keep ≤ `max_proposals` (`:169-175`);
  6. zero-pad the output to a static (max_proposals, 4) (`:186-192`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from maskrcnn_tpu.ops.common import round_up

from maskrcnn_tpu.ops.boxes import apply_box_deltas, clip_boxes
from maskrcnn_tpu.ops.nms import nms_gather, nms_padded


@functools.partial(
    jax.jit,
    static_argnames=("pre_nms_max_proposals", "max_proposals",
                     "nms_threshold", "nms_tile", "topk_recall",
                     "anchor_spec"))
def generate_proposals(
    fg_scores: jnp.ndarray,
    deltas: jnp.ndarray,
    anchors: jnp.ndarray | None,
    *,
    bbox_std_dev=(0.1, 0.1, 0.2, 0.2),
    pre_nms_max_proposals: int = 6000,
    max_proposals: int = 1000,
    nms_threshold: float = 0.7,
    nms_tile: int = 512,
    topk_recall: float | None = 0.95,
    anchor_spec=None,
):
    """(A,) fg scores + (A,4) deltas + (A,4) anchors -> padded ROIs.

    With `anchor_spec` (from `core.anchors.anchor_spec`), the anchors array
    is not consulted (may be None): selected anchors are computed in-graph
    from the top-k indices (`core.anchors.anchors_at`), eliminating the
    (A, 8) table build + wide-gather HBM trip — only the (A, 4) deltas are
    gathered. Anchor values match the table to float32 rounding (<=2 ulp).

    Returns:
      rois: (max_proposals, 4) normalized y1x1y2x2, zero-padded tail.
      valid: (max_proposals,) bool mask of real proposals.
    """
    a = fg_scores.shape[0]
    k = min(a, pre_nms_max_proposals)

    fg_scores = fg_scores.astype(jnp.float32)
    # Top-k replaces the reference's 45 ms vDSP sort hotspot
    # (ProposalLayer.swift:131-133). On TPU, `approx_max_k` (a PartialReduce
    # that keeps per-window leaders, then exact top-k's the candidate pool)
    # returns exactly sorted candidates, so downstream NMS order is
    # unchanged. Measured at batch 48 over 262k scores: exact top_k 32 ms;
    # recall targets >= 0.99 degenerate to l == n (no reduction, 16.9 ms);
    # 0.95 actually reduces (8.2 ms) and leaves 99.96% of the final
    # post-NMS proposals bit-identical (see core/config.py and
    # docs/PERF.md). Non-TPU backends lower it to the exact op.
    # `topk_recall=None` forces exact `lax.top_k` everywhere. (Two other
    # formulations measured SLOWER and were reverted — threshold-bisection
    # top-k, 4x, and nothing else beats the fused sort: see git history.)
    if topk_recall is not None and k < a:
        _, top_idx = jax.lax.approx_max_k(
            fg_scores, k, recall_target=topk_recall)
    else:
        _, top_idx = jax.lax.top_k(fg_scores, k)

    if anchor_spec is not None:
        # Analytic path: one (A, 4) gather for the deltas; anchors decoded
        # from the indices with VPU arithmetic (core/anchors.anchors_at) —
        # no table build, no anchor gather.
        from maskrcnn_tpu.core.anchors import anchors_at

        sel_deltas = jnp.take(deltas, top_idx, axis=0).astype(jnp.float32)
        sel_anchors = anchors_at(top_idx, anchor_spec)
    else:
        # One wide row gather instead of two: TPU gathers are per-index
        # latency-bound (~14 ns/index — docs/PERF.md), so fetching the
        # (delta, anchor) pair from a concatenated (A, 8) table halves the
        # dominant cost of this stage (measured 6.6 ms at batch 32 for the
        # two-gather form; the table build is one bandwidth-rate pass).
        table = jnp.concatenate(
            [deltas.astype(jnp.float32), anchors.astype(jnp.float32)],
            axis=1)
        sel = jnp.take(table, top_idx, axis=0)
        sel_deltas, sel_anchors = sel[:, :4], sel[:, 4:]

    std = jnp.asarray(bbox_std_dev, jnp.float32)
    boxes = apply_box_deltas(sel_anchors, sel_deltas * std)
    boxes = clip_boxes(boxes)

    idx, valid = nms_padded(
        boxes, jnp.ones((k,), jnp.bool_), nms_threshold, max_proposals,
        tile_size=min(nms_tile, round_up(k, 128)))
    rois = nms_gather(boxes, idx)
    return rois, valid

