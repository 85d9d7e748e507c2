"""Box geometry ops (pure jnp, fully vectorized, static-shape).

TPU-native replacement for the reference's scalar-loop Swift box math:
`BoxReference.applyBoxDeltas` / `BoxReference.clip`
(`Sources/Mask-RCNN-CoreML/BoxUtils.swift:32-80`) and the pairwise `IOU`
(`Sources/Mask-RCNN-CoreML/Utils.swift:232-246`). All boxes are flat
(..., 4) = (y1, x1, y2, x2), normally in normalized [0,1] coordinates.

Semantics preserved exactly:
  * delta decode: center += d_yx * size; size *= exp(d_hw)
    (BoxUtils.swift:50-62 — Matterport's refinement formula);
  * clip to [0,1] (BoxUtils.swift:73-80);
  * IoU returns 0 when either box has non-positive area
    (Utils.swift:234-238) — this is what makes zero-padding rows inert.
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_box_deltas(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Refine (..., 4) y1x1y2x2 boxes by (dy, dx, log dh, log dw) deltas."""
    y1, x1, y2, x2 = jnp.split(boxes, 4, axis=-1)
    dy, dx, dh, dw = jnp.split(deltas, 4, axis=-1)

    height = y2 - y1
    width = x2 - x1
    center_y = y1 + 0.5 * height + dy * height
    center_x = x1 + 0.5 * width + dx * width
    height = height * jnp.exp(dh)
    width = width * jnp.exp(dw)

    ny1 = center_y - 0.5 * height
    nx1 = center_x - 0.5 * width
    # Match the reference's y2 = y1 + h (not center + h/2): identical in exact
    # arithmetic, and bit-identical under fp32 to BoxUtils.swift:63-66.
    ny2 = ny1 + height
    nx2 = nx1 + width
    return jnp.concatenate([ny1, nx1, ny2, nx2], axis=-1)


def clip_boxes(boxes: jnp.ndarray, lo: float = 0.0, hi: float = 1.0) -> jnp.ndarray:
    """Clip every coordinate into [lo, hi] (reference BoxUtils.swift:73-80)."""
    return jnp.clip(boxes, lo, hi)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (...,) signed area (h * w); padding rows give 0."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix, (N,4) x (M,4) -> (N,M).

    Degenerate boxes (area <= 0) yield IoU 0 against everything — the inertness
    contract of the reference's `IOU` (Utils.swift:234-238).
    """
    area_a = box_area(boxes_a)  # (N,)
    area_b = box_area(boxes_b)  # (M,)

    yx1 = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])  # (N,M,2)
    yx2 = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])  # (N,M,2)
    wh = jnp.maximum(yx2 - yx1, 0.0)
    inter = wh[..., 0] * wh[..., 1]

    union = area_a[:, None] + area_b[None, :] - inter
    iou = inter / jnp.where(union > 0.0, union, 1.0)
    valid = (area_a[:, None] > 0.0) & (area_b[None, :] > 0.0)
    return jnp.where(valid, iou, 0.0)


def box_overlap_mask(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray,
                     threshold: float) -> jnp.ndarray:
    """Pairwise `IoU > threshold` without the division: (N,4) x (M,4) ->
    (N,M) bool.

    `inter / union > t  ⟺  inter > t * union` for `union > 0`, so the NMS
    comparison needs no f32 divide (the per-element divide is the single
    most expensive VPU op in the IoU — this is the hot comparison inside
    both NMS implementations). The two forms can disagree only when
    `inter` is within 1 ulp of `t * union`; degenerate boxes (area <= 0)
    never overlap anything, matching `box_iou`'s inertness contract
    (reference `Utils.swift:234-238`)."""
    area_a = box_area(boxes_a)  # (N,)
    area_b = box_area(boxes_b)  # (M,)

    yx1 = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])  # (N,M,2)
    yx2 = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])  # (N,M,2)
    wh = jnp.maximum(yx2 - yx1, 0.0)
    inter = wh[..., 0] * wh[..., 1]

    union = area_a[:, None] + area_b[None, :] - inter
    valid = (area_a[:, None] > 0.0) & (area_b[None, :] > 0.0)
    return (inter > threshold * union) & valid

