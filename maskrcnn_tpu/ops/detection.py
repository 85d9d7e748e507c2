"""Second-stage detection filtering: threshold → refine → per-class NMS → top-k.

TPU-native replacement for the reference's `DetectionLayer.evaluate`
(`Sources/Mask-RCNN-CoreML/DetectionLayer.swift:107-236`) fused with the
argmax half of `TimeDistributedClassifierLayer`
(`TimeDistributedClassifierLayer.swift:75-86`): the head gives per-ROI class
probabilities and per-class box deltas; this op takes the argmax class (over
all classes, background included), its score and its 4 deltas, then filters.

Semantics parity:
  * keep score >= threshold — inclusive, like the vDSP_vthres compress at
    `DetectionLayer.swift:238-276`;
  * drop background class 0 (`:136-140`);
  * scale deltas by bbox_std_dev, apply, clip to [0,1] (`:157-164`);
  * per-class greedy NMS at IoU 0.3 (`:170-183`) — realized as ONE global
    NMS on class-offset boxes (boxes shifted by class_id * 2 never overlap
    across classes, so greedy decomposes into independent per-class greedy);
  * keep the top `max_detections` by score (`:186-209`), zero-pad (`:226-231`).

One deliberate divergence, matching the declared correctness oracle instead
of the Swift code: the reference iterates NMS candidates in ROI order
(`DetectionLayer.swift:172-183` passes `indicesOfClass` in array order),
whereas Matterport/TF — the reference's own `--compare` oracle
(`Python/COCOEval/task.py:99-105`) — suppresses in descending *score* order.
We sort by score first (SURVEY.md §7: parity target is the TF path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from maskrcnn_tpu.ops.common import round_up

from maskrcnn_tpu.ops.boxes import apply_box_deltas, clip_boxes
from maskrcnn_tpu.ops.nms import nms_padded


# Boxes live in [0,1]; shifting each class's boxes by class_id * _CLASS_STRIDE
# guarantees zero cross-class IoU inside the shared NMS.
_CLASS_STRIDE = 2.0


@functools.partial(
    jax.jit, static_argnames=("max_detections", "nms_threshold",
                              "nms_tile"))
def refine_detections(
    rois: jnp.ndarray,
    class_probs: jnp.ndarray,
    class_deltas: jnp.ndarray,
    *,
    bbox_std_dev=(0.1, 0.1, 0.2, 0.2),
    score_threshold: float = 0.7,
    nms_threshold: float = 0.3,
    max_detections: int = 100,
    nms_tile: int = 512,
):
    """Filter (R,) ROIs into padded final detections.

    Args:
      rois: (R, 4) normalized proposals (zero rows = padding).
      class_probs: (R, num_classes) softmax probabilities (class 0 is
        background).
      class_deltas: (R, num_classes, 4) per-class box refinements.

    Returns:
      detections: (max_detections, 6) rows (y1, x1, y2, x2, class_id, score),
        zero-padded — the reference's output contract
        (`DetectionLayer.swift:100,219-231`).
      valid: (max_detections,) bool.
      roi_indices: (max_detections,) int32 index into `rois` of each
        detection (sentinel R for padding) — used to gather pooled features
        for the mask head without recomputing ROIAlign on stale boxes.
    """
    r, num_classes = class_probs.shape
    rois = rois.astype(jnp.float32)
    class_probs = class_probs.astype(jnp.float32)

    class_id = jnp.argmax(class_probs, axis=-1).astype(jnp.int32)  # (R,)
    score = jnp.max(class_probs, axis=-1)  # (R,)
    delta = jnp.take_along_axis(
        class_deltas.astype(jnp.float32),
        class_id[:, None, None].repeat(4, axis=2), axis=1)[:, 0, :]  # (R,4)

    std = jnp.asarray(bbox_std_dev, jnp.float32)
    refined = clip_boxes(apply_box_deltas(rois, delta * std))

    roi_area = (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1])
    cand = (score >= score_threshold) & (class_id > 0) & (roi_area > 0.0)

    # Score-descending order (TF oracle semantics — see module docstring).
    order = jnp.argsort(-score)
    s_boxes = jnp.take(refined, order, axis=0)
    s_cand = jnp.take(cand, order)
    s_class = jnp.take(class_id, order)

    offset = s_class.astype(jnp.float32)[:, None] * _CLASS_STRIDE
    nms_idx, valid = nms_padded(
        s_boxes + offset, s_cand, nms_threshold, max_detections,
        tile_size=min(nms_tile, round_up(r, 128)))

    # Map NMS winners (indices into sorted order) back to original ROI rows.
    roi_indices = jnp.take(order, jnp.minimum(nms_idx, r - 1))
    roi_indices = jnp.where(valid, roi_indices, r).astype(jnp.int32)

    out_boxes = jnp.take(refined, roi_indices, axis=0, mode="fill",
                         fill_value=0.0)
    out_class = jnp.take(class_id, roi_indices, mode="fill",
                         fill_value=0).astype(jnp.float32)
    out_score = jnp.take(score, roi_indices, mode="fill", fill_value=0.0)
    vf = valid.astype(jnp.float32)

    detections = jnp.concatenate(
        [out_boxes * vf[:, None],
         (out_class * vf)[:, None],
         (out_score * vf)[:, None]], axis=1)
    return detections, valid, roi_indices

