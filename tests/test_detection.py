"""Detection filtering vs a scalar oracle (DetectionLayer semantics, TF order)."""

import numpy as np
import jax.numpy as jnp

from maskrcnn_tpu.ops.detection import refine_detections
from tests.oracles import oracle_apply_box_deltas, oracle_nms
from tests.test_boxes import random_boxes

STD = (0.1, 0.1, 0.2, 0.2)


def oracle_detections(rois, probs, deltas, score_t, nms_t, max_det):
    r, c = probs.shape
    class_id = probs.argmax(1)
    score = probs.max(1)
    sel_delta = deltas[np.arange(r), class_id] * np.asarray(STD, np.float32)
    refined = np.clip(oracle_apply_box_deltas(rois, sel_delta), 0, 1)
    area = (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1])
    cand = (score >= score_t) & (class_id > 0) & (area > 0)

    kept = []
    # Per-class greedy NMS in global descending-score order (TF semantics).
    order = np.argsort(-score, kind="stable")
    for cid in range(1, c):
        idxs = [i for i in order if cand[i] and class_id[i] == cid]
        loc = oracle_nms(refined, idxs, nms_t, max_det)
        kept.extend(loc)
    kept.sort(key=lambda i: -score[i])
    kept = kept[:max_det]
    out = np.zeros((max_det, 6), np.float32)
    for slot, i in enumerate(kept):
        out[slot, :4] = refined[i]
        out[slot, 4] = class_id[i]
        out[slot, 5] = score[i]
    return out, len(kept)


def make_inputs(rng, r=64, c=5):
    rois = random_boxes(rng, r, degenerate_frac=0.15)
    logits = rng.normal(0, 2.0, (r, c)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    # Push some scores above the 0.7 threshold. Scores must be DISTINCT:
    # tie order among equal scores is implementation-defined in the
    # reference itself (DetectionLayer.swift:170 iterates a Swift Set).
    boost = rng.choice(r, r // 2, replace=False)
    top = 0.75 + 0.2 * rng.permutation(len(boost)) / len(boost)
    probs[boost] = (1.0 - top[:, None]) / (c - 1)
    probs[boost, rng.integers(0, c, len(boost))] = top
    deltas = rng.normal(0, 1.0, (r, c, 4)).astype(np.float32)
    return rois, probs.astype(np.float32), deltas


def test_detections_match_oracle(rng):
    rois, probs, deltas = make_inputs(rng)
    det, valid, roi_idx = refine_detections(
        jnp.asarray(rois), jnp.asarray(probs), jnp.asarray(deltas),
        bbox_std_dev=STD, score_threshold=0.7, nms_threshold=0.3,
        max_detections=16, nms_tile=128)
    det, valid = np.asarray(det), np.asarray(valid)
    want, n = oracle_detections(rois, probs, deltas, 0.7, 0.3, 16)
    assert valid.sum() == n
    np.testing.assert_allclose(det, want, rtol=1e-4, atol=1e-5)
    # roi_indices point at the ROI each detection came from.
    ridx = np.asarray(roi_idx)
    for slot in range(n):
        i = ridx[slot]
        assert i < len(rois)
        assert probs[i].argmax() == det[slot, 4]


def test_no_detections_all_zero(rng):
    rois = random_boxes(rng, 32)
    probs = np.full((32, 5), 0.2, np.float32)  # nothing above 0.7
    deltas = np.zeros((32, 5, 4), np.float32)
    det, valid, _ = refine_detections(
        jnp.asarray(rois), jnp.asarray(probs), jnp.asarray(deltas),
        max_detections=8, nms_tile=128)
    assert np.asarray(valid).sum() == 0
    assert np.all(np.asarray(det) == 0.0)


def test_background_class_dropped(rng):
    rois = random_boxes(rng, 16)
    probs = np.zeros((16, 5), np.float32)
    probs[:, 0] = 0.99  # background wins everywhere
    probs[:, 1:] = 0.0025
    deltas = np.zeros((16, 5, 4), np.float32)
    det, valid, _ = refine_detections(
        jnp.asarray(rois), jnp.asarray(probs), jnp.asarray(deltas),
        max_detections=8, nms_tile=128)
    assert np.asarray(valid).sum() == 0


def test_score_threshold_inclusive(rng):
    # The reference keeps score >= threshold (vDSP_vthres is inclusive).
    rois = np.array([[0.1, 0.1, 0.4, 0.4]], np.float32)
    probs = np.array([[0.3, 0.7]], np.float32)
    deltas = np.zeros((1, 2, 4), np.float32)
    det, valid, _ = refine_detections(
        jnp.asarray(rois), jnp.asarray(probs), jnp.asarray(deltas),
        score_threshold=0.7, max_detections=4, nms_tile=128)
    assert np.asarray(valid).sum() == 1
