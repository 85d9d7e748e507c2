"""Proposal layer vs a scalar oracle of ProposalLayer.swift:103-195."""

import numpy as np
import jax.numpy as jnp

from maskrcnn_tpu.core.anchors import generate_anchors
from maskrcnn_tpu.core.config import tiny_test_config
from maskrcnn_tpu.ops.proposals import generate_proposals
from tests.oracles import oracle_apply_box_deltas, oracle_nms

STD = (0.1, 0.1, 0.2, 0.2)


def oracle_proposals(fg, deltas, anchors, pre_nms, max_out, thresh):
    order = np.argsort(-fg, kind="stable")[:pre_nms]
    d = deltas[order] * np.asarray(STD, np.float32)
    boxes = np.clip(oracle_apply_box_deltas(anchors[order], d), 0.0, 1.0)
    keep = oracle_nms(boxes, list(range(len(boxes))), thresh, max_out)
    out = np.zeros((max_out, 4), np.float32)
    out[:len(keep)] = boxes[keep]
    return out, len(keep)


def test_proposals_match_oracle(rng):
    cfg = tiny_test_config()
    anchors = generate_anchors(cfg)
    a = anchors.shape[0]
    # Distinct scores so top-k tie-breaking cannot differ from the oracle.
    fg = rng.permutation(a).astype(np.float32) / a
    deltas = rng.normal(0, 1.0, (a, 4)).astype(np.float32)

    rois, valid = generate_proposals(
        jnp.asarray(fg), jnp.asarray(deltas), jnp.asarray(anchors),
        bbox_std_dev=STD,
        pre_nms_max_proposals=cfg.pre_nms_max_proposals,
        max_proposals=cfg.max_proposals,
        nms_threshold=cfg.proposal_nms_threshold,
        nms_tile=128)
    rois, valid = np.asarray(rois), np.asarray(valid)

    want, n_keep = oracle_proposals(
        fg, deltas, anchors, cfg.pre_nms_max_proposals, cfg.max_proposals,
        cfg.proposal_nms_threshold)
    assert valid.sum() == n_keep
    np.testing.assert_allclose(rois, want, rtol=1e-4, atol=1e-5)
    # Padded tail must be zeros (ProposalLayer.swift:186-192 contract).
    assert np.all(rois[n_keep:] == 0.0)


def test_proposals_output_static_shape(rng):
    cfg = tiny_test_config()
    anchors = generate_anchors(cfg)
    fg = rng.random(anchors.shape[0]).astype(np.float32)
    deltas = np.zeros((anchors.shape[0], 4), np.float32)
    rois, valid = generate_proposals(
        jnp.asarray(fg), jnp.asarray(deltas), jnp.asarray(anchors),
        pre_nms_max_proposals=cfg.pre_nms_max_proposals,
        max_proposals=cfg.max_proposals, nms_tile=128)
    assert rois.shape == (cfg.max_proposals, 4)
    assert valid.shape == (cfg.max_proposals,)
