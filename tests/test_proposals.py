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


def test_analytic_anchors_match_table():
    """`anchors_at` must reproduce `generate_anchors` to float32 rounding,
    for both the tiny and the flagship 1024² anchor grid."""
    from maskrcnn_tpu.core.anchors import anchor_spec, anchors_at
    from maskrcnn_tpu.core.config import MaskRCNNConfig

    for cfg in (tiny_test_config(), MaskRCNNConfig(architecture="resnet101")):
        table = generate_anchors(cfg)
        spec = anchor_spec(cfg)
        idx = jnp.arange(table.shape[0], dtype=jnp.int32)
        got = np.asarray(anchors_at(idx, spec))
        np.testing.assert_allclose(got, table, atol=2e-6, rtol=0)


def test_proposals_analytic_anchor_path_matches_table_path(rng):
    cfg = tiny_test_config()
    from maskrcnn_tpu.core.anchors import anchor_spec

    anchors = generate_anchors(cfg)
    a = anchors.shape[0]
    fg = rng.permutation(a).astype(np.float32) / a
    deltas = rng.normal(0, 0.3, (a, 4)).astype(np.float32)
    kw = dict(bbox_std_dev=STD, pre_nms_max_proposals=200, max_proposals=32,
              nms_threshold=0.7, topk_recall=None)
    rois_t, valid_t = generate_proposals(
        jnp.asarray(fg), jnp.asarray(deltas), jnp.asarray(anchors), **kw)
    rois_a, valid_a = generate_proposals(
        jnp.asarray(fg), jnp.asarray(deltas), None,
        anchor_spec=anchor_spec(cfg), **kw)
    np.testing.assert_array_equal(np.asarray(valid_t), np.asarray(valid_a))
    np.testing.assert_allclose(np.asarray(rois_a), np.asarray(rois_t),
                               atol=3e-6, rtol=0)
