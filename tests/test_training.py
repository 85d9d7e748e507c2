"""Training subsystem: target assignment oracles, losses, overfit smoke."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maskrcnn_tpu.core.anchors import generate_anchors
from maskrcnn_tpu.core.config import tiny_test_config
from maskrcnn_tpu.models.mask_rcnn import init_mask_rcnn
from maskrcnn_tpu.train import losses as L
from maskrcnn_tpu.train.step import (
    compute_losses, make_train_state, train_step)
from maskrcnn_tpu.train.targets import (
    encode_box_deltas, proposal_targets, rpn_targets)
from maskrcnn_tpu.ops.boxes import apply_box_deltas


def make_gt(rng, g=4, num_classes=5, m=28):
    yx1 = rng.uniform(0, 0.6, (g, 2))
    wh = rng.uniform(0.1, 0.3, (g, 2))
    boxes = np.concatenate([yx1, yx1 + wh], -1).astype(np.float32)
    classes = rng.integers(1, num_classes, (g,)).astype(np.int32)
    masks = (rng.random((g, m, m)) > 0.4).astype(np.float32)
    return boxes, classes, masks


def test_encode_decode_roundtrip(rng):
    boxes = np.concatenate([rng.uniform(0, .5, (32, 2)),
                            rng.uniform(.5, 1., (32, 2))], 1).astype(np.float32)
    gt = np.concatenate([rng.uniform(0, .5, (32, 2)),
                         rng.uniform(.5, 1., (32, 2))], 1).astype(np.float32)
    d = encode_box_deltas(jnp.asarray(boxes), jnp.asarray(gt))
    rec = apply_box_deltas(jnp.asarray(boxes), d)
    np.testing.assert_allclose(np.asarray(rec), gt, rtol=1e-4, atol=1e-5)


def test_rpn_targets_sanity(rng):
    cfg = tiny_test_config()
    anchors = jnp.asarray(generate_anchors(cfg))
    boxes, classes, _ = make_gt(rng)
    t = rpn_targets(anchors, jnp.asarray(boxes),
                    jnp.asarray(classes), jax.random.PRNGKey(0),
                    train_anchors=cfg.rpn_train_anchors_per_image)
    labels = np.asarray(t.labels)
    n_pos = (labels == 1).sum()
    n_neg = (labels == -1).sum()
    assert n_pos >= 1, "every GT must have at least one positive anchor"
    assert n_pos <= cfg.rpn_train_anchors_per_image // 2
    # negatives back-fill to the full quota (Matterport semantics)
    assert n_pos + n_neg == cfg.rpn_train_anchors_per_image
    # the sampled-positive slots agree with the labels
    pos_valid = np.asarray(t.pos_valid)
    pos_idx = np.asarray(t.pos_idx)
    assert set(pos_idx[pos_valid]) == set(np.where(labels == 1)[0])
    assert pos_valid.sum() == n_pos
    # positive anchors decode onto their GT within tolerance
    std = jnp.asarray(cfg.bbox_std_dev)
    sel = pos_valid.nonzero()[0][:8]
    rec = apply_box_deltas(anchors[pos_idx[sel]],
                           t.pos_deltas[sel] * std)
    from maskrcnn_tpu.ops.boxes import box_iou
    iou = np.asarray(box_iou(rec, jnp.asarray(boxes))).max(1)
    assert (iou > 0.99).all()
    # invalid slots carry zero deltas
    assert (np.asarray(t.pos_deltas)[~pos_valid] == 0).all()


def test_rpn_bbox_loss_equals_full_anchor_formula(rng):
    """The K-slot rpn_bbox_loss must equal the mean-over-(labels==1) of the
    naive full-A formulation it replaced."""
    cfg = tiny_test_config()
    anchors = jnp.asarray(generate_anchors(cfg))
    boxes, classes, _ = make_gt(rng)
    t = rpn_targets(anchors, jnp.asarray(boxes), jnp.asarray(classes),
                    jax.random.PRNGKey(3),
                    train_anchors=cfg.rpn_train_anchors_per_image)
    a = anchors.shape[0]
    pred = jnp.asarray(rng.normal(0, 0.3, (a, 4)), jnp.float32)
    fast = float(L.rpn_bbox_loss(pred, t.pos_deltas, t.pos_idx, t.pos_valid))
    # naive: scatter the K targets back to full-A rows, mask by labels == 1
    full_t = np.zeros((a, 4), np.float32)
    full_t[np.asarray(t.pos_idx)[np.asarray(t.pos_valid)]] = \
        np.asarray(t.pos_deltas)[np.asarray(t.pos_valid)]
    labels = np.asarray(t.labels)
    diff = np.asarray(pred) - full_t
    per = np.where(np.abs(diff) < 1, 0.5 * diff * diff,
                   np.abs(diff) - 0.5).sum(-1)
    naive = per[labels == 1].mean()
    np.testing.assert_allclose(fast, naive, rtol=1e-6)


def test_rpn_targets_exact_and_approx_sampling_agree_semantically(rng):
    """Both sampling kernels must produce a full balanced quota of valid
    positives+negatives drawn from the eligible sets (the sampled SETS may
    differ — both are uniform random subsamples)."""
    cfg = tiny_test_config()
    anchors = jnp.asarray(generate_anchors(cfg))
    boxes, classes, _ = make_gt(rng)
    outs = {}
    for mode in ("exact", "approx"):
        t = rpn_targets(anchors, jnp.asarray(boxes), jnp.asarray(classes),
                        jax.random.PRNGKey(0),
                        train_anchors=cfg.rpn_train_anchors_per_image,
                        sampling_topk=mode)
        outs[mode] = np.asarray(t.labels)
    for mode, labels in outs.items():
        n_pos, n_neg = (labels == 1).sum(), (labels == -1).sum()
        assert n_pos + n_neg == cfg.rpn_train_anchors_per_image, mode
        assert n_pos >= 1, mode
    # eligibility must be identical: every anchor either sampler marked
    # positive must be positive-eligible under the other's label map too
    # (positives are threshold-determined, only the subsample is random)
    exact_pos_set = set(np.where(outs["exact"] == 1)[0])
    approx_pos_set = set(np.where(outs["approx"] == 1)[0])
    # when fewer eligible positives exist than the quota, both keep all
    if len(exact_pos_set) < cfg.rpn_train_anchors_per_image // 2:
        assert exact_pos_set == approx_pos_set


def test_proposal_targets_sanity(rng):
    cfg = tiny_test_config()
    boxes, classes, masks = make_gt(rng, num_classes=cfg.num_classes)
    # proposals: jittered copies of gt (positives) + far boxes (negatives)
    jitter = boxes + rng.normal(0, 0.01, boxes.shape).astype(np.float32)
    far = np.concatenate([rng.uniform(0.8, 0.9, (20, 2)),
                          rng.uniform(0.9, 1.0, (20, 2))], 1).astype(np.float32)
    props = np.concatenate([jitter, far]).astype(np.float32)
    valid = np.ones(len(props), bool)

    t = proposal_targets(
        jnp.asarray(props), jnp.asarray(valid), jnp.asarray(boxes),
        jnp.asarray(classes), jnp.asarray(masks), jax.random.PRNGKey(1),
        num_rois=16, positive_fraction=0.33, mask_size=28)
    cls = np.asarray(t.class_ids)
    pos = np.asarray(t.positive)
    assert pos.sum() >= len(boxes)  # all jittered gts are positives
    assert (cls[pos] > 0).all()
    assert (cls[~pos] == 0).all()
    # mask targets only for positives, binary
    m = np.asarray(t.masks)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    assert (m[~pos] == 0).all()


def test_losses_perfect_prediction_zero(rng):
    # class loss ~0 when logits point at the target.
    cls = jnp.asarray(rng.integers(0, 5, (16,)), jnp.int32)
    logits = jax.nn.one_hot(cls, 5) * 100.0
    assert float(L.mrcnn_class_loss(logits, cls, jnp.ones(16, bool))) < 1e-3
    # bbox loss 0 when prediction equals target at the class channel
    tgt = jnp.asarray(rng.normal(0, 1, (16, 4)), jnp.float32)
    pred = jnp.zeros((16, 5, 4)).at[jnp.arange(16), cls].set(tgt)
    assert float(L.mrcnn_bbox_loss(pred, tgt, cls)) < 1e-6
    # rpn class loss ignores neutral anchors
    labels = jnp.asarray([1, -1, 0, 0], jnp.int32)
    lg = jnp.asarray([[0., 10.], [10., 0.], [0., 0.], [5., 5.]])
    assert float(L.rpn_class_loss(lg, labels)) < 1e-3


@pytest.mark.slow
def test_train_step_reduces_loss(rng):
    cfg = tiny_test_config()
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(generate_anchors(cfg))
    boxes, classes, masks = make_gt(rng, num_classes=cfg.num_classes)
    batch = {
        "images": jnp.asarray(
            rng.uniform(0, 255, (1, 128, 128, 3)), jnp.float32),
        "gt_boxes": jnp.asarray(boxes)[None],
        "gt_class_ids": jnp.asarray(classes)[None],
        "gt_masks": jnp.asarray(masks)[None],
    }
    state, tx_and_mask = make_train_state(params, cfg)
    key = jax.random.PRNGKey(42)
    losses = []
    for i in range(6):
        state, metrics = train_step(
            state, batch, anchors, key, cfg, tx_and_mask)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    # overfitting a single fixed batch+key must reduce the loss
    assert losses[-1] < losses[0], losses


def test_bf16_momentum_accumulator(rng):
    """config.train_momentum_dtype='bfloat16' (the r05 optimizer-traffic
    lever, docs/bench_train_r05.json): the momentum accumulator must be
    stored bf16, params must STAY float32 (master copy), and the first
    update must match the f32-momentum update to bf16 rounding (first-step
    momentum == grads, so the only divergence is the accumulator cast)."""
    cfg = tiny_test_config().replace(train_momentum_dtype="bfloat16")
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(generate_anchors(cfg))
    boxes, classes, masks = make_gt(rng, num_classes=cfg.num_classes)
    batch = {
        "images": jnp.asarray(
            rng.uniform(0, 255, (1, 128, 128, 3)), jnp.float32),
        "gt_boxes": jnp.asarray(boxes)[None],
        "gt_class_ids": jnp.asarray(classes)[None],
        "gt_masks": jnp.asarray(masks)[None],
    }
    key = jax.random.PRNGKey(42)

    state_h, tx_h = make_train_state(params, cfg)
    state_f, tx_f = make_train_state(params,
                                     cfg.replace(train_momentum_dtype="float32"))
    new_h, m_h = train_step(state_h, batch, anchors, key, cfg, tx_h)
    new_f, m_f = train_step(state_f, batch, anchors, key,
                            cfg.replace(train_momentum_dtype="float32"),
                            tx_f)

    mom_dtypes = {leaf.dtype for leaf in jax.tree_util.tree_leaves(
        new_h.opt_state) if hasattr(leaf, "dtype") and leaf.ndim > 0}
    assert jnp.dtype(jnp.bfloat16) in mom_dtypes, mom_dtypes
    for leaf in jax.tree_util.tree_leaves(new_h.params):
        assert leaf.dtype == jnp.float32
    # identical loss (forward unaffected), params within bf16 rounding
    np.testing.assert_allclose(float(m_h["loss"]), float(m_f["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(new_h.params),
                    jax.tree_util.tree_leaves(new_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-5)


@pytest.mark.slow
def test_freeze_heads_only(rng):
    cfg = tiny_test_config()
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(generate_anchors(cfg))
    boxes, classes, masks = make_gt(rng, num_classes=cfg.num_classes)
    batch = {
        "images": jnp.asarray(
            rng.uniform(0, 255, (1, 128, 128, 3)), jnp.float32),
        "gt_boxes": jnp.asarray(boxes)[None],
        "gt_class_ids": jnp.asarray(classes)[None],
        "gt_masks": jnp.asarray(masks)[None],
    }
    state, tx_and_mask = make_train_state(params, cfg, trainable="heads")
    new_state, _ = train_step(
        state, batch, anchors, jax.random.PRNGKey(7), cfg, tx_and_mask)
    # backbone untouched, heads updated
    np.testing.assert_array_equal(
        np.asarray(state.params["conv1"]["kernel"]),
        np.asarray(new_state.params["conv1"]["kernel"]))
    assert not np.array_equal(
        np.asarray(state.params["rpn_conv_shared"]["kernel"]),
        np.asarray(new_state.params["rpn_conv_shared"]["kernel"]))


def test_rpn_targets_crowd_neutral(rng):
    cfg = tiny_test_config()
    anchors = jnp.asarray(generate_anchors(cfg))
    boxes, classes, _ = make_gt(rng)
    # Mark GT 0 as a crowd region: anchors overlapping it must not become
    # negatives (label 0, neutral), and it must produce no positives.
    classes = classes.copy()
    crowd_classes = classes.astype(np.int32)
    crowd_classes[0] = -crowd_classes[0]
    t = rpn_targets(anchors, jnp.asarray(boxes), jnp.asarray(crowd_classes),
                    jax.random.PRNGKey(0),
                    train_anchors=cfg.rpn_train_anchors_per_image)
    labels = np.asarray(t.labels)
    from maskrcnn_tpu.ops.boxes import box_iou
    crowd_iou = np.asarray(box_iou(anchors, jnp.asarray(boxes[:1])))[:, 0]
    overlapping = crowd_iou >= 0.001
    assert not (labels[overlapping] == -1).any(), \
        "crowd-overlapping anchors must never be negatives"


def test_proposal_targets_crowd_excluded(rng):
    cfg = tiny_test_config()
    boxes, classes, masks = make_gt(rng, num_classes=cfg.num_classes)
    crowd_classes = classes.astype(np.int32).copy()
    crowd_classes[0] = -crowd_classes[0]
    # proposals: one inside the crowd box, one far away
    props = np.stack([boxes[0], [0.85, 0.85, 0.95, 0.95]]).astype(np.float32)
    t = proposal_targets(
        jnp.asarray(props), jnp.ones(2, bool), jnp.asarray(boxes),
        jnp.asarray(crowd_classes), jnp.asarray(masks),
        jax.random.PRNGKey(1), num_rois=8, positive_fraction=0.5,
        mask_size=28)
    ok = np.asarray(t.roi_valid)
    rois = np.asarray(t.rois)
    # the crowd-covering proposal must not be sampled as a negative
    for slot in range(len(ok)):
        if ok[slot] and not np.asarray(t.positive)[slot]:
            assert not np.allclose(rois[slot], boxes[0], atol=1e-5)


def test_fused_sgd_matches_optax(rng):
    """tools/opt_probe.py's flat-vector optimizer must reproduce the optax
    chain exactly (it measured SLOWER on-chip — docs/opt_probe_r03.json,
    negative result — but stays as the documented A/B arm)."""
    import optax
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from fused_sgd import fused_sgd_init, fused_sgd_step
    from maskrcnn_tpu.train.step import make_optimizer

    base_cfg = tiny_test_config()
    # Includes a BatchNorm layer so the frozen-BN arm below actually
    # exercises the whole-layer freeze (ADVICE r04: the flat path must
    # mirror make_optimizer's _is_bn freeze, not just the layer regex).
    params = {
        "conv1": {"kernel": jnp.asarray(rng.normal(size=(3, 3, 4, 8)),
                                        jnp.float32),
                  "bias": jnp.asarray(rng.normal(size=(8,)), jnp.float32)},
        "bn_conv1": {
            "gamma": jnp.asarray(rng.normal(size=(8,)), jnp.float32),
            "beta": jnp.asarray(rng.normal(size=(8,)), jnp.float32),
            "moving_mean": jnp.zeros((8,), jnp.float32),
            "moving_variance": jnp.ones((8,), jnp.float32)},
        "rpn_conv_shared": {"kernel": jnp.asarray(
            rng.normal(size=(1, 1, 8, 8)), jnp.float32)},
    }
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32) * 10,
        params)
    for train_bn in ("batch", "frozen"):
        cfg = base_cfg.replace(train_bn=train_bn)
        for trainable in ("all", "heads"):
            tx, mask_fn = make_optimizer(cfg, trainable)
            s_tree = tx.init(params)
            p_tree = p_flat = params
            fstate = fused_sgd_init(params, cfg, trainable)
            for _ in range(3):
                mask = mask_fn(p_tree)
                g = grads if mask is None else jax.tree.map(
                    lambda gg, m: gg * jnp.asarray(m, gg.dtype), grads, mask)
                up, s_tree = tx.update(g, s_tree, p_tree)
                p_tree = optax.apply_updates(p_tree, up)
                p_flat, fstate = fused_sgd_step(
                    p_flat, grads, fstate, lr=cfg.learning_rate,
                    weight_decay=cfg.weight_decay)
            for a, b in zip(jax.tree_util.tree_leaves(p_tree),
                            jax.tree_util.tree_leaves(p_flat)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-7)


@pytest.mark.slow
def test_flagship_train_step_traces(rng):
    """The FLAGSHIP train step (resnet101 @ 1024², 81 classes) must trace
    and lower at batch 1 — the CI-sized half of the `bench.py --mode train`
    proof (VERDICT: no committed evidence existed that flagship-config
    training compiles outside the TPU bench). Trace-only (`jit(...).lower`)
    catches shape/dtype/static-arg breakage at flagship scale without an
    XLA compile."""
    from maskrcnn_tpu.core.config import MaskRCNNConfig

    cfg = MaskRCNNConfig(architecture="resnet101")
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(generate_anchors(cfg))
    boxes, classes, masks = make_gt(rng, num_classes=cfg.num_classes)
    batch = {
        "images": jnp.zeros((1, cfg.image_height, cfg.image_width, 3),
                            jnp.float32),
        "gt_boxes": jnp.asarray(boxes)[None],
        "gt_class_ids": jnp.asarray(classes)[None],
        "gt_masks": jnp.asarray(masks)[None],
    }
    state, tx_and_mask = make_train_state(params, cfg)
    lowered = train_step.lower(state, batch, anchors,
                               jax.random.PRNGKey(42), cfg, tx_and_mask)
    text = lowered.as_text()
    assert "stablehlo" in text or "mhlo" in text or "func" in text
