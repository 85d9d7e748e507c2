"""Fused-cost attribution by prefix ablation.

The stage profiler (`tools/profile_stages.py`) jits each stage separately,
which adds per-dispatch tunnel overhead (~3 ms) and inter-stage HBM
round-trips that the real single-jit pipeline doesn't pay. This tool
measures the TRUE fused cost of each stage as the delta between prefix
programs: compile `forward` truncated after stage k and after stage k-1,
time both chained-readback, subtract. XLA still fuses within each prefix
exactly as in the full program (modulo dead-code elimination of unused
producers, which is the point: a stage's delta includes everything that
exists only to feed it).

Run on the TPU: `PYTHONPATH=. python tools/ablate_pipeline.py --batch 32`.
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timeit(fn, *args, iters=8):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def build_prefixes(config):
    """Ordered (name, fn(params, images, anchors)) prefix programs."""
    from maskrcnn_tpu.models import heads, rpn
    from maskrcnn_tpu.models.mask_rcnn import (backbone_fpn, forward,
                                               preprocess)
    from maskrcnn_tpu.ops.detection import refine_detections
    from maskrcnn_tpu.ops.proposals import generate_proposals

    dtype = jnp.dtype(config.compute_dtype)
    image_hw = (config.image_height, config.image_width)

    if jax.default_backend() == "tpu":
        from maskrcnn_tpu.ops.roi_align_pallas import (
            pyramid_roi_align_pallas)
        stack_pyramid = lambda feats: list(feats)  # kernel takes raw levels
    else:  # mirror forward()'s backend dispatch so the tool runs on CPU too
        from maskrcnn_tpu.ops.roi_align import (build_flat_pyramid,
                                                pyramid_roi_align_flat)
        stack_pyramid = lambda feats: jax.vmap(
            lambda *f: build_flat_pyramid(f))(*feats)
        pyramid_roi_align_pallas = lambda flat, rois, crop, hw, scale: (
            jax.vmap(lambda f, r: pyramid_roi_align_flat(
                f, r, crop_size=crop, image_shape=hw,
                canonical_scale=scale))(flat, rois))

    def thin(tree):
        # Reduce every output leaf to a scalar so readback (and the final
        # HBM write) doesn't dominate the measurement, while keeping every
        # producer live. A full-array sum fuses into the producer's epilogue
        # (a strided slice was measured adding tens of ms at pyramid sizes).
        return [jnp.sum(x.astype(jnp.float32))
                for x in jax.tree_util.tree_leaves(tree)]

    def upto_resnet(p, imgs, anch):
        from maskrcnn_tpu.models import resnet
        cs = resnet.apply_resnet(p, preprocess(imgs, config),
                                 config.architecture, dtype=dtype)
        return thin(cs)

    def upto_backbone(p, imgs, anch):
        return thin(backbone_fpn(p, preprocess(imgs, config), config, dtype))

    def upto_rpn(p, imgs, anch):
        pyr = backbone_fpn(p, preprocess(imgs, config), config, dtype)
        return thin(rpn.apply_rpn(p, pyr, dtype=dtype))

    propose = functools.partial(
        generate_proposals, bbox_std_dev=config.bbox_std_dev,
        pre_nms_max_proposals=config.pre_nms_max_proposals,
        max_proposals=config.max_proposals,
        nms_threshold=config.proposal_nms_threshold,
        topk_recall=config.proposal_topk_recall)

    def _common_rois(p, imgs, anch):
        pyr = backbone_fpn(p, preprocess(imgs, config), config, dtype)
        logits, deltas = rpn.apply_rpn(p, pyr, dtype=dtype)
        fg = logits[..., 1] - logits[..., 0]
        rois, valid = jax.vmap(propose, in_axes=(0, 0, None))(
            fg, deltas, anch)
        return pyr, rois, valid

    def upto_proposals(p, imgs, anch):
        pyr, rois, valid = _common_rois(p, imgs, anch)
        return thin((rois, valid))

    def upto_pool7(p, imgs, anch):
        pyr, rois, _ = _common_rois(p, imgs, anch)
        stacked = stack_pyramid(pyr[:4])
        pooled = pyramid_roi_align_pallas(
            stacked, rois, config.pool_size, image_hw,
            config.roi_canonical_scale)
        return thin(pooled)

    def _common_dets(p, imgs, anch):
        pyr, rois, _ = _common_rois(p, imgs, anch)
        stacked = stack_pyramid(pyr[:4])
        pooled = pyramid_roi_align_pallas(
            stacked, rois, config.pool_size, image_hw,
            config.roi_canonical_scale)
        b, r = rois.shape[:2]
        probs, deltas = heads.apply_classifier_head(
            p, pooled.reshape((b * r,) + pooled.shape[2:]),
            config.num_classes, dtype=dtype)
        probs = probs.reshape(b, r, -1)
        deltas = deltas.reshape(b, r, config.num_classes, 4)
        refine = functools.partial(
            refine_detections, bbox_std_dev=config.bbox_std_dev,
            score_threshold=config.detection_score_threshold,
            nms_threshold=config.detection_nms_threshold,
            max_detections=config.max_detections)
        dets, dvalid, _ = jax.vmap(refine)(rois, probs, deltas)
        return stacked, dets, dvalid

    def upto_classifier(p, imgs, anch):
        pyr, rois, _ = _common_rois(p, imgs, anch)
        stacked = stack_pyramid(pyr[:4])
        pooled = pyramid_roi_align_pallas(
            stacked, rois, config.pool_size, image_hw,
            config.roi_canonical_scale)
        b, r = rois.shape[:2]
        probs, deltas = heads.apply_classifier_head(
            p, pooled.reshape((b * r,) + pooled.shape[2:]),
            config.num_classes, dtype=dtype)
        return thin((probs, deltas))

    def upto_detection(p, imgs, anch):
        _, dets, dvalid = _common_dets(p, imgs, anch)
        return thin((dets, dvalid))

    def upto_pool14(p, imgs, anch):
        stacked, dets, _ = _common_dets(p, imgs, anch)
        mp = pyramid_roi_align_pallas(
            stacked, dets[..., :4], config.mask_pool_size, image_hw,
            config.roi_canonical_scale)
        return thin(mp)

    def full(p, imgs, anch):
        out = forward(p, imgs, anch, config)
        return thin((out["detections"], out["masks"]))

    return ([("resnet (no fpn)", upto_resnet)]
            if config.architecture.startswith("resnet") else []) + [
        ("backbone+fpn", upto_backbone),
        ("rpn", upto_rpn),
        ("proposals", upto_proposals),
        ("roi_align pool7 (+stack)", upto_pool7),
        ("classifier head", upto_classifier),
        ("detection", upto_detection),
        ("roi_align pool14", upto_pool14),
        ("mask head + select (full)", full),
    ]


def build_backbone_prefixes(config):
    """Per-stage prefixes INSIDE the resnet backbone (stem, res2..res5).

    Returning only stage k's feature map dead-codes every later stage, so
    consecutive deltas give each stage's true fused cost."""
    from maskrcnn_tpu.models import resnet
    from maskrcnn_tpu.models.mask_rcnn import preprocess

    dtype = jnp.dtype(config.compute_dtype)

    def upto_stage(k):
        def fn(p, imgs, anch):
            feats = resnet.apply_resnet(p, preprocess(imgs, config),
                                        config.architecture, dtype=dtype)
            # apply_resnet returns (C2, C3, C4, C5); keep only stage k.
            return jnp.sum(feats[k].astype(jnp.float32))
        return fn

    def stem_only(p, imgs, anch):
        from maskrcnn_tpu.ops import stem_pallas
        x = preprocess(imgs, config)
        if stem_pallas.stem_supported(x.shape, dtype, None):
            return jnp.sum(
                stem_pallas.apply_stem_pallas(p, x).astype(jnp.float32))
        from maskrcnn_tpu.models import nn
        x = nn.conv2d(x.astype(dtype), p["conv1"], stride=2,
                      padding=[(3, 3), (3, 3)], dtype=dtype)
        x = nn.relu(nn.bn_apply(x, p, "bn_conv1", None))
        return jnp.sum(nn.max_pool(x, 3, 2, padding="SAME")
                       .astype(jnp.float32))

    return [("stem", stem_only)] + [
        (f"res{k+2}", upto_stage(k)) for k in range(4)]


def build_proposal_prefixes(config):
    """Sub-stages inside generate_proposals (on top of backbone+rpn)."""
    from maskrcnn_tpu.models import rpn
    from maskrcnn_tpu.models.mask_rcnn import backbone_fpn, preprocess
    from maskrcnn_tpu.ops.boxes import apply_box_deltas, clip_boxes
    from maskrcnn_tpu.ops.nms import nms_padded
    from maskrcnn_tpu.ops.proposals import generate_proposals

    dtype = jnp.dtype(config.compute_dtype)
    k = config.pre_nms_max_proposals

    def thin(tree):
        return [jnp.sum(x.astype(jnp.float32))
                for x in jax.tree_util.tree_leaves(tree)]

    def _fg(p, imgs):
        pyr = backbone_fpn(p, preprocess(imgs, config), config, dtype)
        logits, deltas = rpn.apply_rpn(p, pyr, dtype=dtype)
        return logits[..., 1] - logits[..., 0], deltas

    def upto_rpn(p, imgs, anch):
        return thin(_fg(p, imgs))

    def upto_topk(p, imgs, anch):
        fg, _ = _fg(p, imgs)
        return thin(jax.vmap(lambda s: jax.lax.approx_max_k(
            s.astype(jnp.float32), k,
            recall_target=config.proposal_topk_recall))(fg))

    def upto_decode(p, imgs, anch):
        fg, deltas = _fg(p, imgs)

        def one(s, d):
            _, idx = jax.lax.approx_max_k(
                s.astype(jnp.float32), k,
                recall_target=config.proposal_topk_recall)
            sd = jnp.take(d, idx, axis=0).astype(jnp.float32)
            sa = jnp.take(anch, idx, axis=0).astype(jnp.float32)
            std = jnp.asarray(config.bbox_std_dev, jnp.float32)
            return clip_boxes(apply_box_deltas(sa, sd * std))
        return thin(jax.vmap(one)(fg, deltas))

    def upto_nms(p, imgs, anch):
        fg, deltas = _fg(p, imgs)
        propose = functools.partial(
            generate_proposals, bbox_std_dev=config.bbox_std_dev,
            pre_nms_max_proposals=k, max_proposals=config.max_proposals,
            nms_threshold=config.proposal_nms_threshold,
            topk_recall=config.proposal_topk_recall)
        return thin(jax.vmap(propose, in_axes=(0, 0, None))(
            fg, deltas, anch))

    return [("backbone+fpn+rpn", upto_rpn), ("approx top-k", upto_topk),
            ("gathers+decode+clip", upto_decode), ("nms (full)", upto_nms)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--arch", default="resnet101")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--backbone-detail", action="store_true",
                    help="ablate stages inside the resnet backbone instead")
    ap.add_argument("--proposal-detail", action="store_true",
                    help="ablate sub-stages inside generate_proposals")
    ap.add_argument("--fuse", choices=("config", "none", "cls", "mask",
                                       "both"), default="config",
                    help="override the ROIAlign head-fusion flags")
    args = ap.parse_args()

    from maskrcnn_tpu.core.anchors import generate_anchors
    from maskrcnn_tpu.core.config import MaskRCNNConfig
    from maskrcnn_tpu.models.mask_rcnn import init_mask_rcnn

    config = MaskRCNNConfig(architecture=args.arch)
    if args.fuse != "config":
        config = config.replace(
            fuse_classifier_head=args.fuse in ("cls", "both"),
            fuse_mask_head=args.fuse in ("mask", "both"))
    params = init_mask_rcnn(jax.random.PRNGKey(0), config)
    anchors = jnp.asarray(generate_anchors(config))
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (args.batch, config.image_height,
                             config.image_width, 3)), jnp.float32)

    prev = 0.0
    print(f"prefix-ablation, {args.arch} batch {args.batch} "
          f"on {jax.devices()[0].device_kind}")
    if args.backbone_detail:
        prefixes = build_backbone_prefixes(config)
    elif args.proposal_detail:
        prefixes = build_proposal_prefixes(config)
    else:
        prefixes = build_prefixes(config)
    for name, fn in prefixes:
        t = timeit(jax.jit(fn), params, images, anchors, iters=args.iters)
        print(f"{name:28s}: cumulative {t*1000:8.2f} ms   "
              f"delta {max(t-prev, 0.0)*1000:7.2f} ms")
        prev = t


if __name__ == "__main__":
    main()
