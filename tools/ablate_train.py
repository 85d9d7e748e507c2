"""Train-step floor accounting by prefix ablation (VERDICT r2 weak #4).

Same methodology as `tools/ablate_pipeline.py` for inference: compile the
training computation truncated after each stage, time chained-readback,
difference consecutive prefixes. Stages follow `train/step.py::
compute_losses` (forward + targets + losses), then three whole-step
variants isolate backward and optimizer cost:

  loss_only   = value of compute_losses            (forward + targets)
  loss_grad   = value_and_grad                     (+ backward)
  full_step   = train_step                         (+ optimizer update)

Run on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_train.py \
      --batch 8 [--json docs/ablate_train_r03.json]
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
    np.asarray(jnp.reshape(leaf, (-1,))[:1])


def timeit(fn, *args, iters=6):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def thin(tree):
    return [jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(tree)]


def build_prefixes(config):
    """(name, fn(params, batch, anchors, key)) prefixes mirroring
    train/step.py::compute_losses stage by stage."""
    from maskrcnn_tpu.models import heads as heads_mod
    from maskrcnn_tpu.models import rpn as rpn_mod
    from maskrcnn_tpu.models.mask_rcnn import backbone_fpn, preprocess
    from maskrcnn_tpu.ops.proposals import generate_proposals
    from maskrcnn_tpu.ops.roi_align import (build_flat_pyramid,
                                            pyramid_roi_align_flat)
    from maskrcnn_tpu.train import losses as L
    from maskrcnn_tpu.train.targets import proposal_targets, rpn_targets

    dtype = jnp.dtype(config.compute_dtype)
    image_hw = (config.image_height, config.image_width)
    bn_ctx = ({"use_batch_stats": True} if config.train_bn == "batch"
              else None)

    def fwd_parts(params, batch, anchors, key, upto):
        b = batch["images"].shape[0]
        x = preprocess(batch["images"], config)
        pyramid = backbone_fpn(params, x, config, dtype, bn_ctx=bn_ctx,
                               inference=False)
        rpn_logits, rpn_deltas = rpn_mod.apply_rpn(params, pyramid,
                                                   dtype=dtype)
        if upto == "backbone_rpn":
            return thin((pyramid, rpn_logits, rpn_deltas))

        gt_valid = batch["gt_class_ids"] > 0
        keys = jax.random.split(key, b * 2).reshape(b, 2, 2)
        rpn_t = jax.vmap(
            functools.partial(
                rpn_targets,
                train_anchors=config.rpn_train_anchors_per_image,
                bbox_std_dev=config.bbox_std_dev,
                sampling_topk=config.train_sampling_topk),
            in_axes=(None, 0, 0, 0))(
            anchors, batch["gt_boxes"], batch["gt_class_ids"], keys[:, 0])
        loss_rpn_cls = jax.vmap(L.rpn_class_loss)(
            rpn_logits, rpn_t.labels).mean()
        loss_rpn_box = jax.vmap(L.rpn_bbox_loss)(
            rpn_deltas, rpn_t.pos_deltas, rpn_t.pos_idx,
            rpn_t.pos_valid).mean()
        if upto == "rpn_targets":
            return thin((pyramid, loss_rpn_cls, loss_rpn_box))

        fg = jax.nn.softmax(rpn_logits, axis=-1)[..., 1]
        propose = functools.partial(
            generate_proposals,
            bbox_std_dev=config.bbox_std_dev,
            pre_nms_max_proposals=config.pre_nms_max_proposals,
            max_proposals=config.max_proposals,
            nms_threshold=config.proposal_nms_threshold,
            topk_recall=config.proposal_topk_recall)
        rois, roi_valid = jax.vmap(propose, in_axes=(0, 0, None))(
            jax.lax.stop_gradient(fg), jax.lax.stop_gradient(rpn_deltas),
            anchors)
        rois = jnp.concatenate([rois, batch["gt_boxes"]], axis=1)
        roi_valid = jnp.concatenate([roi_valid, gt_valid], axis=1)
        if upto == "proposals":
            return thin((pyramid, loss_rpn_cls, loss_rpn_box, rois,
                         roi_valid))

        sample = functools.partial(
            proposal_targets,
            num_rois=config.train_rois_per_image,
            positive_fraction=config.roi_positive_ratio,
            mask_size=config.mask_size,
            bbox_std_dev=config.bbox_std_dev)
        tgt = jax.vmap(sample)(
            rois, roi_valid, batch["gt_boxes"], batch["gt_class_ids"],
            batch["gt_masks"], keys[:, 1])
        if upto == "proposal_targets":
            return thin((pyramid, loss_rpn_cls, loss_rpn_box, tgt.rois,
                         tgt.deltas, tgt.masks, tgt.class_ids))

        t = config.train_rois_per_image
        flat_pyr = jax.vmap(lambda *f: build_flat_pyramid(f))(*pyramid[:4])
        align_cls = functools.partial(
            pyramid_roi_align_flat, crop_size=config.pool_size,
            image_shape=image_hw,
            canonical_scale=config.roi_canonical_scale)
        pooled = jax.vmap(lambda f, r: align_cls(f, r))(flat_pyr, tgt.rois)
        _, pred_deltas, cls_logits = heads_mod.apply_classifier_head(
            params, pooled.reshape((b * t,) + pooled.shape[2:]),
            config.num_classes, dtype=dtype, with_logits=True,
            bn_ctx=bn_ctx)
        flat_class = tgt.class_ids.reshape(b * t)
        loss_cls = L.mrcnn_class_loss(
            cls_logits, flat_class, tgt.roi_valid.reshape(b * t))
        loss_box = L.mrcnn_bbox_loss(
            pred_deltas, tgt.deltas.reshape(b * t, 4), flat_class)
        if upto == "classifier_head":
            return thin((flat_pyr, loss_rpn_cls, loss_rpn_box, loss_cls,
                         loss_box, tgt.masks))

        align_mask = functools.partial(
            pyramid_roi_align_flat, crop_size=config.mask_pool_size,
            image_shape=image_hw,
            canonical_scale=config.roi_canonical_scale)
        mask_pooled = jax.vmap(lambda f, r: align_mask(f, r))(flat_pyr,
                                                              tgt.rois)
        pred_masks = heads_mod.apply_mask_head(
            params, mask_pooled.reshape((b * t,) + mask_pooled.shape[2:]),
            dtype=dtype, bn_ctx=bn_ctx)
        loss_mask = L.mrcnn_mask_loss(
            pred_masks, tgt.masks.reshape(b * t, config.mask_size,
                                          config.mask_size), flat_class)
        total = (loss_rpn_cls + loss_rpn_box + loss_cls + loss_box
                 + loss_mask)
        return thin((total,))

    names = ("backbone_rpn", "rpn_targets", "proposals",
             "proposal_targets", "classifier_head", "mask_head_loss")
    return [(n, jax.jit(functools.partial(fwd_parts, upto=n)))
            for n in names]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="resnet101")
    ap.add_argument("--image-size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--json")
    args = ap.parse_args()

    from maskrcnn_tpu.core.anchors import generate_anchors
    from maskrcnn_tpu.core.config import MaskRCNNConfig
    from maskrcnn_tpu.models.mask_rcnn import init_mask_rcnn
    from maskrcnn_tpu.train.step import (compute_losses, make_train_state,
                                         train_step)
    from maskrcnn_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    config = MaskRCNNConfig(
        architecture=args.arch,
        input_image_shape=(args.image_size, args.image_size, 3))
    params = init_mask_rcnn(jax.random.PRNGKey(0), config)
    anchors = jnp.asarray(generate_anchors(config))
    state, tx_and_mask = make_train_state(params, config)

    rng = np.random.default_rng(0)
    b, g, m = args.batch, 4, config.mask_size
    yx1 = rng.uniform(0, 0.6, (b, g, 2))
    wh = rng.uniform(0.1, 0.3, (b, g, 2))
    batch = {
        "images": jnp.asarray(rng.uniform(
            0, 255, (b, args.image_size, args.image_size, 3)), jnp.float32),
        "gt_boxes": jnp.asarray(np.concatenate([yx1, yx1 + wh], -1),
                                jnp.float32),
        "gt_class_ids": jnp.asarray(
            rng.integers(1, config.num_classes, (b, g)), jnp.int32),
        "gt_masks": jnp.asarray((rng.random((b, g, m, m)) > 0.5),
                                jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    rows = []
    prev = 0.0
    for name, fn in build_prefixes(config):
        t = timeit(fn, params, batch, anchors, key, iters=args.iters)
        rows.append((name, t * 1e3, (t - prev / 1e3) * 1e3))
        print(f"{name:<20} cum {t * 1e3:8.1f} ms   delta "
              f"{t * 1e3 - prev:8.1f} ms", flush=True)
        prev = t * 1e3

    # whole-step variants: forward loss / +backward / +optimizer
    loss_only = jax.jit(functools.partial(compute_losses, config=config))
    t_loss = timeit(
        lambda: loss_only(params, batch=batch, anchors=anchors, key=key)[0],
        iters=args.iters)
    grad_fn = jax.jit(jax.grad(
        lambda p: compute_losses(p, batch, anchors, config, key)[0]))
    t_grad = timeit(lambda: grad_fn(params), iters=args.iters)
    t_step = timeit(
        lambda: train_step(state, batch, anchors, key, config,
                           tx_and_mask)[1]["loss"],
        iters=args.iters)

    print(f"{'LOSS (fwd+targets)':<20} {t_loss * 1e3:8.1f} ms")
    print(f"{'+ BACKWARD':<20} {t_grad * 1e3:8.1f} ms   "
          f"(bwd delta {(t_grad - t_loss) * 1e3:.1f} ms)")
    print(f"{'+ OPTIMIZER':<20} {t_step * 1e3:8.1f} ms   "
          f"(opt delta {(t_step - t_grad) * 1e3:.1f} ms)")
    print(f"throughput: {args.batch / t_step:.1f} img/s at batch "
          f"{args.batch}")

    if args.json:
        import json
        with open(args.json, "w") as f:
            json.dump({
                "metric": f"train_step_ablation_{args.arch}_"
                          f"{args.image_size}",
                "batch": args.batch,
                "prefix_cumulative_ms": {n: round(t, 1)
                                         for n, t, _ in rows},
                "prefix_delta_ms": {n: round(d, 1) for n, _, d in rows},
                "loss_ms": round(t_loss * 1e3, 1),
                "loss_grad_ms": round(t_grad * 1e3, 1),
                "full_step_ms": round(t_step * 1e3, 1),
                "backward_delta_ms": round((t_grad - t_loss) * 1e3, 1),
                "optimizer_delta_ms": round((t_step - t_grad) * 1e3, 1),
                "img_per_s": round(args.batch / t_step, 1),
                "device": jax.devices()[0].device_kind,
            }, f, indent=1)
        print(f"# wrote {args.json}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
