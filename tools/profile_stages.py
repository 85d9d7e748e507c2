"""Per-stage timing of the inference pipeline on the current backend.

Each stage is jitted separately and timed steady-state, so the sum slightly
overestimates the fused pipeline (extra HBM round trips between stages) but
shows where the time goes. Run on the TPU: `python tools/profile_stages.py`.
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # Host readback: block_until_ready over a tunneled device can return
    # before execution finishes.
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from maskrcnn_tpu.core.anchors import generate_anchors
    from maskrcnn_tpu.core.config import MaskRCNNConfig
    from maskrcnn_tpu.models import heads, rpn
    from maskrcnn_tpu.models.mask_rcnn import (backbone_fpn, init_mask_rcnn,
                                               preprocess)
    from maskrcnn_tpu.ops.detection import refine_detections
    from maskrcnn_tpu.ops.proposals import generate_proposals
    from maskrcnn_tpu.ops.roi_align import pyramid_roi_align

    config = MaskRCNNConfig(architecture="resnet101")
    b = args.batch
    dtype = jnp.bfloat16
    params = init_mask_rcnn(jax.random.PRNGKey(0), config)
    anchors = jnp.asarray(generate_anchors(config))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (b, 1024, 1024, 3)),
                         jnp.float32)
    image_hw = (1024, 1024)

    stage_bb = jax.jit(lambda p, x: backbone_fpn(
        p, preprocess(x, config), config, dtype))
    t_bb, pyramid = timeit(stage_bb, params, images)
    print(f"backbone+fpn        : {t_bb*1000:8.2f} ms")

    stage_rpn = jax.jit(lambda p, pyr: rpn.apply_rpn(p, pyr, dtype=dtype))
    t_rpn, (logits, deltas) = timeit(stage_rpn, params, pyramid)
    print(f"rpn heads           : {t_rpn*1000:8.2f} ms")

    fg = jax.nn.softmax(logits, axis=-1)[..., 1]

    propose = functools.partial(
        generate_proposals,
        pre_nms_max_proposals=config.pre_nms_max_proposals,
        max_proposals=config.max_proposals,
        nms_threshold=config.proposal_nms_threshold)
    stage_prop = jax.jit(jax.vmap(propose, in_axes=(0, 0, None)))
    t_prop, (rois, roi_valid) = timeit(stage_prop, fg, deltas, anchors)
    print(f"proposals (topk+nms): {t_prop*1000:8.2f} ms")

    # top_k alone
    stage_topk = jax.jit(lambda s: jax.lax.top_k(s, 6000))
    t_topk, _ = timeit(stage_topk, fg)
    print(f"  - top_k 262k->6k  : {t_topk*1000:8.2f} ms")

    feats = tuple(pyramid[:4])
    if jax.default_backend() == "tpu":
        from maskrcnn_tpu.ops.roi_align_pallas import (
            pyramid_roi_align_pallas)
        stage_align = jax.jit(lambda f, r: pyramid_roi_align_pallas(
            list(f), r, 7, image_hw))
        align_m_fn = jax.jit(lambda f, r: pyramid_roi_align_pallas(
            list(f), r, 14, image_hw))
    else:
        align = functools.partial(pyramid_roi_align, crop_size=7,
                                  image_shape=image_hw)
        stage_align = jax.jit(jax.vmap(lambda f, r: align(f, r)))
        align_m = functools.partial(pyramid_roi_align, crop_size=14,
                                    image_shape=image_hw)
        align_m_fn = jax.jit(jax.vmap(lambda f, r: align_m(f, r)))
    t_align, pooled = timeit(stage_align, feats, rois)
    print(f"roi_align pool7     : {t_align*1000:8.2f} ms")

    stage_cls = jax.jit(lambda p, x: heads.apply_classifier_head(
        p, x.reshape((-1,) + x.shape[2:]), config.num_classes, dtype=dtype))
    t_cls, (probs, cdeltas) = timeit(stage_cls, params, pooled)
    print(f"classifier head     : {t_cls*1000:8.2f} ms")

    probs = probs.reshape(b, -1, config.num_classes)
    cdeltas = cdeltas.reshape(b, -1, config.num_classes, 4)
    refine = functools.partial(refine_detections, max_detections=100)
    stage_det = jax.jit(jax.vmap(refine))
    t_det, (dets, dvalid, _) = timeit(stage_det, rois, probs, cdeltas)
    print(f"detection layer     : {t_det*1000:8.2f} ms")

    t_alm, mpool = timeit(align_m_fn, feats, dets[..., :4])
    print(f"roi_align pool14    : {t_alm*1000:8.2f} ms")

    cls_ids = dets[..., 4].astype(jnp.int32).reshape(-1)
    stage_mask = jax.jit(lambda p, x, ci: heads.apply_mask_head(
        p, x.reshape((-1,) + x.shape[2:]), dtype=dtype, class_ids=ci))
    t_mask, _ = timeit(stage_mask, params, mpool, cls_ids)
    print(f"mask head (fused sel): {t_mask*1000:7.2f} ms")

    total = (t_bb + t_rpn + t_prop + t_align + t_cls + t_det + t_alm
             + t_mask)
    print(f"sum (unfused)       : {total*1000:8.2f} ms "
          f"-> {b/total:6.1f} img/s at batch {b}")


if __name__ == "__main__":
    main()
