"""Decompose the RPN-target-assignment cost found by tools/ablate_train.py.

The r03 train-step prefix ablation measured `rpn_targets` at 57.7 ms for
batch 8 (7.2 ms/img) — 13% of the whole training step, second only to the
backbone. Per image the stage is: one (262k, G) IoU + label masks, two
threefry uniforms over 262k anchors, two `lax.top_k` over 262k scores
(balanced pos/neg subsampling), two 256-index scatters, and a (262k, 4)
delta encode. This probe times cumulative prefixes of that pipeline on the
real chip, plus an A/B of the sampling top-k formulation:

  exact    — `lax.top_k` (shipping)
  approx   — `lax.approx_max_k` on the same masked random scores; for
             SAMPLING (scores ARE uniform random) a recall miss just swaps
             one uniformly random winner for another, and the quota logic
             already backfills negatives when positives come up short, so
             the semantics stay "uniform balanced subsample"

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/rpn_targets_probe.py
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    np.asarray(jnp.reshape(jax.tree_util.tree_leaves(out)[0], (-1,))[:1])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def build(anchors, config, upto, sampler):
    from maskrcnn_tpu.ops.boxes import box_iou
    from maskrcnn_tpu.train.targets import encode_box_deltas

    train_anchors = config.rpn_train_anchors_per_image
    a = anchors.shape[0]

    def one(gt_boxes, gt_class_ids, key):
        full_iou = box_iou(anchors, gt_boxes)
        fg = (gt_class_ids > 0)[None, :]
        crowd = (gt_class_ids < 0)[None, :]
        iou = full_iou * fg.astype(full_iou.dtype)
        crowd_overlap = jnp.max(full_iou * crowd.astype(full_iou.dtype), 1)
        max_iou = jnp.max(iou, axis=1)
        argmax_gt = jnp.argmax(iou, axis=1)
        per_gt_best = jnp.max(iou, axis=0, keepdims=True)
        is_best = jnp.any((iou >= per_gt_best - 1e-7) & (per_gt_best > 0), 1)
        pos = (max_iou >= 0.7) | is_best
        neg = (max_iou < 0.3) & ~pos & (crowd_overlap < 0.001)
        if upto == "iou_labels":
            return pos, neg, argmax_gt
        kp, kn = jax.random.split(key)
        rand_p = jax.random.uniform(kp, (a,))
        rand_n = jax.random.uniform(kn, (a,))
        if upto == "rng":
            return pos, neg, rand_p, rand_n
        k_pos = int(train_anchors * 0.5)
        pos_score = jnp.where(pos, rand_p, -1.0)
        neg_score = jnp.where(neg, rand_n, -1.0)
        if sampler == "exact":
            _, pos_idx = jax.lax.top_k(pos_score, k_pos)
        else:
            _, pos_idx = jax.lax.approx_max_k(pos_score, k_pos)
        if upto == "topk_pos":
            return pos_idx
        pos_sampled = jnp.zeros((a,), jnp.bool_).at[pos_idx].set(True) & pos
        n_pos = jnp.sum(pos_sampled.astype(jnp.int32))
        if sampler == "exact":
            _, neg_idx = jax.lax.top_k(neg_score, train_anchors)
        else:
            _, neg_idx = jax.lax.approx_max_k(neg_score, train_anchors)
        take = jnp.arange(train_anchors) < (train_anchors - n_pos)
        neg_sampled = jnp.zeros((a,), jnp.bool_).at[neg_idx].set(take) & neg
        labels = jnp.where(pos_sampled, 1, jnp.where(neg_sampled, -1, 0))
        if upto == "sampled":
            return labels
        matched = jnp.take(gt_boxes, argmax_gt, axis=0)
        std = jnp.asarray(config.bbox_std_dev, jnp.float32)
        deltas = encode_box_deltas(anchors, matched) / std
        return labels.astype(jnp.int32), deltas.astype(jnp.float32)

    return jax.jit(jax.vmap(one, in_axes=(0, 0, 0)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--gts", type=int, default=4,
                    help="padded GT slots per image (ablate_train used 4)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--json")
    args = ap.parse_args()

    from maskrcnn_tpu.core.anchors import generate_anchors
    from maskrcnn_tpu.core.config import MaskRCNNConfig
    from maskrcnn_tpu.train.targets import rpn_targets
    from maskrcnn_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    config = MaskRCNNConfig(architecture="resnet101")
    anchors = jnp.asarray(generate_anchors(config))

    rng = np.random.default_rng(0)
    b, g = args.batch, args.gts
    yx1 = rng.uniform(0, 0.6, (b, g, 2))
    wh = rng.uniform(0.1, 0.3, (b, g, 2))
    gt_boxes = jnp.asarray(np.concatenate([yx1, yx1 + wh], -1), jnp.float32)
    gt_ids = jnp.asarray(rng.integers(1, 81, (b, g)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(1), b)

    results = {}
    for sampler in ("exact", "approx"):
        prev = 0.0
        for upto in ("iou_labels", "rng", "topk_pos", "sampled", "full"):
            fn = build(anchors, config, upto, sampler)
            ms = timeit(fn, gt_boxes, gt_ids, keys, iters=args.iters)
            results[f"{sampler}/{upto}"] = round(ms, 2)
            print(f"{sampler:>6} {upto:<12} cum {ms:7.2f} ms  "
                  f"delta {ms - prev:7.2f} ms", flush=True)
            prev = ms

    # the shipping function end-to-end, for cross-checking the ablation row
    ship = jax.jit(jax.vmap(
        functools.partial(
            rpn_targets,
            train_anchors=config.rpn_train_anchors_per_image,
            bbox_std_dev=config.bbox_std_dev),
        in_axes=(None, 0, 0, 0)))
    ms = timeit(lambda: ship(anchors, gt_boxes, gt_ids, keys),
                iters=args.iters)
    results["shipping_full"] = round(ms, 2)
    print(f"shipping rpn_targets: {ms:7.2f} ms", flush=True)

    if args.json:
        import json
        with open(args.json, "w") as f:
            json.dump({"metric": "rpn_targets_probe_ms",
                       "batch": b, "gts": g, **results,
                       "device": jax.devices()[0].device_kind}, f, indent=1)
        print(f"# wrote {args.json}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
