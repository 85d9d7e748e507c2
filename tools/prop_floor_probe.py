"""Proposals-stage floor proof probe (VERDICT r03 item 4).

Decomposes the ~16 ms proposal stage (batch 48, flagship config) into its
three legs, each timed standalone with chained readback, and pins each to
a hardware property:

  topk      : `approx_max_k(recall 0.95)` over (48, 262144) f32. The HLO
              is dumped to report the PartialReduce candidate count l —
              the internal exact sort of l elements is the cost.
  +gather   : + (6000,4) delta row-gather + analytic anchor decode +
              clip (the delta gather is per-index latency bound:
              ~14 ns/row, PERF.md gather fast-path rule).
  +nms      : the full stage (adds the Pallas NMS kernel).
  nms_only  : the kernel on pre-decoded sorted boxes at realistic
              clustered-density (so chunk walk + fixpoint counts match
              production), tile sweep 256/512.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    tools/prop_floor_probe.py --out docs/prop_floor_r04.json
"""

from __future__ import annotations

import argparse
import functools
import json
import re
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from maskrcnn_tpu.core.anchors import anchor_spec, generate_anchors
from maskrcnn_tpu.core.config import MaskRCNNConfig
from maskrcnn_tpu.ops.boxes import apply_box_deltas, clip_boxes
from maskrcnn_tpu.ops.nms import nms_gather, nms_padded


def t(f, *a, iters=10):
    o = f(*a)
    np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1000


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--out", default="docs/prop_floor_r04.json")
    args = ap.parse_args()

    cfg = MaskRCNNConfig(architecture="resnet101")
    spec = anchor_spec(cfg)
    anchors = jnp.asarray(generate_anchors(cfg))
    a = anchors.shape[0]
    b, k = args.batch, cfg.pre_nms_max_proposals
    rng = np.random.default_rng(0)
    # clustered scores (like a trained RPN): a few hundred hot anchors per
    # image, so NMS keep-density matches production, not white noise
    base = rng.standard_normal((b, a)).astype(np.float32)
    hot = rng.choice(a, (b, 400))
    for i in range(b):
        base[i, hot[i]] += 6.0
    fg = jnp.asarray(base)
    deltas = jnp.asarray(rng.standard_normal((b, a, 4)) * 0.1, jnp.bfloat16)

    thin = lambda o: [jnp.sum(x.astype(jnp.float32))
                      for x in jax.tree_util.tree_leaves(o)]
    report = {"batch": b, "anchors": a, "pre_nms": k}

    # -- leg 1: top-k ------------------------------------------------------
    topk_fn = jax.vmap(lambda x: jax.lax.approx_max_k(
        x, k, recall_target=0.95))
    f1 = jax.jit(lambda s: thin(topk_fn(s)))
    report["topk_ms"] = round(t(f1, fg), 2)

    # PartialReduce candidate count l from the HLO (the internal exact
    # top-k sorts l elements per image — that sort IS the cost)
    hlo = jax.jit(topk_fn).lower(fg).compile().as_text()
    m = re.findall(r"PartialReduce[^\n]*", hlo)
    lvals = re.findall(r"f32\[\d+,(\d+)\]", "".join(m))
    report["partial_reduce_l"] = sorted({int(x) for x in lvals})
    report["hlo_partial_reduce_lines"] = m[:2]

    # -- leg 2: + gather + decode + clip ----------------------------------
    from maskrcnn_tpu.core.anchors import anchors_at

    def sel_decode(s, d):
        def one(sc, dd):
            _, idx = jax.lax.approx_max_k(sc, k, recall_target=0.95)
            sd = jnp.take(dd, idx, axis=0).astype(jnp.float32)
            sa = anchors_at(idx, spec)
            std = jnp.asarray(cfg.bbox_std_dev, jnp.float32)
            return clip_boxes(apply_box_deltas(sa, sd * std))
        return thin(jax.vmap(one)(s, d))

    f2 = jax.jit(sel_decode)
    report["topk_gather_decode_ms"] = round(t(f2, fg, deltas), 2)

    # -- leg 3: full stage -------------------------------------------------
    from maskrcnn_tpu.ops.proposals import generate_proposals
    full = jax.jit(lambda s, d: thin(jax.vmap(
        functools.partial(
            generate_proposals, bbox_std_dev=cfg.bbox_std_dev,
            pre_nms_max_proposals=k, max_proposals=cfg.max_proposals,
            nms_threshold=cfg.proposal_nms_threshold,
            topk_recall=0.95, anchor_spec=spec),
        in_axes=(0, 0, None))(s, d, None)))
    report["full_stage_ms"] = round(t(full, fg, deltas), 2)
    report["nms_by_difference_ms"] = round(
        report["full_stage_ms"] - report["topk_gather_decode_ms"], 2)

    # -- NMS kernel alone on realistic sorted boxes ------------------------
    def make_boxes(s, d):
        def one(sc, dd):
            _, idx = jax.lax.approx_max_k(sc, k, recall_target=0.95)
            sd = jnp.take(dd, idx, axis=0).astype(jnp.float32)
            sa = anchors_at(idx, spec)
            std = jnp.asarray(cfg.bbox_std_dev, jnp.float32)
            return clip_boxes(apply_box_deltas(sa, sd * std))
        return jax.vmap(one)(s, d)

    boxes = jax.jit(make_boxes)(fg, deltas)
    boxes.block_until_ready()
    for tile in (256, 512):
        nf = jax.jit(lambda bx: thin(jax.vmap(
            lambda x: nms_padded(x, jnp.ones((k,), jnp.bool_),
                                 cfg.proposal_nms_threshold,
                                 cfg.max_proposals, tile_size=tile))(bx)))
        report[f"nms_only_tile{tile}_ms"] = round(t(nf, boxes), 2)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"# wrote {args.out}", file=sys.stderr)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
