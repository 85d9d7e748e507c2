"""Proposal-stage micro-probes, round 2 (batch 48, chained-readback).

Candidates measured in isolation before touching the pipeline:
  A. approx_max_k on float32 vs bfloat16 scores (PartialReduce is
     compute-bound per docs/PERF.md — does halving element width help?).
  B. Pallas NMS tile width 512 vs 768 vs 1024 (fewer sequential tile steps
     vs a larger within-tile fixpoint).
  C. analytic decode (current production path) end-to-end for reference.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/prop_probe2.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tpu.core.anchors import anchor_spec, generate_anchors
from maskrcnn_tpu.core.config import MaskRCNNConfig
from maskrcnn_tpu.ops.proposals import generate_proposals


def t(f, *a, iters=10):
    o = f(*a)
    np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    cfg = MaskRCNNConfig(architecture="resnet101")
    anchors = jnp.asarray(generate_anchors(cfg))
    a = anchors.shape[0]
    b, k = 48, cfg.pre_nms_max_proposals
    rng = np.random.default_rng(0)
    fg32 = jnp.asarray(rng.standard_normal((b, a)), jnp.float32)
    fg16 = fg32.astype(jnp.bfloat16)
    deltas = jnp.asarray(rng.standard_normal((b, a, 4)) * 0.1, jnp.bfloat16)

    thin = lambda o: [jnp.sum(x.astype(jnp.float32))
                      for x in jax.tree_util.tree_leaves(o)]

    # A. top-k dtype
    for name, fg in (("topk f32", fg32), ("topk bf16", fg16)):
        f = jax.jit(lambda s: thin(jax.vmap(
            lambda x: jax.lax.approx_max_k(x, k, recall_target=0.95))(s)))
        print(f"{name:28s}: {t(f, fg):7.2f} ms", flush=True)

    # A'. bf16 top-k + f32 gather of the true scores is NOT needed — scores
    # are only a ranking key past this point. Check candidate overlap:
    _, i32 = jax.vmap(lambda x: jax.lax.approx_max_k(
        x, k, recall_target=0.95))(fg32)
    _, i16 = jax.vmap(lambda x: jax.lax.approx_max_k(
        x, k, recall_target=0.95))(fg16)
    ov = np.mean([np.isin(np.asarray(i16[i]), np.asarray(i32[i])).mean()
                  for i in range(b)])
    print(f"bf16/f32 candidate overlap  : {ov:.4f}", flush=True)

    # B/C. full proposal stage: NMS tile width sweep on the production path
    spec = anchor_spec(cfg)
    for tile in (512, 768, 1024):
        def full(fg, d, tile=tile):
            def one(s, dd):
                return generate_proposals(
                    s, dd, None,
                    bbox_std_dev=cfg.bbox_std_dev,
                    pre_nms_max_proposals=k,
                    max_proposals=cfg.max_proposals,
                    nms_threshold=cfg.proposal_nms_threshold,
                    nms_tile=tile,
                    topk_recall=cfg.proposal_topk_recall,
                    anchor_spec=spec)
            return thin(jax.vmap(one)(fg, d))
        print(f"full stage, nms_tile={tile:4d}: {t(jax.jit(full), fg32, deltas):7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
