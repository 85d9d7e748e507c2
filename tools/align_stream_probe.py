"""Decide the per-tile-streaming ROIAlign question with one measurement.

PERF.md negative result #10 left one escape hatch below pool-7's 28 ms
segment-rate floor: stream the pyramid tile-by-tile (DMA segments ∝ tiles,
~4 ms) and extract/combine strips from VMEM-resident tiles. That reform
keeps the combine EXACTLY as it is today (per-strip y-blend + (q, W) @
(W, C) x-weight matmul) — it only changes where the strip bytes come from.
Today the combine runs hidden under 28 ms of DMA shadow; streamed, it runs
EXPOSED. So its serial cost is a hard lower bound on any streaming kernel:

    streaming_total >= nodma_combine + ~4 ms tile DMA + reorder overheads

This probe measures, same-session at the production operating point
(batch 48 x 1000 pool-7 ROIs):
  full       — the shipping kernel (DMA + combine overlapped)
  nocompute  — DMA only (the segment-rate floor; ~28.3 ms in r02's sweep)
  nodma      — combine only on resident buffers (the exposed-compute bound)

If nodma lands anywhere near `full`, the tiny (8, 48) @ (48, 256) matmuls
(~6% MXU occupancy x 224k issues) are the binding constraint, not the DMA,
and no per-tile formulation can pay for itself. Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/align_stream_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tpu.core.config import MaskRCNNConfig
from maskrcnn_tpu.models.mask_rcnn import (backbone_fpn, init_mask_rcnn,
                                           preprocess)
from maskrcnn_tpu.ops import roi_align_pallas as rap


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
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    b = 48
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (b, 1024, 1024, 3)),
                         jnp.float32)
    pyr = jax.jit(lambda p, x: backbone_fpn(p, preprocess(x, cfg), cfg,
                                            jnp.bfloat16))(params, images)
    pyr = [jnp.asarray(np.asarray(f)) for f in pyr[:4]]
    c = rng.uniform(0.15, 0.85, (b, 1000, 2))
    h = rng.uniform(0.01, 0.5, (b, 1000, 2))
    rois_np = np.concatenate([c - h / 2, c + h / 2], -1).astype(np.float32)
    rois_np[:, 995:] = 0.0
    rois = jnp.asarray(rois_np)

    out = {}
    for mode in ("", "nocompute", "nodma"):
        f7 = lambda f, r: rap.pyramid_roi_align_pallas(
            f, r, 7, (1024, 1024), ablate=mode)
        ms = t(f7, pyr, rois)
        out[mode or "full"] = ms
        print(f"pool7 b48 ablate={mode or 'full':<10}: {ms:7.2f} ms",
              flush=True)
    print(f"exposed-combine share of full: "
          f"{out['nodma'] / out['full']:.2f}", flush=True)


if __name__ == "__main__":
    main()
