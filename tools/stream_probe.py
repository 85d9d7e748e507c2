"""Decompose steady-state streaming latency on the real TPU.

Stages measured per 1024x1024 uint8 frame (flagship resnet101 config,
random weights -- latency does not depend on weight values):
  transfer : host->device device_put of the (1, S, S, 3) uint8 frame
  compute  : jitted forward on a device-resident input
  dispatch : run_batch from numpy without sync (Python+RPC dispatch cost)
  e2e      : run_batch from numpy + block_until_ready (what stream pays)
  paste    : on-device full-res mask paste of the frame's detections

Run serialized (one TPU process): tools/tpu_session.sh discipline.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from maskrcnn_tpu.core.anchors import generate_anchors
from maskrcnn_tpu.core.config import MaskRCNNConfig
from maskrcnn_tpu.models.mask_rcnn import forward, init_mask_rcnn
from maskrcnn_tpu.pipeline.paste import paste_masks_device


def timeit(fn, iters=12, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1000  # median ms


def main():
    cfg = MaskRCNNConfig(architecture="resnet101")
    size = cfg.image_height
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    anchors = generate_anchors(cfg)

    frame = np.random.default_rng(0).integers(
        0, 256, (1, size, size, 3), dtype=np.uint8)

    # transfer: device_put + block
    t_transfer = timeit(
        lambda: jax.block_until_ready(jax.device_put(frame)))
    print(f"transfer (3 MB uint8 host->device): {t_transfer:.1f} ms")

    dev_frame = jax.device_put(frame)
    out = forward(params, dev_frame, anchors, cfg)
    jax.block_until_ready(out["detections"])

    # compute: forward on device-resident input
    t_compute = timeit(
        lambda: jax.block_until_ready(
            forward(params, dev_frame, anchors, cfg)["detections"]))
    print(f"compute (device-resident input):    {t_compute:.1f} ms")

    # dispatch: run from numpy, no sync (async dispatch cost seen by host)
    t_dispatch = timeit(
        lambda: forward(params, jnp.asarray(frame), anchors, cfg))
    print(f"dispatch (numpy in, no sync):       {t_dispatch:.1f} ms")

    # e2e: numpy in + sync — what one un-pipelined stream step pays
    t_e2e = timeit(
        lambda: jax.block_until_ready(
            forward(params, jnp.asarray(frame), anchors, cfg)["detections"]))
    print(f"e2e (numpy in + sync):              {t_e2e:.1f} ms")

    # paste: on-device full-res mask paste
    out = forward(params, dev_frame, anchors, cfg)
    jax.block_until_ready(out["detections"])
    t_paste = timeit(
        lambda: jax.block_until_ready(paste_masks_device(
            out["masks"][0], out["detections"][0, :, :4],
            out["valid"][0], size)))
    print(f"paste (full-res, on device):        {t_paste:.1f} ms")

    print(f"\nimplied max pipelined fps: {1000.0 / max(t_compute, t_transfer):.1f}"
          f" (bound: {'compute' if t_compute > t_transfer else 'transfer'})")


if __name__ == "__main__":
    main()
