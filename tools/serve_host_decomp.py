"""Decompose serve throughput: device step vs host-side work (r05).

`docs/bench_serve_r05.json` measures ~5.2 req/s at K=16 on this box while
the device can do ~147 img/s — this probe attributes the gap by timing each
leg of the worker's request path in isolation, on the same images:

  jpeg_decode_ms   : decode_rgb_bytes per request (native C++ loader)
  device_batch_ms  : detect_images device leg — batch of 8, uint8 wire,
                     masks left on device (paste_masks=False)
  batch_rle_ms     : full detect_images with paste_masks='rle' (adds
                     per-detection region paste + RLE encode on host)
  json_ms          : _detections_to_json serialization per batch

All host legs share this box's ONE core with the HTTP threads and the
in-process probe clients — the serve number is a 1-core-host figure, not a
device ceiling. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/serve_host_decomp.py \
      --weights /tmp/flagship_proof/checkpoint.npz \
      --config /tmp/flagship_proof/config_production.json \
      --images /tmp/flagship_proof/data/coco/val2017 --out /tmp/serve_host.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def med(fn, iters=8, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1000.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--images", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from maskrcnn_tpu.core.config import MaskRCNNConfig
    from maskrcnn_tpu.pipeline.detector import MaskRCNNDetector
    from maskrcnn_tpu.pipeline.loader import decode_rgb_bytes
    from maskrcnn_tpu.pipeline.serve import _detections_to_json
    from maskrcnn_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    config = MaskRCNNConfig.from_json(args.config)
    detector = MaskRCNNDetector.from_checkpoint(config, args.weights)

    paths = sorted(
        os.path.join(args.images, n) for n in os.listdir(args.images)
        if n.lower().endswith((".jpg", ".jpeg")))[:args.batch]
    bodies = [open(p, "rb").read() for p in paths]
    imgs = [decode_rgb_bytes(b) for b in bodies]

    report = {"batch": args.batch}
    report["jpeg_decode_ms_per_req"] = round(
        med(lambda: [decode_rgb_bytes(b) for b in bodies]) / len(bodies), 1)

    # detect_images' own internal legs, isolated: letterbox+quantize on
    # host, the staged uint8 batch's device_put through the tunnel, and
    # the jitted forward (blocking p50)
    import jax

    from maskrcnn_tpu.pipeline.loader import letterbox_rgb
    from maskrcnn_tpu.pipeline.preprocess import quantize_canvas_u8
    size = config.image_height

    def prep():
        return np.stack([quantize_canvas_u8(
            letterbox_rgb(im, size)[0]) for im in imgs])

    report["letterbox_quantize_ms_per_batch"] = round(med(prep), 1)
    staged = prep()
    report["device_put_ms_per_batch"] = round(
        med(lambda: jax.block_until_ready(jax.device_put(staged))), 1)
    dev_batch = jax.device_put(staged)
    jax.block_until_ready(dev_batch)

    def fwd():
        out = detector.run_batch(dev_batch)
        np.asarray(out["detections"][0, 0])

    report["forward_blocking_ms_per_batch"] = round(med(fwd), 1)

    # device leg only: no host paste (masks stay as mask_size crops)
    report["device_batch_ms"] = round(
        med(lambda: detector.detect_images(
            imgs, paste_masks=False, batch_size=args.batch,
            uint8_wire=True)), 1)

    results = None

    def full():
        nonlocal results
        results = detector.detect_images(
            imgs, paste_masks="rle", batch_size=args.batch, uint8_wire=True)

    report["batch_rle_ms"] = round(med(full), 1)
    report["rle_paste_ms"] = round(
        report["batch_rle_ms"] - report["device_batch_ms"], 1)
    report["json_ms_per_batch"] = round(
        med(lambda: [_detections_to_json(r, config.num_classes)
                     for r in results]), 1)
    report["n_detections"] = int(sum(len(r) for r in results))
    report["host_ms_per_batch"] = round(
        report["jpeg_decode_ms_per_req"] * args.batch
        + report["rle_paste_ms"] + report["json_ms_per_batch"], 1)

    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
