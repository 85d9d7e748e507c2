"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md): images/sec/chip for ResNet-101-FPN Mask-RCNN
at 1024x1024 on one TPU chip, end-to-end jitted forward (preprocess in-graph
through detections + masks). `vs_baseline` is relative to the 100 img/s/chip
target from BASELINE.json (the reference publishes no numbers of its own —
SURVEY.md §6).

Usage:
  python bench.py                  # flagship r101 @ 1024², real TPU
  python bench.py --preset tiny --platform cpu   # CI smoke
  python bench.py --batch 8 --iters 20
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=("full", "tiny"), default="full")
    ap.add_argument("--platform", choices=("default", "cpu"),
                    default="default")
    ap.add_argument("--batch", type=int, default=0,
                    help="batch size (0 = auto per preset)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--mode", choices=("infer", "train"), default="infer")
    ap.add_argument("--arch", default="resnet101",
                    choices=("resnet101", "resnet50", "mobilenetv2"),
                    help="backbone for the full preset")
    ap.add_argument("--fuse", choices=("config", "none", "cls", "mask",
                                       "both"), default="config",
                    help="override head-fusion flags (Pallas ROIAlign-fused "
                         "classifier/mask heads) for A/B sweeps")
    ap.add_argument("--remat", action="store_true",
                    help="train mode: rematerialize backbone+FPN in the "
                         "backward pass (config.train_remat_backbone) — "
                         "for batch-size sweeps past the activation limit")
    ap.add_argument("--train-bn", choices=("batch", "frozen"),
                    default="batch",
                    help="train mode BN: 'batch' = from-scratch recipe "
                         "(live batch stats); 'frozen' = Matterport "
                         "fine-tuning recipe (stored stats, BN layers "
                         "frozen) — the 21.1 img/s config at batch 16 "
                         "with --remat")
    ap.add_argument("--train-fused-kernels", action="store_true",
                    help="train mode + frozen BN: run the fused Pallas "
                         "stem/chain forwards via custom_vjp (measured "
                         "NEGATIVE on v5e — PERF.md #17; flag kept for "
                         "the A/B)")
    ap.add_argument("--bf16-momentum", action="store_true",
                    help="train mode: bfloat16 SGD momentum accumulator "
                         "(config.train_momentum_dtype) — halves "
                         "optimizer-state HBM footprint/traffic")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from maskrcnn_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from maskrcnn_tpu.core.anchors import generate_anchors
    from maskrcnn_tpu.core.config import MaskRCNNConfig, tiny_test_config
    from maskrcnn_tpu.models.mask_rcnn import forward, init_mask_rcnn

    if args.preset == "tiny":
        config = tiny_test_config()
        batch = args.batch or 2
    else:
        config = MaskRCNNConfig(architecture=args.arch)
        # Inference batch 48 measured the v5e throughput knee: 142.4 img/s
        # vs 139.9 at 32 and 139.5 at 64 (pipelined, same chip).
        batch = args.batch or (8 if args.mode == "train" else 48)

    if args.fuse != "config":
        config = config.replace(
            fuse_classifier_head=args.fuse in ("cls", "both"),
            fuse_mask_head=args.fuse in ("mask", "both"))
    if args.remat:
        config = config.replace(train_remat_backbone=True)
    if args.train_bn != "batch":
        config = config.replace(train_bn=args.train_bn)
    if args.train_fused_kernels:
        config = config.replace(train_fused_kernels=True)
    if args.bf16_momentum:
        config = config.replace(train_momentum_dtype="bfloat16")

    dev = jax.devices()[0]
    print(f"# bench: {config.architecture} @ "
          f"{config.image_height}x{config.image_width}, batch={batch}, "
          f"device={dev.device_kind}", file=sys.stderr)

    params = init_mask_rcnn(jax.random.PRNGKey(0), config)
    anchors = jnp.asarray(generate_anchors(config))
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (batch, config.image_height,
                             config.image_width, 3)).astype(np.float32))

    if args.mode == "train":
        return _bench_train(args, config, params, anchors, images, batch)

    def run():
        out = forward(params, images, anchors, config)
        # Hard sync via host readback: block_until_ready over a tunneled
        # device has been observed to return before execution finishes.
        np.asarray(out["detections"][0, 0])
        return out

    t0 = time.perf_counter()
    run()
    compile_s = time.perf_counter() - t0
    print(f"# first call (compile+run): {compile_s:.1f}s", file=sys.stderr)

    for _ in range(args.warmup):
        run()

    # Latency: block every step (what one caller waiting on results sees).
    # p95/p99 alongside p50 — production budgets are per-request bounds,
    # not medians (VERDICT r04 #3).
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    import numpy as _np
    p95, p99 = (float(_np.percentile(_np.asarray(times), q)) * 1000
                for q in (95, 99))

    # Throughput: pipelined dispatch, one sync at the end (offline-serving
    # convention — keeps the device busy back-to-back).
    t0 = time.perf_counter()
    out = None
    for _ in range(args.iters):
        out = forward(params, images, anchors, config)
    np.asarray(out["detections"][0, 0])  # hard sync (see run())
    pipelined = (time.perf_counter() - t0) / args.iters

    img_per_s = batch / pipelined
    print(f"# blocking p50 step {med*1000:.2f} ms "
          f"(p95 {p95:.2f} / p99 {p99:.2f}; {batch/med:.2f} img/s); "
          f"pipelined {pipelined*1000:.2f} ms "
          f"-> {img_per_s:.2f} img/s, {pipelined/batch*1000:.2f} ms/img",
          file=sys.stderr)

    metric = (f"images_per_sec_per_chip_{config.architecture}_"
              f"{config.image_height}")
    print(json.dumps({
        "metric": metric,
        "value": round(img_per_s, 3),
        "unit": "images/sec",
        "vs_baseline": round(img_per_s / 100.0, 4),
    }))
    return 0


def _bench_train(args, config, params, anchors, images, batch):
    import time as _t

    import jax
    import jax.numpy as jnp
    import numpy as np

    from maskrcnn_tpu.train.step import make_train_state, train_step

    rng = np.random.default_rng(1)
    g, m = 8, config.mask_size
    yx1 = rng.uniform(0, 0.6, (batch, g, 2))
    wh = rng.uniform(0.1, 0.3, (batch, g, 2))
    batch_data = {
        "images": images,
        "gt_boxes": jnp.asarray(
            np.concatenate([yx1, yx1 + wh], -1), jnp.float32),
        "gt_class_ids": jnp.asarray(
            rng.integers(1, config.num_classes, (batch, g)), jnp.int32),
        "gt_masks": jnp.asarray(
            (rng.random((batch, g, m, m)) > 0.5), jnp.float32),
    }
    state, txm = make_train_state(params, config)
    key = jax.random.PRNGKey(2)

    def run(st):
        st, metrics = train_step(st, batch_data, anchors, key, config, txm)
        np.asarray(metrics["loss"])  # hard sync via host readback
        return st

    t0 = time.perf_counter()
    state = run(state)
    print(f"# train compile+step: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    for _ in range(args.warmup):
        state = run(state)
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        state = run(state)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"# train p50 step {med*1000:.1f} ms, "
          f"{batch/med:.2f} img/s", file=sys.stderr)
    if config.train_fused_kernels and config.train_bn != "frozen":
        print("# WARNING: --train-fused-kernels has no effect without "
              "--train-bn frozen (batch-BN stats cannot fold into conv "
              "weights; the kernels gate themselves off)", file=sys.stderr)
    suffix = ("" if config.train_bn == "batch" else f"_{config.train_bn}bn") \
        + ("_remat" if config.train_remat_backbone else "") \
        + ("_fusedkernels" if config.train_fused_kernels else "") \
        + ("_bf16mom" if config.train_momentum_dtype == "bfloat16" else "")
    print(json.dumps({
        "metric": (f"train_images_per_sec_per_chip_{config.architecture}_"
                   f"{config.image_height}{suffix}"),
        "value": round(batch / med, 3),
        "unit": "images/sec",
        "vs_baseline": round(batch / med / 100.0, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
