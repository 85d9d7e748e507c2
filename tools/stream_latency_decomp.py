"""Decompose streaming p50 latency into device residency vs tunnel RPC.

VERDICT r03 weak #2: the streaming config meets the fps bar (53.7 fps at
mb2) but blocking p50 is ~55-59 ms, and PERF.md ATTRIBUTED ~30 ms of that
to the axon-tunnel RPC without measuring it. This probe turns the claim
into data, on the real chip:

  null_roundtrip : block_until_ready of a jitted (8,128)+1 — the smallest
                   possible dispatch+sync through the tunnel. Pure RPC
                   floor; zero device residency (microseconds of compute).
  device_interval: N forward(+paste) steps dispatched back-to-back, one
                   sync at the end, divided by N — the per-frame DEVICE
                   residency with the tunnel amortized away (exactly the
                   figure the committed fps numbers are built from).
  blocking_p50   : dispatch + block per frame (what a synchronous caller
                   sees through the tunnel).

  tunnel_overhead = blocking_p50 - device_interval, cross-checked against
  null_roundtrip: if the two agree, the gap IS the tunnel, and a
  locally-attached host would see ~device_interval + PCIe — the PERF.md
  claim, now with numbers. Reference analog: the reference pipeline runs
  in-process on the Apple Neural Engine (`MaskRCNN.swift` prediction
  path); it has no tunnel term at all.

Run serialized (one TPU process): tools/tpu_session.sh discipline.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    tools/stream_latency_decomp.py --out docs/stream_latency_decomp_r04.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def pcts(fn, iters=24, warmup=3):
    """(p50, p95, p99) ms — tails included: production budgets are
    per-request bounds, not medians (VERDICT r04 #3)."""
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    a = np.asarray(ts) * 1000.0
    return tuple(round(float(np.percentile(a, q)), 2)
                 for q in (50, 95, 99))


def p50(fn, iters=24, warmup=3):
    return pcts(fn, iters, warmup)[0]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minibatch", type=int, default=2,
                    help="frames per dispatch (mb2 = the 53.7 fps config)")
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--pipeline-n", type=int, default=16)
    ap.add_argument("--out", default="docs/stream_latency_decomp_r05.json")
    args = ap.parse_args()

    from maskrcnn_tpu.core.anchors import generate_anchors
    from maskrcnn_tpu.core.config import MaskRCNNConfig
    from maskrcnn_tpu.models.mask_rcnn import forward, init_mask_rcnn

    cfg = MaskRCNNConfig(architecture="resnet101")
    size = cfg.image_height
    mb = args.minibatch
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(generate_anchors(cfg))
    frames = np.random.default_rng(0).integers(
        0, 256, (mb, size, size, 3), dtype=np.uint8)

    dev = jax.devices()[0]
    report = {"device": dev.device_kind, "minibatch": mb,
              "paste_size": size}

    # --- null RPC roundtrip: the smallest dispatch+sync possible ---------
    tiny = jnp.zeros((8, 128), jnp.float32)
    bump = jax.jit(lambda x: x + 1.0)
    np.asarray(bump(tiny))  # compile
    n50, n95, n99 = pcts(lambda: np.asarray(bump(tiny)), args.iters)
    report["null_roundtrip_ms"] = n50
    report["null_roundtrip_p95_ms"] = n95
    report["null_roundtrip_p99_ms"] = n99

    # device_put leg on a real frame (counted inside blocking_p50 too)
    report["transfer_ms"] = round(
        p50(lambda: jax.block_until_ready(jax.device_put(frames)),
            args.iters), 2)

    # --- the streaming step: forward with fused on-device paste ----------
    # Two arms, matching the committed stream artifacts' device_frames=true
    # convention (bench_stream_device_paste_mb2_r03.json): `dev` keeps the
    # frames device-resident (the 53.7 fps config — a locally-attached
    # host's wire is PCIe, not this tunnel), `np` ships numpy each step
    # (what a remote caller through the tunnel pays).
    dev_frames = jax.device_put(frames)
    jax.block_until_ready(dev_frames)

    for arm, inp in (("dev", dev_frames), ("np", frames)):
        def step():
            return forward(params, inp, anchors, cfg, paste_size=size)

        out = step()
        jax.block_until_ready(out["detections"])

        def blocking():
            o = step()
            np.asarray(o["detections"][0, 0])  # hard sync via readback

        blocking_ms, blocking_p95, blocking_p99 = pcts(blocking, args.iters)

        # device interval: back-to-back dispatch, one sync at the end
        def pipelined():
            o = None
            for _ in range(args.pipeline_n):
                o = step()
            np.asarray(o["detections"][0, 0])

        t = p50(pipelined, max(6, args.iters // 4))
        report[arm] = {
            "blocking_p50_ms": blocking_ms,
            "blocking_p95_ms": blocking_p95,
            "blocking_p99_ms": blocking_p99,
            "interval_ms": round(t / args.pipeline_n, 2),
            "fps_pipelined": round(1000.0 * mb / (t / args.pipeline_n), 1),
            "dispatch_sync_overhead_ms": round(
                blocking_ms - t / args.pipeline_n, 2),
        }

    d = report["dev"]
    report["decomposition"] = {
        "device_residency_ms": d["interval_ms"],
        "tunnel_rpc_ms": d["dispatch_sync_overhead_ms"],
        "null_roundtrip_ms": report["null_roundtrip_ms"],
        "wire_ms_per_dispatch": round(
            report["np"]["interval_ms"] - d["interval_ms"], 2),
        "local_host_projection_ms": d["interval_ms"],
    }

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"# wrote {args.out}", file=sys.stderr)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
