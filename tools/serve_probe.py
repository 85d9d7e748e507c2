"""Load-probe the HTTP model server: concurrent clients, dynamic batching.

Starts `pipeline.serve.make_server` in-process on the flagship config and
drives it with K concurrent clients POSTing JPEGs, sweeping K; reports
request throughput, latency percentiles (p50/p95/p99 — production budgets
are per-request bounds, not medians), and the batch-size histogram the
dynamic-batching worker actually formed (the point of the subsystem:
concurrent callers share one device step, `pipeline/serve.py:44-46`).
Reference analog: the example app serves one interactive request at a time
(`Example/Source/ViewController.swift:105-121`); this is the
production-serving counterpart.

Over this box's remote TPU tunnel the host->device wire bounds throughput
exactly as it does for `cli stream`; a locally-attached deployment sees the
device-compute ceiling instead (docs/PERF.md).

Usage:
  python tools/serve_probe.py \
      --weights /tmp/flagship_proof/checkpoint.npz \
      --config /tmp/flagship_proof/config_production.json \
      --images /tmp/flagship_proof/data/coco/val2017 \
      --clients 1 4 16 --out docs/bench_serve_r05.json
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import sys
import threading
import time

import numpy as np


def run_load(port, bodies, clients, requests, worker):
    """Drive `requests` total requests from `clients` threads; return
    (wall_s, sorted latencies, batch-size histogram for this window)."""
    lat: list[float] = []
    lat_lock = threading.Lock()
    remaining = [requests]
    rem_lock = threading.Lock()
    errors: list[str] = []
    hist0 = dict(worker.batch_size_counts)

    def post(body):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/detect", body=body,
                     headers={"Content-Type": "application/octet-stream"})
        r = conn.getresponse()
        payload = json.loads(r.read())
        conn.close()
        return r.status, payload

    def client(ci):
        i = ci
        while True:
            with rem_lock:
                if remaining[0] <= 0:
                    return
                remaining[0] -= 1
            t0 = time.perf_counter()
            try:
                status, payload = post(bodies[i % len(bodies)])
                if status != 200:
                    errors.append(str(payload))
            except Exception as e:  # noqa: BLE001 — recorded, not raised
                errors.append(repr(e))
            with lat_lock:
                lat.append(time.perf_counter() - t0)
            i += clients

    threads = [threading.Thread(target=client, args=(ci,))
               for ci in range(clients)]
    t_start = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t_start
    if errors:
        raise RuntimeError(f"request errors: {errors[:3]}")
    hist = {n: c - hist0.get(n, 0)
            for n, c in worker.batch_size_counts.items()
            if c - hist0.get(n, 0) > 0}
    lat.sort()
    return wall, lat, hist


def pct(lat, q):
    return round(float(np.percentile(np.asarray(lat), q)) * 1000, 1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config")
    ap.add_argument("--weights")
    ap.add_argument("--images", help="dir of JPEGs to post (else synthetic)")
    ap.add_argument("--clients", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("--requests", type=int, default=64,
                    help="requests per sweep point")
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--window-ms", type=float, default=20.0)
    ap.add_argument("--port", type=int, default=8461)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (CPU smoke test)")
    ap.add_argument("--out")
    args = ap.parse_args()

    from maskrcnn_tpu.core.config import MaskRCNNConfig, tiny_test_config
    from maskrcnn_tpu.pipeline.detector import MaskRCNNDetector
    from maskrcnn_tpu.pipeline.serve import make_server

    if args.tiny:
        config = tiny_test_config()
    else:
        config = (MaskRCNNConfig.from_json(args.config) if args.config
                  else MaskRCNNConfig(architecture="resnet101"))
    if args.weights:
        detector = MaskRCNNDetector.from_checkpoint(config, args.weights)
    else:
        detector = MaskRCNNDetector.from_random(config)

    if args.images:
        paths = sorted(
            os.path.join(args.images, n) for n in os.listdir(args.images)
            if n.lower().endswith((".jpg", ".jpeg", ".png")))
        bodies = [open(p, "rb").read() for p in paths]
    else:
        from io import BytesIO

        from PIL import Image

        rng = np.random.default_rng(0)
        bodies = []
        for _ in range(4):
            arr = rng.integers(0, 255, (config.image_height,
                                        config.image_width, 3), np.uint8)
            buf = BytesIO()
            Image.fromarray(arr).save(buf, "JPEG", quality=90)
            bodies.append(buf.getvalue())

    # Warm the single compiled batch shape off the serving path, at the
    # wire dtype — exactly cmd_serve's convention (a cold flagship compile
    # over the tunnel exceeds the worker's 60 s submit timeout, so the
    # first request would 500 instead of measuring anything).
    from maskrcnn_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    size = config.image_height
    wire_dtype = np.uint8 if not args.tiny else np.float32
    t0 = time.perf_counter()
    detector.run_batch(np.zeros((args.max_batch, size, size, 3), wire_dtype))
    print(f"# detector warmup (compile): {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    # uint8 wire: the CLI production default (cli serve without --exact) —
    # explicit here because the library layer defaults to the exact f32
    # wire (ADVICE r04)
    server, worker = make_server(detector, port=args.port,
                                 max_batch=args.max_batch,
                                 window_ms=args.window_ms,
                                 uint8_wire=not args.tiny)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    # warmup: compile the padded-batch program once (not timed)
    _, warm_lat, _ = run_load(args.port, bodies[:1], 1, 1, worker)
    print(f"# warmup ok ({warm_lat[0]*1000:.0f} ms incl. compile)",
          file=sys.stderr)

    sweep = []
    for k in args.clients:
        wall, lat, hist = run_load(args.port, bodies, k, args.requests,
                                   worker)
        point = {
            "clients": k,
            "requests": len(lat),
            "wall_s": round(wall, 2),
            "req_per_s": round(len(lat) / wall, 2),
            "p50_latency_ms": pct(lat, 50),
            "p95_latency_ms": pct(lat, 95),
            "p99_latency_ms": pct(lat, 99),
            "batch_size_hist": {str(n): hist[n] for n in sorted(hist)},
        }
        sweep.append(point)
        print(json.dumps(point), file=sys.stderr)
    server.shutdown()
    worker.stop()

    import jax

    stats = {
        "metric": (f"serve_requests_per_sec_{config.architecture}_"
                   f"{config.image_height}"),
        "max_batch": args.max_batch,
        "window_ms": args.window_ms,
        "uint8_wire": not args.tiny,
        "weights": "trained" if args.weights else "random",
        "images": "real" if args.images else "synthetic",
        "sweep": sweep,
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(stats))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(stats, f, indent=1)
        print(f"# wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
