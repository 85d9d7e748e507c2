"""Streaming (video) instance segmentation with a persistent compiled pipeline.

BASELINE.json's fifth config: "streaming video instance segmentation at
30 fps with persistent compiled pipeline + on-device mask pasting". The
compiled forward persists across frames (compile once, then steady-state);
frames are processed in micro-batches with double-buffered host->device
transfer (dispatch frame t+1's transfer while frame t computes — the analog
of the reference's 3-deep Metal command-buffer pipelining,
`PyramidROIAlignLayer.swift:143-179`).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable, Iterator

import numpy as np

import jax
import jax.numpy as jnp

from maskrcnn_tpu.pipeline.detector import MaskRCNNDetector


@dataclasses.dataclass
class StreamStats:
    frames: int
    wall_s: float
    p50_latency_ms: float
    # Tail percentiles over the same blocking probes (production frame
    # budgets are per-frame bounds, not medians — BASELINE configs[4]).
    p95_latency_ms: float = 0.0
    p99_latency_ms: float = 0.0
    latency_probes: int = 0

    @property
    def fps(self) -> float:
        return self.frames / self.wall_s if self.wall_s else 0.0


def run_stream(
    detector: MaskRCNNDetector,
    frames: Iterable[np.ndarray],
    on_result: Callable[[int, dict], None] | None = None,
    micro_batch: int = 1,
    prebatched: bool = False,
    paste_size: int | None = None,
    latency_probes: int = 40,
    sync_every: int = 8,
) -> StreamStats:
    """Drive letterboxed (S, S, 3) frames through the persistent pipeline.

    `on_result(frame_idx, outputs)` receives the raw padded device outputs;
    it MUST NOT dispatch device work or device-get (any per-frame sync pays
    an RPC round-trip and serializes with the next frame's forward — stash
    device references and decode after the stream ends). Returns
    throughput/latency stats.

    `paste_size`: paste full-resolution uint8 masks on device INSIDE the
    jitted forward (`outputs["pasted"]`) — the BASELINE streaming config's
    on-device mask pasting, at zero extra dispatches per frame.

    With `prebatched=True` each item of `frames` is already a ready
    (micro_batch, S, S, 3) batch — host numpy or a device-resident array.
    Device-resident batches skip the host->device wire entirely, measuring
    the persistent pipeline's steady-state compute throughput (the number a
    locally-attached deployment sees; over a remote tunnel the wire
    otherwise dominates).
    """
    lat: list[float] = []
    n = 0
    t_start = time.perf_counter()

    # Video frames are 8-bit; shipping uint8 quarters the host->device
    # transfer (12 MB -> 3 MB per 1024² frame) and the in-graph preprocess
    # casts on device (shared convention: preprocess.quantize_canvas_u8).
    from maskrcnn_tpu.pipeline.preprocess import quantize_canvas_u8 as as_u8

    # Throughput: dispatch back-to-back, syncing only every `sync_every`
    # batches (hard host readback of ONE scalar — the chip executes
    # programs in order, so syncing batch i proves every batch <= i
    # finished; bench.py's amortized-sync convention). Why not sync per
    # batch: (a) a per-batch readback costs a full tunnel RPC (~26 ms,
    # docs/stream_latency_decomp_r04.json) and serializes the 1-deep
    # pipeline — measured 53.7 -> 27.6 fps at mb2; (b) `block_until_ready`
    # (used through r03) is NOT a reliable sync over the tunnel — it has
    # been observed returning early (a nonsense 1290 fps at mb1 in r04),
    # so the r03 stream fps artifacts were optimistic. Why not sync ONLY
    # at the end: with paste_size, each in-flight batch holds a
    # (mb, D, S, S) uint8 output (~100 MB/frame) — unbounded dispatch
    # would accumulate them in HBM until RESOURCE_EXHAUSTED on a long
    # stream. sync_every=8 bounds live outputs to ~8 batches while
    # amortizing the RPC to ~3 ms/batch. Latency is measured separately
    # below with honest blocking probes.
    last = None
    dispatched = 0
    probe_src = None  # last FULL input batch — the probes re-run it

    def track(out, batch_in):
        nonlocal last, dispatched, probe_src
        last = out
        dispatched += 1
        # Keep the largest (i.e. full-size) most recent input batch as the
        # latency-probe source: the probe must match the stream's shape AND
        # dtype (both are jit cache keys) and carry real frame content —
        # the NMS kernel's fixpoint loop and kept-buffer chunk walk are
        # data-dependent, so an all-zeros probe understates real-frame
        # latency (ADVICE r04).
        if probe_src is None or batch_in.shape[0] >= probe_src.shape[0]:
            probe_src = batch_in
        if sync_every and dispatched % sync_every == 0:
            np.asarray(out["detections"][0, 0, 0])  # bound the queue

    if prebatched:
        for batch in frames:
            out = detector.run_batch(batch, paste_size=paste_size)
            if on_result is not None:
                on_result(n, out)  # device references only — no sync
            track(out, batch)
            n += int(batch.shape[0])
    else:
        batch_buf: list[np.ndarray] = []
        for frame in frames:
            batch_buf.append(as_u8(frame))
            if len(batch_buf) < micro_batch:
                continue
            stacked = np.stack(batch_buf)
            out = detector.run_batch(stacked, paste_size=paste_size)
            if on_result is not None:
                on_result(n, out)
            track(out, stacked)
            n += len(batch_buf)
            batch_buf = []
        if batch_buf:
            stacked = np.stack(batch_buf)
            out = detector.run_batch(stacked, paste_size=paste_size)
            if on_result is not None:
                on_result(n, out)
            track(out, stacked)
            n += len(batch_buf)
    if last is not None:
        np.asarray(last["detections"][0, 0, 0])  # hard sync: all done
    wall = time.perf_counter() - t_start

    # Blocking latency: dispatch + hard readback per probe — what ONE
    # synchronous caller sees per micro-batch (includes the tunnel RPC
    # here; PCIe on a locally-attached host). Device-staged probe frames:
    # the wire leg is reported separately by tools/stream_latency_decomp.
    # The probe re-runs the stream's own last full input batch, so shape,
    # dtype AND content match the program the stream actually executed
    # (a zeros probe under-exercises the data-dependent NMS fixpoint;
    # a mismatched shape/dtype would silently compile a second program).
    if latency_probes and probe_src is not None:
        probe = jax.device_put(probe_src)
        np.asarray(probe[0, 0, 0])  # hard-stage off the clock
        for _ in range(latency_probes):
            t0 = time.perf_counter()
            out = detector.run_batch(probe, paste_size=paste_size)
            np.asarray(out["detections"][0, 0, 0])
            lat.append(time.perf_counter() - t0)
    if lat:
        ms = np.sort(np.asarray(lat)) * 1000.0
        p50 = float(np.percentile(ms, 50))
        p95 = float(np.percentile(ms, 95))
        p99 = float(np.percentile(ms, 99))
    else:
        p50 = p95 = p99 = 0.0
    return StreamStats(frames=n, wall_s=wall, p50_latency_ms=p50,
                       p95_latency_ms=p95, p99_latency_ms=p99,
                       latency_probes=len(lat))


def frames_from_dir(path: str, size: int) -> Iterator[np.ndarray]:
    """Letterboxed frames from an image directory (sorted by name), decoded
    natively off-thread (pipeline/loader.py) so frame t+1's decode overlaps
    frame t's device compute."""
    import os

    from maskrcnn_tpu.pipeline.loader import PrefetchLoader

    names = [n for n in sorted(os.listdir(path))
             if n.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))]
    items = ((n, os.path.join(path, n)) for n in names)
    for _, canvas, _ in PrefetchLoader(items, size):
        yield canvas


def synthetic_frames(n: int, size: int, seed: int = 0) -> Iterator[np.ndarray]:
    rng = np.random.default_rng(seed)
    # uint8 at the source: video frames are 8-bit, and shipping uint8 is the
    # steady-state wire format (run_stream would convert anyway).
    base = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
    for i in range(n):
        # cheap motion: roll the frame so content changes each step
        yield np.roll(base, shift=7 * i, axis=1)
