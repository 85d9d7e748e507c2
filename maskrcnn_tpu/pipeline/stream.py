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
    pending = None  # (idx, device outputs) — one frame of pipelining
    n = 0
    t_start = time.perf_counter()

    def as_u8(frame: np.ndarray) -> np.ndarray:
        # Video frames are 8-bit; shipping uint8 quarters the host->device
        # transfer (12 MB -> 3 MB per 1024² frame) and the in-graph
        # preprocess casts on device. Letterboxed float canvases are
        # rounded (<=0.5/255 sub-integer resampling precision, below any
        # detection tolerance).
        if frame.dtype == np.uint8:
            return frame
        return np.clip(np.rint(frame), 0, 255).astype(np.uint8)

    def flush(p):
        if p is None:
            return
        idx, out, t0 = p
        jax.block_until_ready(out["detections"])
        lat.append(time.perf_counter() - t0)
        if on_result is not None:
            on_result(idx, out)

    if prebatched:
        for batch in frames:
            t0 = time.perf_counter()
            out = detector.run_batch(batch, paste_size=paste_size)
            flush(pending)  # overlap: previous batch finishes while this runs
            pending = (n, out, t0)
            n += int(batch.shape[0])
        flush(pending)
    else:
        batch_buf: list[np.ndarray] = []
        for frame in frames:
            batch_buf.append(as_u8(frame))
            if len(batch_buf) < micro_batch:
                continue
            t0 = time.perf_counter()
            out = detector.run_batch(np.stack(batch_buf),
                                     paste_size=paste_size)
            flush(pending)  # overlap: previous frame finishes while this runs
            pending = (n, out, t0)
            n += len(batch_buf)
            batch_buf = []
        if batch_buf:
            t0 = time.perf_counter()
            out = detector.run_batch(np.stack(batch_buf),
                                     paste_size=paste_size)
            flush(pending)
            pending = (n, out, t0)
            n += len(batch_buf)
        flush(pending)

    wall = time.perf_counter() - t_start
    p50 = sorted(lat)[len(lat) // 2] * 1000 if lat else 0.0
    return StreamStats(frames=n, wall_s=wall, p50_latency_ms=p50)


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
