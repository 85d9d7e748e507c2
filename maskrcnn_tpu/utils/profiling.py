"""Tracing & profiling — the TPU equivalent of the reference's os_signpost.

The reference brackets every custom-layer phase with os_signpost points of
interest (`ProposalLayer.swift:106-194`, `PyramidROIAlignLayer.swift:83-180`,
`DetectionLayer.swift:109-233`, ... — SURVEY.md §5 "Tracing/profiling") and
prints per-image wall times in its eval CLI. Here:

  * `stage(name)` — `jax.named_scope` wrapper used inside the jitted forward
    so stages are visible in XLA/Tensorboard traces by name;
  * `trace(logdir)` — context manager around `jax.profiler` for capturing a
    device trace of any region;
  * `StageTimer` — host-side wall-clock phase timer with a report, used by
    the evaluate CLI for its per-image breakdown (the analog of
    `EvaluateCommand.swift:167,179,193`).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


def stage(name: str):
    """Named scope for a pipeline stage (shows up in profiler traces)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating wall-clock timer: `with timer.phase("nms"): ...`."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in self.totals:
            tot = self.totals[name]
            n = self.counts[name]
            lines.append(
                f"  {name:<24} {tot*1000:9.1f} ms total"
                f"  ({tot/n*1000:8.2f} ms avg over {n})")
        return "\n".join(lines)
