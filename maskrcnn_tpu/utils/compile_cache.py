"""Persistent XLA compilation cache for CLI/bench entry points.

The flagship forward takes tens of seconds to compile (minutes over a
tunneled device); the reference pays an analogous one-time cost compiling
its three .mlmodel files (`MLModel.compileModel` in
`EvaluateCommand.swift:144-153`) but persists the artifacts. This enables
JAX's on-disk compilation cache so repeated CLI invocations, benchmarks,
and server restarts skip recompilation of unchanged programs.

Opt out with MASKRCNN_TPU_NO_COMPILE_CACHE=1; relocate with
MASKRCNN_TPU_COMPILE_CACHE=<dir> (default ~/.cache/maskrcnn_tpu/xla).
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> str | None:
    """Turn on the persistent cache (idempotent). Returns the dir or None."""
    if os.environ.get("MASKRCNN_TPU_NO_COMPILE_CACHE"):
        return None
    cache_dir = os.environ.get(
        "MASKRCNN_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "maskrcnn_tpu",
                     "xla"))
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Anything over a couple of seconds is worth persisting here: the
        # backbone alone crosses this by an order of magnitude.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # very old jax / read-only home: run without cache
        return None
    return cache_dir
