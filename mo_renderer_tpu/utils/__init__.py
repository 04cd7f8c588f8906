"""Core utilities (mo_core/src/utils.rs) + profiling helpers.

The reference's tracing subsystem is the `tracing` crate with sparse INFO
milestones (mo_core/src/application/mod.rs:47-49); here the analog is the
``mo_renderer_tpu`` logger plus an optional ``jax.profiler`` trace around
the frame loop (``profile_trace``) for XLA-level timelines.
"""

from __future__ import annotations

import contextlib
import logging
import time


def clamp(value, min_value, max_value):
    """mo_core/src/utils.rs:1-18."""
    if value < min_value:
        return min_value
    if value > max_value:
        return max_value
    return value


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard format) around a block."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def log_span(name: str, logger: logging.Logger | None = None):
    """Log a timed span at INFO (the tracing-span analog)."""
    log = logger or logging.getLogger("mo_renderer_tpu")
    t0 = time.perf_counter()
    try:
        yield
    finally:
        log.info("%s: %.1f ms", name, (time.perf_counter() - t0) * 1e3)
