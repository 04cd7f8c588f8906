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

logger = logging.getLogger("mo_renderer_tpu")


def enable_compile_cache() -> None:
    """Point jax's persistent compilation cache at the engine's side-car
    cache dir ($MO_CACHE_DIR, shared with the IBL cache): the multi-minute
    first TPU compile of a frame config or the IBL precompute chain
    replays from disk on later runs.  Idempotent; a no-op if the user
    already configured a cache dir.  Called by Renderer.__init__ and
    IBLResource.ensure_computed so every entry point benefits."""
    import os

    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    cache_dir = os.environ.get(
        "MO_CACHE_DIR", os.path.join(os.path.expanduser("~"), ".mo_cache")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(cache_dir, "xla")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        logger.info("compilation cache disabled: %s", e)


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
