"""Profiling helpers (SURVEY.md §5.1): per-stage wall clock via
block_until_ready bracketing + XLA profiler traces."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def stage_timer(name: str, results: dict | None = None):
    """Wall-clock bracket; blocks on the yielded list's arrays at exit."""
    import jax

    arrays: list = []
    t0 = time.perf_counter()
    try:
        yield arrays
    finally:
        for a in arrays:
            jax.block_until_ready(a)
        dt = time.perf_counter() - t0
        if results is not None:
            results[name] = dt


@contextlib.contextmanager
def xla_trace(logdir: str):
    """XLA profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """HBM usage of the first device, when the backend exposes it."""
    import jax

    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }
