"""Tracing / profiling hooks.

The reference has no profiling at all (SURVEY.md section 5 — ad-hoc cout +
Ceres reports). Here: jax.profiler trace capture (xplane dumps viewable in
TensorBoard/XProf/Perfetto) plus lightweight wall-clock stage timers
(utils/metrics.StageTimer) surfaced in the run log.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace into ``log_dir`` (no-op when None).

    Usage:
        with profiling.trace("/tmp/xprof"):
            slam.process_frame(...)
    """
    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for host-side stages (shows up in xplane)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
