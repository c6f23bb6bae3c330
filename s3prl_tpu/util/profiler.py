"""Profiling hooks (SURVEY §5.1).

The reference only has a wall-time context manager (s3prl/util/
benchmark.py:24-40; kept as util.benchmark here). This adds the TPU-native
instrumentation: `jax.profiler` trace capture around a code region and named
step annotations that show up in the trace viewer / xprof.
"""

from __future__ import annotations

import contextlib
import logging

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into `log_dir` for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {log_dir}")


def step_annotation(name: str):
    """Named region annotation (shows as a span in the trace viewer)."""
    return jax.profiler.StepTraceAnnotation(name)


def annotate(name: str):
    """Function decorator: wrap calls in a TraceAnnotation."""

    def deco(fn):
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        return wrapped

    return deco
