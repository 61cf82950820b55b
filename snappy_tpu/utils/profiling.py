"""Tracing hooks (SURVEY.md §5): jax.profiler annotations around codec stages.

Usage:
    with trace_annotation("decode_blocks"):
        out = decode(...)
    with profile_to("/tmp/trace"):   # opens in xprof/tensorboard
        ...
"""

from __future__ import annotations

import contextlib

import jax


def trace_annotation(name: str):
    """Named region in the device trace."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def profile_to(logdir: str):
    """Capture a profiler trace for the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
