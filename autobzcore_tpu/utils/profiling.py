"""Observability: profiler traces and cost accounting.

The reference's observability surface is the EvalCounter + per-parameter wall
times logged by its HDF5 sweep (SURVEY.md §5).  Here that carries over (eval
counts are native loop-state, wall times recorded by ``batchsolve_h5``) and is
extended with JAX profiler traces for XLA-level analysis.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir="/tmp/autobz_trace"):
    """Capture a jax.profiler trace of the enclosed block (view with
    TensorBoard or xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label, sink=None):
    """Wall-clock a block; append (label, seconds) to ``sink`` if given."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if sink is not None:
            sink.append((label, dt))
