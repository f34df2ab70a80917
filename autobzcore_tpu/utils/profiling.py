"""Observability: profiler traces and cost accounting.

The reference's observability surface is the EvalCounter + per-parameter wall
times logged by its HDF5 sweep (SURVEY.md §5).  Here that carries over (eval
counts are native loop-state, wall times recorded by ``batchsolve_h5``) and is
extended with JAX profiler traces for XLA-level analysis.
"""
from __future__ import annotations

import contextlib
import time


def enable_compile_cache(cache_dir=None, min_compile_secs=0.0):
    """Persist XLA executables across processes.  On hosted TPUs a cold AOT
    compile of a new kernel shape costs minutes through the tunnel; with the
    cache, re-running a sweep/benchmark skips straight to compute.  Safe to
    call more than once; returns the cache directory (or None if the JAX
    version lacks the knobs).

    ``min_compile_secs`` defaults to 0: through the axon remote-compile
    helper, jax's locally-measured compile time is sub-second even when the
    wall compile is minutes (measured 0.57 s local vs 42 s wall, r3), so any
    positive threshold silently filters every TPU executable out of the
    cache — the round-2 "56-523 s PTR-leg compile variance" was exactly
    this: nothing was ever written, and every process recompiled."""
    import os

    import jax

    if cache_dir is None:
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "autobzcore_tpu_xla")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", float(min_compile_secs))
    except Exception:
        return None
    return cache_dir


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
