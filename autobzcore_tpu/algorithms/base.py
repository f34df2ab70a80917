"""Algorithm extension contract.

Every algorithm implements exactly two methods, mirroring the reference's
plugin system (``src/interfaces.jl:14-16``, ``src/algorithms.jl:1-3``):

- ``init_cacheval(f, dom, p)``: algorithm-specific precomputation.  Here this
  is where XLA compilation happens: the cacheval holds a jitted solve function
  plus device-resident rule data, so re-solves at new ``p`` are compile-free.
- ``do_solve(f, dom, p, cacheval, abstol=, reltol=, maxiters=)``: run it.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class IntegralAlgorithm:
    def init_cacheval(self, f, dom, p):
        raise NotImplementedError

    def do_solve(self, f, dom, p, cacheval, abstol=None, reltol=None, maxiters=None):
        raise NotImplementedError


def effective_tolerances(abstol, reltol, dtype=np.float64):
    """Reference tolerance semantics (``src/interfaces.jl:91-104``): both
    unset -> pure relative with sqrt(eps); otherwise unset ones are zero."""
    if abstol is None and reltol is None:
        return 0.0, float(np.sqrt(np.finfo(dtype).eps))
    return (0.0 if abstol is None else float(abstol),
            0.0 if reltol is None else float(reltol))


def segments_of(dom):
    """Breakpoints of a 1D domain: PuncturedInterval or raw array."""
    from ..domains import PuncturedInterval

    if isinstance(dom, PuncturedInterval):
        return np.asarray(dom.segments)
    return jnp.asarray(dom)
