"""Meta-algorithms: AbsoluteEstimate and EvalCounter.

Native equivalents of reference ``src/algorithms.jl:628-691``.  The eval
counter needs no integrand wrapping here: every adaptive driver carries its
evaluation count in the loop state, so ``EvalCounter`` simply surfaces it.
"""
from __future__ import annotations

from ..interfaces import IntegralSolution
from ..utils.tree import tree_norm
from .base import IntegralAlgorithm, effective_tolerances


class AbsoluteEstimate(IntegralAlgorithm):
    """Two-phase: cheap estimate under ``est_alg`` (with the kwargs given at
    construction), then ``abs_alg`` at ``abstol=max(abstol, reltol*norm(I))``,
    ``reltol=0`` (reference ``src/algorithms.jl:628-653``)."""

    def __init__(self, est_alg, abs_alg, norm=tree_norm, **kwargs):
        from ..interfaces import checkkwargs

        checkkwargs(kwargs)
        self.est_alg = est_alg
        self.abs_alg = abs_alg
        self.norm = norm
        self.kwargs = kwargs

    def init_cacheval(self, f, dom, p):
        return {
            "est": self.est_alg.init_cacheval(f, dom, p),
            "abs": self.abs_alg.init_cacheval(f, dom, p),
        }

    def do_solve(self, f, dom, p, cacheval, abstol=None, reltol=None, maxiters=None):
        import numpy as np

        sol = self.est_alg.do_solve(f, dom, p, cacheval["est"], **self.kwargs)
        val = float(self.norm(sol.u))
        rtol = np.sqrt(np.finfo(np.float64).eps) if reltol is None else reltol
        atol = max(0.0 if abstol is None else abstol, rtol * val)
        return self.abs_alg.do_solve(
            f, dom, p, cacheval["abs"], abstol=atol, reltol=0.0, maxiters=maxiters
        )


class EvalCounter(IntegralAlgorithm):
    """Surface the wrapped algorithm's integrand evaluation count in
    ``sol.numevals`` (reference ``src/algorithms.jl:662-691``)."""

    def __init__(self, alg):
        self.alg = alg

    def init_cacheval(self, f, dom, p):
        return self.alg.init_cacheval(f, dom, p)

    def do_solve(self, f, dom, p, cacheval, **kwargs):
        return self.alg.do_solve(f, dom, p, cacheval, **kwargs)
