"""Fixed-order quadrature from a user rule function.

Native equivalent of the reference's ``QuadratureFunction``
(``src/algorithms.jl:156-191``): a rule ``x, w = fun(npt)`` on [-1, 1] applied
to every segment of the domain.  The trapezoid default and the
FastGaussQuadrature option map to :func:`ops.quad_rules.trapz` and
:func:`ops.quad_rules.gausslegendre`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..interfaces import IntegralSolution
from ..ops.adaptive import fixed_rule_eval
from ..ops.quad_rules import trapz
from ..wrappers import batch_eval_fn
from .base import IntegralAlgorithm, segments_of


class QuadratureFunction(IntegralAlgorithm):
    """Fixed rule ``x, w = fun(npt)`` on [-1,1] applied per segment
    (``src/algorithms.jl:156``)."""

    def __init__(self, fun=trapz, npt=50):
        self.fun = fun
        self.npt = npt

    def init_cacheval(self, f, dom, p):
        x, w = self.fun(self.npt)
        batch_f = batch_eval_fn(f)
        segs = segments_of(dom)

        @jax.jit
        def run(p):
            return fixed_rule_eval(batch_f, p, jnp.asarray(segs), x, w)[0]

        nseg = (len(segs) - 1) if hasattr(segs, "__len__") else int(segs.shape[0]) - 1
        return {"run": run, "numevals": len(x) * nseg}

    def do_solve(self, f, dom, p, cacheval, abstol=None, reltol=None, maxiters=None):
        val = cacheval["run"](p)
        return IntegralSolution(val, None, True, cacheval["numevals"])

    def solve_fn(self, cacheval):
        run = cacheval["run"]
        ne = cacheval["numevals"]

        def fn(p, atol, rtol):
            return run(p), jnp.zeros(()), jnp.asarray(True), jnp.asarray(ne)

        return fn
