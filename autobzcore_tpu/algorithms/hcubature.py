"""h-adaptive cubature (Genz-Malik) over hypercubes.

Native equivalent of the reference's ``HCubatureJL`` (``src/algorithms.jl:99-124``).
For 1D domains it degenerates to the adaptive Gauss-Kronrod driver, matching
HCubature.jl's ``hquadrature`` split.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..domains import HyperCube
from ..interfaces import IntegralSolution
from ..ops.adaptive import gk_adaptive
from ..ops.genz_malik import gm_adaptive
from ..utils.tree import tree_norm
from ..wrappers import batch_eval_fn
from .base import IntegralAlgorithm, effective_tolerances


class HCubatureJL(IntegralAlgorithm):
    """h-adaptive Genz-Malik cubature over hypercubes
    (``src/algorithms.jl:99``); 1D domains degrade to adaptive GK."""

    def __init__(self, norm=tree_norm, initdiv=1, cap=4096, nbisect=4):
        self.norm = norm
        self.initdiv = initdiv
        self.cap = cap
        self.nbisect = nbisect

    def _endpoints(self, dom):
        if isinstance(dom, HyperCube):
            return dom.a, dom.b
        if hasattr(dom, "endpoints"):
            a, b = dom.endpoints
            return np.atleast_1d(a), np.atleast_1d(b)
        raise TypeError("HCubatureJL requires a HyperCube-like domain")

    def init_cacheval(self, f, dom, p):
        a, b = self._endpoints(dom)
        d = a.shape[0]
        norm, cap, nbisect = self.norm, self.cap, self.nbisect

        if d == 1:
            from ..domains import PuncturedInterval

            batch_f0 = batch_eval_fn(f)
            if isinstance(dom, PuncturedInterval):
                batch_f = batch_f0  # scalar-domain integrands see scalar x
            else:
                def batch_f(xs, p):  # lift scalars to 1-vectors for the integrand
                    return batch_f0(xs[:, None], p)

            @jax.jit
            def run(p, atol, rtol, maxiters):
                return gk_adaptive(
                    batch_f, p, jnp.asarray([float(a[0]), float(b[0])]),
                    cap=cap, nbisect=nbisect, abstol=atol, reltol=rtol,
                    maxiters=maxiters, norm=norm,
                )

        else:
            batch_f = batch_eval_fn(f, in_ndim=1)

            @jax.jit
            def run(p, atol, rtol, maxiters):
                return gm_adaptive(
                    batch_f, p, jnp.asarray(a), jnp.asarray(b),
                    cap=cap, nbisect=nbisect, abstol=atol, reltol=rtol,
                    maxiters=maxiters, norm=norm,
                )

        return {"run": run}

    def do_solve(self, f, dom, p, cacheval, abstol=None, reltol=None, maxiters=None):
        from .gk import _budget

        atol, rtol = effective_tolerances(abstol, reltol)
        val, err, ne, conv = cacheval["run"](p, atol, rtol, _budget(maxiters))
        return IntegralSolution(val, err, bool(conv), int(ne))

    def solve_fn(self, cacheval):
        from .gk import _budget

        run = cacheval["run"]

        def fn(p, atol, rtol):
            val, err, ne, conv = run(p, atol, rtol, _budget(None))
            return val, err, conv, ne

        return fn
