"""Adaptive 1D Gauss-Kronrod algorithms.

``QuadGKJL`` is the native equivalent of the reference's wrapper over
``quadgk`` (``src/algorithms.jl:13-92``); ``AuxQuadGKJL`` of the
``auxquadgk`` wrapper (``src/algorithms.jl:202-240``).  Both run the
fixed-shape interval-pool driver in :mod:`autobzcore_tpu.ops.adaptive`; the
aux variant differs only in that AuxValue results get channel-separated error
control (which the shared driver provides whenever the integrand returns an
:class:`AuxValue`), and in accepting batch integrands — kept as separate
classes for API parity with the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..interfaces import IntegralSolution
from ..ops.adaptive import gk_adaptive
from ..utils.tree import tree_norm
from ..wrappers import batch_eval_fn
from .base import IntegralAlgorithm, effective_tolerances, segments_of


def _budget(maxiters):
    """Evaluation budget as a jit-stable float scalar (no recompiles when the
    user varies ``maxiters`` between solves).  Delegates to
    ``ops.adaptive._as_eval_budget`` so the unbudgeted sentinel (2^62) and
    dtype match the drivers' monotone float counters — an int32 clamp here
    would silently stop an unbudgeted deep nest at 2^31-1 evals with
    retcode=False."""
    from ..ops.adaptive import _as_eval_budget

    return _as_eval_budget(maxiters)


def _infinity_transform(segs):
    """Map (semi-)infinite segments to finite ones, quadgk-style.

    Both ends infinite: x = t/(1-t^2) over (-1, 1); right-infinite [a, inf):
    x = a + t/(1-t) over [0, 1); left-infinite mirrored.  Returns
    (finite_segs, map_fn, jac_fn) or None when all endpoints are finite.
    """
    segs = np.asarray(segs, dtype=np.float64)
    if np.all(np.isfinite(segs)):
        return None
    if len(segs) != 2:
        raise ValueError("infinite domains support a single segment")
    a, b = segs
    # reversed orientations ((a, -inf), (+inf, b), (inf, -inf)): transform
    # the ascending domain and negate the jacobian (int_a^b = -int_b^a) —
    # the sign-blind isinf branches below would otherwise map to the WRONG
    # half-line and return a plausible value with retcode True
    if (np.isinf(a) and a > 0) or (np.isinf(b) and b < 0):
        fsegs, map_fn, jac_fn = _infinity_transform(np.array([b, a]))
        return fsegs, map_fn, (lambda t, _j=jac_fn: -_j(t))
    if np.isinf(a) and np.isinf(b):
        return (
            np.array([-1.0 + 1e-15, 1.0 - 1e-15]),
            lambda t: t / (1 - t**2),
            lambda t: (1 + t**2) / (1 - t**2) ** 2,
        )
    if np.isinf(b):
        return (
            np.array([0.0, 1.0 - 1e-15]),
            lambda t: a + t / (1 - t),
            lambda t: 1 / (1 - t) ** 2,
        )
    return (
        np.array([0.0, 1.0 - 1e-15]),
        lambda t: b - t / (1 - t),
        lambda t: 1 / (1 - t) ** 2,
    )


class QuadGKJL(IntegralAlgorithm):
    """h-adaptive Gauss-Kronrod (order 2n+1) via the fixed-shape interval
    pool; the reference wrapper over ``quadgk`` (``src/algorithms.jl:13``),
    including its infinite-limit variable transformations."""

    def __init__(self, order=7, norm=tree_norm, cap=2048, nbisect=4):
        self.order = order
        self.norm = norm
        self.cap = cap
        self.nbisect = nbisect

    def init_cacheval(self, f, dom, p):
        batch_f = batch_eval_fn(f)
        segs = segments_of(dom)
        order, cap, nbisect, norm = self.order, self.cap, self.nbisect, self.norm

        # segments_of returns jnp arrays for raw tuple/array domains; the
        # transform decision needs concrete host endpoints either way (an
        # isinstance(np.ndarray) gate silently SKIPPED the transform for
        # those domains, producing NaN at the infinite endpoints)
        try:
            tf = _infinity_transform(np.asarray(segs, dtype=np.float64))
        except (TypeError, jax.errors.TracerArrayConversionError):
            tf = None
        if tf is not None:
            segs, map_fn, jac_fn = tf
            inner_f = batch_f

            def batch_f(ts, pp):  # noqa: F811 — transformed integrand
                xs = map_fn(ts)
                fx = inner_f(xs, pp)
                jac = jac_fn(ts)
                return jax.tree_util.tree_map(
                    lambda v: v * jac.reshape(jac.shape + (1,) * (v.ndim - 1)), fx
                )

        @jax.jit
        def run(p, atol, rtol, maxiters):
            return gk_adaptive(
                batch_f, p, jnp.asarray(segs), order=order, cap=cap,
                nbisect=nbisect, abstol=atol, reltol=rtol, maxiters=maxiters,
                norm=norm,
            )

        return {"run": run}

    def do_solve(self, f, dom, p, cacheval, abstol=None, reltol=None, maxiters=None):
        atol, rtol = effective_tolerances(abstol, reltol)
        val, err, ne, conv = cacheval["run"](p, atol, rtol, _budget(maxiters))
        return IntegralSolution(val, err, bool(conv), int(ne))

    def solve_fn(self, cacheval):
        """Pure jittable/vmappable solve:
        fn(p, atol, rtol) -> (u, resid, converged, numevals)."""
        run = cacheval["run"]

        def fn(p, atol, rtol):
            val, err, ne, conv = run(p, atol, rtol, _budget(None))
            return val, err, conv, ne

        return fn


class AuxQuadGKJL(QuadGKJL):
    """Gauss-Kronrod with auxiliary error control — the workhorse inner rule
    for IAI (reference default at ``src/brillouin.jl:370``)."""
    pass
