"""Pole-aware 1D quadratures for scalar complex integrands.

Native equivalents of the reference's ``ContQuadGKJL`` (contour deformation,
``src/algorithms.jl:251-289``) and ``MeroQuadGKJL`` (pole subtraction,
``src/algorithms.jl:299-328``), with the same restriction to scalar
complex-valued integrands (``src/algorithms.jl:262-264,310-312``).

These are irregular scalar 1D workloads — by this framework's host/device
split (rule construction and scalar control flow on host, dense panels on
device) they run on host numpy.  Pole detection follows the reference's
recipe: roots of a polynomial model of ``1/f`` inside the Bernstein ellipse of
each standard segment with semiaxes ``cosh(rho)``/``sinh(rho)``.
"""
from __future__ import annotations

import heapq

import numpy as np

from ..interfaces import IntegralSolution
from ..ops.quad_rules import kronrod
from ..wrappers import unwrap_integrand
from .base import IntegralAlgorithm, effective_tolerances, segments_of


class NewtonDeflation:
    """Newton-polish detected roots of 1/f (complex finite-difference
    derivative), dedupe, and keep only residual-verified simple poles —
    matching the reference's default root method
    (``IteratedIntegration.ContQuadGK.NewtonDeflation``)."""

    def __init__(self, maxiter=10, tol=1e-13):
        self.maxiter = maxiter
        self.tol = tol

    def polish(self, g, z0, scale):
        """Newton iterations on ``g = 1/f`` from ``z0``; returns (z, g'(z))."""
        z = complex(z0)
        gp = None
        for _ in range(self.maxiter):
            h = 1e-7 * max(scale, abs(z))
            gz = g(z)
            gp = (g(z + h) - g(z - h)) / (2 * h)
            if gp == 0 or not np.isfinite(gp):
                return z, None
            dz = gz / gp
            z = z - dz
            if abs(dz) < self.tol * max(scale, abs(z)):
                break
        # 4th-order central difference for the residue: truncation O(h^4)
        # with h ~ eps^(1/5) balances roundoff, ~1e-12 relative accuracy
        h = 3e-4 * max(scale, abs(z))
        gp = (8 * (g(z + h) - g(z - h)) - (g(z + 2 * h) - g(z - 2 * h))) / (12 * h)
        return z, gp


def _host_f(f):
    g = unwrap_integrand(f)

    def call(x, p):
        return complex(g(x, p))

    return call


class _CountedF:
    """Counts EVERY integrand evaluation — Chebyshev pole-fit nodes, Newton
    polish/residue stencils, residual checks, and GK panels — so
    ``sol.numevals`` reports the exact total cost (the reference's
    cost-observability contract, ``src/algorithms.jl:662-691``)."""

    __slots__ = ("f", "n")

    def __init__(self, f):
        self.f = f
        self.n = 0

    def __call__(self, x, p):
        self.n += 1
        return self.f(x, p)


def _quadgk_host(f, p, segs, atol, rtol, order=7, max_segs=10**4, max_evals=np.inf,
                 should_stop=None, batch_f=None):
    """Heap-based adaptive GK over (possibly complex) segment endpoints.

    Returns (integral, error, nevals, converged); refinement stops at
    ``max_evals`` (the ``maxiters`` budget, reference ``src/interfaces.jl:64-69``)
    or when ``should_stop()`` returns True (used by nested drivers whose
    budget counts INNER integrand evals, invisible to this level's ``nev``).

    ``batch_f(xs, p) -> (K,) values`` evaluates a whole panel's nodes in one
    call — used by the pole nest's plain-innermost levels, where per-point
    host dispatch of a jitted integrand dominates the solve.
    """
    xk, wk, wg = kronrod(order)

    def rule(a, b):
        mid = (a + b) / 2
        half = (b - a) / 2
        if batch_f is not None:
            fs = np.asarray(batch_f(mid + half * xk, p))
        else:
            fs = np.array([f(mid + half * xi, p) for xi in xk])
        I = half * np.sum(wk * fs)
        Ig = half * np.sum(wg * fs)
        return I, abs(I - Ig)

    heap = []
    total_I = 0.0 + 0.0j
    total_E = 0.0
    for i in range(len(segs) - 1):
        I, E = rule(segs[i], segs[i + 1])
        total_I += I
        total_E += E
        heapq.heappush(heap, (-E, i, segs[i], segs[i + 1], I))
    count = len(segs) - 1
    nev = count * len(xk)
    while (total_E > max(atol, rtol * abs(total_I)) and count < max_segs
           and nev + 2 * len(xk) <= max_evals
           and not (should_stop is not None and should_stop())):
        negE, _, a, b, I = heapq.heappop(heap)
        m = (a + b) / 2
        I1, E1 = rule(a, m)
        I2, E2 = rule(m, b)
        total_I += I1 + I2 - I
        total_E += E1 + E2 + negE
        count += 1
        nev += 2 * len(xk)
        heapq.heappush(heap, (-E1, count * 2, a, m, I1))
        heapq.heappush(heap, (-E2, count * 2 + 1, m, b, I2))
    converged = total_E <= max(atol, rtol * abs(total_I))
    return total_I, total_E, nev, converged


import contextlib
import threading

_detect_state = threading.local()


def _in_detection():
    """True while a pole algorithm is LOCATING poles (Chebyshev fit + Newton
    polish of 1/f) rather than integrating.  Nested drivers consult this:
    detection probes may legitimately land ON a pole, where an inner nest
    solve blows up or nans — that must not poison the nest's certificate
    (the probe only feeds 1/f root-finding, not the integral)."""
    return getattr(_detect_state, "flag", False)


@contextlib.contextmanager
def _detection():
    prev = getattr(_detect_state, "flag", False)
    _detect_state.flag = True
    try:
        yield
    finally:
        _detect_state.flag = prev


def _find_poles(f, p, a, b, rho, rootmeth=None, nfit=32):
    """Simple poles of ``f`` near the segment [a, b]: roots of a Chebyshev
    model of ``g = 1/f`` inside the Bernstein ellipse with semiaxes
    ``cosh(rho)``/``sinh(rho)`` on the standard segment, Newton-polished on
    the true ``g`` and deduped (reference rootmeth ``NewtonDeflation``).

    Returns a list of ``(z, residue)`` with ``residue = 1/g'(z)``.
    """
    mid = (a + b) / 2
    half = (b - a) / 2
    theta = (np.arange(nfit) + 0.5) * np.pi / nfit
    xs = np.cos(theta)
    gs = []
    for xi in xs:
        fx = f(mid + half * xi, p)
        gs.append(1.0 / fx if fx != 0 else np.inf)
    gs = np.array(gs, dtype=complex)
    if not np.all(np.isfinite(gs)):
        return []
    coef = np.polynomial.chebyshev.chebfit(xs, gs, nfit - 1)
    # drop numerically-zero trailing coefficients for stable root finding
    mag = np.abs(coef)
    tol = max(mag.max(), 1e-300) * 1e-12
    keep = np.nonzero(mag > tol)[0]
    if len(keep) == 0 or keep[-1] < 1:
        return []
    coef = coef[: keep[-1] + 1]
    roots = np.polynomial.chebyshev.chebroots(coef)
    rootmeth = rootmeth if rootmeth is not None else NewtonDeflation()
    gscale = float(np.median(np.abs(gs))) or 1.0

    def g(z):
        try:
            fx = f(z, p)
        except ZeroDivisionError:
            return 0.0  # exactly at a pole: g = 1/f = 0
        if not np.isfinite(fx):
            return 0.0
        return 1.0 / fx if fx != 0 else np.inf

    out = []
    for z in np.atleast_1d(roots):
        # coarse Bernstein pre-filter on the model root (twice the target
        # ellipse so polishing can pull borderline roots in)
        w = np.arccos(complex(z))
        if abs(w.imag) >= 2 * rho:
            continue
        zp, gp = rootmeth.polish(lambda zz: g(mid + half * zz), complex(z), 1.0)
        if gp is None or gp == 0:
            continue
        # exact membership test on the POLISHED root
        wp = np.arccos(complex(zp))
        if abs(wp.imag) >= rho:
            continue
        # residual check: a genuine root of g, not a Chebyshev artifact
        gz = g(mid + half * zp)
        if not np.isfinite(gz) or abs(gz) > 1e-6 * max(gscale, abs(gp)):
            continue
        zmapped = mid + half * zp
        if any(abs(zmapped - z0) < 1e-10 * max(1.0, abs(half)) for z0, _ in out):
            continue  # deflation: drop duplicates of already-found poles
        out.append((zmapped, half / gp))  # d/dz = (1/half) d/dstd
    return out


def _dented_path(a, b, poles):
    """Piecewise-linear contour from ``a`` to ``b`` (real) denting away from
    every off-axis pole (reference behavior: dents "on either the upper/lower
    half planes", ``src/algorithms.jl:245-250``).

    With poles on both sides, the real interval splits at the poles' real
    parts and each subinterval dents away from its nearest pole, bounded so
    the rectangle swept between the axis and the dent never encloses a pole
    of the opposite (dent) side.
    """
    off_axis = [(z, r) for z, r in poles if z.imag != 0]
    if not off_axis:
        return [a, b]
    eps = 1e-12 * max(1.0, abs(b - a))
    cuts = sorted({min(max(z.real, a + eps), b - eps) for z, _ in off_axis
                   if a < z.real < b})
    knots = [a] + cuts + [b]
    path = [a]
    for u, v in zip(knots[:-1], knots[1:]):
        width = v - u
        m = (u + v) / 2
        near = min(off_axis, key=lambda zr: abs(zr[0] - m))
        im = near[0].imag
        side = -np.sign(im)  # dent opposite the nearest pole
        # Poles on the DENT side near the closed window [u, v] bound the
        # depth: the swept rectangle (and its vertical legs at u and v) must
        # stay pole-free, and the dent only pays off while it raises the
        # MINIMUM pole distance — h* = (min_same - |im_near|)/2 equalizes the
        # approach to both sides; a symmetric conjugate pair gives h* <= 0,
        # i.e. the contour stays pinned to the real axis.  The window extends
        # by the maximum dent depth so a pole hugging a vertical leg (real
        # parts carry float fuzz) still constrains it.
        ext = 4 * abs(im) + 1e-9 * max(1.0, abs(b - a))
        same = [abs(z.imag) for z, _ in off_axis
                if np.sign(z.imag) == side and u - ext <= z.real <= v + ext]
        gain_cap = (min(same) - abs(im)) / 2 if same else np.inf
        h = min(4 * abs(im), width / 2, gain_cap)
        if h > eps:
            path += [u + 1j * side * h, v + 1j * side * h]
        path.append(v)
    # drop consecutive duplicates
    out = [path[0]]
    for z in path[1:]:
        if abs(z - out[-1]) > eps:
            out.append(z)
    return out if len(out) > 1 else [a, b]


class ContQuadGKJL(IntegralAlgorithm):
    """Contour-deformation quadrature: when poles of 1/f are detected near a
    segment (Bernstein-ellipse sense), the contour dents into the opposite
    half-plane — per pole, splitting at pole real parts when poles straddle
    the axis (``src/algorithms.jl:243-289``)."""

    def __init__(self, order=7, rho=1.0, rootmeth=None):
        self.order = order
        self.rho = rho
        self.rootmeth = rootmeth if rootmeth is not None else NewtonDeflation()

    def init_cacheval(self, f, dom, p):
        return {"f": _host_f(f)}

    def do_solve(self, f, dom, p, cacheval, abstol=None, reltol=None, maxiters=None):
        atol, rtol = effective_tolerances(abstol, reltol)
        fh = _CountedF(cacheval["f"])
        segs = np.asarray(segments_of(dom), dtype=float)
        budget = np.inf if maxiters is None else int(maxiters)
        total = 0.0 + 0.0j
        err = 0.0
        ok = True
        for i in range(len(segs) - 1):
            a, b = segs[i], segs[i + 1]
            with _detection():
                poles = _find_poles(fh, p, a, b, self.rho, self.rootmeth)
            path = _dented_path(a, b, poles)
            I, E, _, conv = _quadgk_host(fh, p, path, atol / max(len(segs) - 1, 1), rtol,
                                         self.order, max_evals=budget - fh.n)
            total += I
            err += E
            ok = ok and conv
        return IntegralSolution(total, err, bool(ok), fh.n)


class MeroQuadGKJL(IntegralAlgorithm):
    """Pole-subtraction quadrature for meromorphic integrands: subtract the
    Newton-deflated simple poles analytically, integrate the smooth remainder
    (``src/algorithms.jl:293-328``)."""

    def __init__(self, order=7, rho=1.0, rootmeth=None):
        self.order = order
        self.rho = rho
        self.rootmeth = rootmeth if rootmeth is not None else NewtonDeflation()

    def init_cacheval(self, f, dom, p):
        return {"f": _host_f(f)}

    def do_solve(self, f, dom, p, cacheval, abstol=None, reltol=None, maxiters=None):
        atol, rtol = effective_tolerances(abstol, reltol)
        fh = _CountedF(cacheval["f"])
        segs = np.asarray(segments_of(dom), dtype=float)
        budget = np.inf if maxiters is None else int(maxiters)
        total = 0.0 + 0.0j
        err = 0.0
        ok = True
        for i in range(len(segs) - 1):
            a, b = segs[i], segs[i + 1]
            with _detection():
                poles = [(z, r)
                         for z, r in _find_poles(fh, p, a, b, self.rho,
                                                 self.rootmeth)
                         if z.imag != 0]

            def smooth(x, p, _poles=poles):
                val = fh(x, p)
                for z, r in _poles:
                    val -= r / (x - z)
                return val

            I, E, _, conv = _quadgk_host(smooth, p, [a, b], atol / max(len(segs) - 1, 1),
                                         rtol, self.order, max_evals=budget - fh.n)
            # analytic pole contribution; Log never crosses its cut since the
            # path has constant Im(x - z) = -Im(z) != 0
            for z, r in poles:
                I += r * (np.log(b - z) - np.log(a - z))
            total += I
            err += E
            ok = ok and conv
        return IntegralSolution(total, err, bool(ok), fh.n)
