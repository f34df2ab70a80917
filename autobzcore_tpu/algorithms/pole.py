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
    """Root-finding method marker for API parity with the reference."""


def _host_f(f):
    g = unwrap_integrand(f)

    def call(x, p):
        return complex(g(x, p))

    return call


def _quadgk_host(f, p, segs, atol, rtol, order=7, max_segs=10**4):
    """Heap-based adaptive GK over (possibly complex) segment endpoints."""
    xk, wk, wg = kronrod(order)

    def rule(a, b):
        mid = (a + b) / 2
        half = (b - a) / 2
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
    while total_E > max(atol, rtol * abs(total_I)) and count < max_segs:
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
    return total_I, total_E, nev


def _find_poles(f, p, a, b, rho, nfit=32):
    """Roots of a Chebyshev model of 1/f inside the Bernstein ellipse of the
    segment [a, b] (semiaxes cosh(rho), sinh(rho) on the standard segment)."""
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
    dcoef = np.polynomial.chebyshev.chebder(coef)
    out = []
    for z in np.atleast_1d(roots):
        # Bernstein ellipse membership: z = cos(w), |Im(arccos z)| < rho
        w = np.arccos(complex(z))
        if abs(w.imag) < rho:
            gprime = np.polynomial.chebyshev.chebval(z, dcoef) / half
            zmapped = mid + half * z
            residue = 1.0 / gprime if gprime != 0 else 0.0
            out.append((zmapped, residue))
    return out


class ContQuadGKJL(IntegralAlgorithm):
    """Contour-deformation quadrature: when poles of 1/f are detected near a
    segment, dent the contour into the opposite half-plane."""

    def __init__(self, order=7, rho=1.0, rootmeth=NewtonDeflation()):
        self.order = order
        self.rho = rho
        self.rootmeth = rootmeth

    def init_cacheval(self, f, dom, p):
        return {"f": _host_f(f)}

    def do_solve(self, f, dom, p, cacheval, abstol=None, reltol=None, maxiters=None):
        atol, rtol = effective_tolerances(abstol, reltol)
        fh = cacheval["f"]
        segs = np.asarray(segments_of(dom), dtype=float)
        total = 0.0 + 0.0j
        err = 0.0
        nev = 0
        for i in range(len(segs) - 1):
            a, b = segs[i], segs[i + 1]
            poles = _find_poles(fh, p, a, b, self.rho)
            path = [a, b]
            if poles:
                # deform away from the nearest pole if it is decisively one-sided
                nearest = min(poles, key=lambda zr: abs(zr[0].imag))
                im = nearest[0].imag
                others = [zr for zr in poles if np.sign(zr[0].imag) != np.sign(im)]
                if im != 0 and (not others or min(abs(zr[0].imag) for zr in others) > 3 * abs(im)):
                    h = -np.sign(im) * min(abs(im) * 4, abs(b - a) / 2)
                    path = [a, a + 1j * h, b + 1j * h, b]
            I, E, n = _quadgk_host(fh, p, path, atol / max(len(segs) - 1, 1), rtol, self.order)
            total += I
            err += E
            nev += n
        return IntegralSolution(total, err, True, nev)


class MeroQuadGKJL(IntegralAlgorithm):
    """Pole-subtraction quadrature for meromorphic integrands: subtract the
    detected simple poles analytically, integrate the smooth remainder."""

    def __init__(self, order=7, rho=1.0, rootmeth=NewtonDeflation()):
        self.order = order
        self.rho = rho
        self.rootmeth = rootmeth

    def init_cacheval(self, f, dom, p):
        return {"f": _host_f(f)}

    def do_solve(self, f, dom, p, cacheval, abstol=None, reltol=None, maxiters=None):
        atol, rtol = effective_tolerances(abstol, reltol)
        fh = cacheval["f"]
        segs = np.asarray(segments_of(dom), dtype=float)
        total = 0.0 + 0.0j
        err = 0.0
        nev = 0
        for i in range(len(segs) - 1):
            a, b = segs[i], segs[i + 1]
            poles = [(z, r) for z, r in _find_poles(fh, p, a, b, self.rho) if z.imag != 0]

            def smooth(x, p, _poles=poles):
                val = fh(x, p)
                for z, r in _poles:
                    val -= r / (x - z)
                return val

            I, E, n = _quadgk_host(smooth, p, [a, b], atol / max(len(segs) - 1, 1), rtol, self.order)
            for z, r in poles:
                I += r * (np.log(b - z) - np.log(a - z))
            total += I
            err += E
            nev += n
        return IntegralSolution(total, err, True, nev)
