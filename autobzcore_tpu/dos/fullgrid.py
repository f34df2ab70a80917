"""Lorentzian-broadened DOS through the streaming full-grid engine.

``LorentzianFullGrid(eta)`` exposes the north-star ladder
(``ops/grid_sweep.FullGridSpectralSweep`` — Ozaki bf16-slice MXU matmuls,
struct-of-arrays Cardano, omega-batched Lorentzian reduction) as a
first-class :class:`~autobzcore_tpu.dos.interfaces.DOSAlgorithm`: the
Richardson ladder of full npt^3 PTR grids refines until the sup-norm change
of the whole DOS curve falls under ``abstol``.  On one TPU v5e chip the
SrVO3 1000-omega curve converges to abstol=1e-5 in ~3 minutes warm
(BASELINE.md).  Contrast with :class:`~.ggr.GGR`/:class:`~.tetrahedron.LTM`
(sharp, delta-function DOS from one fixed grid) — this algorithm computes
the eta-broadened spectral density with a CONVERGENCE GUARANTEE in the grid,
the quantity the reference's aps_example sweeps
(``aps_example/aps_example.jl:30``).

Normalization matches GGR/LTM: DOS per unit fractional zone volume (each
band integrates to 1 over energy).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..brillouin import SymmetricBZ
from ..fourier import FourierSeries, JacobianSeries
from ..ops.grid_sweep import FullGridSpectralSweep
from .interfaces import DOSAlgorithm, DOSSolution


def _geometric_step(npt, nmax, factor):
    """Next blind geometric rung after ``npt``, or None at the cap (the one
    shared definition for both the ladder and the auto scheduler's fallback)."""
    if npt >= nmax:
        return None
    return min(int(nmax), max(int(npt) + 1, int(round(npt * factor))))


def next_rung_npt(npts, deltas, tol, factor, nmax):
    """Adaptive rung scheduler for exponentially convergent PTR ladders.

    PTR on an analytic periodic integrand converges exponentially,
    ``err(npt) ~ A exp(-c npt)`` (for the eta-broadened Green's function the
    pole sits eta off the real axis, so c ~ 2 pi eta / period).  Each
    observed sup-norm rung delta approximates the COARSER rung's true error,
    ``deltas[j] ~ err(npts[j])`` for the pair ``(npts[j], npts[j+1])``, so
    with two deltas the rate fits as
    ``c = ln(deltas[-2]/deltas[-1]) / (npts[-2] - npts[-3])``.

    The blind geometric ladder overshoots badly near convergence: on the
    SrVO3 north star the 800^3 rung's true error was already ~1.1e-5
    (delta 1.13e-5, measured at the 1120^3 rung, IS that error), yet the
    x sqrt(2) schedule confirmed with 1120^3 + 1600^3 — 114 s where a
    ~930^3 rung certifies.  Two-branch policy on the predicted current
    error ``e_k = deltas[-1] * exp(-c (n_k - n_{k-1}))``:

    - ``e_k <= 1.4 tol`` (the current rung is already ~converged): take the
      smallest HONEST confirmation step — ``delta = e_k (1 - e^{-c s}) <=
      0.95 tol`` solved for ``s``, floored at ``1/c`` so the measured delta
      is a ``>= 1 - 1/e`` fraction of the coarser rung's true error; a
      passing delta then bounds the NEW rung's error by ``~0.6 tol``.
    - otherwise: jump ``ln(e_k / (0.7 tol))/c`` straight toward the rung
      whose predicted error hits the target (its own confirmation comes
      next round), capped at ``1.5x`` the geometric growth for two-delta
      fits and ``2.5x`` once three monotone deltas corroborate the rate —
      a cap that lands short forces an extra full rung at the expensive
      end of the ladder (measured 1.26x the geometric ladder's cost on the
      SrVO3 deltas vs 0.25x for this policy).

    Steps are floored at ``max(8, 2% n_k)``, rounded up to a multiple of 32
    (each distinct npt is a distinct compiled kernel-shape set; ~40 s cold
    through the hosted tunnel) and capped at ``nmax``.  Falls back to
    geometric growth while fewer than two deltas exist or when the fitted
    rate is non-positive (noise, pre-asymptotic regime).  Returns the next
    npt (> npts[-1]) or None when ``npts[-1] >= nmax``.
    """
    import math

    n_k = int(npts[-1])
    if n_k >= nmax:
        return None

    def geometric():
        return _geometric_step(n_k, nmax, factor)

    if len(npts) < 3 or len(deltas) < 2:
        return geometric()
    d_prev, d_last = float(deltas[-2]), float(deltas[-1])
    # trust a 2-point fit only for STRONG decay (>= 4x per pair — oscillation
    # cannot mimic consistent drops that steep); weaker trends additionally
    # need three monotone deltas, since at coarse rungs the PTR error
    # oscillates (smooth integrands, pre-asymptotic regime) and a 2-point
    # fit extrapolates garbage
    if not (d_prev > d_last > 0.0):
        return geometric()
    strong = d_prev >= 4.0 * d_last and (
        len(deltas) < 3 or float(deltas[-3]) >= d_prev
    )
    mono3 = len(deltas) >= 3 and float(deltas[-3]) > d_prev
    if not (strong or mono3):
        return geometric()
    span = float(npts[-2] - npts[-3])
    if span <= 0:
        return geometric()
    c = math.log(d_prev / d_last) / span
    if not math.isfinite(c) or c <= 0:
        return geometric()
    e_cur = d_last * math.exp(-c * (n_k - float(npts[-2])))
    target = 0.7 * float(tol)
    if target <= 0:
        return geometric()
    if e_cur <= 1.4 * float(tol):
        # the CURRENT rung's predicted error is already ~tol: the very next
        # delta can certify, so take the smallest honest confirmation step —
        # delta = e_cur (1 - e^{-c s}) <= 0.95 tol solved for s, floored at
        # the 1/c honesty step (s < 1/c would measure only a sliver of the
        # coarser rung's error and could certify a curve above tol).  The
        # old ``need + 1/c`` overshot by a full 1/c here, and in the jump
        # branch below it paid (n1 + 1/c)^3 + (n1 + 2/c)^3 instead of
        # n1^3 + (n1 + 1/c)^3 — measured 1.26x the geometric ladder's cost
        # on the SrVO3 deltas where this split policy gives 0.80x.
        dt = 0.95 * float(tol)
        frac = 1.0 - dt / e_cur if e_cur > dt else 0.0
        step = -math.log(max(frac, math.exp(-3.0))) / c if frac > 0 else 1.0 / c
        step = max(step, 1.0 / c)
    else:
        # far from convergence: jump toward the rung n1 whose predicted
        # error hits the 0.7 tol target (its following 1/c confirmation
        # rung then certifies).  The cap guards against garbage fits —
        # looser once three monotone deltas corroborate the rate; a cap
        # that lands short (the old hard (factor-1) n_k) forces an extra
        # full rung near convergence, which is exactly the expensive end
        # of the ladder.
        step = math.log(e_cur / target) / c
        cap_mult = 2.5 if len(deltas) >= 3 else 1.5
        step = min(step, max(1.0, cap_mult * (factor - 1.0) * n_k))
    step = max(step, 8.0, 0.02 * n_k)
    nxt = n_k + int(math.ceil(step))
    # quantize UP to a multiple of 32 (8 for small rungs, where a 32-step
    # would dominate the rung itself): every distinct npt is a distinct set
    # of compiled kernel shapes (a cold compile through the hosted tunnel
    # costs ~40 s wall — comparable to the rung it saves), and 32-multiples
    # keep slab contraction dims MXU-tile aligned.  Rounding up only adds
    # certification margin.
    q = 32 if nxt >= 256 else 8
    nxt = q * ((nxt + q - 1) // q)
    return min(int(nmax), nxt)


class LorentzianFullGrid(DOSAlgorithm):
    """``LorentzianFullGrid(eta, nmin=50, nmax=2000, factor=sqrt(2))``.

    ``eta``: Lorentzian broadening.  The npt ladder grows geometrically from
    ``nmin`` by ``factor`` (capped at ``nmax``) until ``max|D_k - D_{k-1}|
    <= max(abstol, reltol * max|D_k|)``; ``maxiters`` bounds the TOTAL grid
    points evaluated (budget exhaustion -> ``retcode=False``).  ``mesh``
    shards slab rows over a device-mesh axis (``rung_sharded``).

    Requires a 3D ``FourierSeries`` of square Hermitian matrices.  m=3 runs
    the struct-of-arrays Cardano fast path; other band counts use the
    gather-assembled split matrices + Rayleigh-quotient f64 eigenvalues
    (``ops/rayleigh.py``), matching the reference's band-count-generic GGR
    (``/root/reference/src/dos_ggr.jl:14-44``).

    Precision floor: eigenvalues carry full (split-)f64, but the Lorentzian
    evaluation runs in two-float f32 — rung-to-rung agreement bottoms out
    around ``1e-6 * max(D)``, so ``abstol`` below ~1e-6 cannot certify.
    """

    def __init__(self, eta, nmin=50, nmax=2000, factor=np.sqrt(2.0), mesh=None,
                 schedule="auto", **engine_kwargs):
        self.eta = float(eta)
        self.nmin = int(nmin)
        self.nmax = int(nmax)
        self.factor = float(factor)
        self.mesh = mesh
        # "auto": rate-fitted rung scheduling (next_rung_npt) once two rung
        # deltas exist — certifies with the smallest rung the observed
        # exponential convergence allows; "geometric": the blind x factor
        # ladder (the pre-r3 behavior)
        if schedule not in ("auto", "geometric"):
            raise ValueError("schedule must be 'auto' or 'geometric'")
        self.schedule = schedule
        self.engine_kwargs = engine_kwargs

    def _geometric_next(self, npt):
        """Next geometric rung after ``npt``, or None at the cap."""
        return _geometric_step(npt, self.nmax, self.factor)

    def npt_ladder(self):
        npt = self.nmin
        while npt is not None:
            yield npt
            npt = self._geometric_next(npt)

    def init_cacheval(self, h, domain, p):
        if isinstance(h, JacobianSeries):
            h = h.s
        if not isinstance(h, FourierSeries):
            raise TypeError("LorentzianFullGrid requires a FourierSeries Hamiltonian")
        if not isinstance(p, SymmetricBZ):
            raise TypeError("LorentzianFullGrid takes the BZ as the problem parameter")
        c = np.asarray(h.c)
        if p.ndim != 3 or c.ndim != 5 or c.shape[-2] != c.shape[-1]:
            raise ValueError(
                "LorentzianFullGrid supports 3D series of square Hermitian "
                "matrices (any band count; m=3 takes the Cardano fast path)"
            )
        # engines are built per energy grid at solve time; cache them so
        # repeated sweeps over the same grid reuse compiled rung kernels
        return {"h": h, "engines": {}}

    def _engine(self, cacheval, Es):
        """One engine per (padded width, eta): omega VALUES are runtime
        arguments of the rung kernels, so engines key on the compiled width
        only and ``set_omegas`` swaps grids — the interval-domain driver's
        varying chebinterp frontiers then reuse one compiled engine instead
        of building (and tunnel-compiling) a fresh one per refinement round.
        Padding to multiples of 32 bounds the set of compiled widths; pad
        lanes repeat the last energy and are sliced off by the caller."""
        Es = np.atleast_1d(np.asarray(Es, np.float64))
        W = Es.size
        if W == 0:
            raise ValueError("empty energy grid")
        Wp = max(32 * ((W + 31) // 32), 1) if W > 8 else W
        Ep = np.concatenate([Es, np.full(Wp - W, Es[-1])])
        key = (Wp, self.eta)
        eng = cacheval["engines"].get(key)
        if eng is None:
            eng = FullGridSpectralSweep(cacheval["h"], Ep, self.eta,
                                        **self.engine_kwargs)
            cacheval["engines"][key] = eng
        else:
            eng.set_omegas(Ep)
        return eng

    def _ladder(self, cacheval, Es, abstol, reltol, maxiters):
        W = np.atleast_1d(np.asarray(Es)).size  # pad lanes sliced off below
        eng = self._engine(cacheval, Es)
        atol = 0.0 if abstol is None else float(abstol)
        rtol = 0.0 if reltol is None else float(reltol)
        if abstol is None and reltol is None:
            atol = 1e-8
        budget = np.inf if maxiters is None else float(maxiters)
        prev = None
        D = None
        err = np.inf
        nev = 0
        npts_done = []
        deltas = []
        # warm start: a previous converged ladder (same engine family, same
        # eta) recorded its final certifying PAIR — the rate c is a property
        # of (series, eta), not of the energy grid, so frontier rounds of
        # the interval-domain driver (and repeated pointwise solves) can
        # re-certify with just those two rungs instead of re-climbing from
        # nmin (the sub-certifying rungs are ~half the ladder's points).
        # The pair's honesty gap carries over; if the new curve's delta
        # fails anyway, the loop simply keeps extending from there.
        queue = []
        hint = cacheval.get("ladder_hint")
        if hint is not None and atol > 0:
            n1, n2, tol_u = hint
            # replay the certified pair only for COMPARABLE tolerances: a
            # much looser solve (atol >> tol_u) would burn the expensive
            # certified rungs where the cold nmin ladder certifies in a
            # tiny fraction of the points (and would then re-save the big
            # pair, pessimizing every later loose call)
            if tol_u / 4 <= atol <= 64 * tol_u and n2 <= self.nmax and rtol == 0.0:
                queue = [n1, n2]
        npt = queue.pop(0) if queue else self.nmin
        while npt is not None:
            if nev + npt**3 > budget:
                # budget honored even before the first rung: a too-small
                # maxiters yields a NaN curve with retcode=False rather than
                # silently overspending by nmin^3
                if prev is None:
                    D = np.full(np.atleast_1d(Es).shape, np.nan)
                return D, err, False, nev
            if self.mesh is not None:
                acc = eng.rung_sharded(npt, self.mesh)
            else:
                acc = eng.rung(npt)
            nev += npt**3
            D = acc[:W] / npt**3
            if prev is not None:
                err = float(np.max(np.abs(D - prev)))
                deltas.append(err)
                tol_now = max(atol, rtol * float(np.max(np.abs(D))))
                if err <= tol_now:
                    cacheval["ladder_hint"] = (npts_done[-1], npt, tol_now)
                    return D, err, True, nev
            prev = D
            npts_done.append(npt)
            if queue:
                npt = queue.pop(0)
            elif self.schedule == "auto":
                # rate-fitted scheduling certifies with the smallest rung the
                # observed exponential convergence allows (tol = the delta
                # threshold the loop above actually uses)
                tol_now = max(atol, rtol * float(np.max(np.abs(D))))
                npt = next_rung_npt(npts_done, deltas, tol_now, self.factor,
                                    self.nmax)
            else:
                npt = self._geometric_next(npt)
        # reachable only after the in-loop test failed (or never ran) at nmax
        return D, err, False, nev

    def dos_solve(self, h, domain, p, cacheval, abstol=None, reltol=None, maxiters=None):
        Es = np.atleast_1d(np.asarray(domain, np.float64))
        D, err, ok, nev = self._ladder(cacheval, Es, abstol, reltol, maxiters)
        val = jnp.asarray(D[0] if np.ndim(domain) == 0 else D)
        return DOSSolution(val, err, bool(ok), int(nev))

    def dos_sweep(self, cacheval, Es, abstol=None, reltol=None, maxiters=None,
                  with_status=False):
        """Converged broadened DOS over a whole energy grid (the ladder's
        convergence test runs on the sup-norm of the full curve).

        ``with_status=True`` returns ``(D, ok)`` so frontier drivers
        (``DOSProblem`` interval domains) can propagate ladder truncation
        into their own retcode instead of certifying unconverged data."""
        D, err, ok, nev = self._ladder(
            cacheval, np.asarray(Es, np.float64), abstol, reltol, maxiters
        )
        if with_status:
            return jnp.asarray(D), bool(ok)
        return jnp.asarray(D)
