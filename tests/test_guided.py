"""f32-guided split-f64 adaptive integration (ops/adaptive.gk_adaptive_guided,
NestedQuad(split="guided"), IAI(precision="guided")).

The guided tier is a TPU-original three-phase driver: search with cheap
complex64 evaluations, upgrade the surviving intervals in split-f64, polish to
the f64 certificate.  These tests pin (a) exact agreement of the certified
values with the pure split tier, (b) the machinery in 1D, and (c) the
host-outer guided flow (search panel + upgrade + polish).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autobzcore_tpu import (
    FBZ,
    IAI,
    AuxValue,
    FourierIntegrand,
    IntegralProblem,
    IntegralSolver,
    SplitComplex,
    load_bz,
)
from autobzcore_tpu.models import tb_integer
from autobzcore_tpu.models.observables import greens_function_trace


def test_gk_adaptive_guided_1d_matches_plain():
    """With identical tier functions, the guided driver reproduces the plain
    adaptive result (search finds the pool, upgrade re-evaluates it, polish
    certifies) on a peaked 1D integrand."""
    from autobzcore_tpu.ops.adaptive import gk_adaptive, gk_adaptive_guided

    eta = 1e-3

    def batch_f(xs, p):
        return eta / np.pi / (xs**2 + eta**2)

    segs = jnp.asarray([-1.0, 1.0])
    val, err, ne, conv = gk_adaptive(batch_f, None, segs, abstol=1e-10, cap=256)
    valg, errg, neg, convg = gk_adaptive_guided(
        batch_f, batch_f, None, None, segs, abstol=1e-10, cap=256)
    assert bool(conv) and bool(convg)
    # both certify the same analytic answer (2/pi * atan(1/eta))
    exact = 2 / np.pi * np.arctan(1 / eta)
    assert float(val) == pytest.approx(exact, abs=1e-10)
    assert float(valg) == pytest.approx(exact, abs=1e-10)
    assert float(errg) <= 1e-10
    # the guided run spends extra (search-tier) evaluations and counts them
    assert int(neg) >= int(ne)


def test_guided_iai_matches_split_2d():
    """Full-device guided nest: value equals the split tier to f64 roundoff,
    with a converged f64 certificate."""
    fi = FourierIntegrand(greens_function_trace, tb_integer(2), eta=0.1)
    bz = load_bz(FBZ(), 2 * np.pi * np.eye(2))
    us = IntegralSolver(IntegralProblem(fi, bz), IAI(precision="split"),
                        abstol=1e-8).solve_p(jnp.float64(0.2))
    ug = IntegralSolver(IntegralProblem(fi, bz), IAI(precision="guided"),
                        abstol=1e-8).solve_p(jnp.float64(0.2))
    assert ug.retcode
    a = np.complex128(us.u.join())
    b = np.complex128(ug.u.join())
    assert b == pytest.approx(a, abs=1e-12)
    assert float(ug.resid) <= 1e-8


def test_guided_iai_host_outer_matches_split():
    """Host-outer guided flow (f32 search panel, chunked upgrade through the
    accurate panel, polish) certifies the same value as the split tier."""
    fi = FourierIntegrand(greens_function_trace, tb_integer(2), eta=0.1)
    bz = load_bz(FBZ(), 2 * np.pi * np.eye(2))
    us = IntegralSolver(IntegralProblem(fi, bz),
                        IAI(precision="split", host_outer=True),
                        abstol=1e-8).solve_p(jnp.float64(0.2))
    uh = IntegralSolver(IntegralProblem(fi, bz),
                        IAI(precision="guided", host_outer=True),
                        abstol=1e-8).solve_p(jnp.float64(0.2))
    assert uh.retcode
    a = np.complex128(us.u.join())
    b = np.complex128(uh.u.join())
    assert b == pytest.approx(a, abs=1e-12)


def test_guided_auxvalue_channels():
    """AuxValue results flow through the guided pools (search in c64, upgrade
    in split) with per-channel error control intact."""
    eta = 0.05
    om = 0.3

    def f(v):
        if isinstance(v.s, SplitComplex):
            h = v.s.re[0, 0] if v.s.ndim == 2 else v.s.re
            g = SplitComplex(om - h, jnp.broadcast_to(jnp.asarray(eta), jnp.shape(h)))
            ginv = SplitComplex(jnp.ones_like(h), None) / g
            return AuxValue(-ginv.imag / jnp.pi, ginv.abs2())
        h = jnp.real(v.s[0, 0]) if v.s.ndim == 2 else jnp.real(v.s)
        g = 1.0 / (om + 1j * eta - h)
        return AuxValue(-jnp.imag(g) / jnp.pi, jnp.abs(g) ** 2)

    bz = load_bz(FBZ(), np.eye(2))
    fi = FourierIntegrand(f, tb_integer(2))
    from autobzcore_tpu import solve

    ref = solve(IntegralProblem(fi, bz), IAI(precision="split"), abstol=1e-6)
    sol = solve(IntegralProblem(fi, bz), IAI(precision="guided"), abstol=1e-6)
    assert sol.retcode
    assert float(sol.u.val) == pytest.approx(float(ref.u.val), abs=1e-9)
    assert float(sol.u.aux) == pytest.approx(float(ref.u.aux), abs=1e-7)


def _f32_peak(xs, p):
    eta = p
    return eta / ((xs - 0.5) ** 2 + eta**2)


def test_noise_rfloor_stops_saturating_search():
    """An f32 pool chasing an absolute tolerance below its eval-noise floor
    saturates the cap; the L1-relative floor stops it where f32 stops
    resolving, with the value still accurate to that floor."""
    from autobzcore_tpu.ops.adaptive import gk_adaptive

    segs = jnp.asarray([0.0, 1.0], jnp.float32)
    kw = dict(order=7, cap=2000, nbisect=1, abstol=1e-11, reltol=0.0)
    val0, _, ne0, conv0 = gk_adaptive(_f32_peak, jnp.float32(1e-3), segs, **kw)
    val1, _, ne1, conv1 = gk_adaptive(_f32_peak, jnp.float32(1e-3), segs,
                                      noise_rfloor=1e-7, **kw)
    assert not bool(conv0) and int(ne0) > 10 * int(ne1)  # saturated vs floored
    assert bool(conv1)
    exact = 2 * np.arctan(0.5 / 1e-3)  # atan((1-.5)/eta) + atan(.5/eta)
    assert float(val1) == pytest.approx(exact, rel=1e-5)


def test_stall_patience_detects_noise_floor_without_model():
    """The stalled-total-error detector stops the same saturating search with
    NO noise model at all — the backstop for amplified eval noise (c64
    Green's functions) where no fixed rfloor can be right."""
    from autobzcore_tpu.ops.adaptive import gk_adaptive

    segs = jnp.asarray([0.0, 1.0], jnp.float32)
    kw = dict(order=7, cap=2000, nbisect=1, abstol=1e-11, reltol=0.0)
    _, _, ne0, _ = gk_adaptive(_f32_peak, jnp.float32(1e-3), segs, **kw)
    val1, err1, ne1, _ = gk_adaptive(_f32_peak, jnp.float32(1e-3), segs,
                                     stall_patience=8, **kw)
    assert int(ne0) > 10 * int(ne1)
    exact = 2 * np.arctan(0.5 / 1e-3)
    assert float(val1) == pytest.approx(exact, rel=1e-5)
    # the reported residual is an honest noise-floor estimate, not the
    # requested abstol
    assert float(err1) > 1e-11


def test_guided_rejects_bad_precision():
    with pytest.raises(ValueError):
        IAI(precision="half")


def test_guided_nest_defaults_to_narrow_host_panels():
    """NestedQuad(split='guided', host_outer=True) constructed DIRECTLY (not
    via the IAI wrapper) must default host_nbisect to 1: guided panels
    dispatch both tiers per refinement step and 120-node panels crash the
    hosted-TPU tunnel worker (docs/DESIGN.md 'Guided precision')."""
    from autobzcore_tpu import NestedQuad, QuadGKJL

    algs = (QuadGKJL(), QuadGKJL())
    assert NestedQuad(algs, split="guided", host_outer=True).host_nbisect == 1
    assert NestedQuad(algs, split=True, host_outer=True).host_nbisect == 4
    assert NestedQuad(algs, split="guided", host_nbisect=3).host_nbisect == 3
