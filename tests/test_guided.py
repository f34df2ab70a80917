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


def test_guided_iai_leaf_presplit_matches_default():
    """leaf_presplit through the guided tier: identical certified values
    (only the search's STARTING partition changes; the split polish
    certifies at the same tolerance)."""
    fi = FourierIntegrand(greens_function_trace, tb_integer(2), eta=0.1)
    bz = load_bz(FBZ(), 2 * np.pi * np.eye(2))
    base = IntegralSolver(IntegralProblem(fi, bz), IAI(precision="guided"),
                          abstol=1e-8).solve_p(jnp.float64(0.2))
    pre = IntegralSolver(IntegralProblem(fi, bz),
                         IAI(precision="guided", leaf_presplit=4),
                         abstol=1e-8).solve_p(jnp.float64(0.2))
    assert pre.retcode
    a = np.complex128(base.u.join())
    b = np.complex128(pre.u.join())
    assert b == pytest.approx(a, abs=1e-8)
    assert float(pre.resid) <= 1e-8


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


def test_auto_rfloor_eta_sweep():
    """The default guide_rfloor="auto" probes the search tier's relative eval
    noise at solve time (nested._probe_noise_rfloor) instead of pinning the
    SrVO3-calibrated constant.  Across an eta sweep changing ||H||/eta by 10^3
    the auto floor keeps guided within ~2x of split's raw eval count at both
    extremes (measured 1.99x smooth / 2.18x sharp — the structural search +
    upgrade + polish decomposition; the search tier is the CHEAP c64 one), and
    is never worse than the hand-calibrated pinned constant."""
    bz = load_bz(FBZ(), 2 * np.pi * np.eye(2))
    for eta, cap in ((1.0, 2.1), (1e-3, 2.3)):
        fi = FourierIntegrand(greens_function_trace, tb_integer(2), eta=eta)
        prob = IntegralProblem(fi, bz)
        us = IntegralSolver(prob, IAI(precision="split"),
                            abstol=1e-5).solve_p(jnp.float64(0.2))
        ua = IntegralSolver(prob, IAI(precision="guided"),
                            abstol=1e-5).solve_p(jnp.float64(0.2))
        up = IntegralSolver(prob, IAI(precision="guided", guide_rfloor=2e-5),
                            abstol=1e-5).solve_p(jnp.float64(0.2))
        assert ua.retcode
        a = np.complex128(us.u.join())
        b = np.complex128(ua.u.join())
        assert b == pytest.approx(a, abs=1e-8)
        ratio = int(ua.numevals) / int(us.numevals)
        assert ratio <= cap, f"eta={eta}: auto/split eval ratio {ratio:.2f}"
        # auto matches or beats the pinned SrVO3 constant (within 5%)
        assert int(ua.numevals) <= 1.05 * int(up.numevals)


def test_auto_rfloor_avoids_saturating_search():
    """The failure mode the auto floor removes: a wrongly-LOW pinned floor
    with the stall backstop disabled saturates the search against noise it
    cannot resolve (the measured 450M-eval failure mode, VERDICT r3 weak #4).
    Auto with the same disabled backstop converges outright; the wrong pinned
    floor burns >3x the evals into a budget truncation with retcode False."""
    bz = load_bz(FBZ(), 2 * np.pi * np.eye(2))
    fi = FourierIntegrand(greens_function_trace, tb_integer(2), eta=1e-3)
    prob = IntegralProblem(fi, bz)
    ua = IntegralSolver(prob, IAI(precision="guided", guide_patience=0),
                        abstol=1e-5).solve_p(jnp.float64(0.2))
    assert ua.retcode  # the probed floor alone stops the search correctly
    uw = IntegralSolver(prob,
                        IAI(precision="guided", guide_rfloor=1e-9,
                            guide_patience=0),
                        abstol=1e-5, maxiters=1_000_000).solve_p(jnp.float64(0.2))
    assert not uw.retcode  # honest truncation, not a fake certificate
    assert int(uw.numevals) > 3 * int(ua.numevals)


def test_guide_slack_trades_search_for_polish():
    """guide_slack > 1 stops the search phase looser than the certificate —
    fewer total raw evals on smooth integrands, identical certified value
    (the split polish closes the gap at the unslacked tolerance)."""
    bz = load_bz(FBZ(), 2 * np.pi * np.eye(2))
    fi = FourierIntegrand(greens_function_trace, tb_integer(2), eta=1.0)
    prob = IntegralProblem(fi, bz)
    u1 = IntegralSolver(prob, IAI(precision="guided"),
                        abstol=1e-5).solve_p(jnp.float64(0.2))
    u4 = IntegralSolver(prob, IAI(precision="guided", guide_slack=4.0),
                        abstol=1e-5).solve_p(jnp.float64(0.2))
    assert u4.retcode
    assert np.complex128(u4.u.join()) == pytest.approx(
        np.complex128(u1.u.join()), abs=1e-8)
    assert int(u4.numevals) < int(u1.numevals)


def test_warm_start_chains_host_outer_solves():
    """IAI(host_outer=True, warm_start=True): successive solves on one cache
    seed their outer heap from the previous solve's surviving partition
    (re-evaluated at the new omega with the accurate tier, search phase
    skipped).  Values match cold solves within the certificate, each warmed
    solve converges with its own f64 certificate, and the eval count drops
    by ~2x (measured 249k -> 123k on the tb_integer(2) Green's function) —
    the cross-omega warm start for sequenced DOS sweeps (VERDICT r3 #2)."""
    bz = load_bz(FBZ(), 2 * np.pi * np.eye(2))
    fi = FourierIntegrand(greens_function_trace, tb_integer(2), eta=0.05)
    prob = IntegralProblem(fi, bz)
    cold = IntegralSolver(prob, IAI(precision="guided", host_outer=True),
                          abstol=1e-6)
    warm = IntegralSolver(prob,
                          IAI(precision="guided", host_outer=True,
                              warm_start=True), abstol=1e-6)
    oms = [0.2, 0.21, 0.22]
    cs = [cold.solve_p(jnp.float64(o)) for o in oms]
    ws = [warm.solve_p(jnp.float64(o)) for o in oms]
    for c, w in zip(cs, ws):
        assert w.retcode
        assert np.complex128(w.u.join()) == pytest.approx(
            np.complex128(c.u.join()), abs=1e-6)
    # the first solve has nothing to seed from; every later one does
    assert int(ws[0].numevals) == int(cs[0].numevals)
    for c, w in zip(cs[1:], ws[1:]):
        assert int(w.numevals) < 0.7 * int(c.numevals)


def test_coarsen_partition_decays_stale_structure():
    """Sibling pairs with tiny stored error merge into their parent; pairs
    near their tolerance share, with mismatched widths, or straddling an
    original domain breakpoint stay split."""
    from autobzcore_tpu.algorithms.nested import _coarsen_partition

    tol = 1e-6
    part = np.array([
        (0.00, 0.25, 1e-14),   # stale pair: merges
        (0.25, 0.50, 1e-14),
        (0.50, 0.75, 1e-7),    # load-bearing pair: stays
        (0.75, 1.00, 1e-7),
    ])
    out = _coarsen_partition(part, np.array([0.0, 1.0]), tol)
    assert out == [(0.0, 0.5), (0.5, 0.75), (0.75, 1.0)]
    # the same stale pair straddling an original breakpoint cannot merge
    out_bk = _coarsen_partition(part, np.array([0.0, 0.25, 1.0]), tol)
    assert out_bk[0] == (0.0, 0.25)
    # mismatched widths never merge (not siblings)
    part2 = np.array([(0.0, 0.25, 1e-14), (0.25, 1.0, 1e-14)])
    assert _coarsen_partition(part2, np.array([0.0, 1.0]), tol) == [
        (0.0, 0.25), (0.25, 1.0)]


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
