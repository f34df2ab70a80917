"""LorentzianFullGrid DOS algorithm (dos/fullgrid.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from autobzcore_tpu import FBZ, load_bz
from autobzcore_tpu.dos import DOSProblem, LorentzianFullGrid, init, solve_
from tests.test_grid_sweep import _dense_dos, _random_hermitian_series


@pytest.fixture(scope="module")
def setup():
    s = _random_hermitian_series(seed=11)
    bz = load_bz(FBZ(), np.eye(3))
    return s, bz


def test_single_energy_converges(setup):
    s, bz = setup
    eta = 0.3  # smooth: a coarse ladder rung suffices
    # geometric schedule pinned: at these coarse oscillatory rungs the
    # rung-pair deltas are luck-of-cancellation, and this test asserts the
    # legacy x sqrt(2) pairing specifically
    alg = LorentzianFullGrid(eta, nmin=8, nmax=64, slab=4, omega_batch=1,
                             schedule="geometric")
    cache = init(DOSProblem(s, 0.5, bz), alg, abstol=1e-5)
    sol = solve_(cache)
    assert sol.retcode
    ref = _dense_dos(s, 64, np.array([0.5]), eta)[0] / 64**3
    assert float(sol.u) == pytest.approx(ref, abs=1e-5)
    # re-solve through the same cache reuses the engines dict
    sol2 = solve_(cache)
    assert float(sol2.u) == pytest.approx(float(sol.u), abs=1e-12)


def test_sweep_matches_dense(setup):
    s, bz = setup
    eta = 0.25
    Es = np.linspace(-4.0, 4.0, 12)
    alg = LorentzianFullGrid(eta, nmin=8, nmax=32, slab=4, omega_batch=6)
    cache = init(DOSProblem(s, Es, bz), alg, abstol=1e-5)
    D = np.asarray(alg.dos_sweep(cache.cacheval, Es, abstol=1e-5))
    ref = _dense_dos(s, 32, Es, eta) / 32**3
    assert np.max(np.abs(D - ref)) < 1e-4


def test_budget_truncation(setup):
    s, bz = setup
    alg = LorentzianFullGrid(0.05, nmin=8, nmax=512, slab=4, omega_batch=1)
    cache = init(DOSProblem(s, 0.0, bz), alg, abstol=1e-12, maxiters=2000)
    sol = solve_(cache)
    assert sol.retcode is False
    assert sol.numevals <= 2000


def test_rejects_wrong_shape(setup):
    _, bz = setup
    from autobzcore_tpu.fourier import FourierSeries

    # non-square values (band counts other than 3 are now supported)
    C = np.zeros((3, 3, 3, 2, 3), complex)
    s2 = FourierSeries(C, period=1.0, offset=(-1, -1, -1), ndim=3)
    with pytest.raises(ValueError):
        LorentzianFullGrid(0.1).init_cacheval(s2, 0.0, bz)


def test_general_m_through_dos_algorithm(setup):
    """A 2-band series runs end-to-end through LorentzianFullGrid
    (VERDICT r2 next #2: dos/fullgrid no longer raises for m != 3)."""
    _, bz = setup
    s2 = _random_hermitian_series(seed=21, n=3, m=2)
    alg = LorentzianFullGrid(0.3, nmin=8, nmax=64, slab=4, omega_batch=1)
    cache = init(DOSProblem(s2, 0.5, bz), alg, abstol=1e-4)
    sol = solve_(cache)
    assert sol.retcode
    ref = _dense_dos(s2, 64, np.array([0.5]), 0.3)[0] / 64**3
    assert float(sol.u) == pytest.approx(ref, abs=1e-4)


def test_budget_honored_before_first_rung(setup):
    """maxiters smaller than the first rung: no silent nmin^3 overspend —
    NaN curve, retcode False, zero evals (ADVICE r2)."""
    s, bz = setup
    alg = LorentzianFullGrid(0.05, nmin=8, nmax=512, slab=4, omega_batch=1)
    cache = init(DOSProblem(s, 0.0, bz), alg, abstol=1e-3, maxiters=100)
    sol = solve_(cache)
    assert sol.retcode is False
    assert sol.numevals == 0
    assert np.isnan(float(sol.u))


def test_next_rung_npt_scheduler():
    """Rate-fitted rung scheduling: on the recorded north-star deltas the
    scheduler certifies with ~874^3 where the geometric ladder burned
    1120^3 + 1600^3; oscillatory/short histories fall back to geometric."""
    import math

    from autobzcore_tpu.dos.fullgrid import next_rung_npt

    f = math.sqrt(2.0)
    # real r3 north-star data (BASELINE.md): monotone exponential decay
    n = next_rung_npt([400, 560, 800, 1120],
                      [3.24e-3, 2.91e-4, 1.13e-5], 1e-5, f, 2000)
    assert n < 1280 and n % 32 == 0  # rate-fitted rungs are shape-quantized
    # fewer than three deltas -> geometric
    assert next_rung_npt([50, 71], [1e-3], 1e-5, f, 2000) == 100
    # oscillation -> geometric
    assert next_rung_npt([50, 71, 100, 141], [1e-3, 2e-3, 5e-4],
                         1e-5, f, 2000) == 199
    # cap respected
    assert next_rung_npt([2000], [], 1e-5, f, 2000) is None
    # jumps are capped: at most 2.5x the geometric growth even with three
    # corroborating monotone deltas (+ the 32-quantum)
    n = next_rung_npt([100, 141, 200, 283], [1e-1, 1e-2, 1e-3], 1e-12, f, 4000)
    assert n <= 283 + math.ceil(2.5 * (f - 1.0) * 283) + 32
    # two-delta fits get the tighter 1.5x cap
    n2 = next_rung_npt([100, 141, 200], [1e-1, 1e-3], 1e-12, f, 4000)
    assert n2 <= 200 + math.ceil(1.5 * (f - 1.0) * 200) + 32


def test_auto_schedule_converges_with_headroom(setup):
    """The default auto schedule certifies the same answer as geometric when
    nmax leaves room (the intended regime: deep monotone convergence)."""
    s, bz = setup
    alg = LorentzianFullGrid(0.3, nmin=8, nmax=128, slab=4, omega_batch=1)
    cache = init(DOSProblem(s, 0.5, bz), alg, abstol=1e-5)
    sol = solve_(cache)
    assert sol.retcode
    ref = _dense_dos(s, 64, np.array([0.5]), 0.3)[0] / 64**3
    assert float(sol.u) == pytest.approx(ref, abs=2e-5)


def test_engine_cache_reuses_compiled_width_with_correct_values(setup):
    """Two grids with identical length but different interior spacing share
    ONE engine (omega values are runtime args; only the width is a compiled
    shape) and still produce their own correct curves — the wrong-grid-reuse
    hazard of ADVICE r2 is now structurally impossible via set_omegas."""
    s, bz = setup
    alg = LorentzianFullGrid(0.25, nmin=8, nmax=8, slab=4, omega_batch=1)
    cache = init(DOSProblem(s, 0.0, bz), alg, abstol=1e-3)
    lin = np.linspace(1.0, 4.0, 5)
    geo = np.geomspace(1.0, 4.0, 5)
    D_lin = np.asarray(alg.dos_sweep(cache.cacheval, lin, abstol=1.0))
    D_geo = np.asarray(alg.dos_sweep(cache.cacheval, geo, abstol=1.0))
    assert len(cache.cacheval["engines"]) == 1  # same width -> one engine
    ref_geo = _dense_dos(s, 8, geo, 0.25) / 8**3
    ref_lin = _dense_dos(s, 8, lin, 0.25) / 8**3
    assert np.max(np.abs(D_geo - ref_geo)) < 1e-4
    assert np.max(np.abs(D_lin - ref_lin)) < 1e-4
    assert not np.allclose(D_lin, D_geo)


def test_interval_domain_truncated_ladder_not_certified(setup):
    """An interval-domain DOSProblem whose ladder hits the maxiters budget
    must return retcode=False (uncertified interpolant), not a 'certified'
    curve built from unconverged or NaN frontier data."""
    from autobzcore_tpu.dos import solve as dos_solve_fn

    s, bz = setup
    alg = LorentzianFullGrid(0.3, nmin=8, nmax=64, slab=4, omega_batch=1,
                             schedule="geometric")
    # budget below the first rung: every frontier is NaN -> zero-filled,
    # flagged uncertified
    sol = dos_solve_fn(DOSProblem(s, (0.0, 1.0), bz), alg, abstol=1e-2,
                       maxiters=8**3 - 1)
    assert sol.retcode is False
    assert not np.isfinite(sol.err)
    # and a certified run over the same interval does report retcode=True
    ok = dos_solve_fn(DOSProblem(s, (0.0, 1.0), bz), alg, abstol=1e-2)
    assert ok.retcode


def test_next_rung_npt_invariants_fuzz():
    """Scheduler invariants over random delta histories: the next rung is
    always strictly larger and nmax-capped; rate-FITTED rungs are quantized
    (32 above 256, 8 below, or == nmax — geometric-fallback rungs keep the
    classic x sqrt(2) ladder shapes for compile-cache reuse); and when the
    fit is trusted the step respects the 1/c honesty floor even when it
    exceeds the geometric clamp (the slow-rate certification hole fixed in
    round 3)."""
    import math

    from autobzcore_tpu.dos.fullgrid import next_rung_npt

    rng = np.random.default_rng(11)
    f = np.sqrt(2.0)
    for _ in range(300):
        k = rng.integers(1, 7)
        npts = [int(50 * f**j) for j in range(k)]
        deltas = list(10.0 ** rng.uniform(-8, -1, size=max(0, k - 1)))
        tol = 10.0 ** rng.uniform(-9, -2)
        nmax = int(rng.choice([800, 2000, 4000]))
        n = next_rung_npt(npts, deltas, tol, f, nmax)
        if npts[-1] >= nmax:
            assert n is None
            continue
        assert n is not None and n > npts[-1]
        assert n <= nmax

    # rate-fitted rungs quantize to 32-multiples (or nmax)
    n = next_rung_npt([400, 560, 800], [4e-3, 1e-3], 1e-5, f, 2000)
    assert n is not None and (n % 32 == 0 or n == 2000)

    # honesty floor dominates the geometric clamp for slow decay: rate
    # c = ln(1.5)/50 -> 1/c ~ 123 > (sqrt2-1)*150 ~ 62
    npts = [50, 100, 150]
    deltas = [1.5e-3, 1e-3]
    c = math.log(1.5) / 50.0
    n = next_rung_npt(npts, deltas, 1e-4, f, 10000)
    # strong-decay gate rejects this 1.5x drop (2-point fit untrusted) ->
    # geometric; verify the gate rather than the floor here
    assert n == int(round(150 * f))
    # a trusted fit (>=4x drops) with slow absolute rate: c = ln(4)/400
    npts = [400, 600, 800]
    deltas = [4e-3, 1e-3]
    c = math.log(4.0) / 200.0
    n = next_rung_npt(npts, deltas, 1e-7, f, 100000)
    assert n - 800 >= 1.0 / c  # step at least the honesty floor


def test_ladder_warm_start_reuses_certifying_pair(setup):
    """A converged ladder records its final rung pair; subsequent solves at
    the same tolerance re-certify with just those two rungs (the rate is a
    property of (series, eta), not the energy grid) — halving interval-DOS
    frontier rounds.  A failed warm pair must still fall through to more
    rungs, never certify falsely."""
    s, bz = setup
    alg = LorentzianFullGrid(0.25, nmin=8, nmax=64, slab=4, omega_batch=1)
    cache = init(DOSProblem(s, 0.0, bz), alg, abstol=1e-3)
    Es1 = np.linspace(0.5, 1.5, 5)
    D1, ok1 = alg.dos_sweep(cache.cacheval, Es1, abstol=1e-3, with_status=True)
    assert ok1
    hint = cache.cacheval["ladder_hint"]
    assert hint[0] < hint[1] <= 64
    # second sweep on a different grid: exactly the two hint rungs
    Es2 = np.linspace(1.0, 2.0, 5)
    nev_before = hint[0] ** 3 + hint[1] ** 3
    D2, err2, ok2, nev2 = alg._ladder(cache.cacheval, Es2, 1e-3, None, None)
    assert ok2 and nev2 == nev_before
    ref2 = _dense_dos(s, hint[1], Es2, 0.25) / hint[1] ** 3
    assert np.max(np.abs(np.asarray(D2) - ref2)) < 1e-3
    # a much tighter tolerance ignores the stale hint (atol < tol_u/4) and
    # re-climbs from nmin — it must NOT certify from the stale 2-rung pair
    D3, err3, ok3, nev3 = alg._ladder(cache.cacheval, Es2, 1e-3 / 100, None, None)
    assert nev3 != nev_before  # not the warm pair: a fresh climb
    ref3 = _dense_dos(s, 64, Es2, 0.25) / 64**3
    assert np.max(np.abs(np.asarray(D3) - ref3)) < 1e-4


def test_interval_default_tolerance_forwards_abstol():
    """A default-tolerance interval solve must forward the (defaulted)
    certificate budget to an abstol-honoring sweep — the ladder must not run
    at its own much tighter internal default when the user passes nothing."""
    from autobzcore_tpu.dos.interfaces import (DOSAlgorithm, DOSProblem,
                                               solve as dos_solve_fn)

    seen = []

    class Stub(DOSAlgorithm):
        def dos_sweep(self, cacheval, Es, abstol=None, with_status=False):
            seen.append(abstol)
            out = np.exp(-np.asarray(Es) ** 2)
            return (out, True) if with_status else out

    sol = dos_solve_fn(DOSProblem(None, (0.0, 1.0)), Stub())
    assert sol.retcode
    assert seen and all(a == pytest.approx(0.5e-2) for a in seen)
