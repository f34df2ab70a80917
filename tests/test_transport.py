"""Kinetic coefficients / optical conductivity (beyond-parity transport layer).

The reference provides the machinery these quantities are computed WITH
(cited application: SciPost Phys. 15, 062 (2023) — ``README.md:20-23``);
here they are first-class solvers.  Validation: window identities, the
equal-frequency reduction to the Kubo-Greenwood ``TransportSolver``, a dense
trapezoid reference for the adaptive frequency integral, and IBZ=FBZ
consistency of the symmetrized rank-2 tensor.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from autobzcore_tpu import FBZ, InversionSymIBZ, load_bz
from autobzcore_tpu.models.observables import TransportSolver
from autobzcore_tpu.models.tight_binding import tb_integer
from autobzcore_tpu.models.transport import (KineticCoefficientSolver,
                                             fermi_window,
                                             fermi_window_limits,
                                             optical_conductivity)


def test_fermi_window_identities():
    """The window is positive, matches -f' at Omega=0, integrates to ~1 over
    its truncation interval for any Omega, and is stable at huge beta|w|."""
    beta = 7.0
    ws = np.linspace(-6, 6, 2001)
    w0 = np.asarray(fermi_window(ws, 0.0, beta))
    assert np.all(w0 >= 0)
    fp = beta * np.exp(beta * ws) / (1 + np.exp(beta * ws)) ** 2
    assert np.max(np.abs(w0 - fp)) < 1e-12
    for Om in (0.0, 0.3, 2.0):
        lo, hi = fermi_window_limits(Om, beta, wtol=1e-12)
        xs = np.linspace(lo, hi, 20001)
        mass = np.trapezoid(np.asarray(fermi_window(xs, Om, beta)), xs)
        assert mass == pytest.approx(1.0, abs=1e-9)
    assert np.isfinite(float(fermi_window(1e6, 0.0, beta)))
    assert float(fermi_window(1e6, 0.0, beta)) < 1e-200


@pytest.fixture(scope="module")
def setup():
    h = tb_integer(2)
    bz = load_bz(FBZ(), np.eye(2))
    kc = KineticCoefficientSolver(h, bz, 16, eta=0.3, beta=4.0)
    return h, bz, kc


def test_equal_frequency_reduces_to_transport_solver(setup):
    """At Omega=0 the two-frequency distribution Gamma(w, w) must equal the
    single-frequency TransportSolver's output at the same (npt, eta)."""
    h, bz, kc = setup
    ts = TransportSolver(h, bz, 16, eta=0.3)
    om = 0.37
    win = float(fermi_window(om, 0.0, 4.0))
    G_kc = np.asarray(kc._integrand(jnp.asarray(om), jnp.asarray(0.0))) / win
    G_ts = np.asarray(ts(np.array([om])))[0]
    assert np.max(np.abs(G_kc - G_ts)) < 1e-10


def test_adaptive_matches_dense_trapezoid(setup):
    """The adaptive GK frequency integral agrees with a dense trapezoid of
    the same integrand over the same window-truncated interval."""
    h, bz, kc = setup
    for Om in (0.0, 0.8):
        got = kc(np.array([Om]), abstol=1e-7)[0]
        lo, hi = fermi_window_limits(Om, 4.0, wtol=1e-12)
        ws = np.linspace(lo, hi, 1501)
        vals = np.array([np.asarray(kc._integrand(jnp.asarray(w), jnp.asarray(Om)))
                         for w in ws])
        ref = np.trapezoid(vals, ws, axis=0)
        assert kc.retcode
        assert np.max(np.abs(got - ref)) < 1e-5
        # square-lattice C4: isotropic diagonal, zero off-diagonal
        assert got[0, 0] == pytest.approx(got[1, 1], rel=1e-8)
        assert abs(got[0, 1]) < 1e-10 * got[0, 0]


def test_ibz_matches_fbz(setup):
    """The group-averaged IBZ kinetic coefficient equals the full-zone one
    (rank-2 tensor symmetrization through the packed GEMM path)."""
    h, bz, kc = setup
    bzi = load_bz(InversionSymIBZ(), np.eye(2))
    kci = KineticCoefficientSolver(h, bzi, 16, eta=0.3, beta=4.0)
    gi = kci(np.array([0.8]), abstol=1e-7)[0]
    gf = kc(np.array([0.8]), abstol=1e-7)[0]
    assert np.max(np.abs(gi - gf)) < 1e-10 * max(1.0, gf[0, 0])


def test_moments_and_one_shot(setup):
    """alpha=1 weights the window by beta(w-mu) (sign-indefinite), and the
    one-shot optical_conductivity helper matches the solver path."""
    h, bz, kc = setup
    kc1 = KineticCoefficientSolver(h, bz, 16, eta=0.3, beta=4.0, alpha=1)
    a1 = kc1(np.array([0.5]), abstol=1e-7)[0]
    assert np.isfinite(a1).all()
    sig = optical_conductivity(h, bz, 16, eta=0.3, beta=4.0, Omegas=[0.8],
                               abstol=1e-7)
    ref = kc(np.array([0.8]), abstol=1e-7)
    assert np.max(np.abs(sig - ref)) < 1e-8


def test_mu_shifts_the_window(setup):
    """A chemical-potential shift moves the window: at mu far below the band
    the DC coefficient collapses toward zero."""
    h, bz, kc = setup
    kc_mu = KineticCoefficientSolver(h, bz, 16, eta=0.3, beta=4.0, mu=-30.0)
    g0 = kc(np.array([0.0]), abstol=1e-7)[0][0, 0]
    gmu = kc_mu(np.array([0.0]), abstol=1e-7)[0][0, 0]
    assert gmu < 1e-3 * g0


def test_sweep_matches_per_omega(setup):
    """The scan-swept path (one device program per chunk, shared superset
    window) matches the per-Omega adaptive solves."""
    h, bz, kc = setup
    Oms = np.array([0.0, 0.4, 0.8])
    ref = kc(Oms, abstol=1e-7)
    got = kc.sweep(Oms, abstol=1e-7, chunk=2)
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 1e-6


def test_electron_count_and_find_mu():
    """Filling is monotone in mu, hits half filling at the particle-hole
    symmetric point of the integer lattice, matches the zero-T step count,
    agrees between IBZ and FBZ grids, and find_mu inverts it."""
    from autobzcore_tpu.models.transport import ElectronCountSolver

    h = tb_integer(2)
    bz = load_bz(FBZ(), np.eye(2))
    ec = ElectronCountSolver(h, bz, 32)
    assert ec.nbands == 1
    # particle-hole symmetry of cos(kx)+cos(ky): n(0) = 1/2 at any beta
    assert ec(0.0, 5.0) == pytest.approx(0.5, abs=1e-12)
    assert ec(0.0, np.inf) == pytest.approx(0.5, abs=0.02)
    # monotone and saturating
    assert ec(-10.0, 5.0) < 1e-6
    assert ec(10.0, 5.0) > 1 - 1e-6
    # IBZ grid gives the same count
    eci = ElectronCountSolver(h, load_bz(InversionSymIBZ(), np.eye(2)), 32)
    assert eci(0.7, 5.0) == pytest.approx(ec(0.7, 5.0), abs=1e-12)
    # inverse: recover mu for a target filling
    mu = ec.find_mu(0.3, 5.0)
    assert ec(mu, 5.0) == pytest.approx(0.3, abs=1e-8)
    with pytest.raises(ValueError):
        ec.find_mu(1.5, 5.0)


def test_validation_and_pack_sharing(setup):
    """Negative alpha and zero-temperature windows raise; a shared
    SpectralPack gives bit-identical results across solvers (the grid builds
    once), and the eigenvalues-only ElectronCountSolver build matches the
    full pack's eigenvalues."""
    from autobzcore_tpu.models.observables import spectral_velocity_pack
    from autobzcore_tpu.models.transport import ElectronCountSolver

    h, bz, kc = setup
    with pytest.raises(ValueError, match="non-negative"):
        KineticCoefficientSolver(h, bz, 16, eta=0.3, beta=4.0, alpha=-1)
    with pytest.raises(ValueError, match="finite"):
        fermi_window_limits(0.0, np.inf)

    pack = spectral_velocity_pack(h, bz, 16)
    kc_shared = KineticCoefficientSolver(h, bz, 16, eta=0.3, beta=4.0,
                                         pack=pack)
    got = kc_shared(np.array([0.8]), abstol=1e-7)
    ref = kc(np.array([0.8]), abstol=1e-7)
    assert np.array_equal(got, ref)
    assert kc_shared.pack is pack
    ec_cheap = ElectronCountSolver(h, bz, 16)
    ec_pack = ElectronCountSolver(h, bz, 16, pack=pack)
    assert ec_cheap(0.4, 5.0) == pytest.approx(ec_pack(0.4, 5.0), abs=1e-12)


def test_fermi_window_no_cancellation_near_dc():
    """The product form must be smooth through Omega -> 0: a window at
    Omega = 1e-12 agrees with the analytic DC limit to near machine
    precision (the naive f(x) - f(x+a) difference loses ~12 digits here)."""
    beta = 40.0
    ws = np.linspace(-0.5, 0.5, 101)
    w_dc = np.asarray(fermi_window(ws, 0.0, beta))
    w_eps = np.asarray(fermi_window(ws, 1e-12, beta))
    assert np.max(np.abs(w_eps - w_dc) / w_dc.max()) < 1e-10


def test_sweep_sets_retcode(setup):
    """sweep() must certify like __call__: retcode True on a converged
    sweep, False when the budget cannot be met."""
    h, bz, kc = setup
    kc_ok = KineticCoefficientSolver(h, bz, 16, eta=0.3, beta=4.0)
    kc_ok.sweep(np.array([0.0, 0.4]), abstol=1e-6, chunk=2)
    assert kc_ok.retcode is True
    assert kc_ok.numevals > 100  # true GK integrand evals, not solve counts
    kc_bad = KineticCoefficientSolver(h, bz, 16, eta=0.3, beta=4.0, cap=8)
    kc_bad.sweep(np.array([0.0, 0.4]), abstol=1e-14, chunk=2)
    assert kc_bad.retcode is False


def test_scalar_self_energy(setup):
    """A frequency-dependent scalar self-energy replaces the constant-eta
    spectral function; Sigma = -i eta reproduces the eta path exactly, and a
    Fermi-liquid-like Sigma(w) = -i(eta + c w^2) stays certified and differs."""
    h, bz, kc = setup
    kc_const = KineticCoefficientSolver(
        h, bz, 16, eta=0.3, beta=4.0,
        self_energy=lambda w: jnp.asarray(-0.3j))
    ref = kc(np.array([0.5]), abstol=1e-7)
    got = kc_const(np.array([0.5]), abstol=1e-7)
    assert np.max(np.abs(got - ref)) < 1e-9
    kc_fl = KineticCoefficientSolver(
        h, bz, 16, eta=0.3, beta=4.0,
        self_energy=lambda w: 0.05 * w - 1j * (0.3 + 0.2 * w**2))
    fl = kc_fl(np.array([0.5]), abstol=1e-7)
    assert kc_fl.retcode
    assert np.isfinite(fl).all()
    assert np.max(np.abs(fl - ref)) > 1e-3


def test_electron_count_pack_npt_mismatch_safe():
    # regression: the filling was silently rescaled when the npt argument
    # differed from the shared pack's grid
    import numpy as np

    from autobzcore_tpu import FBZ, load_bz
    from autobzcore_tpu.models.observables import spectral_velocity_pack
    from autobzcore_tpu.models.transport import ElectronCountSolver
    from autobzcore_tpu.models.tight_binding import tb_graphene

    h = tb_graphene()
    bz = load_bz(FBZ(), np.eye(2))
    pack = spectral_velocity_pack(h, bz, 16)
    n_ref = ElectronCountSolver(h, bz, 16)(0.0, 50.0)
    n_pack = ElectronCountSolver(h, bz, 999, pack=pack)(0.0, 50.0)  # wrong npt arg
    assert abs(n_pack - n_ref) < 1e-12
