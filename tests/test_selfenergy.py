"""Matrix-valued self-energy Green's functions: consistency anchors."""
import jax.numpy as jnp
import numpy as np
import pytest

from autobzcore_tpu import FBZ, IAI, IntegralProblem, IntegralSolver, PTR, load_bz
from autobzcore_tpu.models.selfenergy import (SigmaDOSSolver, SigmaInterpolant,
                                              dos_integrand_sigma)
from autobzcore_tpu.models.tight_binding import tb_graphene, tb_integer


def _const_sigma(val):
    return lambda om: jnp.asarray(val)


def test_sigma_interpolant_linear_exact():
    # linear data is reproduced exactly between and clamped outside nodes
    w = np.linspace(-1, 1, 11)
    vals = (2.0 + 3.0j) * w[:, None, None] * np.eye(2)
    S = SigmaInterpolant(w, vals)
    got = np.asarray(S(0.37))
    np.testing.assert_allclose(got, (2 + 3j) * 0.37 * np.eye(2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(S(5.0)), vals[-1], atol=1e-12)
    np.testing.assert_allclose(np.asarray(S(-5.0)), vals[0], atol=1e-12)


def test_constant_sigma_matches_eta_dos():
    # Sigma = -i eta I reproduces the constant-broadening DOS exactly
    from autobzcore_tpu.models.observables import dos_integrand

    h = tb_integer(2)
    bz = load_bz(FBZ(), np.eye(2))
    eta = 0.2
    om = 0.3
    ref = float(IntegralSolver(IntegralProblem(dos_integrand(h, eta=eta), bz),
                               PTR(npt=32))(om=om))
    fi = dos_integrand_sigma(h, _const_sigma(-1j * eta))
    got = float(IntegralSolver(IntegralProblem(fi, bz), PTR(npt=32))(om=om))
    assert got == pytest.approx(ref, rel=1e-12)


def test_real_shift_translates_dos():
    # Sigma = Delta (real) shifts the spectrum: D_Sigma(om) = D_0(om - Delta)
    h = tb_integer(1)
    bz = load_bz(FBZ(), np.eye(1))
    eta, delta = 0.15, 0.4
    om = np.linspace(-3, 3, 7)
    s0 = SigmaDOSSolver(h, bz, 64, _const_sigma(-1j * eta))
    s1 = SigmaDOSSolver(h, bz, 64, _const_sigma(delta - 1j * eta))
    np.testing.assert_allclose(np.asarray(s1(om + delta)), np.asarray(s0(om)),
                               rtol=1e-10)


def test_orbital_selective_broadening():
    # block-diagonal 2-band model with orbital-resolved Sigma: the DOS is the
    # sum of the two scalar curves with their own eta
    C1 = np.zeros((3, 1, 1), dtype=complex)
    C1[0, 0, 0] = C1[2, 0, 0] = 0.5       # cos band
    C2 = np.zeros((3, 1, 1), dtype=complex)
    C2[0, 0, 0] = C2[2, 0, 0] = 1.0       # wider cos band
    Cb = np.zeros((3, 2, 2), dtype=complex)
    Cb[:, 0, 0] = C1[:, 0, 0]
    Cb[:, 1, 1] = C2[:, 0, 0]
    from autobzcore_tpu.fourier import FourierSeries

    hb = FourierSeries(Cb, period=1.0, offset=(-1,), ndim=1)
    h1 = FourierSeries(C1, period=1.0, offset=(-1,), ndim=1)
    h2 = FourierSeries(C2, period=1.0, offset=(-1,), ndim=1)
    bz = load_bz(FBZ(), np.eye(1))
    eta1, eta2 = 0.1, 0.3
    S = _const_sigma(np.diag([-1j * eta1, -1j * eta2]))
    om = np.linspace(-2.5, 2.5, 9)
    Db = np.asarray(SigmaDOSSolver(hb, bz, 128, S)(om))
    D1 = np.asarray(SigmaDOSSolver(h1, bz, 128, _const_sigma(-1j * eta1))(om))
    D2 = np.asarray(SigmaDOSSolver(h2, bz, 128, _const_sigma(-1j * eta2))(om))
    np.testing.assert_allclose(Db, D1 + D2, rtol=1e-10)


def test_grid_engine_matches_adaptive_and_ibz():
    # omega-dependent matrix Sigma: grid engine vs the adaptive IAI solve,
    # and FBZ vs IBZ (TrivialRep weight symmetrization)
    from autobzcore_tpu import InversionSymIBZ

    h = tb_graphene()
    w = np.linspace(-6, 6, 25)
    vals = np.empty((25, 2, 2), complex)
    for i, x in enumerate(w):
        vals[i] = np.diag([-0.05j - 0.02j * x**2, 0.1 * x - 0.08j])
    S = SigmaInterpolant(w, vals)
    om = 0.7
    bz = load_bz(FBZ(), np.eye(2))
    grid = float(np.asarray(SigmaDOSSolver(h, bz, 768, S)([om]))[0])
    fi = dos_integrand_sigma(h, S)
    adaptive = float(IntegralSolver(IntegralProblem(fi, bz),
                                    IAI(inner_cap=64), abstol=1e-6)(om=om))
    assert grid == pytest.approx(adaptive, abs=1e-5)

    # IBZ weight symmetrization: needs a model actually invariant under the
    # 2^d sign-flip group (graphene's hexagonal lattice is NOT — the
    # reference carries the same non-orthogonal-lattice caveat,
    # src/brillouin.jl:265,302), so use a square-lattice 2-band model
    from autobzcore_tpu.fourier import FourierSeries
    from autobzcore_tpu.models.tight_binding import integer_lattice

    pat = integer_lattice(2)  # cos k1 + cos k2 pattern, sign-flip even
    Cb = np.zeros((3, 3, 2, 2), dtype=complex)
    Cb[:, :, 0, 0] = 2.0 * pat
    Cb[:, :, 1, 1] = 4.0 * pat
    Cb[:, :, 0, 1] = Cb[:, :, 1, 0] = 0.6 * pat
    hsq = FourierSeries(Cb, period=1.0, offset=(-1, -1), ndim=2)
    bzf = load_bz(FBZ(), np.eye(2))
    bzi = load_bz(InversionSymIBZ(), np.eye(2))
    Df = float(np.asarray(SigmaDOSSolver(hsq, bzf, 96, S)([om]))[0])
    Di = float(np.asarray(SigmaDOSSolver(hsq, bzi, 96, S)([om]))[0])
    assert Di == pytest.approx(Df, rel=1e-10)


def test_sum_rule():
    # int A(omega) domega = m * |det B| regardless of Sigma's structure
    h = tb_graphene()
    bz = load_bz(FBZ(), np.eye(2))
    S = _const_sigma(np.diag([-0.2j, 0.3 - 0.1j]))
    om = np.linspace(-40, 40, 4001)
    D = np.asarray(SigmaDOSSolver(h, bz, 24, S)(om))
    vol = np.linalg.det(np.asarray(bz.B))
    assert np.trapezoid(D, om) == pytest.approx(2 * vol, rel=2e-2)


def test_transport_distribution_sigma_reduces_to_eta():
    # constant Sigma = -i eta I: the full-matrix-A transport kernel equals
    # the band-diagonal constant-broadening form, for 2- and 3-band models
    from autobzcore_tpu.fourier import FourierValue, JacobianSeries
    from autobzcore_tpu.models.observables import transport_distribution
    from autobzcore_tpu.models.selfenergy import transport_distribution_sigma
    from autobzcore_tpu.models.tight_binding import synthetic_wannier

    eta = 0.15
    for h in (tb_graphene(), synthetic_wannier(3, nr=3, ndim=2, seed=3)):
        js = JacobianSeries(h)
        k = np.array([0.13, 0.41])
        hv = FourierValue(k, js(k))
        ref = np.asarray(transport_distribution(hv, 0.37, eta=eta))
        got = np.asarray(transport_distribution_sigma(
            hv, 0.37, Sigma=_const_sigma(-1j * eta)))
        np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)


def test_inv_small_matches_linalg():
    from autobzcore_tpu.models.selfenergy import _inv_small

    rng = np.random.default_rng(5)
    for m in (1, 2, 3):
        M = rng.normal(size=(4, m, m)) + 1j * rng.normal(size=(4, m, m))
        np.testing.assert_allclose(np.asarray(_inv_small(jnp.asarray(M))),
                                   np.linalg.inv(M), rtol=1e-10)


def test_projected_dos_sums_to_total():
    # orbital-projected DOS: rows sum to the trace DOS; in a block-diagonal
    # model each orbital's curve is its own scalar band's DOS
    from autobzcore_tpu.fourier import FourierSeries

    C1 = np.zeros((3,), dtype=complex); C1[0] = C1[2] = 0.5
    C2 = np.zeros((3,), dtype=complex); C2[0] = C2[2] = 1.0
    Cb = np.zeros((3, 2, 2), dtype=complex)
    Cb[:, 0, 0], Cb[:, 1, 1] = C1, C2
    hb = FourierSeries(Cb, period=1.0, offset=(-1,), ndim=1)
    bz = load_bz(FBZ(), np.eye(1))
    S = _const_sigma(np.diag([-0.1j, -0.3j]))
    om = np.linspace(-2.5, 2.5, 9)
    P = np.asarray(SigmaDOSSolver(hb, bz, 128, S, project=True)(om))
    D = np.asarray(SigmaDOSSolver(hb, bz, 128, S)(om))
    assert P.shape == (9, 2)
    np.testing.assert_allclose(P.sum(axis=1), D, rtol=1e-12)
    h1 = FourierSeries(C1[:, None, None], period=1.0, offset=(-1,), ndim=1)
    D1 = np.asarray(SigmaDOSSolver(h1, bz, 128, _const_sigma(-0.1j))(om))
    np.testing.assert_allclose(P[:, 0], D1, rtol=1e-10)


def test_sigma_transport_solver_matches_eta_engine():
    # constant Sigma = -i eta: the matrix-Sigma transport grid engine equals
    # the band-diagonal GEMM TransportSolver on FBZ and IBZ
    from autobzcore_tpu import InversionSymIBZ
    from autobzcore_tpu.models.observables import TransportSolver
    from autobzcore_tpu.models.selfenergy import SigmaTransportSolver

    h = tb_graphene()
    eta = 0.12
    om = np.linspace(-3, 3, 5)
    for bz in (load_bz(FBZ(), np.eye(2)), load_bz(InversionSymIBZ(), np.eye(2))):
        ref = np.asarray(TransportSolver(h, bz, 24, eta)(om))
        got = np.asarray(SigmaTransportSolver(h, bz, 24, _const_sigma(-1j * eta))(om))
        assert got.shape == ref.shape == (5, 2, 2)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)


def test_certified_sigma_dos():
    # whole-curve certification for the self-energy DOS engine
    from autobzcore_tpu.models.selfenergy import certified_sigma_dos

    h = tb_graphene()
    bz = load_bz(FBZ(), np.eye(2))
    om = np.linspace(-1, 1, 8)
    S = _const_sigma(np.diag([-0.3j, -0.4j]))
    res = certified_sigma_dos(h, bz, om, S, abstol=1e-5, nmin=16, nmax=256)
    assert res.retcode and res.resid <= 1e-5
    ref = np.asarray(SigmaDOSSolver(h, bz, 2 * res.npts[-1], S)(om))
    assert np.abs(np.asarray(res.u) - ref).max() <= 1e-5


def test_sigma_interpolant_rejects_unsorted_grid():
    w = np.linspace(1, -1, 5)  # descending: a common file convention
    with pytest.raises(ValueError, match="ascending"):
        SigmaInterpolant(w, np.zeros((5,), complex))


def test_sigma_kinetic_matches_scalar_eta():
    # matrix-Sigma kinetic coefficients reduce exactly to the band-diagonal
    # GEMM solver at Sigma = -i eta, for the optical (alpha=0) and
    # thermoelectric (alpha=1) moments, through the same adaptive
    # frequency-integral driver
    from autobzcore_tpu import InversionSymIBZ
    from autobzcore_tpu.models.selfenergy import SigmaKineticCoefficientSolver
    from autobzcore_tpu.models.transport import KineticCoefficientSolver

    h = tb_graphene()
    bz = load_bz(InversionSymIBZ(), np.eye(2))
    eta, beta, mu = 0.1, 20.0, 0.4
    Om = [0.0, 0.5]
    for alpha in (0, 1):
        ref = KineticCoefficientSolver(h, bz, 24, eta, beta, alpha=alpha,
                                       mu=mu)(Om, abstol=1e-7)
        slv = SigmaKineticCoefficientSolver(h, bz, 24, _const_sigma(-1j * eta),
                                            beta, alpha=alpha, mu=mu)
        got = slv(Om, abstol=1e-7)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-9, atol=1e-9)
        assert slv.retcode
