"""Observable kernels: DOS traces agree across formulations, transport is
symmetric positive; plus the package-surface quality gate (the reference runs
Aqua.jl, ``test/aqua.jl``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import autobzcore_tpu as abz
from autobzcore_tpu import FBZ, IntegralProblem, PTR, load_bz, solve
from autobzcore_tpu.models import tb_integer
from autobzcore_tpu.models.observables import (
    dos_eig,
    dos_integrand,
    dos_trace,
    spectral_function,
    transport_integrand,
)
from autobzcore_tpu.fourier import FourierIntegrand, FourierValue, JacobianSeries


def test_dos_trace_vs_eig():
    s = tb_integer(2)
    x = jnp.asarray([0.13, 0.41])
    hv = FourierValue(x, s(x)[None, None] if s(x).ndim == 0 else s(x))
    a = float(dos_trace(hv, 0.5, eta=0.1))
    b = float(dos_eig(hv, 0.5, eta=0.1))
    assert a == pytest.approx(b, rel=1e-10)


def test_spectral_function_trace_matches_dos():
    s = tb_integer(2)
    x = jnp.asarray([0.13, 0.41])
    sv = s(x)
    hv = FourierValue(x, sv[None, None] if sv.ndim == 0 else sv)
    A = spectral_function(hv, 0.5, eta=0.1)
    assert float(jnp.real(jnp.trace(A))) == pytest.approx(float(dos_trace(hv, 0.5, eta=0.1)), rel=1e-10)


def test_dos_integrand_bz_solve():
    bz = load_bz(FBZ(), np.eye(2))
    fi = dos_integrand(tb_integer(2), eta=0.3)
    sol = solve(IntegralProblem(fi, bz, abz.MixedParameters(0.0)), PTR(npt=40))
    # broadened DOS at band center of the 2D integer lattice is positive and
    # finite; sanity against the dense formula
    u = np.arange(40) / 40
    kx, ky = np.meshgrid(u, u, indexing="ij")
    e = 2 * np.cos(2 * np.pi * kx) + 2 * np.cos(2 * np.pi * ky)
    ref = (2 * np.pi) ** 2 * np.mean(0.3 / (e**2 + 0.09) / np.pi)
    assert float(sol.u) == pytest.approx(ref, rel=1e-10)


def test_transport_integrand_runs():
    fi = transport_integrand(tb_integer(2), eta=0.1)
    bz = load_bz(FBZ(), np.eye(2))
    sol = solve(IntegralProblem(fi, bz, abz.MixedParameters(0.0)), PTR(npt=20))
    G = np.asarray(sol.u)
    assert G.shape == (2, 2)
    assert G[0, 0] > 0 and G[0, 0] == pytest.approx(G[1, 1], rel=1e-8)
    assert abs(G[0, 1]) < 1e-8 * G[0, 0]  # square lattice: off-diagonal vanishes


class TestPackageSurface:
    def test_all_exports_resolve(self):
        for name in abz.__all__:
            assert hasattr(abz, name), name

    def test_public_docstrings(self):
        undocumented = [
            name for name in abz.__all__
            if callable(getattr(abz, name)) and not getattr(abz, name).__doc__
        ]
        # allow a small set of self-explanatory aliases
        assert len(undocumented) <= 5, undocumented


def test_transport_sweep_matches_per_omega_solve():
    from autobzcore_tpu import InversionSymIBZ, MixedParameters
    from autobzcore_tpu.models.observables import transport_sweep
    from autobzcore_tpu import solve as _solve

    h = tb_integer(2)
    bz = load_bz(InversionSymIBZ(), np.eye(2))
    omegas = np.array([-1.0, 0.0, 1.5])
    sweep = np.asarray(transport_sweep(h, bz, 40, omegas, eta=0.3))
    assert sweep.shape == (3, 2, 2)
    from autobzcore_tpu import FBZ as _FBZ

    bz_full = load_bz(_FBZ(), np.eye(2))
    for i, om in enumerate(omegas):
        sol = _solve(IntegralProblem(transport_integrand(h, eta=0.3), bz_full, MixedParameters(float(om))), PTR(npt=40))
        assert np.allclose(sweep[i], np.asarray(sol.u), rtol=1e-8, atol=1e-10), om
    # IBZ solve with LatticeRep symmetrization agrees with the full-BZ solve
    sol_ibz = _solve(IntegralProblem(transport_integrand(h, eta=0.3), bz, MixedParameters(0.0)), PTR(npt=40))
    sol_fbz = _solve(IntegralProblem(transport_integrand(h, eta=0.3), bz_full, MixedParameters(0.0)), PTR(npt=40))
    assert np.allclose(np.asarray(sol_ibz.u), np.asarray(sol_fbz.u), rtol=1e-9, atol=1e-10)


def test_certified_transport_sweep():
    # AutoPTR-style certification extended to the transport family: the
    # rate-fitted ladder converges on a gapped (analytic) model and the
    # certified curve's true error is below tolerance
    import numpy as np

    from autobzcore_tpu import FBZ, load_bz
    from autobzcore_tpu.models.observables import (TransportSolver,
                                                   certified_transport_sweep)
    from autobzcore_tpu.models.tight_binding import tb_graphene, tb_haldane

    h = tb_haldane(t2=0.1, M=0.3)
    bz = load_bz(FBZ(), np.eye(2))
    om = np.linspace(-2, 2, 8)
    res = certified_transport_sweep(h, bz, om, eta=0.1, abstol=1e-4,
                                    nmin=16, nmax=256)
    assert res.retcode and res.resid <= 1e-4
    ref = np.asarray(TransportSolver(h, bz, 2 * res.npts[-1], 0.1)(om))
    assert np.abs(np.asarray(res.u) - ref).max() <= 1e-4
    assert all(b > a for a, b in zip(res.npts, res.npts[1:]))
    # honest failure: a Dirac cone (algebraic convergence) with a tight
    # budget must report retcode=False, not a fake certificate
    res2 = certified_transport_sweep(tb_graphene(), bz, om, eta=0.2,
                                     abstol=1e-8, nmin=16, nmax=40)
    assert not res2.retcode


def test_greens_trace_split_omega_block():
    """The SplitComplex branch of greens_function_trace broadcasts an omega
    BLOCK vector over new leading axes exactly like the complex branch does
    (regression: a bare (W,) * (m, m) product smeared the omega vector
    across matrix columns — silently wrong at W == m, a shape error
    otherwise).  Covers m <= 3 (adjugate) and m > 3 (eigenvalue) paths."""
    from autobzcore_tpu.models.observables import greens_function_trace
    from autobzcore_tpu.ops.scomplex import SplitComplex

    class FV:
        def __init__(self, s):
            self.s = s

    rng = np.random.default_rng(0)
    eta = 1e-2
    for m in (2, 3, 5):
        A = rng.normal(size=(m, m)) + 1j * rng.normal(size=(m, m))
        H = (A + A.conj().T) / 2
        for om in (0.3, np.linspace(0.1, 0.3, m), np.linspace(0.1, 0.5, m + 2)):
            gc = np.asarray(greens_function_trace(
                FV(jnp.asarray(H)), jnp.asarray(om), eta=eta))
            gs = greens_function_trace(
                FV(SplitComplex(jnp.asarray(H.real), jnp.asarray(H.imag))),
                jnp.asarray(om), eta=eta)
            gs_c = np.asarray(gs.re) + 1j * np.asarray(gs.im)
            assert gs_c.shape == gc.shape
            assert np.max(np.abs(gc - gs_c)) < 1e-10, (m, np.shape(om))
