"""Lindhard susceptibility anchors."""
import numpy as np
import pytest

from autobzcore_tpu.brillouin import FBZ, InversionSymIBZ, load_bz
from autobzcore_tpu.models.lindhard import LindhardSolver
from autobzcore_tpu.models.tight_binding import tb_haldane, tb_integer
from autobzcore_tpu.models.transport import fermi


def test_static_long_wavelength_compressibility():
    # Re chi0(q->0, 0) -> -beta |det B| <f(1-f)> (thermal compressibility)
    bz = load_bz(FBZ(), np.eye(2))
    beta, mu, npt = 20.0, 0.5, 96
    slv = LindhardSolver(tb_integer(2), bz, npt, beta, mu=mu, eta=1e-3)
    chi = complex(np.asarray(slv([1 / npt, 0.0], [0.0]))[0])
    e = np.asarray(slv._e)
    f = np.asarray(fermi(beta * (e - mu)))
    ref = -beta * slv._vol * np.mean(f * (1 - f))
    assert chi.real == pytest.approx(ref, rel=2e-2)
    assert abs(chi.imag) < 1e-10


def test_inversion_symmetry():
    bz = load_bz(FBZ(), np.eye(2))
    slv = LindhardSolver(tb_integer(2), bz, 64, beta=20.0, mu=0.5, eta=1e-3)
    c1 = complex(np.asarray(slv([0.25, 0.125], [0.7]))[0])
    c2 = complex(np.asarray(slv([-0.25, -0.125], [0.7]))[0])
    assert c1 == pytest.approx(c2, rel=1e-10)


def test_particle_hole_continuum_onset():
    # gapped 2-band insulator: Im chi0 is O(eta) below the direct gap AT
    # THAT q and jumps by orders of magnitude inside the continuum; the
    # retarded response has Im <= 0 for omega > 0
    bz = load_bz(FBZ(), np.eye(2))
    slv = LindhardSolver(tb_haldane(t2=0.1, M=0.3), bz, 96, beta=500.0,
                         mu=0.0, eta=1e-3)
    om = [0.3, 2.0]
    c = np.asarray(slv([0.25, 0.0], om))
    assert abs(c[0].imag) < 5e-3        # below onset: Lorentzian tail only
    assert abs(c[1].imag) > 10.0        # inside the continuum
    assert np.all(c.imag <= 1e-12)


def test_requires_full_zone():
    bz = load_bz(InversionSymIBZ(), np.eye(2))
    with pytest.raises(ValueError, match="full-zone"):
        LindhardSolver(tb_integer(2), bz, 16, beta=10.0)


def test_q_dimension_validated():
    bz = load_bz(FBZ(), np.eye(2))
    slv = LindhardSolver(tb_integer(2), bz, 16, beta=10.0)
    with pytest.raises(ValueError, match="components"):
        slv([0.25, 0.0, 0.1], [0.0])


def test_cooper_bubble_logarithm():
    # the Cooper instability: chi_pp(0) grows by vol * N(mu) * ln 2 per
    # temperature halving, with N(mu) from an independent GGR DOS
    from autobzcore_tpu.dos import DOSProblem, GGR
    from autobzcore_tpu.dos import init as dos_init
    from autobzcore_tpu.dos import solve_ as dos_solve_
    from autobzcore_tpu.models.lindhard import cooper_bubble

    bz = load_bz(FBZ(), np.eye(2))
    mu = 0.5
    chi = {b: cooper_bubble(LindhardSolver(tb_integer(2), bz, 384, b, mu=mu))
           for b in (50.0, 100.0)}
    cache = dos_init(DOSProblem(tb_integer(2), mu, bz), GGR(npt=400))
    D = float(np.asarray(dos_solve_(cache).u))
    vol = np.linalg.det(np.asarray(bz.B))
    expected = vol * D * np.log(2)
    assert chi[100.0] - chi[50.0] == pytest.approx(expected, rel=2e-2)
    # TRS: the q=0 bubble is where the log lives; a finite q cuts it off
    chi_q = cooper_bubble(LindhardSolver(tb_integer(2), bz, 384, 100.0, mu=mu),
                          q=[0.25, 0.0])
    assert chi_q < chi[100.0]


def test_certified_chi0_converges_and_bounds_error():
    """certified_chi0 certifies the whole chi0(q, omega) curve against the
    k-grid; every rung is a multiple of q's denominator (exact snap) and the
    certificate bounds the distance to a much finer grid."""
    import jax.numpy as jnp
    from autobzcore_tpu.models.lindhard import LindhardSolver, certified_chi0

    h = tb_integer(2)
    bz = load_bz(FBZ(), 2 * np.pi * np.eye(2))
    q = [0.25, 0.0]
    oms = jnp.linspace(0.0, 2.0, 9)
    res = certified_chi0(h, bz, q, oms, beta=8.0, eta=0.2, abstol=5e-4,
                         nmin=16, nmax=256)
    assert res.retcode
    assert all(n % 4 == 0 for n in res.npts)  # exact q-snap at every rung
    ref = LindhardSolver(h, bz, 512, beta=8.0, eta=0.2)(q, oms)
    true_err = float(np.max(np.abs(np.asarray(res.u) - ref)))
    assert true_err <= max(res.resid * 3, 5e-4)


def test_certified_chi0_truncation():
    from autobzcore_tpu.models.lindhard import certified_chi0
    import jax.numpy as jnp

    h = tb_integer(2)
    bz = load_bz(FBZ(), 2 * np.pi * np.eye(2))
    res = certified_chi0(h, bz, [0.5, 0.0], jnp.asarray([0.5]), beta=50.0,
                         eta=1e-3, abstol=1e-12, nmin=8, nmax=24)
    assert not res.retcode
