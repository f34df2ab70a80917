"""Linear tetrahedron method + adaptive Gaussian broadening — the two DOS
algorithms the reference names as wished-for future work
(``docs/src/dos.md:14-16``), validated against the same analytic suite as
GGR and against GGR itself."""
import numpy as np
import pytest

from autobzcore_tpu import FBZ, CubicSymIBZ, DOSProblem, GGR, InversionSymIBZ, load_bz
from autobzcore_tpu.dos import LTM, AdaptiveGaussianBroadening
from autobzcore_tpu.dos import init as dos_init, solve_ as dos_solve_
from autobzcore_tpu.models import tb_graphene, tb_integer

from test_dos import (
    dos_integer_1d_exact,
    dos_integer_2d_exact,
    dos_integer_3d_exact,
    dos_graphene_exact,
)

CASES = [
    ("int1d", 1, dos_integer_1d_exact, 2, FBZ(), 400),
    ("int2d", 2, dos_integer_2d_exact, 4, FBZ(), 150),
    ("int3d", 3, dos_integer_3d_exact, 6, FBZ(), 60),
    ("int2d", 2, dos_integer_2d_exact, 4, InversionSymIBZ(), 150),
    ("int3d", 3, dos_integer_3d_exact, 6, CubicSymIBZ(), 60),
    ("graphene", 2, dos_graphene_exact, 4, FBZ(), 150),
]

# energies avoiding van Hove points, where the exact DOS has log/step
# structure linear interpolation smears at finite npt
SAMPLE = (-0.85, -0.55, -0.3, 0.2, 0.45, 0.75)


@pytest.mark.parametrize("name,ndim,exact,bandwidth,bzkind,npt", CASES)
def test_ltm_vs_exact(name, ndim, exact, bandwidth, bzkind, npt):
    model = tb_graphene() if name == "graphene" else tb_integer(ndim)
    bz = load_bz(bzkind, np.eye(ndim))
    cache = dos_init(DOSProblem(model, 0.0, bz), LTM(npt=npt))
    for frac in SAMPLE:
        e = frac * bandwidth
        cache.domain = e
        got = float(dos_solve_(cache).u)
        assert got == pytest.approx(exact(e), abs=2e-2), f"E={e}"
    # outside the band: exactly zero (no broadening tails)
    cache.domain = bandwidth + 1.0
    assert float(dos_solve_(cache).u) == 0.0


def test_ltm_symmetry_scatter_exact():
    """Symmetry-reduced eigensolve + orbit scatter reproduces the full-grid
    corner energies exactly (same tetrahedra, same values)."""
    model = tb_integer(3)
    vals = []
    for kind in (FBZ(), CubicSymIBZ()):
        bz = load_bz(kind, np.eye(3))
        cache = dos_init(DOSProblem(model, 0.8, bz), LTM(npt=24))
        vals.append(float(dos_solve_(cache).u))
    assert vals[0] == pytest.approx(vals[1], rel=1e-12)


def test_ltm_band_normalization():
    """Each band carries unit fractional weight: integral of D(E) dE = nbands."""
    model = tb_graphene()  # 2 bands
    bz = load_bz(FBZ(), np.eye(2))
    alg = LTM(npt=60)
    cache = dos_init(DOSProblem(model, 0.0, bz), alg)
    dos_solve_(cache)
    Es = np.linspace(-4.0, 4.0, 3001)
    D = np.asarray(alg.dos_sweep(cache.cacheval, Es))
    assert np.trapezoid(D, Es) == pytest.approx(2.0, abs=2e-2)


def test_ltm_sweep_matches_pointwise():
    model = tb_integer(2)
    bz = load_bz(InversionSymIBZ(), np.eye(2))
    alg = LTM(npt=80)
    cache = dos_init(DOSProblem(model, 0.0, bz), alg)
    dos_solve_(cache)
    Es = np.linspace(-4.5, 4.5, 61)
    sweep = np.asarray(alg.dos_sweep(cache.cacheval, Es))
    for i in (5, 30, 55):
        cache.domain = Es[i]
        assert float(dos_solve_(cache).u) == pytest.approx(sweep[i], rel=1e-12)


def test_ltm_nos_and_fermi_level():
    """N(E) is the closed-form integral of D(E); half filling of a
    particle-hole-symmetric band pins E_F at the band center."""
    model = tb_integer(2)  # band [-4, 4], symmetric
    bz = load_bz(FBZ(), np.eye(2))
    alg = LTM(npt=100)
    cache = dos_init(DOSProblem(model, 0.0, bz), alg)
    dos_solve_(cache)
    Es = np.linspace(-5.0, 5.0, 501)
    N = np.asarray(alg.nos_sweep(cache.cacheval, Es))
    assert N[0] == 0.0 and N[-1] == pytest.approx(1.0, abs=1e-12)
    assert np.all(np.diff(N) >= -1e-12)  # monotone
    # dN/dE ~ D away from van Hove structure
    D = np.asarray(alg.dos_sweep(cache.cacheval, Es))
    dN = np.gradient(N, Es)
    mask = (np.abs(Es) > 0.5) & (np.abs(Es) < 3.5)
    assert np.allclose(dN[mask], D[mask], atol=5e-2)
    ef = alg.fermi_level(cache.cacheval, 0.5)
    assert ef == pytest.approx(0.0, abs=1e-3)
    assert alg.fermi_level(cache.cacheval, 0.95) > 2.0


@pytest.mark.parametrize("ndim,exact,bandwidth,npt", [
    (1, dos_integer_1d_exact, 2, 400),
    (2, dos_integer_2d_exact, 4, 150),
])
def test_agb_vs_exact(ndim, exact, bandwidth, npt):
    model = tb_integer(ndim)
    bz = load_bz(FBZ(), np.eye(ndim))
    cache = dos_init(DOSProblem(model, 0.0, bz), AdaptiveGaussianBroadening(npt=npt))
    for frac in SAMPLE:
        e = frac * bandwidth
        cache.domain = e
        assert float(dos_solve_(cache).u) == pytest.approx(exact(e), abs=2e-2), f"E={e}"


def test_agb_matches_ggr_moderate():
    """AGB and GGR agree away from critical points (independent broadening
    models of the same spectral grid)."""
    model = tb_integer(2)
    bz = load_bz(CubicSymIBZ(), np.eye(2))
    ca = dos_init(DOSProblem(model, 0.0, bz), AdaptiveGaussianBroadening(npt=200))
    cg = dos_init(DOSProblem(model, 0.0, bz), GGR(npt=200))
    for E in (0.8, 2.0, 3.1):
        ca.domain = E
        cg.domain = E
        assert float(dos_solve_(ca).u) == pytest.approx(float(dos_solve_(cg).u), abs=5e-3)
