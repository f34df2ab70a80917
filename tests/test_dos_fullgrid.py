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
    alg = LorentzianFullGrid(eta, nmin=8, nmax=64, slab=4, omega_batch=1)
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

    C = np.zeros((3, 3, 3, 2, 2), complex)
    s2 = FourierSeries(C, period=1.0, offset=(-1, -1, -1), ndim=3)
    with pytest.raises(ValueError):
        LorentzianFullGrid(0.1).init_cacheval(s2, 0.0, bz)
