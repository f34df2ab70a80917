"""k-path band structure / spectral function tests."""
import numpy as np

from autobzcore_tpu.models.kpath import KPath, band_structure, kpath, spectral_path
from autobzcore_tpu.models.tight_binding import tb_graphene, tb_integer


def test_kpath_geometry():
    # G -> X -> M in a square zone
    V = [[0, 0], [0.5, 0], [0.5, 0.5]]
    p = kpath(V, npts=10)
    assert isinstance(p, KPath)
    # endpoints hit the vertices exactly
    np.testing.assert_allclose(p.X[p.ticks], V)
    # arclength is monotone and ends at the polyline length
    assert np.all(np.diff(p.s) > 0)
    np.testing.assert_allclose(p.s[-1], 1.0, atol=1e-12)
    # Cartesian scaling doubles with B = 2I
    p2 = kpath(V, npts=10, B=2 * np.eye(2))
    np.testing.assert_allclose(p2.s[-1], 2.0, atol=1e-12)


def test_band_structure_matches_pointwise():
    h = tb_graphene()
    p = kpath([[0, 0], [0.5, 0.5]], npts=8)
    e = np.asarray(band_structure(h, p))
    assert e.shape == (len(p.X), 2)
    # spot-check against a direct pointwise eigendecomposition
    k = np.asarray(p.X[3])
    hk = np.asarray(h(k))
    np.testing.assert_allclose(e[3], np.linalg.eigvalsh(hk), atol=1e-12)


def test_graphene_dirac_point():
    # for this parametrization (reference test/dos.jl:8-14 hopping offsets)
    # H_AB ~ e^{2pi i(u1+u2)} + e^{2pi i(u1-2u2)} + e^{2pi i(-2u1+u2)},
    # which vanishes at (1/9, 2/9): bands touch there, gapped at Gamma
    h = tb_graphene()
    e = np.asarray(band_structure(h, np.array([[1 / 9, 2 / 9], [0.0, 0.0]])))
    assert abs(e[0, 1] - e[0, 0]) < 1e-10
    assert e[1, 1] - e[1, 0] > 1.0


def test_spectral_sum_rule():
    h = tb_integer(2)
    p = kpath([[0, 0], [0.5, 0.0]], npts=4)
    om = np.linspace(-40, 40, 4001)
    A = np.asarray(spectral_path(h, p, om, eta=0.05))
    assert A.shape == (len(p.X), len(om))
    # int A domega = number of bands (here 1), Lorentzian tails truncated
    integral = np.trapezoid(A, om, axis=1)
    np.testing.assert_allclose(integral, 1.0, atol=1e-2)


def test_expectation_path_spin_texture():
    # Sz-conserving Kane-Mele: every band has a definite spin +-1/2; with
    # Rashba the texture deviates from the poles
    from autobzcore_tpu.models.kpath import expectation_path
    from autobzcore_tpu.models.tight_binding import tb_kane_mele

    Sz = np.diag([0.5, 0.5, -0.5, -0.5])
    X = np.array([[0.13, 0.41], [0.3, 0.1], [0.45, 0.27]])
    s_cons = np.asarray(expectation_path(tb_kane_mele(lam_so=0.08), X, Sz))
    np.testing.assert_allclose(np.abs(s_cons), 0.5, atol=1e-12)
    # identity operator: expectation 1 for every band (normalization)
    ones = np.asarray(expectation_path(tb_kane_mele(lam_so=0.08), X, np.eye(4)))
    np.testing.assert_allclose(ones, 1.0, atol=1e-12)
    s_rash = np.asarray(expectation_path(
        tb_kane_mele(lam_so=0.08, lam_r=0.08), X, Sz))
    assert np.abs(np.abs(s_rash) - 0.5).max() > 1e-3
