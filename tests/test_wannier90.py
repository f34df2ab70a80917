"""Wannier90 parser conventions (reference ``ext/WannierIOExt.jl``,
``aps_example/aps_example.jl:7-21``)."""
import numpy as np
import jax.numpy as jnp

from autobzcore_tpu.io.wannier90 import hamiltonian_fourier_series, read_w90_hrdat

HR_DAT = """ written by hand
           2
           3
    1    1    1
    0    0   -1    1    1    0.000000    0.000000
    0    0   -1    2    1    0.700000    0.100000
    0    0   -1    1    2    0.000000    0.000000
    0    0   -1    2    2    0.000000    0.000000
    0    0    0    1    1    1.000000    0.000000
    0    0    0    2    1    0.000000    0.000000
    0    0    0    1    2    0.000000    0.000000
    0    0    0    2    2    2.000000    0.000000
    0    0    1    1    1    0.000000    0.000000
    0    0    1    2    1    0.000000    0.000000
    0    0    1    1    2    0.700000   -0.100000
    0    0    1    2    2    0.000000    0.000000
"""


def test_hrdat_index_convention(tmp_path):
    """Each line's (i, j) labels are the row/column of H_mn(R) = <m0|H|nR>
    directly; H(k) must come out Hermitian with the off-diagonal phase
    e^{+2 pi i k.R} attached to H_12(R=+e_z)."""
    p = tmp_path / "toy_hr.dat"
    p.write_text(HR_DAT)
    hr = read_w90_hrdat(str(p))
    assert hr["num_wann"] == 2 and hr["H"].shape == (3, 2, 2)
    # stored matrices: H(R=+e_z) has only the (1,2) element (0-indexed (0,1))
    Rplus = np.where((hr["Rvectors"] == [0, 0, 1]).all(axis=1))[0][0]
    assert hr["H"][Rplus][0, 1] == 0.7 - 0.1j
    assert hr["H"][Rplus][1, 0] == 0.0

    s = hamiltonian_fourier_series(hr, dtype=jnp.complex128)
    k = jnp.asarray([0.0, 0.0, 0.3])
    Hk = np.asarray(s(k))
    assert np.allclose(Hk, Hk.conj().T, atol=1e-12), "H(k) not Hermitian"
    expect01 = (0.7 - 0.1j) * np.exp(2j * np.pi * 0.3)
    assert np.allclose(Hk[0, 1], expect01, atol=1e-12)
    assert np.allclose(np.diag(Hk), [1.0, 2.0], atol=1e-12)
