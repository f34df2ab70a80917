"""Rayleigh-refined f64 eigenvalues (ops/rayleigh.py)."""
import numpy as np

import jax.numpy as jnp

from autobzcore_tpu.ops.rayleigh import eigvalsh_rayleigh


def _herm(rng, n, m, scale=1.0):
    A = rng.normal(size=(n, m, m)) + 1j * rng.normal(size=(n, m, m))
    return scale * (A + np.conj(np.swapaxes(A, -1, -2))) / 2


def test_separated_spectra_f64_accuracy():
    rng = np.random.default_rng(0)
    H = _herm(rng, 64, 8, scale=5.0)
    ref = np.linalg.eigvalsh(H)
    got = np.asarray(eigvalsh_rayleigh(jnp.asarray(H.real), jnp.asarray(H.imag)))
    got = np.sort(got, axis=-1)
    # second-order refinement: far below the 1e-6 a plain c64 eigh gives
    assert np.max(np.abs(got - ref)) < 1e-10 * np.max(np.abs(ref))


def test_thirty_band():
    rng = np.random.default_rng(1)
    H = _herm(rng, 16, 30, scale=3.0)
    ref = np.linalg.eigvalsh(H)
    got = np.sort(np.asarray(
        eigvalsh_rayleigh(jnp.asarray(H.real), jnp.asarray(H.imag))), axis=-1)
    assert np.max(np.abs(got - ref)) < 1e-10 * np.max(np.abs(ref))


def test_near_degenerate_cluster_stays_in_span():
    """A 1e-9-split pair: refined values must stay within the cluster spread
    (the quotient of any in-cluster vector lies between the eigenvalues)."""
    rng = np.random.default_rng(2)
    m = 6
    e = np.array([-2.0, -1.0, 0.5, 0.5 + 1e-9, 2.0, 3.0])
    Q = np.linalg.qr(rng.normal(size=(m, m)) + 1j * rng.normal(size=(m, m)))[0]
    H = (Q * e) @ np.conj(Q.T)
    H = (H + np.conj(H.T)) / 2
    got = np.sort(np.asarray(eigvalsh_rayleigh(
        jnp.asarray(H.real[None]), jnp.asarray(H.imag[None])))[0])
    ref = np.linalg.eigvalsh(H)
    # isolated bands to 1e-11; cluster members within the cluster span (pad
    # by the second-order refinement floor)
    for j in (0, 1, 4, 5):
        assert abs(got[j] - ref[j]) < 1e-11
    for j in (2, 3):
        assert ref[2] - 1e-11 <= got[j] <= ref[3] + 1e-11
