"""Analytic small-Hermitian eigenvalue kernels vs LAPACK."""
import jax.numpy as jnp
import numpy as np

from autobzcore_tpu.ops.eigh3 import eigvalsh2, eigvalsh3, eigvalsh3_split, eigvalsh_small


def _rand_herm(n, m, seed=0):
    rng = np.random.default_rng(seed)
    H = rng.normal(size=(n, m, m)) + 1j * rng.normal(size=(n, m, m))
    return (H + H.conj().swapaxes(1, 2)) / 2


def test_eigvalsh3():
    H = _rand_herm(500, 3)
    assert np.allclose(np.asarray(eigvalsh3(jnp.asarray(H))), np.linalg.eigvalsh(H), atol=1e-12)


def test_eigvalsh3_split():
    H = _rand_herm(200, 3, seed=1)
    got = eigvalsh3_split(jnp.asarray(H.real), jnp.asarray(H.imag))
    assert np.allclose(np.asarray(got), np.linalg.eigvalsh(H), atol=1e-12)


def test_eigvalsh2_and_dispatch():
    H = _rand_herm(200, 2, seed=2)
    assert np.allclose(np.asarray(eigvalsh2(jnp.asarray(H))), np.linalg.eigvalsh(H), atol=1e-12)
    H4 = _rand_herm(50, 4, seed=3)
    assert np.allclose(np.asarray(eigvalsh_small(jnp.asarray(H4))), np.linalg.eigvalsh(H4), atol=1e-10)


def test_degenerate_and_diagonal():
    D = np.stack([np.diag([1.0, 1.0, 2.0]), np.eye(3), np.diag([3.0, 1.0, 2.0])]).astype(complex)
    assert np.allclose(np.asarray(eigvalsh3(jnp.asarray(D))), np.linalg.eigvalsh(D), atol=1e-7)
