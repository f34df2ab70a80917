"""FullGridSpectralSweep (ops/grid_sweep.py) vs a dense direct reference."""
import numpy as np
import pytest

import jax.numpy as jnp

from autobzcore_tpu.fourier import FourierSeries
from autobzcore_tpu.ops.grid_sweep import FullGridSpectralSweep


def _random_hermitian_series(seed=0, n=5, m=3):
    rng = np.random.default_rng(seed)
    C = rng.normal(size=(n, n, n, m, m)) + 1j * rng.normal(size=(n, n, n, m, m))
    C *= np.exp(-np.linalg.norm(np.mgrid[-2:3, -2:3, -2:3], axis=0))[..., None, None]
    C = (C + np.flip(C, axis=(0, 1, 2)).conj().swapaxes(-1, -2)) / 2
    return FourierSeries(C, period=1.0, offset=(-2, -2, -2), ndim=3)


def _dense_dos(series, npt, omegas, eta):
    C = np.asarray(series.c)
    n = C.shape[0]
    freqs = [series.offset[j] + np.arange(n) for j in range(3)]
    u = np.arange(npt) / npt
    ph = [np.exp(2j * np.pi * np.outer(u, f)) for f in freqs]
    hk = np.einsum("ka,lb,mc,abcij->klmij", ph[0], ph[1], ph[2], C, optimize=True)
    e = np.linalg.eigvalsh(hk.reshape(-1, 3, 3))
    t = omegas[:, None, None] - e[None]
    return np.sum(eta / (t * t + eta * eta), axis=(1, 2)) / np.pi


@pytest.mark.parametrize("npt", [8, 12])  # 12 exercises slab padding (slab=8)
def test_matches_dense(npt):
    s = _random_hermitian_series()
    omegas = np.linspace(-6.0, 6.0, 40)
    eta = 0.1
    sweep = FullGridSpectralSweep(s, omegas, eta, slab=8, slabs_per_dispatch=1,
                                  omega_batch=20)
    got = sweep.rung(npt)
    ref = _dense_dos(s, npt, omegas, eta)
    assert np.max(np.abs(got - ref)) < 1e-6 * npt**3  # f32 Lorentzian tier
    # the two-float Lorentzian keeps relative accuracy ~1e-7
    assert np.max(np.abs(got - ref) / np.abs(ref)) < 3e-6


def test_eigvalsh3_rows_matches_complex():
    from autobzcore_tpu.ops.eigh3 import eigvalsh3, eigvalsh3_rows

    rng = np.random.default_rng(7)
    A = rng.normal(size=(257, 3, 3)) + 1j * rng.normal(size=(257, 3, 3))
    H = (A + np.conj(np.swapaxes(A, -1, -2))) / 2
    ref = np.asarray(eigvalsh3(jnp.asarray(H)))
    lo, mid, hi = eigvalsh3_rows(
        jnp.asarray(H[..., 0, 0].real), jnp.asarray(H[..., 1, 1].real),
        jnp.asarray(H[..., 2, 2].real),
        jnp.asarray(H[..., 0, 1].real), jnp.asarray(H[..., 0, 1].imag),
        jnp.asarray(H[..., 0, 2].real), jnp.asarray(H[..., 0, 2].imag),
        jnp.asarray(H[..., 1, 2].real), jnp.asarray(H[..., 1, 2].imag),
    )
    got = np.stack([np.asarray(lo), np.asarray(mid), np.asarray(hi)], axis=-1)
    assert np.max(np.abs(got - ref)) < 1e-12


def test_rung_sharded_matches_serial():
    """8-device k-shard of the slab loop reproduces the single-device rung."""
    import jax
    from jax.sharding import Mesh

    s = _random_hermitian_series(seed=3)
    omegas = np.linspace(-5.0, 5.0, 20)
    sweep = FullGridSpectralSweep(s, omegas, 0.15, slab=4, omega_batch=10)
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("k",))
    npt = 12  # nrows pads 12 -> 4*8 = 32: exercises both padding and sharding
    got = sweep.rung_sharded(npt, mesh)
    ref = sweep.rung(npt)
    assert np.max(np.abs(got - ref)) < 1e-10 * npt**3


def test_rejects_non_3band():
    rng = np.random.default_rng(1)
    C = rng.normal(size=(3, 3, 3, 2, 2)) * (1 + 0j)
    C = (C + np.flip(C, axis=(0, 1, 2)).conj().swapaxes(-1, -2)) / 2
    s = FourierSeries(C, period=1.0, offset=(-1, -1, -1), ndim=3)
    with pytest.raises(ValueError):
        FullGridSpectralSweep(s, np.linspace(0, 1, 4), 0.1)
