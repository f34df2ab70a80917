"""Ozaki bf16-slice f64 matmul (ops/ozaki.py): accuracy vs native f64.

The scheme must be indistinguishable from hardware f64 for the BZ workloads:
errors are bounded relative to rowmax(A)*colmax(B), so assertions normalize
by that scale.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from autobzcore_tpu.ops.ozaki import ozaki_matmul, ozaki_tensordot


def _err(A, B, ndiag=6):
    ref = np.asarray(A, np.float64) @ np.asarray(B, np.float64)
    got = np.asarray(ozaki_matmul(jnp.asarray(A), jnp.asarray(B), ndiag=ndiag))
    scale = (
        np.max(np.abs(A), axis=1, keepdims=True)
        * np.max(np.abs(B), axis=0, keepdims=True)
        * A.shape[1]
    )
    return np.max(np.abs(got - ref) / np.maximum(scale, 1e-300))


def test_random_matmul_accuracy():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(100, 11))
    B = rng.normal(size=(11, 900))
    assert _err(A, B) < 1e-13


def test_decaying_coefficients():
    """Exponential dynamic range along the contracted axis (Fourier
    coefficients decay like exp(-|R|))."""
    rng = np.random.default_rng(1)
    A = np.cos(rng.uniform(0, 7, size=(64, 13)))
    B = rng.normal(size=(13, 200)) * np.exp(-np.arange(13))[:, None]
    assert _err(A, B) < 1e-13


def test_more_diagonals_tightens():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(32, 17))
    B = rng.normal(size=(17, 64))
    assert _err(A, B, ndiag=7) < 1e-15


def test_deep_contraction_fallback():
    """43 <= n <= 255: in-dot diagonal fusion would overflow exact f32
    accumulation, so the per-pair f64-accumulation branch must engage."""
    rng = np.random.default_rng(6)
    A = rng.normal(size=(24, 100))
    B = rng.normal(size=(100, 48))
    assert _err(A, B) < 1e-13


def test_chunked_large_n():
    """n > 255 splits the contraction to keep f32 accumulation exact."""
    rng = np.random.default_rng(3)
    A = rng.normal(size=(16, 300))
    B = rng.normal(size=(300, 24))
    assert _err(A, B) < 1e-13


def test_extreme_magnitudes_full_f64_range():
    """Row/col maxima beyond the f32 range (overflow ~3.4e38 and the
    subnormal floor ~1e-38) must still produce exact power-of-two scales
    (ADVICE r2: the f32-frexp exponent extraction silently returned
    inf/garbage above f32 max)."""
    rng = np.random.default_rng(8)
    for mag in (1e60, 1e300, 1e-60, 1e-300):
        A = rng.normal(size=(8, 11)) * mag
        B = rng.normal(size=(11, 16))
        assert _err(A, B) < 1e-13, mag


def test_pairs_path_matches_sliced():
    """The per-pair deep-contraction path agrees with the diag-concat fast
    path where both are exact (n <= 42)."""
    from autobzcore_tpu.ops.ozaki import (
        ozaki_matmul_pairs,
        ozaki_matmul_sliced,
        ozaki_prepare_lhs,
        ozaki_prepare_lhs_pairs,
        ozaki_prepare_rhs,
    )

    rng = np.random.default_rng(9)
    A = rng.normal(size=(12, 30))
    B = rng.normal(size=(30, 20))
    b, sB = ozaki_prepare_rhs(jnp.asarray(B))
    cats, sA1 = ozaki_prepare_lhs(jnp.asarray(A))
    sl, sA2 = ozaki_prepare_lhs_pairs(jnp.asarray(A))
    fast = np.asarray(ozaki_matmul_sliced(cats, sA1, b, sB, 30))
    pairs = np.asarray(ozaki_matmul_pairs(sl, sA2, b, sB, 30))
    assert np.max(np.abs(fast - pairs)) < 1e-13 * np.abs(fast).max()


def test_zero_rows_cols():
    A = np.zeros((4, 5))
    A[0] = 1.0
    B = np.zeros((5, 3))
    B[:, 1] = 2.0
    got = np.asarray(ozaki_matmul(jnp.asarray(A), jnp.asarray(B)))
    assert np.allclose(got, A @ B, atol=1e-15)


def test_tensordot_layout():
    rng = np.random.default_rng(4)
    C = rng.normal(size=(9, 6))
    V = rng.normal(size=(3, 6, 4, 5))
    ref = np.tensordot(C, V, axes=([1], [1]))
    got = np.asarray(ozaki_tensordot(jnp.asarray(C), jnp.asarray(V), 1))
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 1e-12


def test_contract_split_route_matches_emul(monkeypatch):
    """contract_split under AUTOBZ_SPLIT_MM=ozaki equals the emulated-f64
    route to 1e-12 on a real Fourier evaluation."""
    from autobzcore_tpu.fourier import FourierSeries
    from autobzcore_tpu.ops.csplit_eval import evaluate_grid_split

    rng = np.random.default_rng(5)
    C = rng.normal(size=(5, 5, 3, 3)) + 1j * rng.normal(size=(5, 5, 3, 3))
    C = (C + np.flip(C, axis=(0, 1)).conj().swapaxes(-1, -2)) / 2
    s = FourierSeries(C, period=1.0, offset=(-2, -2), ndim=2)
    u = [np.linspace(0, 1, 17, endpoint=False)] * 2

    outs = {}
    for mode in ("emul", "ozaki"):
        monkeypatch.setenv("AUTOBZ_SPLIT_MM", mode)
        hr, hi = evaluate_grid_split(
            jnp.asarray(C.real), jnp.asarray(C.imag), 2, u, s.offset, s.period
        )
        outs[mode] = (np.asarray(hr), np.asarray(hi))
    for a, b in zip(outs["emul"], outs["ozaki"]):
        assert np.max(np.abs(a - b)) < 1e-12
