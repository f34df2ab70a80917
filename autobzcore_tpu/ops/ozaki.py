"""Ozaki-scheme f64 matrix products on the TPU MXU.

XLA's x64 rewriter emulates f64 dot-generals off the MXU: measured 6 GFLOP/s
on v5e for the split-complex Fourier contraction — 100x below the systolic
array.  This module recovers near-f64 matmul accuracy at MXU speed with the
error-free-splitting scheme of Ozaki et al. (accurate matrix multiplication
by low-precision blocked products; the same recipe public TPU/GPU "emulated
FP64 GEMM" kernels use):

1. scale each row of ``A`` (column of ``B``) by a power of two so entries lie
   in (-1, 1] relative to the row/column max over the CONTRACTED axis;
2. peel the scaled mantissas into ``t = 8``-bit integer slices, each exactly
   representable in bfloat16 (integers up to 256);
3. multiply slice pairs on the MXU with f32 accumulation — products are
   integers < 2^16, so sums stay exact while the contraction depth is below
   2^8 terms;
4. recombine in f64 by total shift ``p + q`` (one power-of-256 per diagonal)
   and restore the row/column scales.

**Diagonal concatenation**: all pairs with ``p + q = d`` are fused into ONE
dot — ``[a_d | a_{d-1} | ... | a_0] @ [b_0; b_1; ...; b_d]`` — which cuts
the f32 partial-product output traffic from ``ndiag (ndiag+1)/2`` buffers to
``ndiag`` and deepens the MXU contraction.  Storing B's slices stacked as a
``(ndiag * n, M)`` array makes every diagonal's right operand a zero-copy
row-prefix view; only the tiny A slices are concatenated per diagonal.
In-dot f32 accumulation stays exact while ``n * ndiag * 2^16 < 2^24``
(n <= 42 at ndiag=6); larger contractions fall back to per-pair products
with f64 accumulation.

With ``ndiag`` slices per operand the dominant error is the operand-mantissa
truncation ``~0.5 * 256^-ndiag`` relative to the row/column max: ndiag=5 ->
~7e-13, ndiag=6 (default) -> ~3e-15, ndiag=7 -> f64 roundoff (validated
against host f64 in tests/test_ozaki.py).

Used by ``ops/csplit_eval.py`` (split-complex Fourier contraction) and
``ops/grid_sweep.py`` (north-star f64 ladder).  Reference has no analogue —
its f64 is Julia-native (`/root/reference/src/fourier.jl` evaluates series
in hardware f64); this is the TPU-native route to the same precision tier.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_T = 8  # bits per slice
_RADIX = float(1 << _T)  # 256.0
_DEFAULT_DIAGS = 6  # ~1e-14 below row/col max


def _pow2_scale(x, axis):
    """Power-of-two scale >= max|x| along ``axis`` (keepdims), 1.0 where the
    slice is all-zero.  Powers of two make the descale exact.

    The exponent is extracted in f32 (TPU's x64 rewriter cannot bitcast f64
    to s64, so f64 ``frexp`` fails to compile).  The full f64 range —
    including magnitudes above f32 max (~3.4e38) and below the f32 subnormal
    floor (~1e-38), where a single f32 round-trip silently returns inf/0 —
    is handled by first walking ``amax`` into [2^-100, 2^100] with exact
    power-of-two multiplies (5 static steps cover 2^-1074..2^1024) and
    folding the walked factor back into the scale."""
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    a = amax
    fold = jnp.ones_like(amax)
    big_step, small_step = 2.0 ** -200, 2.0 ** 200
    for _ in range(5):
        big = a > 2.0 ** 100
        a = jnp.where(big, a * big_step, a)
        fold = jnp.where(big, fold * small_step, fold)
        small = (a > 0) & (a < 2.0 ** -100)
        a = jnp.where(small, a * small_step, a)
        fold = jnp.where(small, fold * big_step, fold)
    am32 = (a * (1.0 + 1e-6)).astype(jnp.float32)
    # frexp: am32 = m * 2^e with m in [0.5, 1) -> 2^e >= am32 >= a
    _, e = jnp.frexp(am32)
    scale = jnp.ldexp(jnp.ones_like(am32), e).astype(x.dtype) * fold
    # amax > 2^1023 would need scale = 2^1024 = inf; cap at 2^1023 (entries
    # then reach (-2, 2] and the first slice loses its last bit — graceful,
    # and such operands overflow any f64 product anyway)
    scale = jnp.minimum(scale, 2.0 ** 1023)
    return jnp.where(am32 > 0, scale, jnp.ones_like(scale))


def _slices(x, nslice):
    """Peel ``nslice`` t-bit integer slices from ``x`` in (-1, 1]:
    ``x = sum_p s_p * 256^-(p+1)`` with each ``s_p`` an integer in
    [-256, 256] (bf16-exact).  Returns a list of bf16 arrays."""
    out = []
    cur = x
    for _ in range(nslice):
        s = jnp.round(cur * _RADIX)
        out.append(s.astype(jnp.bfloat16))
        cur = cur * _RADIX - s  # residual in [-0.5, 0.5]
    return out


def ozaki_prepare_rhs(B, ndiag=_DEFAULT_DIAGS):
    """Pre-slice the right operand: returns ``(b_stacked, sB)`` with the
    slices stacked along the contraction axis — ``b_stacked[(q*n):(q+1)*n]``
    is slice ``q`` — so each diagonal's operand is a zero-copy row prefix.
    Reusable across many :func:`ozaki_matmul_prepared` calls (e.g. a fixed
    Fourier intermediate contracted against many phase slabs)."""
    B = jnp.asarray(B, jnp.float64)
    sB = _pow2_scale(B, 0)  # (1, M)
    return jnp.concatenate(_slices(B / sB, ndiag), axis=0), sB


def ozaki_prepare_lhs(A, ndiag=_DEFAULT_DIAGS):
    """Pre-slice the left operand: returns ``(a_cats, sA)`` where
    ``a_cats[d] = [a_d | a_{d-1} | ... | a_0]`` pairs against the stacked
    right prefix ``b[:(d+1) * n]``."""
    A = jnp.asarray(A, jnp.float64)
    sA = _pow2_scale(A, 1)  # (K, 1)
    a_sl = _slices(A / sA, ndiag)
    a_cats = tuple(
        jnp.concatenate([a_sl[d - q] for q in range(d + 1)], axis=1)
        for d in range(ndiag)
    )
    return a_cats, sA


def ozaki_sliced_safe_n(ndiag=_DEFAULT_DIAGS):
    """Largest contraction depth ``n`` for which the diagonal-concatenated
    f32 dots of :func:`ozaki_matmul_sliced` accumulate exactly
    (``n * ndiag * 2^16 < 2^24``): 42 at the default ndiag=6."""
    return ((1 << 24) - 1) // (ndiag << (2 * _T))


def ozaki_prepare_lhs_pairs(A, ndiag=_DEFAULT_DIAGS):
    """Pre-slice the left operand for the per-pair deep-contraction path
    (:func:`ozaki_matmul_pairs`): returns ``(a_slices, sA)`` with the raw
    (unconcatenated) slices.  Use when ``n > ozaki_sliced_safe_n(ndiag)``."""
    A = jnp.asarray(A, jnp.float64)
    sA = _pow2_scale(A, 1)
    return tuple(_slices(A / sA, ndiag)), sA


def ozaki_matmul_pairs(a_slices, sA, b_stacked, sB, n):
    """Matmul from per-pair slices: each f32 dot covers one (p, q) slice pair
    over a contraction chunk of <= 255 terms (products are integers < 2^16,
    so 255-deep f32 sums stay exact); chunks and pairs accumulate in f64.
    Exact for ANY contraction depth, at ``ndiag (ndiag+1)/2`` times the
    output traffic of the diagonal-concatenated fast path."""
    ndiag = len(a_slices)
    chunks = [(i, min(i + 255, n)) for i in range(0, n, 255)]
    diags = []
    for d in range(ndiag):
        diag = None
        for p in range(d + 1):
            off = (d - p) * n
            for (i, j) in chunks:
                prod = jax.lax.dot_general(
                    a_slices[p][:, i:j],
                    b_stacked[off + i:off + j],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.float64)
                diag = prod if diag is None else diag + prod
        diags.append(diag)
    return _recombine(diags, sA, sB)


def _recombine(diags, sA, sB):
    out = None
    for d, prod in enumerate(diags):
        term = prod.astype(jnp.float64) * (_RADIX ** -(d + 2))
        out = term if out is None else out + term
    return out * sA * sB


def ozaki_matmul_sliced(a_cats, sA, b_stacked, sB, n):
    """Matmul from pre-sliced operands (see the prepare functions)."""
    ndiag = len(a_cats)
    diags = []
    for d in range(ndiag):
        prod = jax.lax.dot_general(
            a_cats[d],
            b_stacked[: (d + 1) * n],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        diags.append(prod)
    return _recombine(diags, sA, sB)


def ozaki_matmul_prepared(A, b_stacked, sB, n):
    """``A (K, n) @ B`` where ``B`` was prepared by :func:`ozaki_prepare_rhs`."""
    ndiag = b_stacked.shape[0] // n
    if n <= ozaki_sliced_safe_n(ndiag):
        a_cats, sA = ozaki_prepare_lhs(A, ndiag)
        return ozaki_matmul_sliced(a_cats, sA, b_stacked, sB, n)
    # deep contraction: per-pair chunked products, f64 accumulation (exact
    # for any n)
    a_sl, sA = ozaki_prepare_lhs_pairs(A, ndiag)
    return ozaki_matmul_pairs(a_sl, sA, b_stacked, sB, n)


def ozaki_matmul(A, B, ndiag=_DEFAULT_DIAGS):
    """``A (K, n) @ B (n, M)`` in f64 via bf16 slice products on the MXU.
    Any contraction depth: deep contractions route through the per-pair
    chunked path (:func:`ozaki_matmul_pairs`), which stays exact."""
    n = A.shape[1]
    b_stacked, sB = ozaki_prepare_rhs(B, ndiag)
    return ozaki_matmul_prepared(A, b_stacked, sB, n)


def ozaki_tensordot(C, V, axis, ndiag=_DEFAULT_DIAGS):
    """``tensordot(C, V, axes=([1], [axis]))`` in f64 via :func:`ozaki_matmul`
    — same output layout as ``jnp.tensordot``: the new axis prepends, the
    remaining ``V`` axes keep their order."""
    V = jnp.asarray(V, jnp.float64)
    vm = jnp.moveaxis(V, axis, 0)
    rest = vm.shape[1:]
    out2 = ozaki_matmul(jnp.asarray(C, jnp.float64), vm.reshape(vm.shape[0], -1), ndiag)
    return out2.reshape((C.shape[0],) + rest)


def use_ozaki() -> bool:
    """Whether split-complex f64 contractions should route through the MXU
    slice scheme.  Default: only on TPU backends (CPU f64 is native and
    faster than slicing).  Override with AUTOBZ_SPLIT_MM=ozaki|emul."""
    mode = os.environ.get("AUTOBZ_SPLIT_MM", "auto")
    if mode == "ozaki":
        return True
    if mode == "emul":
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover - no backend at all
        return False
