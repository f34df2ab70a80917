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
   integers < 2^16 and sums over n <= 255 terms stay below 2^24, so every
   slice-pair product is EXACT;
4. recombine the slice-pair products in f64, grouped by total shift
   ``p + q`` (one power-of-256 scale per diagonal), and restore the
   row/column scales.

With ``ndiag`` slices per operand and diagonals ``p + q < ndiag``, the
dominant error is the operand-mantissa truncation ``~0.5 * 256^-ndiag``
relative to the row/column max: ndiag=5 -> ~7e-13, ndiag=6 (default, 21
slice-pair matmuls) -> ~3e-15, ndiag=7 -> f64 roundoff (validated against
host f64 in tests/test_ozaki.py).

Used by ``ops/csplit_eval.py`` for the split-complex Fourier contraction
(north-star f64 ladder, split-IAI point batches).  Reference has no
analogue — its f64 is Julia-native (`/root/reference/src/fourier.jl`
evaluates series in hardware f64); this is the TPU-native route to the same
precision tier.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_T = 8  # bits per slice
_RADIX = float(1 << _T)  # 256.0
_DEFAULT_DIAGS = 6  # diagonals 0..5 -> 21 matmuls, ~1e-14 below row/col max


def _pow2_scale(x, axis):
    """Power-of-two scale >= max|x| along ``axis`` (keepdims), 1.0 where the
    slice is all-zero.  Powers of two make the descale exact.

    The exponent is extracted in f32 (TPU's x64 rewriter cannot bitcast f64
    to s64, so f64 ``frexp`` fails to compile); the (1 + 1e-6) pad keeps the
    scale >= amax across the f64->f32 rounding.  Magnitudes below the f32
    subnormal floor (~1e-38) collapse to zero — negligible against any
    representable partner factor and far outside the BZ workloads' range."""
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    am32 = (amax * (1.0 + 1e-6)).astype(jnp.float32)
    # frexp: am32 = m * 2^e with m in [0.5, 1) -> 2^e >= am32 >= amax
    _, e = jnp.frexp(am32)
    scale = jnp.ldexp(jnp.ones_like(am32), e).astype(x.dtype)
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
    """Pre-slice the right operand: returns ``(b_slices, sB)`` reusable
    across many :func:`ozaki_matmul_prepared` calls (e.g. a fixed Fourier
    intermediate contracted against many phase slabs)."""
    B = jnp.asarray(B, jnp.float64)
    sB = _pow2_scale(B, 0)  # (1, M)
    return tuple(_slices(B / sB, ndiag)), sB


def ozaki_matmul_prepared(A, b_sl, sB, n):
    """``A (K, n) @ B`` where ``B`` was prepared by :func:`ozaki_prepare_rhs`
    (``n`` = contraction length, needed for the f32-accumulation guard)."""
    ndiag = len(b_sl)
    A = jnp.asarray(A, jnp.float64)
    sA = _pow2_scale(A, 1)  # (K, 1)
    a_sl = _slices(A / sA, ndiag)
    out = jnp.zeros((A.shape[0], b_sl[0].shape[1]), jnp.float64)
    for d in range(ndiag - 1, -1, -1):
        # all pairs p + q == d share the scale 256^-(d+2); their f32 products
        # are exact integers, and the per-diagonal f32 sum of <= ndiag of them
        # stays below 2^24 for n <= 255/ndiag -- accumulate in f64 to be safe
        # for every n
        # cross-pair f32 accumulation is exact only while n*(d+1)*2^16 < 2^24
        f32_safe = n * (d + 1) < 256
        diag = None
        for p in range(d + 1):
            q = d - p
            prod = jax.lax.dot_general(
                a_sl[p],
                b_sl[q],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if not f32_safe:
                prod = prod.astype(jnp.float64)
            diag = prod if diag is None else diag + prod
        out = out + diag.astype(jnp.float64) * (_RADIX ** -(d + 2))
    return out * sA * sB


def ozaki_matmul(A, B, ndiag=_DEFAULT_DIAGS):
    """``A (K, n) @ B (n, M)`` in f64 via bf16 slice products on the MXU.

    ``n`` must be <= 255 so f32 slice-product accumulation stays exact.
    ``ndiag`` = number of slices per operand and shift diagonals kept
    (p + q < ndiag); 5 keeps ~48 bits below the per-row/column max, 6
    (default) ~3e-15, 7 reaches f64 roundoff.
    """
    n = A.shape[1]
    if n > 255:
        # chunk the contraction to preserve exact f32 accumulation
        mid = (n // 2 + 127) & ~127 or 128
        return ozaki_matmul(A[:, :mid], B[:mid], ndiag) + ozaki_matmul(
            A[:, mid:], B[mid:], ndiag
        )
    b_sl, sB = ozaki_prepare_rhs(B, ndiag)
    return ozaki_matmul_prepared(A, b_sl, sB, n)


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
