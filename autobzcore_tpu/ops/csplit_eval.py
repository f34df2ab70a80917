"""Split-complex (re, im) evaluation kernels for full f64 precision on TPU.

TPU hardware has no complex types; XLA decomposes complex64 into f32 pairs,
but the f64 emulation layer does not handle complex128 at all (the x64
rewriter aborts on f64->c128 conversion).  For workloads that need double
precision — abstol <= 1e-5 spectral integrals, the BASELINE north star — this
module implements the complex arithmetic manually over f64 real pairs:

- ``grid_hermitian_split``: Fourier-series evaluation on a tensor grid via
  cos/sin phase contractions (4 real tensordots per dimension);
- ``eigvalsh_split`` / ``eigh_split``: Hermitian eigensolve through the real
  symmetric embedding ``[[Re, -Im], [Im, Re]]`` (eigenvalues doubled; for
  eigenvectors, columns pair as (u_re, u_im)).

Everything here is jit-safe with only real arrays at the boundaries.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def phase_cs(x, n, offset, period, dtype=jnp.float64, deriv=0):
    """(cos, sin) parts of ``(2 pi i f)^deriv e^{i ang}``, ang = 2 pi f x/t.

    ``deriv=1`` gives the z-derivative phase ``2 pi f (-sin + i cos)``."""
    x = jnp.asarray(x, dtype)
    f = (offset + jnp.arange(n)).astype(dtype)
    ang = (2 * np.pi) * jnp.outer(x / period, f)
    c, s = jnp.cos(ang), jnp.sin(ang)
    for _ in range(deriv):
        fac = (2 * np.pi) * f[None, :]
        c, s = -fac * s, fac * c  # multiply by i*2pi*f
    return c, s


def contract_split(vre, vim, cos, sin, axis):
    """Contract split-complex ``v`` with phase ``e^{i ang}`` along ``axis``:
    (re + i im)(cos + i sin) summed over the axis, new axis prepends."""
    import jax

    prec = jax.lax.Precision.HIGHEST  # TPU default matmul precision is bf16
    rr = jnp.tensordot(cos, vre, axes=([1], [axis]), precision=prec)
    ri = jnp.tensordot(cos, vim, axes=([1], [axis]), precision=prec)
    ir = jnp.tensordot(sin, vre, axes=([1], [axis]), precision=prec)
    ii = jnp.tensordot(sin, vim, axes=([1], [axis]), precision=prec)
    return rr - ii, ri + ir


def evaluate_grid_split(c_re, c_im, spatial_ndim, nodes, offsets, periods,
                        dtype=jnp.float64, derivs=None):
    """Split-complex tensor-grid evaluation; returns (re, im) arrays of shape
    ``(g_1, ..., g_d, *valshape)``.  Mirrors ``fourier_eval.evaluate_grid``."""
    d = spatial_ndim
    if derivs is None:
        derivs = (0,) * d
    vre = jnp.asarray(c_re, dtype)
    vim = jnp.asarray(c_im, dtype)
    vshape = vre.shape[d:]
    vre = vre.reshape(vre.shape[:d] + (-1,))
    vim = vim.reshape(vim.shape[:d] + (-1,))
    for j in range(d - 1, -1, -1):
        cos, sin = phase_cs(nodes[j], vre.shape[d - 1], offsets[j], periods[j], dtype, derivs[j])
        vre, vim = contract_split(vre, vim, cos, sin, d - 1)
    return (vre.reshape(vre.shape[:d] + vshape), vim.reshape(vim.shape[:d] + vshape))


def evaluate_points_split(c_re, c_im, spatial_ndim, X, offsets, periods,
                          dtype=jnp.float64, derivs=None):
    """Split-complex evaluation at an arbitrary (K, d) point batch; returns
    (re, im) arrays of shape (K, *valshape).  Mirrors
    ``fourier_eval.evaluate_points``: the trailing dimension contracts first
    as a big matmul, the rest per-point."""
    import jax

    prec = jax.lax.Precision.HIGHEST
    d = spatial_ndim
    if derivs is None:
        derivs = (0,) * d
    vre = jnp.asarray(c_re, dtype)
    vim = jnp.asarray(c_im, dtype)
    vshape = vre.shape[d:]
    vre = vre.reshape(vre.shape[:d] + (-1,))
    vim = vim.reshape(vim.shape[:d] + (-1,))
    K = X.shape[0]
    for j in range(d - 1, -1, -1):
        nj = vre.shape[j] if j == d - 1 else vre.shape[j + 1]
        cos, sin = phase_cs(X[:, j], nj, offsets[j], periods[j], dtype, derivs[j])
        if j == d - 1:
            vre, vim = contract_split(vre, vim, cos, sin, d - 1)
            # -> (K, n_1..n_{d-1}, V)
        else:
            # per-point contraction of axis j+1 with this point's phase row.
            # Elementwise multiply+sum, NOT einsum/dot: TPU's x64 rewriter
            # emulates elementwise f64 faithfully but batched dot-generals
            # lose the low word (observed ~1e-2 relative error in H(k)).
            a = j + 1
            vre_m = jnp.moveaxis(vre, a, 1)
            vim_m = jnp.moveaxis(vim, a, 1)
            shape = (K, vre_m.shape[1]) + (1,) * (vre_m.ndim - 2)
            cb = cos.reshape(shape)
            sb = sin.reshape(shape)
            rr = jnp.sum(cb * vre_m, axis=1)
            ri = jnp.sum(cb * vim_m, axis=1)
            ir = jnp.sum(sb * vre_m, axis=1)
            ii = jnp.sum(sb * vim_m, axis=1)
            vre, vim = rr - ii, ri + ir
    return vre.reshape((K,) + vshape), vim.reshape((K,) + vshape)


def hermitian_embedding(h_re, h_im):
    """Real symmetric 2m x 2m embedding of Hermitian ``h = h_re + i h_im``:
    ``[[Re, -Im], [Im, Re]]`` (batched over leading axes)."""
    top = jnp.concatenate([h_re, -h_im], axis=-1)
    bot = jnp.concatenate([h_im, h_re], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def eigvalsh_split(h_re, h_im):
    """Eigenvalues of Hermitian ``h_re + i h_im`` via the real embedding.

    The embedding's 2m eigenvalues come in duplicated pairs; with ascending
    sort the distinct values sit at even indices."""
    E = hermitian_embedding(h_re, h_im)
    e2 = jnp.linalg.eigvalsh(E)  # (..., 2m) ascending, duplicated
    return e2[..., ::2]


def eigh_split(h_re, h_im):
    """Eigen-decomposition of Hermitian ``h_re + i h_im`` via the real
    embedding: returns (e (..., m), u_re (..., m, m), u_im (..., m, m)) with
    eigenvector columns ``u[:, j] = u_re[:, j] + i u_im[:, j]``."""
    m = h_re.shape[-1]
    E = hermitian_embedding(h_re, h_im)
    e2, V = jnp.linalg.eigh(E)  # (..., 2m), (..., 2m, 2m)
    e = e2[..., ::2]
    W = V[..., ::2]  # one representative per duplicated pair
    u_re = W[..., :m, :]
    u_im = W[..., m:, :]
    # normalize: embedding eigenvectors satisfy |u_re|^2 + |u_im|^2 = 1 already
    return e, u_re, u_im
