"""Pallas TPU kernels for the hot spectral reductions.

The omega-sweep spectral sum  dos[w] = sum_k wgt_k sum_b eta/((w - e_kb)^2 +
eta^2)/pi  is the inner loop of every broadened-DOS workload (the aps_example
sweep runs it for 1000 omegas over ~1e6 k-points).  A naive formulation
materializes the (W, K, m) Lorentzian tensor in HBM; this kernel tiles
(omega-block x k-block) in VMEM and accumulates k-blocks in place, so HBM
traffic is just the spectrum read (+ output) — bandwidth-optimal.

Falls back to a fused-by-XLA jnp implementation off-TPU (and runs the kernel
in interpreter mode under tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _lorentzian_ref(e, wgt, omegas, eta):
    lor = eta / ((omegas[:, None, None] - e[None, :, :]) ** 2 + eta**2)
    return jnp.sum(lor * wgt[None, :, None], axis=(1, 2)) / jnp.pi


def lorentzian_dos(e, wgt, omegas, eta, *, block_w=256, block_k=512, interpret=None):
    """Weighted Lorentzian spectral sum over (k, band) for each omega.

    ``e``: (K, m) band energies; ``wgt``: (K,) quadrature weights;
    ``omegas``: (W,).  Returns (W,) DOS values (same normalization as the
    dense formula: caller applies vol/npt^d style scaling).
    """
    e = jnp.asarray(e)
    wgt = jnp.asarray(wgt, e.dtype)
    omegas = jnp.asarray(omegas, e.dtype)
    platform = jax.devices()[0].platform
    if interpret is None:
        interpret = platform != "tpu"
    if platform != "tpu" and not interpret:
        return _lorentzian_ref(e, wgt, omegas, eta)

    if platform == "tpu" and not interpret and jax.config.jax_enable_x64:
        # Mosaic rejects the i64 index maps x64 tracing produces (and has no
        # f64): trace the kernel in pure-f32 mode and restore dtype after
        from jax._src.config import enable_x64 as _x64_ctx

        with _x64_ctx(False):
            out32 = lorentzian_dos(
                e.astype(jnp.float32), wgt.astype(jnp.float32),
                omegas.astype(jnp.float32), jnp.asarray(eta, jnp.float32),
                block_w=block_w, block_k=block_k, interpret=interpret,
            )
        return out32.astype(e.dtype)

    from jax.experimental import pallas as pl

    K, m = e.shape
    W = omegas.shape[0]
    # flatten (k, band) to one axis and use strictly 2D blocks (Mosaic layout
    # rules: last dim = lanes (128x), second-to-last = sublanes (8x))
    ef = e.reshape(-1)
    wf = jnp.repeat(wgt, m)
    N = ef.shape[0]
    bw = min(block_w, max(8, -(-W // 8) * 8))
    bk = min(block_k * m, max(128, -(-N // 128) * 128))
    bw = max(8, (bw // 8) * 8)
    bk = max(128, (bk // 128) * 128)
    Wp = -(-W // bw) * bw
    Np = -(-N // bk) * bk
    # pad: zero weights kill padded rows; padded omegas are discarded
    e_p = jnp.zeros((1, Np), e.dtype).at[0, :N].set(ef)
    w_p = jnp.zeros((1, Np), e.dtype).at[0, :N].set(wf)
    om_p = jnp.zeros((Wp, 1), e.dtype).at[:W, 0].set(omegas)
    eta_arr = jnp.reshape(jnp.asarray(eta, e.dtype), (1, 1))

    def kernel(eta_ref, om_ref, e_ref, w_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        et = eta_ref[0, 0]
        om = om_ref[:]  # (bw, 1)
        ee = e_ref[:]  # (1, bk)
        ww = w_ref[:]  # (1, bk)
        diff = om - ee  # (bw, bk)
        lor = et / (diff * diff + et * et)
        out_ref[:] += jnp.sum(lor * ww, axis=1, keepdims=True) * (1.0 / np.pi)

    if platform == "tpu" and not interpret:
        from jax.experimental.pallas import tpu as pltpu

        eta_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    else:
        eta_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0))

    out = pl.pallas_call(
        kernel,
        grid=(Wp // bw, Np // bk),
        in_specs=[
            eta_spec,
            pl.BlockSpec((bw, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, bk), lambda i, j: (0, j)),
            pl.BlockSpec((1, bk), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bw, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Wp, 1), e.dtype),
        interpret=interpret,
    )(eta_arr, om_p, e_p, w_p)
    return out[:W, 0]
