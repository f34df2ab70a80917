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

    from jax.experimental import pallas as pl

    K, m = e.shape
    W = omegas.shape[0]
    # flatten (k, band) to one axis: Mosaic vector layouts want 2D kernel math
    ef = e.reshape(-1)
    wf = jnp.repeat(wgt, m)
    N = ef.shape[0]
    bw = min(block_w, W)
    bk = min(block_k * m, N)
    Wp = -(-W // bw) * bw
    Np = -(-N // bk) * bk
    # pad: zero weights kill padded rows; padded omegas are discarded
    e_p = jnp.zeros((Np,), e.dtype).at[:N].set(ef)
    w_p = jnp.zeros((Np,), e.dtype).at[:N].set(wf)
    om_p = jnp.zeros((Wp,), e.dtype).at[:W].set(omegas)
    eta_arr = jnp.reshape(jnp.asarray(eta, e.dtype), (1, 1))  # SMEM scalar

    def kernel(eta_ref, om_ref, e_ref, w_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        et = eta_ref[0, 0]
        om = om_ref[:]  # (bw,)
        ee = e_ref[:]  # (bk,)
        ww = w_ref[:]  # (bk,)
        diff = om[:, None] - ee[None, :]
        lor = et / (diff * diff + et * et)
        out_ref[:] += jnp.sum(lor * ww[None, :], axis=1) * (1.0 / np.pi)

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
            pl.BlockSpec((bw,), lambda i, j: (i,)),
            pl.BlockSpec((bk,), lambda i, j: (j,)),
            pl.BlockSpec((bk,), lambda i, j: (j,)),
        ],
        out_specs=pl.BlockSpec((bw,), lambda i, j: (i,)),
        out_shape=jax.ShapeDtypeStruct((Wp,), e.dtype),
        interpret=interpret,
    )(eta_arr, om_p, e_p, w_p)
    return out[:W]
