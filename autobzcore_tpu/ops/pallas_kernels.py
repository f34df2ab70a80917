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
    bw = min(block_w, W)
    bk = min(block_k, K)
    Wp = -(-W // bw) * bw
    Kp = -(-K // bk) * bk
    # pad: zero weights kill padded k rows; padded omegas are discarded
    e_p = jnp.zeros((Kp, m), e.dtype).at[:K].set(e)
    w_p = jnp.zeros((Kp,), e.dtype).at[:K].set(wgt)
    om_p = jnp.zeros((Wp,), e.dtype).at[:W].set(omegas)
    eta = float(eta)

    def kernel(om_ref, e_ref, w_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        om = om_ref[:]  # (bw,)
        ee = e_ref[:]  # (bk, m)
        ww = w_ref[:]  # (bk,)
        diff = om[:, None, None] - ee[None, :, :]
        lor = eta / (diff * diff + eta * eta)
        out_ref[:] += jnp.sum(lor * ww[None, :, None], axis=(1, 2)) * (1.0 / np.pi)

    out = pl.pallas_call(
        kernel,
        grid=(Wp // bw, Kp // bk),
        in_specs=[
            pl.BlockSpec((bw,), lambda i, j: (i,)),
            pl.BlockSpec((bk, m), lambda i, j: (j, 0)),
            pl.BlockSpec((bk,), lambda i, j: (j,)),
        ],
        out_specs=pl.BlockSpec((bw,), lambda i, j: (i,)),
        out_shape=jax.ShapeDtypeStruct((Wp,), e.dtype),
        interpret=interpret,
    )(om_p, e_p, w_p)
    return out[:W]
