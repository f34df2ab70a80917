"""k-grid sharding over a device mesh.

The scale-out design (SURVEY.md §2.4 TPU mapping): symmetry-reduced k-point
batches are sharded over a mesh axis and combined with ``psum`` over ICI,
while parameter (omega) grids shard over a second, data-parallel axis.  This
replaces the reference's user-side ``BatchIntegrand`` distribution hook
(``src/batch.jl:5-7``) with jax collectives.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..brillouin import SymmetricBZ
from ..fourier import FourierSeries
from ..ops.symptr import symptr_rule


def _rule_data(series: FourierSeries, bz: SymmetricBZ, npt: int):
    d = bz.ndim
    if bz.syms is None:
        strides = npt ** np.arange(d - 1, -1, -1)
        lin = np.arange(npt**d)
        reps = np.stack([(lin // s) % npt for s in strides], axis=-1)
        weights = np.ones(lin.shape[0])
    else:
        reps, weights = symptr_rule(npt, d, bz.syms)
    return reps, weights


def spectral_sum_sharded(series: FourierSeries, bz: SymmetricBZ, npt: int,
                         omegas, eta: float, mesh: Mesh,
                         k_axis: str = "k", w_axis: str = "w"):
    """Broadened DOS  -Im Tr (w + i*eta - H(k))^{-1} / pi  integrated over the
    BZ, with k-points sharded over ``k_axis`` (psum-combined) and the omega
    grid sharded over ``w_axis``.

    Returns DOS values (len(omegas),), replicated over ``k_axis``.
    The eigendecomposition trick: Tr(z - H)^{-1} = sum_b (z - e_b)^{-1}, so
    the grid is eigendecomposed once and every omega reuses the spectrum.
    """
    d = bz.ndim
    reps, weights = _rule_data(series, bz, npt)
    nk_dev = mesh.shape[k_axis]
    nw_dev = mesh.shape[w_axis]
    K = reps.shape[0]
    Kpad = -(-K // nk_dev) * nk_dev
    frac = np.zeros((Kpad, d))
    w = np.zeros(Kpad)
    frac[:K] = reps.astype(np.float64) / npt
    w[:K] = weights
    omegas = jnp.asarray(omegas)
    W = omegas.shape[0]
    if W % nw_dev:
        raise ValueError(f"omega count {W} must divide over {nw_dev} devices")

    nsyms = 1 if bz.syms is None else len(bz.syms)
    vol = abs(np.linalg.det(bz.B))
    scale = vol / (npt**d)  # full-zone normalization: sum w = npt^d

    frac_sharded = jax.device_put(jnp.asarray(frac), NamedSharding(mesh, P(k_axis, None)))
    w_sharded = jax.device_put(jnp.asarray(w), NamedSharding(mesh, P(k_axis)))
    om_sharded = jax.device_put(omegas, NamedSharding(mesh, P(w_axis)))

    coeffs = series.c  # replicated (small)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(k_axis, None), P(k_axis), P(w_axis)),
        out_specs=P(w_axis),
    )
    def block(frac_blk, w_blk, om_blk):
        hk = series_eval_points(coeffs, series, frac_blk)
        e = jnp.linalg.eigvalsh(hk)  # (K_loc, m)
        # local Lorentzian sum, then psum over the k axis
        lor = eta / ((om_blk[:, None, None] - e[None, :, :]) ** 2 + eta**2) / jnp.pi
        local = jnp.sum(lor * w_blk[None, :, None], axis=(1, 2))
        return jax.lax.psum(local, k_axis)

    def series_eval_points(c, s, X):
        from ..ops.fourier_eval import evaluate_points

        return evaluate_points(c, s.sndim, X, s.offset, s.period, None, s.dtype)

    dos = block(frac_sharded, w_sharded, om_sharded)
    return dos * scale
