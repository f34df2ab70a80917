"""Canonical tight-binding model builders.

Fixtures matching the reference's test models: ``integer_lattice``
(``test/utils.jl:3-9``), ``tb_integer`` and ``tb_graphene``
(``test/dos.jl:8-41``), used for the analytic-DOS acceptance suite.
"""
from __future__ import annotations

import numpy as np

from ..fourier import FourierSeries


def integer_lattice(n, coeff=None):
    """Nearest-neighbor hopping coefficients on Z^n: C[+-e_i] = 1/(2n)
    (scalar-valued), centered offsets."""
    coeff = 1.0 / (2 * n) if coeff is None else coeff
    C = np.zeros((3,) * n)
    for i in range(n):
        for j in (0, 2):
            idx = tuple(j if k == i else 1 for k in range(n))
            C[idx] = coeff
    return C


def tb_integer(n, t=1.0, period=1.0, dtype=None):
    """n-dim integer-lattice tight-binding Hamiltonian as a 1x1 Fourier
    series: H(k) = 2t sum_i cos(2 pi k_i) (reference ``test/dos.jl:34-41``)."""
    import jax.numpy as jnp

    C = integer_lattice(n, coeff=t)[..., None, None]
    return FourierSeries(C, period=period, offset=(-1,) * n, ndim=n,
                         dtype=dtype or jnp.complex128)


def tb_graphene(t=1.0, period=1.0, dtype=None):
    """Graphene 2-band tight-binding model on the 2D hexagonal lattice in
    fractional coordinates (reference ``test/dos.jl:8-14``)."""
    import jax.numpy as jnp

    C = np.zeros((5, 5, 2, 2), dtype=np.complex128)  # offsets -2..2
    o = 2

    def put(i, j, a, b, val):
        C[i + o, j + o, a, b] = val

    put(1, 1, 0, 1, t)
    put(1, -2, 0, 1, t)
    put(-2, 1, 0, 1, t)
    put(-1, -1, 1, 0, t)
    put(-1, 2, 1, 0, t)
    put(2, -1, 1, 0, t)
    return FourierSeries(C, period=period, offset=(-2, -2), ndim=2,
                         dtype=dtype or jnp.complex128)


def synthetic_wannier(nbands, nr=5, ndim=3, decay=1.0, seed=0, period=1.0, dtype=None):
    """Random Hermitian-symmetric Wannier-like model: ``nbands`` bands with
    exponentially decaying real-space hoppings on an ``nr^ndim`` R-box.
    Used for scale tests (e.g. the 30+ band near-singular DOS config)."""
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(seed)
    shape = (nr,) * ndim
    o = -((nr - 1) // 2)
    C = rng.normal(size=shape + (nbands, nbands)) + 1j * rng.normal(size=shape + (nbands, nbands))
    grids = np.meshgrid(*[np.arange(nr) + o] * ndim, indexing="ij")
    dist = np.sqrt(sum(g.astype(float) ** 2 for g in grids))
    C *= np.exp(-decay * dist)[..., None, None] / np.sqrt(nbands)
    # hermitian symmetry: c(-R) = c(R)^dagger
    C = (C + np.flip(C.conj(), axis=tuple(range(ndim))).swapaxes(-1, -2)) / 2
    return FourierSeries(C, period=period, offset=(o,) * ndim, ndim=ndim,
                         dtype=dtype or jnp.complex128)
