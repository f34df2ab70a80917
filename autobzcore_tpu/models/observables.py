"""Spectral observables as ready-made integrand kernels.

The reference leaves integrand kernels to user scripts (e.g. the DOS trace at
``aps_example/aps_example.jl:30``, gradient/transport workloads via
``JacobianSeries``).  Here the common ones ship as a library, formulated for
batched TPU execution: every kernel works on a ``FourierValue`` and is safe
under ``vmap`` over both k-points and parameter sweeps.

Eigendecomposition forms are provided where they enable parameter-sweep reuse:
``Tr (z - H)^{-1} = sum_b (z - e_b)^{-1}``, so a single batched ``eigh`` of
the k-grid serves every omega (the reference re-solves per (k, omega)).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..brillouin import TrivialRep
from ..fourier import FourierIntegrand, FourierSeries, JacobianSeries


def greens_function_trace(hv, om, eta=None):
    """Tr (om + i eta - H(k))^{-1} (retarded, scalar broadening)."""
    m = hv.s.shape[-1]
    z = (om + 1j * eta) * jnp.eye(m, dtype=hv.s.dtype)
    return jnp.trace(jnp.linalg.inv(z - hv.s))


def dos_trace(hv, om, eta=None):
    """Lorentzian-broadened DOS integrand: -Im Tr G / pi
    (``aps_example/aps_example.jl:30``)."""
    return -jnp.imag(greens_function_trace(hv, om, eta=eta)) / jnp.pi


def spectral_function(hv, om, eta=None):
    """Full matrix spectral function A(k, om) = -Im G / pi."""
    m = hv.s.shape[-1]
    z = (om + 1j * eta) * jnp.eye(m, dtype=hv.s.dtype)
    G = jnp.linalg.inv(z - hv.s)
    return -(G - jnp.conj(jnp.swapaxes(G, -1, -2))) / (2j * jnp.pi)


def dos_eig(hv, om, eta=None):
    """DOS via eigenvalues (cheaper than the inverse for Hermitian H)."""
    e = jnp.linalg.eigvalsh(hv.s)
    return jnp.sum(eta / ((om - e) ** 2 + eta**2)) / jnp.pi


def transport_distribution(hv, om, eta=None):
    """Kubo-Greenwood transport distribution Gamma_ab(om) =
    sum_k Tr[v_a A(om) v_b A(om)] for a JacobianSeries value ``(H, dH)``.

    Returns the (d, d) conductivity-kernel matrix at one k-point; integrate
    over the BZ and frequency-weight for optical conductivity (BASELINE
    config 4: batched eigh + matrix products).
    """
    h, v = hv.s  # (m, m), (d, m, m)
    e, U = jnp.linalg.eigh(h)
    vband = jnp.einsum("ia,dij,jb->dab", jnp.conj(U), v, U)  # (d, m, m)
    a = eta / ((om - e) ** 2 + eta**2) / jnp.pi  # (m,) spectral weights
    return jnp.einsum("dab,b,gba,a->dg", vband, a, jnp.conj(jnp.swapaxes(vband, -1, -2)).transpose(0, 2, 1), a).real


def dos_integrand(h: FourierSeries, eta, rep=True):
    """Convenience: FourierIntegrand for the broadened DOS with TrivialRep."""
    fi = FourierIntegrand(dos_trace, h, eta=eta)
    if rep:
        fi.rep = TrivialRep()
    return fi


def transport_integrand(h: FourierSeries, eta):
    """FourierIntegrand over ``JacobianSeries(h)`` for transport sweeps."""
    return FourierIntegrand(transport_distribution, JacobianSeries(h), eta=eta)
