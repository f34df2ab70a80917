"""Generalized Gilat-Raubenheimer DOS algorithm.

Native equivalent of reference ``src/dos_algorithms.jl`` + ``src/dos_ggr.jl``:
on a symmetry-reduced ``npt^d`` k-grid, eigendecompose ``H(k)``, extract band
velocities ``diag(U' dH U)`` in standardized coordinates, then accumulate
closed-form box-broadened delta contributions per (k, band).  Second-order
convergent; robust at band crossings [Liu, Yu, Duan, Gilat-correction per the
reference ``src/dos_ggr.jl:102``].

TPU-native: the eigensolve grid is one batched ``jnp.linalg.eigh``; the per-E
accumulation is a dense vectorized reduction, so 1000-energy sweeps reuse the
spectral data at negligible cost (the reference's cache-reuse property,
``docs/src/dos.md:36-42``) and run as a single vmapped kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..brillouin import SymmetricBZ
from ..fourier import FourierSeries, JacobianSeries
from ..ops.fourier_eval import evaluate_grid
from ..ops.symptr import symptr_rule
from .interfaces import DOSAlgorithm, DOSSolution

_EPS = 1e-300


def _ggr_1d(b, dw, v, vtol):
    v1 = jnp.abs(v[..., 0])
    # critical points (v ~ 0) are measure-zero in the box model; the reference
    # formula yields Inf there (src/dos_ggr.jl:75-79) — we drop them instead
    inside = (dw <= b * v1) & (v1 > vtol)
    return jnp.where(inside, 1.0 / jnp.maximum(v1, _EPS), 0.0)


def _ggr_2d(b, dw, v, vtol):
    av = jnp.sort(jnp.abs(v), axis=-1)  # ascending
    v2, v1 = av[..., 0], av[..., 1]
    w1 = b * jnp.abs(v1 - v2)
    w3 = b * (v1 + v2)
    r1 = 2 * b / jnp.maximum(v1, _EPS)
    r2 = (b * (v1 + v2) - dw) / jnp.maximum(v1 * v2, _EPS)
    return jnp.where(v1 > vtol, jnp.where(dw <= w1, r1, jnp.where(dw <= w3, r2, 0.0)), 0.0)


def _ggr_3d(b, dw, v, vtol):
    av = jnp.sort(jnp.abs(v), axis=-1)  # ascending: v3 <= v2 <= v1
    v3, v2, v1 = av[..., 0], av[..., 1], av[..., 2]
    w1 = b * jnp.abs(v1 - v2 - v3)
    w2 = b * (v1 - v2 + v3)
    w3 = b * (v1 + v2 - v3)
    w4 = b * (v1 + v2 + v3)
    vv = jnp.sqrt(v1**2 + v2**2 + v3**2)
    d123 = jnp.maximum(v1 * v2 * v3, _EPS)
    d12 = jnp.maximum(v1 * v2, _EPS)
    caseA = 4 * b**2 / jnp.maximum(v1, _EPS)
    caseB = (2 * b**2 * (v1 * v2 + v2 * v3 + v3 * v1) - (dw**2 + (vv * b) ** 2)) / d123
    caseC = (
        b**2 * (v1 * v2 + 3 * v2 * v3 + v3 * v1)
        - b * dw * (-v1 + v2 + v3)
        - (dw**2 + (vv * b) ** 2) / 2
    ) / d123
    caseD = 2 * b * (b * (v1 + v2) - dw) / d12
    caseE = (b * (v1 + v2 + v3) - dw) ** 2 / (2 * d123)
    res = jnp.where(
        dw <= w1,
        jnp.where(v1 >= v2 + v3, caseA, caseB),
        jnp.where(dw <= w2, caseC, jnp.where(dw <= w3, caseD, jnp.where(dw <= w4, caseE, 0.0))),
    )
    return jnp.where(v1 > vtol, res, 0.0)


_GGR_FORMULAS = {1: _ggr_1d, 2: _ggr_2d, 3: _ggr_3d}


class GGR(DOSAlgorithm):
    """``GGR(npt=50)`` (reference ``src/dos_algorithms.jl:23``).

    ``precision='auto'`` picks the complex path on CPU and the split-complex
    f64 path (real-pair contraction + real-embedding eigh) on TPU, where
    complex128 is unavailable; force with ``'complex'``/``'split'``.
    """

    def __init__(self, npt=50, precision="auto"):
        self.npt = npt
        self.precision = precision

    def _use_split(self):
        if self.precision == "split":
            return True
        if self.precision == "complex":
            return False
        return jax.devices()[0].platform == "tpu"

    def init_cacheval(self, h, domain, p):
        if isinstance(h, JacobianSeries):
            h = h.s
        if not isinstance(h, FourierSeries):
            raise TypeError("GGR currently supports Fourier series Hamiltonians")
        if not isinstance(p, SymmetricBZ):
            raise TypeError("GGR supports BZ parameters from load_bz")
        bz = p
        d = bz.ndim
        if d not in _GGR_FORMULAS:
            raise ValueError("GGR implemented for up to 3d BZ")
        npt = self.npt

        if bz.syms is None:
            reps = None
            weights = np.ones(npt**d)
        else:
            reps, weights = symptr_rule(npt, d, bz.syms)

        # spectral data: grid evaluation + batched eigh in ONE compiled
        # program.  Coefficients enter as HLO literals and only real arrays
        # (energies, velocities) cross the jit boundary, so this runs on TPU
        # backends that reject complex runtime parameters.
        u = [np.arange(npt) / npt * h.period[j] for j in range(d)]
        if reps is not None:
            lin = np.ravel_multi_index(tuple(reps.T.astype(np.int64)), (npt,) * d)
        else:
            lin = None

        use_split = self._use_split()

        @jax.jit
        def spectral():
            if use_split:
                from ..ops.csplit_eval import eigh_split, evaluate_grid_split

                c_np = np.asarray(h.c)
                cre, cim = c_np.real, c_np.imag

                def ev(derivs):
                    return evaluate_grid_split(cre, cim, d, u, h.offset, h.period, derivs=derivs)

                hr, hi = ev(None)
                gr = [ev(tuple(1 if i == j else 0 for i in range(d))) for j in range(d)]
                vr = jnp.stack([g[0] for g in gr], axis=d)
                vi = jnp.stack([g[1] for g in gr], axis=d)
                hr = hr.reshape((npt**d,) + hr.shape[d:])
                hi = hi.reshape((npt**d,) + hi.shape[d:])
                vr = vr.reshape((npt**d, d) + vr.shape[d + 1:])
                vi = vi.reshape((npt**d, d) + vi.shape[d + 1:])
                if lin is not None:
                    hr, hi, vr, vi = hr[lin], hi[lin], vr[lin], vi[lin]
                if hr.ndim == 1:  # scalar-valued series
                    hr, hi = hr[:, None, None], hi[:, None, None]
                    vr, vi = vr[:, :, None, None], vi[:, :, None, None]
                e, ur, ui = eigh_split(hr, hi)
                # real part of diag(U^H V U) with split arithmetic
                v = (
                    jnp.einsum("kim,kdij,kjm->kdm", ur, vr, ur)
                    + jnp.einsum("kim,kdij,kjm->kdm", ur, vi * -1, ui)
                    + jnp.einsum("kim,kdij,kjm->kdm", ui, vi, ur)
                    + jnp.einsum("kim,kdij,kjm->kdm", ui, vr, ui)
                )
                return e, v
            hk = evaluate_grid(h.c, d, u, h.offset, h.period, None, h.dtype)
            grads = []
            for j in range(d):
                derivs = tuple(1 if i == j else 0 for i in range(d))
                grads.append(evaluate_grid(h.c, d, u, h.offset, h.period, derivs, h.dtype))
            vk = jnp.stack(grads, axis=d)  # (npt.., d, m, m)
            hk = hk.reshape((npt**d,) + hk.shape[d:])  # flatten grid axes
            vk = vk.reshape((npt**d, d) + vk.shape[d + 1:])
            if lin is not None:
                hk = hk[lin]
                vk = vk[lin]
            if hk.ndim == 1:  # scalar-valued series -> 1x1 Hamiltonian
                hk = hk[:, None, None]
                vk = vk[:, :, None, None]
            e, U = jnp.linalg.eigh(hk)  # (K, m), (K, m, m)
            # band velocities: diag(U' dH U) per direction
            v = jnp.einsum("kmi,kdij,kjm->kdm", jnp.conj(jnp.swapaxes(U, 1, 2)), vk, U)
            return e, jnp.real(v)

        energies, velocities = spectral()
        w = jnp.asarray(weights)
        formula = _GGR_FORMULAS[d]
        b = 1.0 / (2 * npt)
        # velocities at band critical points are numerical noise, not exact
        # zeros; gate the 1/v formulas on a scale-relative threshold
        vtol = 1e-10 * float(jnp.maximum(1.0, jnp.max(jnp.abs(velocities))))

        @jax.jit
        def dos_at(E):
            dw = jnp.abs(E - energies)  # (K, m)
            vt = jnp.moveaxis(velocities, 1, 2)  # (K, m, d)
            contrib = formula(b, dw, vt, vtol)  # (K, m)
            return jnp.sum(w[:, None] * contrib)

        return {
            "dos_at": dos_at,
            "dos_sweep": jax.jit(jax.vmap(dos_at)),
            "energies": energies,
            "velocities": velocities,
            "weights": w,
            "numevals": int(energies.shape[0]),
        }

    def dos_solve(self, h, domain, p, cacheval, abstol=None, reltol=None, maxiters=None):
        if np.ndim(domain) != 0:
            raise TypeError("GGR supports domains of individual eigenvalues")
        if not isinstance(p, SymmetricBZ):
            raise TypeError("GGR supports BZ parameters from load_bz")
        A = cacheval["dos_at"](jnp.asarray(domain))
        return DOSSolution(A, None, True, cacheval["numevals"])

    def dos_sweep(self, cacheval, Es):
        """Batched DOS over an energy grid — the vmapped sweep reusing the
        eigensolve grid (beyond-reference convenience for 1000-omega sweeps)."""
        return cacheval["dos_sweep"](jnp.asarray(Es))
