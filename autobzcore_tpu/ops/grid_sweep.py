"""Full-grid split-f64 spectral sweeps: slab-streamed H(k) + eigenvalues +
broadened DOS over a complete npt^3 PTR grid.

Why full grid instead of symmetry-reduced representatives: scattered-point
evaluation (``csplit_eval.evaluate_points_split``) pays per-point phase
products in emulated f64 — measured ~50x slower per k-point than tensor-grid
contraction on TPU v5e — while cubic symmetry reduction only shrinks the
point count by <= 48x.  Streaming the FULL grid through the MXU (Ozaki-slice
matmuls, ``ops/ozaki.py``) therefore beats the reduced scatter path outright
and eliminates the host-side ``symptr_rule`` enumeration (~1 min/rung at
npt=1600) entirely.  Orbit sums make the full-grid sum exactly equal to the
symmetrized reduced sum (reference AutoPTR semantics,
``/root/reference/src/brillouin.jl:421-444``).

Pipeline per slab of ``S`` outer-dimension grid rows:
1. phase rows (S, n1) hit a pre-sliced Fourier intermediate (n1, 6*npt^2)
   — Karatsuba x Ozaki: 3 slice-matmul groups for the 6 independent
   Hermitian entries (re for all 6, im for the 3 off-diagonals);
2. entry-major rows feed the struct-of-arrays Cardano
   (``ops/eigh3.eigvalsh3_rows``; the AoS layout measured 4x slower);
3. an omega-batched Lorentzian reduction accumulates the (W,) DOS partial
   in f64, two-float (hi, lo) subtraction preserving the o - e cancellation.

Used by ``benchmarks/northstar.py --fullgrid`` (SrVO3 1000-omega ladder).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from autobzcore_tpu.ops.csplit_eval import contract_split
from autobzcore_tpu.ops.eigh3 import eigvalsh3_rows
from autobzcore_tpu.ops.ozaki import ozaki_matmul_prepared, ozaki_prepare_rhs

# Hermitian entry order: diagonals then upper off-diagonals
_ENTRIES = ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))


def _phase_table(npt, nfreq, offset):
    """Host-f64 (cos, sin) tables for the fractional PTR nodes: exact IEEE
    f64 trig (the TPU's double-single emulation is weaker)."""
    freqs = offset + np.arange(nfreq)
    ang = 2 * np.pi * np.outer(np.arange(npt) / npt, freqs)
    return np.cos(ang), np.sin(ang)


class FullGridSpectralSweep:
    """Broadened-DOS sweep engine for 3-band Hermitian Fourier series.

    Parameters
    ----------
    series : FourierSeries with 3D spatial grid and 3x3 Hermitian values.
    omegas : (W,) frequency grid.
    eta : Lorentzian broadening.
    slab : grid rows of the outer dimension per MXU step.
    slabs_per_dispatch : fori_loop steps per device dispatch (bounds
        single-dispatch wall time on hosted TPU workers).
    omega_batch : omegas per Lorentzian pass (bounds the (B, S*npt^2)
        broadcast intermediate).
    """

    def __init__(self, series, omegas, eta, ndiag=6, slab=16,
                 slabs_per_dispatch=16, omega_batch=100):
        c = np.asarray(series.c)
        if c.ndim != 5 or c.shape[-2:] != (3, 3):
            raise ValueError("FullGridSpectralSweep requires a 3D series of 3x3 matrices")
        self.n1, self.n2, self.n3 = c.shape[:3]
        self.offset = tuple(int(o) for o in series.offset)
        # 6 independent Hermitian entries, split re/im (host)
        c6 = np.stack([c[..., i, j] for (i, j) in _ENTRIES], axis=-1)
        self.c6_re = jnp.asarray(c6.real, jnp.float64)
        self.c6_im = jnp.asarray(c6.imag, jnp.float64)
        self.omegas = np.asarray(omegas, np.float64)
        self.eta = float(eta)
        self.ndiag = ndiag
        self.slab = slab
        self.spd = slabs_per_dispatch
        W = self.omegas.size
        ob = min(omega_batch, W)
        while W % ob:
            ob -= 1
        self.omega_batch = ob
        self._run_cache = {}

    # -- per-rung preparation ------------------------------------------------

    def _prepare(self, npt):
        """Contract the inner two dimensions on device and pre-slice the
        (n1, {6,3} * npt^2) intermediates for the slab matmuls."""
        c3, s3 = _phase_table(npt, self.n3, self.offset[2])
        c2, s2 = _phase_table(npt, self.n2, self.offset[1])

        @jax.jit
        def prep(cre, cim, c3, s3, c2, s2):
            # (n1, n2, n3, 6) -> contract n3 -> (npt, n1, n2, 6)
            vre, vim = contract_split(cre, cim, c3, s3, 2)
            # contract n2 (axis 2) -> (npt2, npt3, n1, 6)
            vre, vim = contract_split(vre, vim, c2, s2, 2)
            # -> (n1, 6, npt2, npt3) entry-major, grid minor
            vre = jnp.transpose(vre, (2, 3, 0, 1))
            vim = jnp.transpose(vim, (2, 3, 0, 1))
            n1 = vre.shape[0]
            bre = vre.reshape(n1, -1)
            bim = vim.reshape(n1, -1)
            bsum = (vre[:, 3:] + vim[:, 3:]).reshape(n1, -1)
            out = ()
            for b in (bre, bim, bsum):
                sl, sc = ozaki_prepare_rhs(b, self.ndiag)
                out += tuple(sl) + (sc,)
            return out

        return prep(self.c6_re, self.c6_im, jnp.asarray(c3), jnp.asarray(s3),
                    jnp.asarray(c2), jnp.asarray(s2))

    # -- slab kernel ---------------------------------------------------------

    def _make_run(self, npt):
        S = self.slab
        n1 = self.n1
        M = npt * npt
        W = self.omegas.size
        OB = self.omega_batch
        eta32 = jnp.float32(self.eta)
        nb = self.ndiag

        @jax.jit
        def run(i0, nsl, cosP, sinP, rowmask, omhi, omlo, *prepared):
            bre_sl, sre = prepared[:nb], prepared[nb]
            bim_sl, sim = prepared[nb + 1:2 * nb + 1], prepared[2 * nb + 1]
            bsm_sl, ssm = prepared[2 * nb + 2:3 * nb + 2], prepared[3 * nb + 2]

            def body(i, acc):
                cs = jax.lax.dynamic_slice(cosP, (i * S, 0), (S, n1))
                sn = jax.lax.dynamic_slice(sinP, (i * S, 0), (S, n1))
                w = jax.lax.dynamic_slice(rowmask, (i * S,), (S,))
                # Karatsuba x Ozaki: re = cc - ss, im = (c+s)(re+im) - cc - ss
                R1 = ozaki_matmul_prepared(cs, bre_sl, sre, n1).reshape(S, 6, M)
                R2 = ozaki_matmul_prepared(sn, bim_sl, sim, n1).reshape(S, 6, M)
                R3 = ozaki_matmul_prepared(cs + sn, bsm_sl, ssm, n1).reshape(S, 3, M)
                re6 = R1 - R2
                im3 = R3 - R1[:, 3:] - R2[:, 3:]
                lo, mid, hi = eigvalsh3_rows(
                    re6[:, 0], re6[:, 1], re6[:, 2],
                    re6[:, 3], im3[:, 0],
                    re6[:, 4], im3[:, 1],
                    re6[:, 5], im3[:, 2],
                )
                # two-float omega - e: hi parts cancel exactly (Sterbenz),
                # lo parts carry the f64 residue — preserves the o - e
                # cancellation without re-reading f64 rows per omega
                w32 = w.astype(jnp.float32)[:, None]

                def band(e):
                    ehi = e.astype(jnp.float32)
                    elo = (e - ehi).astype(jnp.float32)

                    def one(ob):
                        oh, ol = ob  # (OB,)
                        t = (oh[:, None, None] - ehi[None]) + (ol[:, None, None] - elo[None])
                        lor = eta32 / (t * t + eta32 * eta32)
                        return jnp.sum(lor * w32[None], axis=(1, 2))

                    return jax.lax.map(
                        one, (omhi.reshape(-1, OB), omlo.reshape(-1, OB))
                    ).reshape(W)

                d = band(lo) + band(mid) + band(hi)
                return acc + d.astype(jnp.float64)

            # init derives from cosP so that under shard_map the carry is
            # device-varying like the body output (plain zeros are unvarying
            # and fail the while_loop carry-type check); outside shard_map
            # this is a constant-folded no-op
            init = jnp.zeros((W,), jnp.float64) + cosP[0, 0] * 0.0
            return jax.lax.fori_loop(i0, i0 + nsl, body, init)

        return run

    # -- public API ----------------------------------------------------------

    def rung(self, npt, progress=None):
        """DOS partial sums over the full npt^3 grid: returns the (W,) array
        ``sum_k sum_b eta/((omega - e_b(k))^2 + eta^2) / pi`` (caller applies
        the det(B)/npt^3 measure)."""
        S = self.slab
        prepared = self._prepare(npt)
        c1, s1 = _phase_table(npt, self.n1, self.offset[0])
        nrows = -(-npt // S) * S
        cosP = np.zeros((nrows, self.n1))
        sinP = np.zeros((nrows, self.n1))
        cosP[:npt], sinP[:npt] = c1, s1
        rowmask = np.zeros(nrows)
        rowmask[:npt] = 1.0
        omhi = self.omegas.astype(np.float32)
        omlo = (self.omegas - omhi).astype(np.float32)

        if npt not in self._run_cache:
            self._run_cache[npt] = self._make_run(npt)
        run = self._run_cache[npt]

        cosP = jnp.asarray(cosP)
        sinP = jnp.asarray(sinP)
        rowmask = jnp.asarray(rowmask)
        omhi = jnp.asarray(omhi)
        omlo = jnp.asarray(omlo)

        nslab = nrows // S
        acc = np.zeros(self.omegas.size)
        for i0 in range(0, nslab, self.spd):
            nsl = min(self.spd, nslab - i0)
            acc += np.asarray(run(i0, nsl, cosP, sinP, rowmask, omhi, omlo, *prepared))
            if progress is not None:
                progress(i0 + nsl, nslab)
        return acc / np.pi

    def rung_sharded(self, npt, mesh, axis="k"):
        """Pod-parallel rung: outer-dimension grid rows shard over ``mesh``'s
        ``axis`` (the Fourier intermediate replicates — it is O(n1 * npt^2),
        small next to the streamed slabs), per-device slab loops run
        independently, and one ``psum`` over ICI combines the (W,) DOS
        partials.  Exactly the full-grid analogue of the reference's
        ``BatchIntegrand`` distribution hook (``/root/reference/src/batch.jl:5-7``)."""
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        S = self.slab
        ndev = mesh.shape[axis]
        prepared = self._prepare(npt)
        c1, s1 = _phase_table(npt, self.n1, self.offset[0])
        nrows = -(-npt // (S * ndev)) * S * ndev
        cosP = np.zeros((nrows, self.n1))
        sinP = np.zeros((nrows, self.n1))
        cosP[:npt], sinP[:npt] = c1, s1
        rowmask = np.zeros(nrows)
        rowmask[:npt] = 1.0
        omhi = self.omegas.astype(np.float32)
        omlo = (self.omegas - omhi).astype(np.float32)

        run = self._run_cache.setdefault(npt, self._make_run(npt))
        nsl_local = nrows // ndev // S

        @jax.jit
        def sharded(cosP, sinP, rowmask, omhi, omlo, *prepared):
            def local(cosP, sinP, rowmask, omhi, omlo, *prepared):
                d = run(0, nsl_local, cosP, sinP, rowmask, omhi, omlo, *prepared)
                return jax.lax.psum(d, axis)

            spec = [P(axis), P(axis), P(axis), P(), P()] + [P()] * len(prepared)
            return shard_map(local, mesh=mesh, in_specs=tuple(spec),
                             out_specs=P())(cosP, sinP, rowmask, omhi, omlo, *prepared)

        acc = np.asarray(sharded(jnp.asarray(cosP), jnp.asarray(sinP),
                                 jnp.asarray(rowmask), jnp.asarray(omhi),
                                 jnp.asarray(omlo), *prepared))
        return acc / np.pi
