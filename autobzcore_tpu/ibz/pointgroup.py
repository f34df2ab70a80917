"""Crystallographic point-group detection (host side).

Native replacement for the symmetry-discovery role SymmetryReduceBZ.jl plays
in the reference's IBZ extension (``ext/SymmetryReduceBZExt.jl:95-112``).

Standard algorithm: candidate rotations are the integer matrices W (lattice
basis) with entries in {-1, 0, 1} that preserve the metric G = A^T A; the
crystal's point group keeps those W for which some translation t maps the
atomic basis onto itself (species-matched, modulo lattice translations).
"""
from __future__ import annotations

from itertools import product

import numpy as np


def lattice_pointgroup(A, tol=1e-8):
    """All integer lattice-basis rotations preserving the metric of ``A``.

    Returns (N, d, d) int array (N <= 48 for d=3)."""
    A = np.asarray(A, dtype=np.float64)
    d = A.shape[0]
    G = A.T @ A
    ops = []
    for entries in product((-1, 0, 1), repeat=d * d):
        W = np.array(entries, dtype=np.int64).reshape(d, d)
        if abs(round(np.linalg.det(W))) != 1:
            continue
        if np.allclose(W.T @ G @ W, G, atol=tol * np.linalg.norm(G)):
            ops.append(W)
    return np.array(ops)


def crystal_pointgroup(A, species=None, positions=None, tol=1e-5):
    """Point group of the crystal (A, species, positions).

    ``positions``: (natoms, d) fractional coordinates; ``species``: length-
    natoms labels.  Without an atomic basis, returns the full lattice point
    group (the holohedry).
    """
    ops = lattice_pointgroup(A)
    if species is None or positions is None or len(np.atleast_1d(species)) == 0:
        return ops
    pos = np.asarray(positions, dtype=np.float64) % 1.0
    species = np.asarray(species)
    keep = []
    for W in ops:
        mapped = (pos @ W.T) % 1.0
        if _basis_maps(mapped, pos, species, tol):
            keep.append(W)
    return np.array(keep)


def _basis_maps(mapped, pos, species, tol):
    """Is there a translation t with mapped + t == pos (as sets, per species)?"""
    s0 = species[0]
    for j in np.nonzero(species == s0)[0]:
        t = (pos[j] - mapped[0]) % 1.0
        shifted = (mapped + t) % 1.0
        if _same_set(shifted, pos, species, tol):
            return True
    return False


def _same_set(a, b, species, tol):
    used = np.zeros(len(b), dtype=bool)
    for i in range(len(a)):
        diff = np.abs(a[i] - b) % 1.0
        diff = np.minimum(diff, 1.0 - diff)
        match = (np.max(diff, axis=1) < tol) & (species == species[i]) & ~used
        j = np.nonzero(match)[0]
        if len(j) == 0:
            return False
        used[j[0]] = True
    return True
