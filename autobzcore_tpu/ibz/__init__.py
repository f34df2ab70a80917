"""Irreducible Brillouin zone construction from crystal symmetry.

Native equivalent of reference ``ext/SymmetryReduceBZExt.jl``: detect the
crystal point group, build the IBZ as a convex polytope, and return a
:class:`SymmetricBZ` whose limits support iterated adaptive integration and
whose symmetries drive PTR grid reduction.
"""
from __future__ import annotations

import numpy as np

from .pointgroup import crystal_pointgroup, lattice_pointgroup
from .polyhedron import ConvexPolytope, PolyhedralLimits, ibz_polytope, wigner_seitz

__all__ = [
    "load_ibz",
    "crystal_pointgroup",
    "lattice_pointgroup",
    "ibz_polytope",
    "wigner_seitz",
    "ConvexPolytope",
    "PolyhedralLimits",
]


def load_ibz(A, B, species=None, positions=None):
    """Build the irreducible BZ for the crystal (A, species, positions).

    Point ops detected in the direct lattice basis map to reciprocal
    fractional coordinates as W -> W^{-T} (both integer for unimodular W).
    """
    from ..brillouin import SymmetricBZ

    A = np.asarray(A, dtype=np.float64)
    d = A.shape[0]
    W = crystal_pointgroup(A, species, positions)
    S = np.array([np.round(np.linalg.inv(w).T).astype(np.int64) for w in W])
    poly = ibz_polytope(B, S)
    lims = PolyhedralLimits(poly)
    return SymmetricBZ(A, B, lims, S)
