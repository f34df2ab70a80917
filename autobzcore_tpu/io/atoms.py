"""Load Brillouin zones from atomic-structure objects.

Native equivalent of the reference's AtomsBase extension
(``ext/AtomsBaseExt.jl``): accept any ASE-like atoms object (duck-typed on
``cell``/``get_positions``/``get_chemical_symbols`` or
``cell``/``positions``/``species``) or explicit (cell, species, positions)
data, and build the requested BZ kind.
"""
from __future__ import annotations

import numpy as np


def atoms_data(system):
    """Extract (A columns-as-lattice-vectors, species, fractional positions)."""
    if isinstance(system, dict):
        A = np.asarray(system["cell"], dtype=np.float64).T
        species = list(system["species"])
        pos = np.asarray(system["positions"], dtype=np.float64)
        frac = pos if system.get("fractional", True) else pos @ np.linalg.inv(A.T)
        return A, species, frac
    if hasattr(system, "get_chemical_symbols"):  # ASE-like
        A = np.asarray(system.cell, dtype=np.float64).T  # ASE rows -> columns
        species = list(system.get_chemical_symbols())
        frac = np.asarray(system.get_scaled_positions())
        return A, species, frac
    if hasattr(system, "species") and hasattr(system, "positions"):
        A = np.asarray(system.cell, dtype=np.float64).T
        species = list(system.species)
        frac = np.asarray(system.positions)
        return A, species, frac
    raise TypeError(f"cannot extract atoms data from {type(system).__name__}")


def load_bz_from_atoms(kind, system, atol=None):
    """``load_bz`` for an atomic system (reference ``ext/AtomsBaseExt.jl:14-35``)."""
    from ..brillouin import IBZ, load_bz

    A, species, frac = atoms_data(system)
    if isinstance(kind, IBZ):
        return load_bz(kind, A, species=species, positions=frac, atol=atol)
    return load_bz(kind, A, atol=atol)
