"""Unit handling helpers.

The reference supports unitful lattices through a Unitful.jl extension whose
entire job is stripping units before kernels run (``ext/UnitfulExt.jl:6-10``)
and scaling tolerances/domains consistently (``src/algorithms.jl:76-79``).
JAX arrays are unitless, so the native design is explicit: carry a scale per
quantity, strip it entering the solver, reapply leaving.  These helpers make
that pattern one-liners and interoperate with pint-style quantities
(duck-typed on ``.magnitude``/``.units``) when a user has them installed.
"""
from __future__ import annotations

import numpy as np


def strip_units(x):
    """Return (magnitude, units_or_None) for pint-like quantities, else (x, None)."""
    if hasattr(x, "magnitude") and hasattr(x, "units"):
        return x.magnitude, x.units
    return x, None


def reapply_units(x, units):
    return x if units is None else x * units


def canonical_reciprocal_basis_unitful(A):
    """Reference ``canonical_reciprocal_basis`` for unitful lattices: strips
    units, computes 2 pi inv(A)^T, reattaches inverse units."""
    mag, units = strip_units(A)
    B = 2 * np.pi * np.linalg.inv(np.asarray(mag, dtype=np.float64)).T
    return B if units is None else B * (1 / units)
