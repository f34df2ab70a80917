"""Integration domains.

Native equivalents of the reference's domain layer (reference
``src/domains.jl``): ``PuncturedInterval`` (interval with interior breakpoints
the integrator must not straddle, ``src/domains.jl:8``) and ``HyperCube``
(``src/domains.jl:22``), plus ``Basis`` — the lattice-basis domain consumed by
the periodic-trapezoidal-rule algorithms (observed surface of
``AutoSymPTR.Basis``, cf. reference ``src/algorithms.jl:348-356``).

Domains are host-side (static) objects: their endpoints shape the compiled
program, so they are plain numpy data rather than traced values.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np


class Domain:
    pass


class PuncturedInterval(Domain):
    """Interval ``(a, b)`` with deleted interior points ``s = (a, c1, ..., cN, b)``."""

    def __init__(self, s):
        s = tuple(float(x) for x in np.asarray(s).reshape(-1))
        if len(s) < 2:
            raise ValueError("PuncturedInterval needs at least two points")
        self.s = s

    @property
    def segments(self) -> Tuple[float, ...]:
        return self.s

    @property
    def endpoints(self):
        return (self.s[0], self.s[-1])

    @property
    def ndim(self):
        return 1

    def __repr__(self):
        return f"PuncturedInterval{self.s}"


class HyperCube(Domain):
    """Axis-aligned box spanned by vertices ``a``, ``b``."""

    def __init__(self, a, b):
        self.a = np.atleast_1d(np.asarray(a, dtype=np.float64))
        self.b = np.atleast_1d(np.asarray(b, dtype=np.float64))
        if self.a.shape != self.b.shape:
            raise ValueError("HyperCube endpoints must have the same length")

    @property
    def endpoints(self):
        return (self.a, self.b)

    @property
    def ndim(self):
        return self.a.shape[0]

    def __repr__(self):
        return f"HyperCube({self.a}, {self.b})"


class Basis(Domain):
    """Lattice basis domain: integrate over the parallelepiped spanned by the
    columns of ``B`` (periodic trapezoidal rules sample fractional coordinates
    in ``[0,1)^d`` and map through ``B``)."""

    def __init__(self, B):
        B = np.asarray(B, dtype=np.float64)
        if B.ndim == 0:
            B = B.reshape(1, 1)
        elif B.ndim == 1:
            B = np.diag(B)
        if B.shape[0] != B.shape[1]:
            raise ValueError("Basis matrix must be square")
        self.B = B

    @property
    def ndim(self):
        return self.B.shape[0]

    @property
    def volume(self):
        return abs(np.linalg.det(self.B))

    def __repr__(self):
        return f"Basis({self.B})"


def interval_or_cube(a, b):
    """Reference ``IntegralProblem(f, a, b)`` domain promotion
    (``src/interfaces.jl:44-46``): scalars become a PuncturedInterval, vectors a
    HyperCube."""
    a_arr = np.asarray(a)
    if a_arr.ndim == 0:
        return PuncturedInterval((float(a), float(b)))
    return HyperCube(a, b)
