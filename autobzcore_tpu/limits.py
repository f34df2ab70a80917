"""Iterated integration limits.

Native equivalent of the IteratedIntegration.jl limits protocol the reference
consumes (observed surface: ``limit_iterate``/``fixandeliminate``/
``interior_point``, reference ``src/algorithms.jl:458-579``,
``src/brillouin.jl:4,267,304``):

- ``CubicLimits(a, b)``: axis-aligned box.
- ``TetrahedralLimits(s)``: the cubic-symmetry wedge
  ``0 <= x_1 <= x_2 <= ... <= x_d <= s`` (reference ``src/brillouin.jl:297-307``
  uses it for ``CubicSymIBZ``).
- ``PolyhedralLimits``: general convex polytopes for the IBZ extension (see
  :mod:`autobzcore_tpu.ibz`).

Integration fixes the *last* variable first (dim d down to 1), matching the
reference.  ``fix(x)`` may receive traced values: the sliced limits carry
device scalars, which is how irregular wedge/polytope geometry stays inside
the compiled nested solve.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class IteratedLimits:
    pass


class CubicLimits(IteratedLimits):
    """Axis-aligned box as iterated limits (IteratedIntegration
    ``CubicLimits`` surface)."""

    def __init__(self, a, b):
        self.a = tuple(np.atleast_1d(np.asarray(a, dtype=np.float64)))
        self.b = tuple(np.atleast_1d(np.asarray(b, dtype=np.float64)))
        if len(self.a) != len(self.b):
            raise ValueError("CubicLimits endpoints must have equal length")

    @property
    def ndim(self):
        return len(self.a)

    def outer_segments(self):
        return jnp.asarray([self.a[-1], self.b[-1]])

    def fix(self, x):
        return CubicLimits(self.a[:-1], self.b[:-1])

    def interior_point(self):
        return np.array([(ai + bi) / 2 for ai, bi in zip(self.a, self.b)])

    def __eq__(self, other):
        return (
            isinstance(other, CubicLimits)
            and self.a == other.a
            and self.b == other.b
        )

    def __repr__(self):
        return f"CubicLimits({self.a}, {self.b})"


class TetrahedralLimits(IteratedLimits):
    """Wedge ``0 <= x_1 <= ... <= x_d <= s``; after fixing ``x_d = t`` the
    remaining region is the (d-1)-wedge with upper corner ``t``."""

    def __init__(self, s, ndim=None):
        if np.ndim(s) == 1 or isinstance(s, (tuple, list)):
            s_arr = np.asarray(s)
            if not np.allclose(s_arr, s_arr.reshape(-1)[0]):
                raise ValueError("TetrahedralLimits currently requires equal corner coordinates")
            ndim = len(s_arr)
            s = s_arr.reshape(-1)[0]
        if ndim is None:
            raise ValueError("TetrahedralLimits(s, ndim) requires ndim for scalar s")
        self.s = s  # may be traced
        self._ndim = int(ndim)

    @property
    def ndim(self):
        return self._ndim

    def outer_segments(self):
        return jnp.stack([jnp.zeros_like(jnp.asarray(self.s, jnp.result_type(float))),
                          jnp.asarray(self.s, jnp.result_type(float))])

    def fix(self, x):
        return TetrahedralLimits(x, self._ndim - 1)

    def interior_point(self):
        s = float(self.s) if np.ndim(self.s) == 0 and not hasattr(self.s, "aval") else 0.5
        # nested midpoints of the wedge
        return np.array([s * (i + 1) / (self._ndim + 1) for i in range(self._ndim)])

    def __eq__(self, other):
        return (
            isinstance(other, TetrahedralLimits)
            and self._ndim == other._ndim
            and np.allclose(self.s, other.s)
        )

    def __repr__(self):
        return f"TetrahedralLimits({self.s}, ndim={self._ndim})"


def load_limits(polyhedron):
    """Build iterated limits from a convex polyhedron (half-space or vertex
    data) — native equivalent of ``IteratedIntegration.load_limits``
    (reference ``ext/SymmetryReduceBZExt.jl:95-115``)."""
    from .ibz.polyhedron import PolyhedralLimits

    return PolyhedralLimits(polyhedron)
