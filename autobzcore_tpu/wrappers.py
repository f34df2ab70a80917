"""Integrand wrapper protocol.

Native equivalents of the reference's cross-cutting integrand wrappers
(reference ``src/inplace.jl``, ``src/batch.jl``) plus ``AuxValue`` (observed
surface of ``IteratedIntegration.AuxValue``; used for auxiliary error control,
cf. reference ``src/algorithms.jl:202-240`` and ``src/brillouin.jl:113``).

Under JAX's functional model the wrappers change *calling convention*, not
memory management:

- ``InplaceIntegrand(f, prototype)``: ``f(y, x, p)`` receives a zero array
  ``y`` with the declared result shape and must *return* the filled array
  (functional in-place, via ``y.at[...]`` updates or plain construction).  The
  prototype replaces the reference's probe-evaluation cache typing
  (``src/algorithms.jl:40-66``) with an explicit shape/dtype declaration.
- ``BatchIntegrand(f, max_batch)``: ``f(xs, p)`` evaluates a whole panel of
  quadrature nodes (leading axis) at once.  Every adaptive driver here is
  batched, so this wrapper simply bypasses the internal ``vmap`` for users
  whose kernels batch better by hand (reference ``src/batch.jl:10``).
- ``NestedBatchIntegrand``: accepted for API parity; JAX needs no per-thread
  worker replicas (reference ``src/batch.jl:50``), so it behaves as a
  ``BatchIntegrand``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class InplaceIntegrand:
    """``f(y, x, p) -> y``: functional in-place integrand with a declared
    result prototype (shape/dtype), replacing probe evaluation."""

    def __init__(self, f, result_prototype):
        self.f = f
        self.result_prototype = result_prototype

    def to_pure(self):
        proto = self.result_prototype

        def pure(x, p):
            y = jnp.zeros(jnp.shape(proto), dtype=jnp.result_type(proto))
            return self.f(y, x, p)

        return pure


class BatchIntegrand:
    """``f(xs, p) -> ys`` evaluating many nodes at once; ``xs`` leaves carry a
    leading batch axis, as do the returned ``ys`` leaves."""

    def __init__(self, f, max_batch=None):
        self.f = f
        self.max_batch = max_batch


class NestedBatchIntegrand(BatchIntegrand):
    """API-parity alias of :class:`BatchIntegrand`: JAX needs no per-thread
    worker replicas (reference ``src/batch.jl:50``)."""

    def __init__(self, f, max_batch=None):
        super().__init__(f, max_batch)


@jax.tree_util.register_pytree_node_class
class AuxValue:
    """Integral value with an auxiliary component used for error control.

    The adaptive Gauss-Kronrod driver tracks the error of ``val`` and ``aux``
    separately and refines until *both* satisfy the tolerance, which is the
    behavior the reference exercises through ``auxquadgk``
    (``src/algorithms.jl:202-240``).
    """

    def __init__(self, val, aux):
        self.val = val
        self.aux = aux

    def tree_flatten(self):
        return (self.val, self.aux), None

    @classmethod
    def tree_unflatten(cls, aux_data, children):
        return cls(*children)

    def __add__(self, other):
        if isinstance(other, AuxValue):
            return AuxValue(self.val + other.val, self.aux + other.aux)
        return NotImplemented

    def __mul__(self, s):
        return AuxValue(self.val * s, self.aux * s)

    __rmul__ = __mul__

    def __repr__(self):
        return f"AuxValue(val={self.val!r}, aux={self.aux!r})"


def batch_eval_fn(f, in_ndim=0):
    """Return ``g(xs, p) -> ys`` evaluating ``f`` on a panel of nodes.

    ``xs`` has shape ``(B,)`` for 1D domains (``in_ndim=0``) or ``(B, d)``
    (``in_ndim=1``).  Dispatches on the wrapper protocol: BatchIntegrands are
    called directly; everything else goes through ``jax.vmap``.
    """
    if isinstance(f, BatchIntegrand):
        return f.f
    if isinstance(f, InplaceIntegrand):
        g = f.to_pure()
    else:
        g = f
    return jax.vmap(g, in_axes=(0, None))


def unwrap_integrand(f):
    """Plain pointwise callable for probe evaluations / fixed rules."""
    if isinstance(f, InplaceIntegrand):
        return f.to_pure()
    if isinstance(f, BatchIntegrand):
        def pointwise(x, p):
            xs = jax.tree_util.tree_map(lambda v: jnp.asarray(v)[None], x)
            ys = f.f(xs, p)
            return jax.tree_util.tree_map(lambda v: v[0], ys)

        return pointwise
    return f
