"""Device-parallel parameter sweeps.

TPU-native replacement for the reference's threaded ``batchsolve``
(``src/interfaces.jl:199-241``): instead of round-robining parameters over
threads with per-thread deepcopies, the whole sweep becomes one vmapped (and
optionally mesh-sharded) XLA program.  The omega-grid of a spectral-function
sweep is the natural data-parallel axis (cf. reference ``docs/src/dos.md:38-42``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..algorithms.base import effective_tolerances
from ..interfaces import IntegralProblem, init


def sweep_solve(prob: IntegralProblem, alg, ps, abstol=None, reltol=None, mesh=None, axis="p"):
    """Solve ``prob`` at every parameter in the stacked pytree ``ps`` (leading
    axis = sweep axis) in one batched program.

    Returns ``(us, resids)`` with the sweep axis leading.  With ``mesh``, the
    parameter axis is sharded over ``mesh.axis_names[0]`` and results are
    gathered (data-parallel over omega/temperature/chemical-potential grids).
    """
    cache = init(prob, alg)
    fn = alg.solve_fn(cache.cacheval)
    atol, rtol = effective_tolerances(abstol, reltol)

    from ..interfaces import _takes_mixed_parameters
    from ..parameters import merge_parameters

    if _takes_mixed_parameters(prob.f):
        preset = cache.p  # integrand-preset parameters resolved at init

        def one(p):
            return fn(merge_parameters(preset, p), atol, rtol)
    else:
        def one(p):
            return fn(p, atol, rtol)

    batched = jax.jit(jax.vmap(one))
    if mesh is not None:
        sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
        ps = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), ps
        )
    return batched(ps)


def make_mesh(n_devices=None, axis_names=("p",), devices=None):
    """Build a 1D device mesh for sweep parallelism."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names)
