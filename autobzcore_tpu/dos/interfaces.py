"""Density-of-states problem family.

Native equivalent of reference ``src/dos_interfaces.jl``: ``DOSProblem``
(``:33``) for ``D(E) = sum_k sum_lambda delta(E - lambda(H(k)))``, the mutable
``DOSCache`` with ``isfresh`` invalidation when ``H`` is replaced
(``:49-64``), and the same ``init``/``solve!`` verbs.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from ..interfaces import checkkwargs
from ..parameters import NullParameters


class DOSAlgorithm:
    def init_cacheval(self, h, domain, p):
        return None

    def dos_solve(self, h, domain, p, cacheval, abstol=None, reltol=None, maxiters=None):
        raise NotImplementedError


class DOSProblem:
    """Density-of-states problem: operator ``H(p)``, spectral ``domain``,
    parameters ``p`` (reference ``src/dos_interfaces.jl:33``)."""

    def __init__(self, H, domain, p=NullParameters()):
        self.H = H
        self.domain = domain
        self.p = p


@dataclass
class DOSSolution:
    u: Any
    err: Any
    retcode: bool
    numevals: int = -1


class DOSCache:
    """Mutable cache; assigning ``cache.H`` marks it stale so the next
    ``solve_`` rebuilds the spectral data (reference ``src/dos_interfaces.jl:59-64``)."""

    def __init__(self, H, domain, p, alg, cacheval, kwargs):
        object.__setattr__(self, "isfresh", False)
        object.__setattr__(self, "H", H)
        self.domain = domain
        self.p = p
        self.alg = alg
        self.cacheval = cacheval
        self.kwargs = kwargs

    def __setattr__(self, name, value):
        if name == "H":
            object.__setattr__(self, "isfresh", True)
        object.__setattr__(self, name, value)


def init(prob: DOSProblem, alg: DOSAlgorithm, **kwargs) -> DOSCache:
    checkkwargs(kwargs)
    cacheval = alg.init_cacheval(prob.H, prob.domain, prob.p)
    return DOSCache(prob.H, prob.domain, prob.p, alg, cacheval, kwargs)


def solve(prob: DOSProblem, alg: DOSAlgorithm, **kwargs) -> DOSSolution:
    return solve_(init(prob, alg, **kwargs))


def solve_(cache: DOSCache) -> DOSSolution:
    if cache.isfresh:
        cache.cacheval = cache.alg.init_cacheval(cache.H, cache.domain, cache.p)
        object.__setattr__(cache, "isfresh", False)
    return cache.alg.dos_solve(cache.H, cache.domain, cache.p, cache.cacheval, **cache.kwargs)
