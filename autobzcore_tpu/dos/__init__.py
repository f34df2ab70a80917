from .interfaces import DOSProblem, DOSSolution, DOSCache, DOSAlgorithm, init, solve, solve_
from .ggr import GGR

__all__ = ["DOSProblem", "DOSSolution", "DOSCache", "DOSAlgorithm", "GGR", "init", "solve", "solve_"]
