from .interfaces import DOSProblem, DOSSolution, DOSCache, DOSAlgorithm, init, solve, solve_
from .ggr import GGR
from .tetrahedron import LTM, AdaptiveGaussianBroadening
from .fullgrid import LorentzianFullGrid

__all__ = ["DOSProblem", "DOSSolution", "DOSCache", "DOSAlgorithm", "GGR", "LTM",
           "AdaptiveGaussianBroadening", "LorentzianFullGrid", "init", "solve", "solve_"]
