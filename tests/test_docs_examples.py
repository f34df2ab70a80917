"""Reproduce the reference documentation's worked examples and anchor values
(reference ``docs/src/examples.md:60,105``): the local Green's function of the
1D and 2D integer lattices."""
import jax.numpy as jnp
import numpy as np
import pytest

from autobzcore_tpu import (
    FBZ,
    IAI,
    FourierIntegrand,
    FourierSeries,
    IntegralProblem,
    IntegralSolver,
    ParameterIntegrand,
    QuadGKJL,
    load_bz,
)


def test_gloc_1d_anchor():
    """H(k) = cos(2 pi k), eta = 0.1: gloc(0) = -0.9950375451895513 i."""
    h = FourierSeries(np.array([0.5, 0.0, 0.5]), period=1.0, offset=-1)

    def gloc_integrand(k, h, eta=None, om=None):
        return 1.0 / ((om + 1j * eta) - h(jnp.atleast_1d(k)))

    integrand = ParameterIntegrand(gloc_integrand, h, eta=0.1)
    prob = IntegralProblem(integrand, 0.0, 1.0)
    gloc = IntegralSolver(prob, QuadGKJL(), abstol=1e-3)
    val = np.complex128(gloc(om=0.0))
    assert val.imag == pytest.approx(-0.9950375451895513, abs=1e-3)
    assert abs(val.real) < 1e-10


def test_gloc_2d_iai_anchor():
    """H(k) = cos(2 pi kx) + cos(2 pi ky): gloc(0) = -1.3941704019631334 i
    through IAI over the FBZ with A = 2 pi I."""
    C = np.array([[0.0, 0.5, 0.0], [0.5, 0.0, 0.5], [0.0, 0.5, 0.0]])
    h = FourierSeries(C, period=1.0, offset=(-1, -1))

    def gloc_integrand(hk, eta=None, om=None):
        s = hk.s
        return 1.0 / ((om + 1j * eta) - s)

    integrand = FourierIntegrand(gloc_integrand, h, eta=0.1)
    bz = load_bz(FBZ(), 2 * np.pi * np.eye(2))
    gloc = IntegralSolver(IntegralProblem(integrand, bz), IAI(), abstol=1e-3)
    val = np.complex128(gloc(om=0.0))
    assert val.imag == pytest.approx(-1.3941704019631334, abs=1e-3)
    assert abs(val.real) < 1e-8
