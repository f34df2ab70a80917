"""AuxValue error control through nested BZ integration (the reference's
auxquadgk-inside-IAI workhorse path) and GGR over a generic polyhedral IBZ."""
import jax.numpy as jnp
import numpy as np
import pytest

from autobzcore_tpu import (
    FBZ,
    GGR,
    IAI,
    AuxValue,
    DOSProblem,
    FourierIntegrand,
    IntegralProblem,
    InversionSymIBZ,
    load_bz,
    solve,
)
from autobzcore_tpu.dos import init as dos_init, solve_ as dos_solve_
from autobzcore_tpu.ibz import load_ibz
from autobzcore_tpu.models import tb_integer


def test_auxvalue_through_iai():
    """Green's function with auxiliary spectral weight: both channels of the
    AuxValue converge through the nested adaptive solve."""
    s = tb_integer(2)
    eta = 0.05
    om = 0.3

    def f(v):
        h = jnp.real(v.s[0, 0]) if v.s.ndim == 2 else jnp.real(v.s)
        g = 1.0 / (om + 1j * eta - h)
        return AuxValue(-jnp.imag(g) / jnp.pi, jnp.abs(g) ** 2)

    bz = load_bz(FBZ(), np.eye(2))
    fi = FourierIntegrand(f, s)
    sol = solve(IntegralProblem(fi, bz), IAI(), abstol=1e-4)
    assert sol.retcode
    # dense reference on a fine grid
    u = np.arange(400) / 400
    kx, ky = np.meshgrid(u, u, indexing="ij")
    e = 2 * np.cos(2 * np.pi * kx) + 2 * np.cos(2 * np.pi * ky)
    g = 1.0 / (om + 1j * eta - e)
    vol = (2 * np.pi) ** 2
    assert float(sol.u.val) == pytest.approx(vol * np.mean(-g.imag / np.pi), rel=2e-3)
    assert float(sol.u.aux) == pytest.approx(vol * np.mean(np.abs(g) ** 2), rel=2e-3)


def test_ggr_polyhedral_ibz():
    """GGR DOS over the polyhedral IBZ (48 ops) matches the InversionSymIBZ
    result for the cubic integer lattice."""
    h = tb_integer(3)
    bz_poly = load_ibz(np.eye(3), 2 * np.pi * np.eye(3))
    bz_inv = load_bz(InversionSymIBZ(), np.eye(3))
    assert bz_poly.nsyms == 48
    E = 1.7
    a = float(dos_solve_(dos_init(DOSProblem(h, E, bz_poly), GGR(npt=60))).u)
    b = float(dos_solve_(dos_init(DOSProblem(h, E, bz_inv), GGR(npt=60))).u)
    assert a == pytest.approx(b, rel=1e-10)


def test_auxvalue_through_split_iai():
    """AuxValue channels built from SplitComplex values converge through the
    split-f64 nested solve and match the complex path."""
    from autobzcore_tpu import SplitComplex

    s = tb_integer(2)
    eta = 0.05
    om = 0.3

    def f(v):
        if isinstance(v.s, SplitComplex):
            h = v.s.re[0, 0] if v.s.ndim == 2 else v.s.re
            g = SplitComplex(om - h, jnp.broadcast_to(jnp.asarray(eta), jnp.shape(h)))
            ginv = SplitComplex(jnp.ones_like(h), None) / g
            return AuxValue(-ginv.imag / jnp.pi, ginv.abs2())
        h = jnp.real(v.s[0, 0]) if v.s.ndim == 2 else jnp.real(v.s)
        g = 1.0 / (om + 1j * eta - h)
        return AuxValue(-jnp.imag(g) / jnp.pi, jnp.abs(g) ** 2)

    bz = load_bz(FBZ(), np.eye(2))
    fi = FourierIntegrand(f, s)
    ref = solve(IntegralProblem(fi, bz), IAI(), abstol=1e-6)
    sol = solve(IntegralProblem(fi, bz), IAI(precision="split"), abstol=1e-6)
    assert sol.retcode
    assert float(sol.u.val) == pytest.approx(float(ref.u.val), abs=1e-10)
    assert float(sol.u.aux) == pytest.approx(float(ref.u.aux), abs=1e-8)


def test_nest_presplit_breaks_gk_aliasing():
    """A single-segment GK estimate can be DECEIVED by structure that
    aliases through its nodes: the 2D integer-lattice DOS at omega~0.905,
    eta=0.1 certifies abstol=1e-4 with resid 7e-5 while its TRUE error is
    2.8e-3.  nest_presplit=3 (the initdiv-style robustness knob, reference
    HCubatureJL's initdiv at src/algorithms.jl:99) breaks the aliasing and
    lands within the certificate of the dense-PTR truth — at FEWER evals.
    Note P=2 does NOT help: dyadic splits preserve the aliasing symmetry."""
    import numpy as np

    from autobzcore_tpu import (FBZ, IAI, PTR, FourierIntegrand,
                                IntegralProblem, load_bz, solve)
    from autobzcore_tpu.models import tb_integer
    from autobzcore_tpu.models.observables import dos_trace

    bz = load_bz(FBZ(), 2 * np.pi * np.eye(2))
    fi = FourierIntegrand(dos_trace, tb_integer(2), eta=0.1)
    om = 0.9047619047619049
    truth = float(np.asarray(solve(IntegralProblem(fi, bz, om),
                                   PTR(npt=256)).u))
    plain = solve(IntegralProblem(fi, bz, om),
                  IAI(inner_cap=64, inner_nbisect=2), abstol=1e-4)
    # the deception: certified but wrong (documents the failure mode the
    # knob exists for — if adaptive improvements ever fix this, tighten me)
    assert abs(float(np.asarray(plain.u)) - truth) > 1e-3
    robust = solve(IntegralProblem(fi, bz, om),
                   IAI(inner_cap=64, inner_nbisect=2, nest_presplit=3),
                   abstol=1e-4)
    assert robust.retcode
    assert abs(float(np.asarray(robust.u)) - truth) < 2e-4
