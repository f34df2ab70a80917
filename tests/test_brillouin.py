"""BZ layer tests, mirroring reference ``test/brillouin.jl``: SymmetricBZ
construction, volume identities for all BZ algorithms, MixedParameters merge
algebra, IntegralSolver and batchsolve interfaces."""
import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from autobzcore_tpu import (
    FBZ,
    IAI,
    PTR,
    TAI,
    AutoPTR,
    CubicLimits,
    CubicSymIBZ,
    EvalCounter,
    IntegralProblem,
    IntegralSolver,
    InversionSymIBZ,
    MixedParameters,
    ParameterIntegrand,
    QuadGKJL,
    TetrahedralLimits,
    TrivialRep,
    batchsolve,
    canonical_reciprocal_basis,
    load_bz,
    nsyms,
    paramproduct,
    paramzip,
    solve,
)
from autobzcore_tpu.parameters import merge_parameters


class TestSymmetricBZ:
    def test_load_bz(self):
        dims = 3
        A = np.eye(dims)
        B = canonical_reciprocal_basis(A)
        fbz = load_bz(FBZ(), A)
        assert np.allclose(fbz.A, A)
        assert np.allclose(fbz.B, B)
        assert nsyms(fbz) == 1
        assert fbz.lims == CubicLimits(np.zeros(3), np.ones(3))

        ibz = load_bz(InversionSymIBZ(), A)
        assert nsyms(ibz) == 2**dims
        assert all(np.allclose(S, np.diag(np.diag(S))) for S in ibz.syms)
        assert ibz.lims == CubicLimits(np.zeros(3), 0.5 * np.ones(3))

        cbz = load_bz(CubicSymIBZ(), A)
        assert nsyms(cbz) == 2**dims * 6
        assert cbz.lims == TetrahedralLimits(0.5, 3)


class TestBZAlgorithms:
    @pytest.mark.parametrize("bzkind", [FBZ(), InversionSymIBZ()])
    @pytest.mark.parametrize("algname", ["IAI", "TAI", "PTR", "AutoPTR"])
    def test_unit_measure(self, bzkind, algname):
        """Integral of 1 over the BZ = (2 pi)^d for every algorithm
        (reference ``test/brillouin.jl:33-44``)."""
        dims = 3
        vol = (2 * np.pi) ** dims
        bz = load_bz(bzkind, np.eye(dims))
        alg = {"IAI": IAI, "TAI": TAI, "PTR": PTR, "AutoPTR": AutoPTR}[algname]()

        def f(x, p):
            return jnp.asarray(1.0)

        sol = solve(IntegralProblem(f, bz), alg)
        assert float(sol.u) == pytest.approx(vol, rel=1e-6)

    def test_infinite_interval(self):
        """(-inf, inf) Gaussian through QuadGKJL (reference
        ``test/brillouin.jl:42``) via the built-in t/(1-t^2) transform."""
        sol = solve(
            IntegralProblem(lambda x, p: jnp.exp(-(x**2)), -np.inf, np.inf),
            QuadGKJL(), abstol=1e-8,
        )
        assert float(sol.u) == pytest.approx(np.sqrt(np.pi), abs=1e-6)

    def test_semi_infinite_interval(self):
        sol = solve(
            IntegralProblem(lambda x, p: jnp.exp(-x), 0.0, np.inf),
            QuadGKJL(), abstol=1e-10,
        )
        assert float(sol.u) == pytest.approx(1.0, abs=1e-8)
        sol = solve(
            IntegralProblem(lambda x, p: jnp.exp(x), -np.inf, 0.0),
            QuadGKJL(), abstol=1e-10,
        )
        assert float(sol.u) == pytest.approx(1.0, abs=1e-8)


class TestInterfaces:
    def test_mixed_parameters(self):
        p = MixedParameters(1, 2)
        q = MixedParameters(a="a", b="b")
        for pq in (merge_parameters(p, q), merge_parameters(p, {"a": "a", "b": "b"})):
            assert pq[0] == 1 and pq[1] == 2
            assert pq.a == "a" and pq.b == "b"
        assert merge_parameters(p, 3)[2] == 3
        assert merge_parameters(q, 3)[0] == 3
        assert merge_parameters(p, {"a": "c"}).a == "c"

    def test_integral_solver(self):
        f = lambda x, p: p * jnp.ones_like(x)
        prob = IntegralProblem(f, 0.0, 1.0, 33.0)
        solver = IntegralSolver(prob, QuadGKJL())
        assert float(solver(0.81)) == pytest.approx(
            float(solve(IntegralProblem(f, 0.0, 1.0, 0.81), QuadGKJL()).u)
        )

    def test_integral_solver_bz(self):
        dims = 3
        bz = load_bz(FBZ(), np.eye(dims))
        f = lambda x, p: p * jnp.asarray(1.0)
        prob = IntegralProblem(f, bz, 0.81)
        solver = IntegralSolver(IntegralProblem(f, bz), IAI())
        assert float(solver(0.81)) == pytest.approx(float(solve(prob, IAI()).u), rel=1e-9)

    def test_parameter_integrand(self):
        def f(x, a, b=None):
            return a * x + b

        pi = ParameterIntegrand(f, 1.3, b=4.2)
        from autobzcore_tpu import NullParameters

        assert float(pi(6.7, NullParameters())) == pytest.approx(f(6.7, 1.3, b=4.2))
        assert float(ParameterIntegrand(f)(6.7, MixedParameters(1.3, b=4.2))) == pytest.approx(
            f(6.7, 1.3, b=4.2)
        )
        prob = IntegralProblem(ParameterIntegrand(f, 1.3, b=4.2), 0.0, 1.0)
        u = IntegralSolver(prob, QuadGKJL())()
        v = IntegralSolver(ParameterIntegrand(f), 0.0, 1.0, QuadGKJL())(1.3, b=4.2)
        w = IntegralSolver(ParameterIntegrand(f, b=4.2), 0.0, 1.0, QuadGKJL())(1.3)
        assert float(u) == pytest.approx(float(v)) == pytest.approx(float(w))
        sol = solve(prob, EvalCounter(QuadGKJL(order=7)))
        assert sol.numevals == 15

    def test_batchsolve(self):
        prob = IntegralProblem(lambda x, p: p * jnp.ones_like(x), 0.0, 1.0)
        solver = IntegralSolver(prob, QuadGKJL())
        params = np.linspace(1, 2, 3)
        assert [float(solver(p)) for p in params] == [float(u) for u in batchsolve(solver, params)]

        def f(x, a, b=None):
            return a * x + b

        solver = IntegralSolver(ParameterIntegrand(f), 0.0, 1.0, QuadGKJL())
        a_vals = np.random.rand(3)
        b_vals = np.random.rand(3)
        direct = [float(solver(a, b=b)) for a, b in zip(a_vals, b_vals)]
        batch = [float(u) for u in batchsolve(solver, paramzip(a_vals, b=b_vals))]
        assert direct == pytest.approx(batch)
        prod_direct = [
            float(solver(a, b=b)) for a in a_vals for b in b_vals
        ]
        prod_batch = [float(u) for u in batchsolve(solver, paramproduct(a_vals, b=b_vals).reshape(-1))]
        assert prod_direct == pytest.approx(prod_batch)

    def test_unknown_rep_fallback(self):
        """Non-scalar result + unknown symmetry rep -> warn and recompute on
        the full BZ (reference ``src/brillouin.jl:346-351``)."""
        bz = load_bz(InversionSymIBZ(), np.eye(2))

        def f(x, p):
            return jnp.ones(2)  # vector-valued, rep unknown

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            sol = solve(IntegralProblem(f, bz), PTR(npt=10))
            assert any("full BZ" in str(x.message) for x in w)
        assert np.allclose(np.asarray(sol.u), (2 * np.pi) ** 2)

    def test_trivial_rep_integrand(self):
        bz = load_bz(InversionSymIBZ(), np.eye(2))

        class F:
            rep = TrivialRep()

            def __call__(self, x, p):
                return jnp.ones(2)

        sol = solve(IntegralProblem(F(), bz), PTR(npt=10))
        assert np.allclose(np.asarray(sol.u), (2 * np.pi) ** 2)


class TestMultiAlgorithms:
    def test_ptr_iai(self):
        from autobzcore_tpu import PTR_IAI, AutoPTR_IAI

        bz = load_bz(InversionSymIBZ(), np.eye(2))
        f = lambda x, p: jnp.asarray(1.0)
        for alg in (PTR_IAI(), AutoPTR_IAI()):
            sol = solve(IntegralProblem(f, bz), alg, reltol=1e-4)
            assert float(sol.u) == pytest.approx((2 * np.pi) ** 2, rel=1e-4)

    def test_nested_quad_mixed_algorithms(self):
        from autobzcore_tpu import AuxQuadGKJL, NestedQuad, QuadratureFunction

        dom = CubicLimits(np.zeros(2), 2 * np.pi * np.ones(2))
        f = lambda x, p: 1.0 + jnp.sum(jnp.cos(x))
        alg = NestedQuad((QuadratureFunction(npt=64), AuxQuadGKJL()))
        sol = solve(IntegralProblem(f, dom), alg, abstol=1e-6)
        assert float(sol.u) == pytest.approx((2 * np.pi) ** 2, abs=1e-4)


class TestAutoPTRParity:
    """Reference AutoPTR semantics (``src/algorithms.jl:393-432``,
    ``src/brillouin.jl:116-144,421-444``)."""

    def test_npt_schedule(self):
        from autobzcore_tpu import AutoSymPTRJL

        # defaults: npt0 = clamp(round(n0/a), nmin, nmax) = 50, step exp(dn)/a = 10
        assert AutoSymPTRJL(nmax=90).npt_ladder() == [50, 60, 70, 80, 90]
        # a = localization ratio: halving a doubles the step and raises npt0
        alg = AutoSymPTRJL(a=0.5, nmin=10, nmax=60)
        assert alg.npt_ladder() == [12, 32, 52, 60]
        # keepmost widens the error window but never changes the schedule
        assert AutoSymPTRJL(nmax=70, keepmost=4).npt_ladder() == [50, 60, 70]

    def test_autoptr_lattice_rep_ibz_matches_fbz(self):
        """In-loop symmetrization: a declared non-trivial rep converges on the
        symmetrized iterate, and the IBZ solve equals the FBZ solve."""
        from autobzcore_tpu.models import tb_integer
        from autobzcore_tpu.models.observables import transport_integrand

        fi = transport_integrand(tb_integer(2), eta=0.5)
        alg = AutoPTR(nmin=20, nmax=200)
        si = IntegralSolver(IntegralProblem(fi, load_bz(InversionSymIBZ(), np.eye(2))), alg, abstol=1e-8)
        sf = IntegralSolver(IntegralProblem(fi, load_bz(FBZ(), np.eye(2))), alg, abstol=1e-8)
        ui = si.solve_p(MixedParameters(om=0.4))
        uf = sf.solve_p(MixedParameters(om=0.4))
        assert ui.retcode and uf.retcode
        assert np.allclose(np.asarray(ui.u), np.asarray(uf.u), atol=1e-8)

    def test_autoptr_keepmost_window(self):
        """keepmost=k compares against the iterate k-1 rungs back (a wider,
        more conservative Richardson window)."""
        from autobzcore_tpu.models import tb_integer
        from autobzcore_tpu.models.observables import dos_integrand

        bz = load_bz(InversionSymIBZ(), np.eye(2))
        fi = dos_integrand(tb_integer(2), eta=0.5)
        prob = IntegralProblem(fi, bz)
        s2 = IntegralSolver(prob, AutoPTR(nmin=20, nmax=200, keepmost=2),
                            abstol=1e-6).solve_p(MixedParameters(om=0.3))
        s3 = IntegralSolver(prob, AutoPTR(nmin=20, nmax=200, keepmost=3),
                            abstol=1e-6).solve_p(MixedParameters(om=0.3))
        assert s2.retcode and s3.retcode
        # same converged value; the wider window needs at least as many evals
        assert float(s2.u) == pytest.approx(float(s3.u), abs=1e-6)
        assert s3.numevals >= s2.numevals


class TestRandomModelCrossAlgorithm:
    """Fixed-seed random Wannier models through the full BZ+Fourier stack:
    all four BZ algorithms must agree on a broadened DOS integral.  The
    reference's acceptance fixtures are symmetric integer-lattice models
    (``test/dos.jl:8-41``) whose structure can mask sign/offset regressions
    in the Fourier contraction or symmetrization; a generic complex
    Hermitian model with no point symmetry beyond Hermiticity closes that
    hole."""

    @pytest.mark.parametrize("seed", [3, 7])
    def test_bz_algorithms_agree_2d(self, seed):
        from autobzcore_tpu.models import synthetic_wannier
        from autobzcore_tpu.models.observables import dos_integrand

        h = synthetic_wannier(2, nr=3, ndim=2, seed=seed)
        bz = load_bz(FBZ(), np.eye(2))
        fi = dos_integrand(h, eta=0.8)
        vals = {
            name: float(solve(IntegralProblem(fi, bz, 0.3), alg(), abstol=1e-5).u)
            for name, alg in [("IAI", IAI), ("TAI", TAI), ("PTR", PTR),
                              ("AutoPTR", AutoPTR)]
        }
        ref = vals["PTR"]
        assert ref > 0
        for name, v in vals.items():
            assert v == pytest.approx(ref, abs=5e-5), (name, vals)


def test_load_bz_int_dimension_vs_float_lattice_constant():
    """The scalar-A forms are type-directed and must stay distinct: an INT is
    the documented dimension shorthand (identity lattice), a FLOAT is a 1x1
    lattice constant."""
    bz3 = load_bz(FBZ(), 3)
    assert bz3.A.shape == (3, 3)
    assert np.allclose(bz3.A, np.eye(3))
    bz1 = load_bz(FBZ(), 3.0)
    assert bz1.A.shape == (1, 1)
    assert bz1.A[0, 0] == 3.0
