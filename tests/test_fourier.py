"""Fourier layer tests, mirroring reference ``test/fourier.jl``: evaluation
correctness, FourierIntegrand parameter interface, consistency of specialized
vs fallback paths, and BZ volume identities through the Fourier fast path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autobzcore_tpu import (
    FBZ,
    IAI,
    PTR,
    TAI,
    AutoPTR,
    Basis,
    CubicLimits,
    EvalCounter,
    FourierIntegrand,
    FourierSeries,
    FourierValue,
    HCubatureJL,
    HyperCube,
    IntegralProblem,
    IntegralSolver,
    InversionSymIBZ,
    JacobianSeries,
    MonkhorstPack,
    NestedQuad,
    AuxQuadGKJL,
    load_bz,
    solve,
)
from autobzcore_tpu.models import integer_lattice, tb_integer


class TestFourierSeries:
    @pytest.mark.parametrize("dims", [1, 2, 3])
    def test_evaluation_matches_direct_sum(self, dims):
        rng = np.random.default_rng(0)
        shape = (3,) * dims
        C = rng.normal(size=shape) + 1j * rng.normal(size=shape)
        s = FourierSeries(C, period=1.0, offset=(-1,) * dims)
        x = rng.uniform(size=dims)
        direct = 0.0
        for idx in np.ndindex(*shape):
            f = np.array(idx) - 1
            direct += C[idx] * np.exp(2j * np.pi * f @ x)
        val = np.complex128(s(jnp.asarray(x)))
        assert val == pytest.approx(direct, rel=1e-12)

    @pytest.mark.parametrize("dims", [1, 2, 3])
    def test_grid_matches_points(self, dims):
        C = integer_lattice(dims)
        s = FourierSeries(C, period=1.0, offset=(-1,) * dims)
        npt = 5
        grid = s.eval_grid([np.arange(npt) / npt] * dims)
        u = np.arange(npt) / npt
        mesh = np.meshgrid(*([u] * dims), indexing="ij")
        X = np.stack([m.reshape(-1) for m in mesh], axis=-1)
        pts = s.eval_points(jnp.asarray(X))
        assert np.allclose(np.asarray(grid).reshape(-1), np.asarray(pts))

    def test_contract_consistency(self):
        C = integer_lattice(3)
        s = FourierSeries(C, period=1.0, offset=(-1, -1, -1))
        x = np.array([0.11, 0.27, 0.63])
        s2 = s.contract(x[2])
        s1 = s2.contract(x[1])
        v = s1(jnp.asarray(x[:1]))
        assert np.complex128(v) == pytest.approx(np.complex128(s(jnp.asarray(x))), rel=1e-12)

    def test_jacobian_series(self):
        s = tb_integer(2)
        j = JacobianSeries(s)
        x = jnp.asarray([0.2, 0.4])
        h, v = j(x)
        # H = 2 cos(2 pi x1) + 2 cos(2 pi x2); dH/dz_i = -4 pi sin(2 pi x_i)
        assert np.real(np.complex128(h[0, 0])) == pytest.approx(
            2 * np.cos(2 * np.pi * 0.2) + 2 * np.cos(2 * np.pi * 0.4), rel=1e-12
        )
        assert np.real(np.complex128(v[0][0, 0])) == pytest.approx(
            -4 * np.pi * np.sin(2 * np.pi * 0.2), rel=1e-12
        )
        assert np.real(np.complex128(v[1][0, 0])) == pytest.approx(
            -4 * np.pi * np.sin(2 * np.pi * 0.4), rel=1e-12
        )


class TestFourierIntegrand:
    @pytest.mark.parametrize("dims", [1, 2, 3])
    def test_parameter_interface(self, dims):
        s = FourierSeries(integer_lattice(dims), period=1.0, offset=(-1,) * dims)

        def f(v, a, b=None):
            return a * v.s * jnp.sum(v.x) + b

        prob = IntegralProblem(
            FourierIntegrand(f, s, 1.3, b=4.2), np.zeros(dims), np.ones(dims)
        )
        u = IntegralSolver(prob, HCubatureJL())()
        v = IntegralSolver(FourierIntegrand(f, s), np.zeros(dims), np.ones(dims), HCubatureJL())(1.3, b=4.2)
        w = IntegralSolver(FourierIntegrand(f, s, b=4.2), np.zeros(dims), np.ones(dims), HCubatureJL())(1.3)
        assert np.complex128(u) == pytest.approx(np.complex128(v)) == pytest.approx(np.complex128(w))

    @pytest.mark.parametrize("dims", [1, 2, 3])
    def test_algorithm_consistency(self, dims):
        """Specialized rules (PTR grid eval, nested contraction) agree with
        the fallback pointwise path (reference ``test/fourier.jl:24-38``)."""
        s = FourierSeries(integer_lattice(dims), period=1.0, offset=(-1,) * dims)

        def f(v, a, b=None):
            return a * v.s + b

        fi = FourierIntegrand(f, s, 1.3, b=4.2)
        results = {}
        for name, alg, dom in (
            ("hcub", HCubatureJL(), HyperCube(np.zeros(dims), np.ones(dims))),
            ("nested", NestedQuad(AuxQuadGKJL()), CubicLimits(np.zeros(dims), np.ones(dims))),
            ("mp", MonkhorstPack(npt=20), Basis(np.eye(dims))),
        ):
            results[name] = np.complex128(solve(IntegralProblem(fi, dom), alg, abstol=1e-8).u)
        assert results["hcub"] == pytest.approx(results["nested"], abs=1e-6)
        assert results["hcub"] == pytest.approx(results["mp"], abs=1e-6)


class TestFourierBZ:
    @pytest.mark.parametrize("dims", [1, 2, 3])
    @pytest.mark.parametrize("bzkind", [FBZ(), InversionSymIBZ()])
    @pytest.mark.parametrize("algname", ["IAI", "PTR", "AutoPTR", "TAI"])
    @pytest.mark.parametrize("counter", [False, True])
    def test_unit_measure(self, dims, bzkind, algname, counter):
        vol = (2 * np.pi) ** dims
        s = FourierSeries(integer_lattice(dims), period=1.0, offset=(-1,) * dims)
        bz = load_bz(bzkind, np.eye(dims))

        def f(v, a, b=None):
            return jnp.real(a * v.s) + b

        fi = FourierIntegrand(f, s, 0.0, b=1.0)
        if algname == "IAI" and dims == 3:
            # derated pools keep the 3D nested compile tractable on CPU; the
            # constant integrand converges on the initial rule evaluation
            alg = IAI(AuxQuadGKJL(cap=64, nbisect=2), inner_cap=32)
        else:
            alg = {"IAI": IAI, "PTR": PTR, "AutoPTR": AutoPTR, "TAI": TAI}[algname]()
        if counter:
            alg = EvalCounter(alg)
        solver = IntegralSolver(IntegralProblem(fi, bz), alg, reltol=0, abstol=1e-6)
        from autobzcore_tpu import MixedParameters

        sol = solver.solve_p(MixedParameters())
        assert float(sol.u) == pytest.approx(vol, abs=1e-5)
        if counter and algname == "PTR":
            # exact eval count through the BZ + Fourier layers (reference
            # test/brillouin.jl:96, test/fourier.jl:40-56): the full grid on
            # the FBZ, the symmetry-reduced representative count on the IBZ
            if bz.syms is None:
                expected = 50 ** dims
            else:
                from autobzcore_tpu.ops.symptr import symptr_rule

                expected = symptr_rule(50, dims, bz.syms)[0].shape[0]
            assert sol.numevals == expected


def test_iai_host_outer_matches_device():
    """host_outer=True (bounded per-dispatch device time, host heap over the
    outermost level) reproduces the on-device nested result."""
    from autobzcore_tpu import FBZ, IAI, IntegralProblem, IntegralSolver, load_bz
    from autobzcore_tpu.models import tb_integer
    from autobzcore_tpu.models.observables import dos_integrand

    fi = dos_integrand(tb_integer(2), eta=0.1)
    bz = load_bz(FBZ(), 2 * np.pi * np.eye(2))
    ref = IntegralSolver(IntegralProblem(fi, bz), IAI(), abstol=1e-6).solve_p(jnp.float64(0.0))
    for prec in ("complex", "split"):
        sol = IntegralSolver(IntegralProblem(fi, bz), IAI(precision=prec, host_outer=True),
                             abstol=1e-6).solve_p(jnp.float64(0.0))
        assert sol.retcode
        assert float(sol.u) == pytest.approx(float(ref.u), abs=1e-9)


def test_iai_split_matches_complex():
    """The split-complex f64 carrier is bit-compatible with the complex path
    on CPU (scalar DOS and SplitComplex Green's-trace results)."""
    from autobzcore_tpu import FBZ, IAI, FourierIntegrand, IntegralProblem, IntegralSolver, load_bz
    from autobzcore_tpu.models import tb_integer
    from autobzcore_tpu.models.observables import greens_function_trace

    fi = FourierIntegrand(greens_function_trace, tb_integer(2), eta=0.1)
    bz = load_bz(FBZ(), 2 * np.pi * np.eye(2))
    uc = IntegralSolver(IntegralProblem(fi, bz), IAI(), abstol=1e-8).solve_p(jnp.float64(0.2)).u
    us = IntegralSolver(IntegralProblem(fi, bz), IAI(precision="split"),
                        abstol=1e-8).solve_p(jnp.float64(0.2)).u
    assert np.complex128(us.join()) == pytest.approx(np.complex128(uc), abs=1e-12)


def test_host_outer_checkpoint_resume(tmp_path):
    """A budget-truncated host-outer solve leaves a checkpoint; rerunning with
    a larger budget resumes the heap (cumulative numevals) and converges to
    the same value as a fresh solve, then removes the file."""
    from autobzcore_tpu import FBZ, IAI, IntegralProblem, IntegralSolver, load_bz
    from autobzcore_tpu.models import tb_integer
    from autobzcore_tpu.models.observables import dos_integrand

    fi = dos_integrand(tb_integer(2), eta=0.03)
    bz = load_bz(FBZ(), 2 * np.pi * np.eye(2))
    prob = IntegralProblem(fi, bz)
    ck = str(tmp_path / "iai_ck")
    alg = IAI(host_outer=True, checkpoint=ck)

    trunc = IntegralSolver(prob, alg, abstol=1e-9, maxiters=3000).solve_p(jnp.float64(0.0))
    assert trunc.retcode is False
    assert list(tmp_path.glob("iai_ck.*.pkl")), "truncated solve must leave a checkpoint"

    resumed = IntegralSolver(prob, alg, abstol=1e-9).solve_p(jnp.float64(0.0))
    assert resumed.retcode
    assert not list(tmp_path.glob("iai_ck.*.pkl")), "converged solve must clean up"
    assert resumed.numevals > trunc.numevals  # cumulative across the resume

    fresh = IntegralSolver(prob, IAI(host_outer=True), abstol=1e-9).solve_p(jnp.float64(0.0))
    assert float(resumed.u) == pytest.approx(float(fresh.u), abs=1e-11)
