"""Polyhedral IBZ tests, mirroring reference ``test/test_ibz.jl``: polytope
volumes across Bravais lattice types validated against |G|-fold reduction,
both geometrically and by nested adaptive integration over the loaded limits."""
import jax.numpy as jnp
import numpy as np
import pytest

from autobzcore_tpu import IAI, PTR, IBZ, IntegralProblem, load_bz, solve
from autobzcore_tpu.brillouin import canonical_reciprocal_basis
from autobzcore_tpu.ibz import (
    crystal_pointgroup,
    ibz_polytope,
    lattice_pointgroup,
    load_ibz,
    wigner_seitz,
)


def lattices_3d():
    """All 14 Bravais lattice types (columns = lattice vectors), mirroring the
    reference's coverage in ``test/test_ibz.jl:121-149``."""
    a, b, c = 1.0, 1.3, 1.7
    cb = np.cos(np.deg2rad(75.0))  # monoclinic beta
    sb = np.sin(np.deg2rad(75.0))
    return {
        "cubic": np.eye(3),
        "fcc": 0.5 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]]).T,
        "bcc": 0.5 * np.array([[-1, 1, 1], [1, -1, 1], [1, 1, -1]]).T,
        "tetragonal": np.diag([a, a, c]),
        "tetragonal_I": 0.5 * np.array(
            [[-a, a, c], [a, -a, c], [a, a, -c]]
        ).T,
        "orthorhombic": np.diag([a, b, c]),
        "orthorhombic_C": np.array(
            [[a / 2, -b / 2, 0], [a / 2, b / 2, 0], [0, 0, c]]
        ).T,
        "orthorhombic_I": 0.5 * np.array(
            [[-a, b, c], [a, -b, c], [a, b, -c]]
        ).T,
        "orthorhombic_F": 0.5 * np.array(
            [[0, b, c], [a, 0, c], [a, b, 0]]
        ).T,
        "hexagonal": np.array([[1, -0.5, 0], [0, np.sqrt(3) / 2, 0], [0, 0, c]]),
        "rhombohedral": np.array(
            [
                [a, 0.0, c],
                [-a / 2, a * np.sqrt(3) / 2, c],
                [-a / 2, -a * np.sqrt(3) / 2, c],
            ]
        ).T,
        "monoclinic": np.array(
            [[a, 0, 0], [0, b, 0], [c * cb, 0, c * sb]]
        ).T,
        "monoclinic_C": np.array(
            [[a / 2, -b / 2, 0], [a / 2, b / 2, 0], [c * cb, 0, c * sb]]
        ).T,
        "triclinic": np.array(
            [[a, 0, 0], [0.27 * b, b, 0], [0.21 * c, 0.13 * c, c]]
        ).T,
    }


# Laue-class point-group orders for each Bravais type
POINTGROUP_ORDER = {
    "cubic": 48,
    "fcc": 48,
    "bcc": 48,
    "tetragonal": 16,
    "tetragonal_I": 16,
    "orthorhombic": 8,
    "orthorhombic_C": 8,
    "orthorhombic_I": 8,
    "orthorhombic_F": 8,
    "hexagonal": 24,
    "rhombohedral": 12,
    "monoclinic": 4,
    "monoclinic_C": 4,
    "triclinic": 2,
}


class TestPointGroup:
    def test_cubic_order(self):
        assert len(lattice_pointgroup(np.eye(3))) == 48

    def test_hexagonal_order(self):
        assert len(lattice_pointgroup(lattices_3d()["hexagonal"])) == 24

    def test_fcc_bcc_order(self):
        assert len(lattice_pointgroup(lattices_3d()["fcc"])) == 48
        assert len(lattice_pointgroup(lattices_3d()["bcc"])) == 48

    @pytest.mark.parametrize("name", list(lattices_3d()))
    def test_all_bravais_orders(self, name):
        """Laue point-group order for each of the 14 Bravais types."""
        assert len(lattice_pointgroup(lattices_3d()[name])) == POINTGROUP_ORDER[name]

    def test_basis_reduces_group(self):
        # one off-center atom at a general position kills every nontrivial op
        A = np.eye(3)
        ops = crystal_pointgroup(A, ["X", "Y"], [[0, 0, 0], [0.1, 0.23, 0.37]])
        assert len(ops) < 48
        # all ops survive with the single atom at the origin
        assert len(crystal_pointgroup(A, ["X"], [[0.0, 0.0, 0.0]])) == 48


class TestWignerSeitz:
    @pytest.mark.parametrize("name", list(lattices_3d()))
    def test_ws_volume(self, name):
        A = lattices_3d()[name]
        B = canonical_reciprocal_basis(A)
        ws = wigner_seitz(B)
        assert ws.volume == pytest.approx(abs(np.linalg.det(B)), rel=1e-9)


class TestIBZ:
    @pytest.mark.parametrize("name", list(lattices_3d()))
    def test_ibz_volume_fraction(self, name):
        A = lattices_3d()[name]
        B = canonical_reciprocal_basis(A)
        W = crystal_pointgroup(A)
        S = np.array([np.round(np.linalg.inv(w).T).astype(np.int64) for w in W])
        poly = ibz_polytope(B, S)
        # fractional-coordinate volume of a fundamental domain = 1/|G|
        assert poly.volume == pytest.approx(1.0 / len(S), rel=1e-7)

    @pytest.mark.parametrize(
        "name", ["cubic", "fcc", "hexagonal", "tetragonal_I", "monoclinic", "triclinic"]
    )
    def test_ibz_ptr_unit_measure(self, name):
        A = lattices_3d()[name]
        bz = load_ibz(A, canonical_reciprocal_basis(A))
        sol = solve(IntegralProblem(lambda x, p: jnp.asarray(1.0), bz), PTR(npt=24))
        assert float(sol.u) == pytest.approx(abs(np.linalg.det(bz.B)), rel=1e-8)

    @pytest.mark.parametrize("name", list(lattices_3d()))
    def test_ibz_iai_unit_measure(self, name):
        """Nested adaptive integration over the polytope wedge reproduces the
        zone volume for ALL 14 Bravais types (reference ``test/test_ibz.jl:121-149``).

        With exact per-level slice breakpoints (polygon-vertex x2 values at
        the middle level), the slice area is piecewise-polynomial between
        breakpoints, so the constant integrand must converge to abstol 1e-8
        on the initial rule evaluation — zero adaptive refinement."""
        from autobzcore_tpu import AuxQuadGKJL, EvalCounter

        A = lattices_3d()[name]
        bz = load_ibz(A, canonical_reciprocal_basis(A))
        # tiny pools: convergence must come from breakpoints, not refinement
        alg = IAI(AuxQuadGKJL(cap=64, nbisect=2), inner_cap=48)
        sol = solve(IntegralProblem(lambda x, p: jnp.asarray(1.0), bz),
                    EvalCounter(alg), abstol=1e-8)
        vol = abs(np.linalg.det(bz.B))
        assert float(sol.u) == pytest.approx(vol, rel=1e-8)
        assert sol.retcode
        # exact zero-refinement eval count: nseg_o outer segments x 15 GK
        # nodes, each spawning F middle segments (F = polytope face count,
        # the fixed breakpoint-slot count) x 15 nodes x one 15-node inner rule
        F = bz.lims.normals.shape[0]
        nseg_o = int(np.asarray(bz.lims.outer_segments()).shape[0]) - 1
        assert sol.numevals == nseg_o * F * 15**3

    def test_load_bz_ibz_kind(self):
        A = np.eye(3)
        bz = load_bz(IBZ(), A, species=["V"], positions=np.array([[0.0, 0.0, 0.0]]))
        assert bz.nsyms == 48


def test_wigner_seitz_skewed_basis():
    """Non-reduced bases are LLL-reduced before the neighbor shell, and the
    cell volume is certified against |det B| — a skewed basis (columns
    (1,10),(0,1) whose cell needs the m=(1,-10) bisector) must not silently
    yield a cell larger than the fundamental domain."""
    import numpy as np
    from scipy.spatial import ConvexHull

    from autobzcore_tpu.ibz.polyhedron import wigner_seitz

    B2 = np.column_stack([np.array([1.0, 10.0]), np.array([0.0, 1.0])])
    ws2 = wigner_seitz(B2)
    assert ConvexHull(ws2.vertices).volume == pytest.approx(1.0, rel=1e-9)
    B3 = np.column_stack([[1.0, 7.0, 3.0], [0.0, 1.0, 5.0], [0.0, 0.0, 1.0]])
    ws3 = wigner_seitz(B3)
    assert ConvexHull(ws3.vertices).volume == pytest.approx(1.0, rel=1e-9)
