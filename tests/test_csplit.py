"""Split-complex f64 kernels vs complex reference."""
import jax.numpy as jnp
import numpy as np
import pytest

from autobzcore_tpu.ops.csplit_eval import (
    eigh_split,
    eigvalsh_split,
    evaluate_grid_split,
)
from autobzcore_tpu.ops.fourier_eval import evaluate_grid


def _random_series(dims=3, n=5, m=3, seed=0):
    rng = np.random.default_rng(seed)
    C = rng.normal(size=(n,) * dims + (m, m)) + 1j * rng.normal(size=(n,) * dims + (m, m))
    # hermitian-symmetric coefficients: c(-R) = c(R)^dagger
    C = (C + np.flip(C.conj(), axis=tuple(range(dims))).swapaxes(-1, -2)) / 2
    return C


def test_grid_split_matches_complex():
    C = _random_series()
    nodes = [np.arange(7) / 7] * 3
    off = (-2, -2, -2)
    per = (1.0, 1.0, 1.0)
    ref = np.asarray(evaluate_grid(C, 3, nodes, off, per))
    re, im = evaluate_grid_split(C.real, C.imag, 3, nodes, off, per)
    assert np.allclose(np.asarray(re), ref.real, atol=1e-12)
    assert np.allclose(np.asarray(im), ref.imag, atol=1e-12)


def test_eigvalsh_split():
    C = _random_series()
    H = np.asarray(evaluate_grid(C, 3, [np.arange(4) / 4] * 3, (-2,) * 3, (1.0,) * 3)).reshape(-1, 3, 3)
    e_ref = np.linalg.eigvalsh(H)
    e = np.asarray(eigvalsh_split(jnp.asarray(H.real), jnp.asarray(H.imag)))
    assert np.allclose(e, e_ref, atol=1e-10)


def test_eigh_split_velocities():
    """Band velocities diag(U' V U) computed from the real embedding agree
    with the complex eigendecomposition (phase-invariant check)."""
    rng = np.random.default_rng(1)
    H = rng.normal(size=(10, 3, 3)) + 1j * rng.normal(size=(10, 3, 3))
    H = (H + H.conj().swapaxes(1, 2)) / 2
    V = rng.normal(size=(10, 3, 3)) + 1j * rng.normal(size=(10, 3, 3))
    V = (V + V.conj().swapaxes(1, 2)) / 2

    e_ref, U = np.linalg.eigh(H)
    v_ref = np.real(np.einsum("kim,kij,kjm->km", U.conj(), V, U))

    e, u_re, u_im = map(np.asarray, eigh_split(jnp.asarray(H.real), jnp.asarray(H.imag)))
    Uc = u_re + 1j * u_im
    v = np.real(np.einsum("kim,kij,kjm->km", Uc.conj(), V, Uc))
    assert np.allclose(e, e_ref, atol=1e-10)
    assert np.allclose(v, v_ref, atol=1e-8)


def test_ggr_split_matches_complex():
    import numpy as np

    from autobzcore_tpu import FBZ, DOSProblem, GGR, load_bz
    from autobzcore_tpu.dos import init as dos_init, solve_ as dos_solve_
    from autobzcore_tpu.models import tb_graphene

    bz = load_bz(FBZ(), np.eye(2))
    prob = DOSProblem(tb_graphene(), 0.7, bz)
    a = dos_solve_(dos_init(prob, GGR(npt=60, precision="complex"))).u
    b = dos_solve_(dos_init(prob, GGR(npt=60, precision="split"))).u
    assert float(a) == pytest.approx(float(b), rel=1e-10)


def test_ggr_rayleigh_tier_matches_complex():
    """The fast split tier (c64 eigh + Rayleigh-refined f64 eigenvalues,
    f32-grade velocities) agrees with the complex path to its documented
    ~1e-6 relative DOS contract."""
    import numpy as np

    from autobzcore_tpu import FBZ, DOSProblem, GGR, load_bz
    from autobzcore_tpu.dos import init as dos_init, solve_ as dos_solve_
    from autobzcore_tpu.models import tb_graphene

    bz = load_bz(FBZ(), np.eye(2))
    prob = DOSProblem(tb_graphene(), 0.7, bz)
    a = dos_solve_(dos_init(prob, GGR(npt=60, precision="complex"))).u
    b = dos_solve_(dos_init(prob, GGR(npt=60, precision="rayleigh"))).u
    assert float(a) == pytest.approx(float(b), rel=1e-5)


def test_eigh_split_degenerate_cluster():
    """Inside a degenerate eigenspace the real embedding's eigenvector columns
    can project to complex-parallel vectors; eigh_split must still return a
    unitary U with H U = U diag(e) (regression for the J-related-column
    hazard at high-symmetry k-points)."""
    rng = np.random.default_rng(7)
    m = 4
    # random unitary via QR of a complex Gaussian
    Q, _ = np.linalg.qr(rng.normal(size=(m, m)) + 1j * rng.normal(size=(m, m)))
    evals = np.array([1.0, 1.0, 1.0, 2.5])  # 3-fold degenerate cluster
    H = (Q * evals) @ Q.conj().T
    H = (H + H.conj().T) / 2
    Hb = np.broadcast_to(H, (6, m, m))  # batched path too

    e, u_re, u_im = map(np.asarray, eigh_split(jnp.asarray(Hb.real), jnp.asarray(Hb.imag)))
    U = u_re + 1j * u_im
    assert np.allclose(e, evals, atol=1e-10)
    eye = np.broadcast_to(np.eye(m), U.shape)
    assert np.allclose(U.conj().swapaxes(-1, -2) @ U, eye, atol=1e-8), "U not unitary"
    assert np.allclose(Hb @ U, U * e[..., None, :], atol=1e-8)

    # cluster-trace of band velocities is basis-independent: compare to the
    # complex eigendecomposition within the degenerate block
    V = rng.normal(size=(m, m)) + 1j * rng.normal(size=(m, m))
    V = (V + V.conj().T) / 2
    _, Uref = np.linalg.eigh(H)
    vref = np.real(np.einsum("im,ij,jm->m", Uref.conj(), V, Uref))
    v = np.real(np.einsum("kim,ij,kjm->km", U.conj(), V, U))
    assert np.allclose(np.sum(v[:, :3], axis=1), np.sum(vref[:3]), atol=1e-8)
    assert np.allclose(v[:, 3], vref[3], atol=1e-8)
