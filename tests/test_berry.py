"""Berry curvature / Chern / anomalous Hall acceptance tests.

Anchors: the Haldane model's exactly known phase diagram — Chern number
+-1 for |M| < 3 sqrt(3) |t2 sin phi|, 0 otherwise (Haldane, PRL 61, 2015
(1988)) — and the gapped-band identity sigma_xy = -C e^2/h, i.e.
I_xy = sign(det B) C / (2 pi) for mu in the gap.
"""
import numpy as np
import pytest

from autobzcore_tpu.brillouin import FBZ, InversionSymIBZ, load_bz
from autobzcore_tpu.models.berry import BerryCurvatureSolver
from autobzcore_tpu.models.tight_binding import tb_haldane


def _fbz2(A=None):
    if A is None:
        A = np.eye(2)
    return load_bz(FBZ(), A)


def test_haldane_chern_topological():
    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=0.0)
    slv = BerryCurvatureSolver(h, _fbz2(), npt=72)
    C = np.asarray(slv.chern())
    # bands carry opposite unit Chern numbers; total is zero
    assert abs(abs(C[0]) - 1) < 1e-6
    assert abs(C[0] + C[1]) < 1e-9


def test_haldane_chern_sign_flips_with_phi():
    hp = tb_haldane(t2=0.1, phi=np.pi / 2)
    hm = tb_haldane(t2=0.1, phi=-np.pi / 2)
    Cp = np.asarray(BerryCurvatureSolver(hp, _fbz2(), npt=54).chern())
    Cm = np.asarray(BerryCurvatureSolver(hm, _fbz2(), npt=54).chern())
    assert np.allclose(Cp, -Cm, atol=1e-6)
    assert abs(abs(Cp[0]) - 1) < 1e-5


def test_haldane_chern_trivial_phase():
    # |M| = 1.0 > 3 sqrt(3) * 0.1 ~ 0.52: trivial insulator
    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=1.0)
    C = np.asarray(BerryCurvatureSolver(h, _fbz2(), npt=54).chern())
    assert np.allclose(C, 0.0, atol=1e-6)


def test_ahc_gap_quantization():
    # mu in the gap at zero temperature: I_xy = sign(det B) C_lower / (2 pi)
    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=0.0)
    bz = _fbz2()
    slv = BerryCurvatureSolver(h, bz, npt=72)
    C = np.asarray(slv.chern())
    lower = C[0] if True else None  # eigh sorts ascending: band 0 is lower
    I = np.asarray(slv.ahc(mu=0.0, beta=None))
    detB = np.linalg.det(np.asarray(bz.B))
    assert abs(I[0, 1] - np.sign(detB) * lower / (2 * np.pi)) < 1e-6
    # antisymmetric response
    assert abs(I[0, 1] + I[1, 0]) < 1e-9
    assert abs(I[0, 0]) < 1e-9 and abs(I[1, 1]) < 1e-9


def test_ahc_basis_invariance():
    # I_ab is a Cartesian tensor: a non-trivial lattice basis must give the
    # same zone-integral invariant pattern (here: the 2D antisymmetric part
    # scales as the Chern number regardless of A)
    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=0.0)
    A = np.array([[1.0, 0.5], [0.0, 2.0]])
    bz = _fbz2(A)
    slv = BerryCurvatureSolver(h, bz, npt=54)
    I = np.asarray(slv.ahc(mu=0.0, beta=None))
    C = np.asarray(slv.chern())
    detB = np.linalg.det(np.asarray(bz.B))
    assert abs(I[0, 1] - np.sign(detB) * C[0] / (2 * np.pi)) < 1e-6


def test_ahc_finite_temperature_interpolates():
    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=0.0)
    slv = BerryCurvatureSolver(h, _fbz2(), npt=54)
    I0 = np.asarray(slv.ahc(mu=0.0, beta=None))[0, 1]
    # low T ~ zero T; high T washes the response out toward zero
    Ilow = np.asarray(slv.ahc(mu=0.0, beta=200.0))[0, 1]
    Ihigh = np.asarray(slv.ahc(mu=0.0, beta=0.5))[0, 1]
    assert abs(Ilow - I0) < 1e-3 * abs(I0) + 1e-8
    assert abs(Ihigh) < abs(I0)


def test_requires_full_zone():
    h = tb_haldane(t2=0.1)
    bz = load_bz(InversionSymIBZ(), np.eye(2))
    with pytest.raises(ValueError, match="full-zone"):
        BerryCurvatureSolver(h, bz, npt=12)


def test_chern_grid_convergence():
    # exponential PTR convergence on the smooth gapped curvature: a coarse
    # grid is already integer to ~1e-4, a moderate one to ~1e-8
    h = tb_haldane(t1=1.0, t2=0.2, phi=np.pi / 3, M=0.3)
    coarse = np.asarray(BerryCurvatureSolver(h, _fbz2(), npt=24).chern())
    fine = np.asarray(BerryCurvatureSolver(h, _fbz2(), npt=96).chern())
    assert abs(coarse[0] - round(fine[0])) < 1e-3
    assert abs(fine[0] - round(fine[0])) < 1e-8


def test_lattice_chern_exact_on_coarse_grid():
    from autobzcore_tpu.models.berry import lattice_chern

    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=0.0)
    bz = _fbz2()
    # FHS plaquette Chern is exactly integer even at npt=12
    C = lattice_chern(h, bz, 12, bands=[0])
    assert abs(C - round(C)) < 1e-12
    assert round(C) in (-1, 1)
    # agrees with the Kubo-curvature route
    CK = np.asarray(BerryCurvatureSolver(h, bz, npt=72).chern())
    assert round(C) == round(float(CK[0]))
    # default band set = lower half
    assert lattice_chern(h, bz, 12) == C
    # upper band carries the opposite charge; total zero
    assert round(lattice_chern(h, bz, 12, bands=[1])) == -round(C)
    assert round(lattice_chern(h, bz, 12, bands=[0, 1])) == 0


def test_lattice_chern_trivial():
    from autobzcore_tpu.models.berry import lattice_chern

    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=1.0)
    assert round(lattice_chern(h, _fbz2(), 16, bands=[0])) == 0


def test_orbital_magnetization_streda_slope():
    # inside a Chern gap dM/dmu = sign(det B) C_occ / (2 pi) exactly
    # (Streda / Shi-Vignale-Xiao-Niu); the slope is linear so two in-gap
    # points pin it
    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=0.0)
    bz = _fbz2()
    slv = BerryCurvatureSolver(h, bz, npt=72)
    e = np.asarray(slv.pack.e)
    lo, hi = e[:, 0].max(), e[:, 1].min()
    assert hi - lo > 0.3  # sanity: actually gapped
    C = float(np.asarray(slv.chern())[0])
    mus = lo + np.array([0.2, 0.8]) * (hi - lo)
    M = [float(np.asarray(slv.orbital_magnetization(mu=m))[0, 1]) for m in mus]
    slope = (M[1] - M[0]) / (mus[1] - mus[0])
    detB = np.linalg.det(np.asarray(bz.B))
    assert abs(slope - np.sign(detB) * C / (2 * np.pi)) < 1e-9
    # antisymmetric tensor
    Mt = np.asarray(slv.orbital_magnetization(mu=mus[0]))
    assert abs(Mt[0, 1] + Mt[1, 0]) < 1e-12


def test_orbital_magnetization_finite_temperature():
    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=0.0)
    slv = BerryCurvatureSolver(h, _fbz2(), npt=54)
    m0 = float(np.asarray(slv.orbital_magnetization(mu=0.0))[0, 1])
    mlow = float(np.asarray(slv.orbital_magnetization(mu=0.0, beta=500.0))[0, 1])
    assert abs(mlow - m0) < 1e-6 + 1e-6 * abs(m0)


def test_orbital_magnetization_trs_zero():
    # a real (time-reversal-symmetric) model carries no orbital moment
    from autobzcore_tpu.models.tight_binding import tb_graphene

    slv = BerryCurvatureSolver(tb_graphene(), _fbz2(), npt=36)
    assert abs(float(np.asarray(slv.orbital_magnetization(mu=0.5))[0, 1])) < 1e-12


def test_kane_mele_spin_hall_quantized():
    # Sz-conserving QSH: charge Hall exactly zero (TRS), spin Hall
    # I^sz_xy = sign(det B) (C_up - C_dn)/2 / (2 pi) = -1/(2 pi)
    from autobzcore_tpu.models.tight_binding import tb_kane_mele_sz

    h = tb_kane_mele_sz(lam_so=0.1, M=0.0)
    bz = _fbz2()
    slv = BerryCurvatureSolver(h, bz, npt=72)
    Sz = np.diag([0.5, 0.5, -0.5, -0.5])
    I_c = float(np.asarray(slv.ahc(mu=0.0))[0, 1])
    I_s = float(np.asarray(slv.operator_hall(Sz, mu=0.0))[0, 1])
    detB = np.linalg.det(np.asarray(bz.B))
    assert abs(I_c) < 1e-12
    assert abs(I_s - np.sign(detB) * (-1.0) / (2 * np.pi)) < 1e-6
    # operator cache: second query is a pure reduction, same answer
    assert float(np.asarray(slv.operator_hall(Sz, mu=0.0))[0, 1]) == I_s


def test_kane_mele_spin_hall_trivial_phase():
    from autobzcore_tpu.models.tight_binding import tb_kane_mele_sz

    # |M| = 1.0 > 3 sqrt(3) * 0.1: both spin blocks trivial
    h = tb_kane_mele_sz(lam_so=0.1, M=1.0)
    slv = BerryCurvatureSolver(h, _fbz2(), npt=54)
    Sz = np.diag([0.5, 0.5, -0.5, -0.5])
    assert abs(float(np.asarray(slv.operator_hall(Sz, mu=0.0))[0, 1])) < 1e-6


def test_operator_hall_identity_reduces_to_ahc():
    # O = identity: the operator current is the charge current, so the
    # operator Hall response must equal ahc exactly
    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=0.0)
    slv = BerryCurvatureSolver(h, _fbz2(), npt=36)
    I1 = np.asarray(slv.operator_hall(np.eye(2), mu=0.0))
    I0 = np.asarray(slv.ahc(mu=0.0))
    np.testing.assert_allclose(I1, I0, atol=1e-12)


def test_weyl_slice_chern_scan():
    # 3D topology scan with the 2D machinery: contract k3, Wilson-loop the
    # slice.  tb_weyl(m=2) has Weyl nodes at k3 = +-1/4; the slice Chern
    # jumps -1 -> 0 across them
    from autobzcore_tpu.models.berry import lattice_chern
    from autobzcore_tpu.models.tight_binding import tb_weyl

    h = tb_weyl(m=2.0)
    bz2 = _fbz2()
    inside = [lattice_chern(h.contract(np.float64(kz)), bz2, 24, bands=[0])
              for kz in (0.0, 0.2)]
    outside = [lattice_chern(h.contract(np.float64(kz)), bz2, 24, bands=[0])
               for kz in (0.3, 0.5)]
    assert all(abs(c + 1) < 1e-12 for c in inside), inside
    assert all(abs(c) < 1e-12 for c in outside), outside


def test_berry_flux_through_solve_pipeline():
    # the Berry flux as a standard FourierIntegrand: Chern numbers flow
    # through the framework's own PTR / AutoPTR solve machinery,
    # u = |det B| * 2 pi * C_occ
    from autobzcore_tpu import AutoPTR, EvalCounter, IntegralProblem, IntegralSolver, PTR
    from autobzcore_tpu.models.berry import berry_flux_integrand

    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=0.0)
    bz = _fbz2()
    fi = berry_flux_integrand(h)
    detB = np.linalg.det(np.asarray(bz.B))
    prob = IntegralProblem(fi, bz)
    C_ptr = float(IntegralSolver(prob, PTR(npt=48))(mu=0.0)) / (detB * 2 * np.pi)
    assert abs(C_ptr + 1) < 1e-10
    C_auto = float(IntegralSolver(prob, AutoPTR(), abstol=1e-6)(mu=0.0)) / (detB * 2 * np.pi)
    assert abs(C_auto + 1) < 1e-10
    # cost observability composes too
    from autobzcore_tpu import solve
    from autobzcore_tpu.parameters import MixedParameters

    sol = solve(IntegralProblem(fi, bz, MixedParameters(mu=0.0)), EvalCounter(PTR(npt=10)))
    assert sol.numevals == 100


def test_berry_flux_iai_adaptive():
    # JacobianSeries now carries through the nest (channel-stacked
    # derivative coefficients): the adaptive IAI path integrates the Berry
    # flux too
    from autobzcore_tpu import IAI, IntegralProblem, IntegralSolver
    from autobzcore_tpu.models.berry import berry_flux_integrand

    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=0.0)
    bz = _fbz2()
    fi = berry_flux_integrand(h)
    detB = np.linalg.det(np.asarray(bz.B))
    f = IntegralSolver(IntegralProblem(fi, bz), IAI(inner_cap=128), abstol=1e-5)
    C = float(f(mu=0.0)) / (detB * 2 * np.pi)
    assert abs(C + 1) < 1e-6


def test_weyl_3d_ahc_node_separation():
    # the hallmark Weyl-semimetal result: the 3D AHC is set by the node
    # separation.  tb_weyl(m=2) has nodes at k3 = +-1/4, so the k3-average
    # of the slice Chern is -1/2 and I_xy -> -1/(4 pi).  Convergence is
    # algebraic (gapless nodes), ~1/npt^2: err 8.6e-5 at npt=64
    from autobzcore_tpu.models.berry import BerryCurvatureSolver
    from autobzcore_tpu.models.tight_binding import tb_weyl

    bz3 = load_bz(FBZ(), np.eye(3))
    I = np.asarray(BerryCurvatureSolver(tb_weyl(m=2.0), bz3, npt=64).ahc(mu=0.0))
    assert abs(I[0, 1] + 1 / (4 * np.pi)) < 2e-4
    # only the xy component survives (nodes on the z axis)
    assert abs(I[0, 2]) < 1e-12 and abs(I[1, 2]) < 1e-12
    assert abs(I[0, 1] + I[1, 0]) < 1e-12


def test_wilson_loop_center_winding_equals_chern():
    # hybrid Wannier center flow winds by the band Chern number over one
    # k2 period (sign convention pinned to lattice_chern)
    from autobzcore_tpu.models.berry import lattice_chern, wilson_loop_spectrum

    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=0.0)
    th = np.asarray(wilson_loop_spectrum(h, 48, bands=[0]))
    flow = th[:, 0]
    d = np.diff(np.concatenate([flow, [flow[0]]]))
    winding = ((d + 0.5) % 1.0 - 0.5).sum()
    C = lattice_chern(h, _fbz2(), 24, bands=[0])
    assert abs(winding - round(C)) < 1e-9


def test_z2_invariant_kane_mele_phases():
    from autobzcore_tpu.models.berry import z2_invariant
    from autobzcore_tpu.models.tight_binding import tb_kane_mele_sz

    # topological QSH phase (|M| < 3 sqrt(3) lam_so)
    assert z2_invariant(tb_kane_mele_sz(lam_so=0.1, M=0.0), 48) == 1
    # trivial phases: large mass, and small spin-orbit vs mass
    assert z2_invariant(tb_kane_mele_sz(lam_so=0.1, M=1.0), 48) == 0
    assert z2_invariant(tb_kane_mele_sz(lam_so=0.02, M=0.3), 64) == 0


def test_kane_mele_rashba_z2_and_dequantized_spin_hall():
    # the full Kane-Mele model with Rashba coupling: S_z is NOT conserved,
    # so the spin Hall response dequantizes — but the Z2 invariant stays 1
    # until the gap closes, and charge Hall stays exactly 0 (TRS)
    from autobzcore_tpu.models.berry import z2_invariant
    from autobzcore_tpu.models.tight_binding import tb_kane_mele, tb_kane_mele_sz

    # lam_r = 0 reduces exactly to the Sz-conserving builder
    np.testing.assert_allclose(np.asarray(tb_kane_mele(lam_so=0.1, M=0.2).c),
                               np.asarray(tb_kane_mele_sz(lam_so=0.1, M=0.2).c),
                               atol=1e-15)
    h = tb_kane_mele(lam_so=0.06, lam_r=0.05, M=0.0)
    assert z2_invariant(h, 48) == 1
    assert z2_invariant(tb_kane_mele(lam_so=0.06, lam_r=0.05, M=0.8), 48) == 0
    slv = BerryCurvatureSolver(h, _fbz2(), npt=60)
    Sz = np.diag([0.5, 0.5, -0.5, -0.5])
    I_c = float(np.asarray(slv.ahc(mu=0.0))[0, 1])
    I_s = float(np.asarray(slv.operator_hall(Sz, mu=0.0))[0, 1])
    assert abs(I_c) < 1e-10
    q = -1 / (2 * np.pi)
    assert abs(I_s - q) > 1e-3       # dequantized...
    assert abs(I_s - q) < 0.2 * abs(q)  # ...but still near the quantum


def test_quantum_metric_curvature_inequality():
    # the quantum geometric tensor bound for two-band models:
    # det g_n(k) >= (Omega_n(k)/2)^2 pointwise, g symmetric PSD
    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=0.0)
    slv = BerryCurvatureSolver(h, _fbz2(), npt=48)
    g = np.asarray(slv.quantum_metric())           # (K, m, 2, 2)
    Om = np.asarray(slv.pack.Om)[:, :, 0, 1]       # (K, m)
    np.testing.assert_allclose(g, g.swapaxes(-1, -2), atol=1e-12)
    detg = g[..., 0, 0] * g[..., 1, 1] - g[..., 0, 1] * g[..., 1, 0]
    assert np.all(g[..., 0, 0] >= -1e-12) and np.all(g[..., 1, 1] >= -1e-12)
    assert np.all(detg + 1e-10 >= (Om / 2) ** 2)
    # both bands share the same metric in a two-band model
    np.testing.assert_allclose(g[:, 0], g[:, 1], atol=1e-10)
    # cached: second call returns the same object
    assert slv.quantum_metric() is slv.quantum_metric()


def test_berry_curvature_dipole_symmetry_anchors():
    # nonlinear Hall BCD (Fermi-surface form): exactly zero under inversion
    # (v odd, Omega even) and for mu in the gap; nonzero once inversion
    # breaks (M != 0) at a metallic mu; grid-converged
    from autobzcore_tpu.fourier import FourierSeries

    bz = _fbz2()
    mu_metal, beta = 0.8, 40.0

    def model(M, s=0.0):
        h = tb_haldane(t2=0.1, phi=np.pi / 2, M=M)
        c = np.array(h.c)
        c[1, 1, 0, 1] *= (1 + s)   # strengthen one NN bond (keeps inversion)
        c[1, 1, 1, 0] *= (1 + s)
        return FourierSeries(c, period=1.0, offset=(-1, -1), ndim=2)

    # inversion-symmetric (M=0), with and without bond anisotropy: D = 0
    for s in (0.0, 0.2):
        D = np.asarray(BerryCurvatureSolver(model(0.0, s), bz, npt=72)
                       .berry_curvature_dipole(mu=mu_metal, beta=beta))
        assert np.abs(D).max() < 1e-14
    # inversion broken, mu in the gap: no Fermi surface -> exponentially
    # small (exp(-beta gap/2) tail of -df/de)
    slv = BerryCurvatureSolver(model(0.3), bz, npt=96)
    Dgap = np.asarray(slv.berry_curvature_dipole(mu=0.0, beta=80.0))
    assert np.abs(Dgap).max() < 1e-8
    # inversion broken, metallic: nonzero and grid-converged
    D96 = np.asarray(slv.berry_curvature_dipole(mu=mu_metal, beta=beta))
    D192 = np.asarray(BerryCurvatureSolver(model(0.3), bz, npt=192)
                      .berry_curvature_dipole(mu=mu_metal, beta=beta))
    assert np.abs(D96).max() > 1e-3
    # Fermi-surface quantity: ~0.2% between npt=96 and the 192 anchor
    # (measured ladder 96/128/192/256: 0.0084827/69/92/92)
    np.testing.assert_allclose(D96, D192, atol=1e-8 + 5e-3 * np.abs(D192).max())
    # the BCD tensor is antisymmetric in its curvature indices
    np.testing.assert_allclose(D96, -D96.transpose(0, 2, 1), atol=1e-15)


def test_synthetic_wannier_hermitian_even_nr():
    # regression: the flip-based symmetrization paired c(-1) with c(2)^dag
    # on even-nr (uncentered) boxes, yielding a non-Hermitian H(k)
    from autobzcore_tpu.models.tight_binding import synthetic_wannier

    for nr in (3, 4, 5, 6):
        h = synthetic_wannier(3, nr=nr, ndim=2, seed=1)
        H = np.asarray(h(np.array([0.13, 0.37])))
        assert np.abs(H - H.conj().T).max() < 1e-12, nr


def test_quantum_metric_degtol_not_stale():
    # regression: the metric cache ignored degtol
    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=0.0)
    slv = BerryCurvatureSolver(h, _fbz2(), npt=12)
    g1 = np.asarray(slv.quantum_metric(degtol=1e-8))
    g2 = np.asarray(slv.quantum_metric(degtol=1e3))  # absurd: kills all pairs
    assert np.abs(g2).max() == 0.0
    assert np.abs(g1).max() > 0.0


def test_anomalous_nernst_mott_relation():
    # low-T anchor: N_xy -> (pi^2 / 3 beta) dI_xy/dmu (Mott), plus
    # exponential suppression in the gap (stable entropy form, no overflow)
    bz = _fbz2()
    slv = BerryCurvatureSolver(tb_haldane(t2=0.1), bz, npt=200)
    mu, beta = 0.8, 200.0
    N = float(np.asarray(slv.anomalous_nernst(mu=mu, beta=beta))[0, 1])
    d = 1e-3
    Ip = float(np.asarray(slv.ahc(mu=mu + d, beta=beta))[0, 1])
    Im_ = float(np.asarray(slv.ahc(mu=mu - d, beta=beta))[0, 1])
    mott = (np.pi**2 / (3 * beta)) * (Ip - Im_) / (2 * d)
    assert abs(N - mott) < 5e-3 * abs(mott)
    assert abs(float(np.asarray(slv.anomalous_nernst(mu=0.0, beta=beta))[0, 1])) < 1e-20


def test_certified_berry_chern_haldane():
    """certified_berry runs the rate-fitted npt ladder until the whole Chern
    vector is grid-converged: the certified values are integer-exact on the
    Haldane anchor and the certificate bounds the true npt->infinity error
    (the exact values are known: +-1)."""
    from autobzcore_tpu.models.berry import certified_berry

    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=0.0)
    res = certified_berry(h, _fbz2(), what="chern", abstol=1e-4, nmin=18,
                          nmax=240)
    assert res.retcode
    C = np.asarray(res.u)
    exact = np.array([1.0, -1.0]) * np.sign(C[0])
    # integer-exact to well inside the certificate
    assert np.all(np.abs(C - exact) <= max(res.resid, 1e-4))
    assert abs(abs(C[0]) - 1) < 1e-4 and abs(C[0] + C[1]) < 1e-9
    assert len(res.npts) >= 2 and res.npts[-1] > res.npts[0]


def test_certified_berry_honest_truncation():
    """nmax reached before the tolerance: retcode=False with the last rung
    delta as the certificate (no fake convergence)."""
    from autobzcore_tpu.models.berry import certified_berry

    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=0.0)
    res = certified_berry(h, _fbz2(), what="chern", abstol=1e-12, nmin=12,
                          nmax=30)
    assert not res.retcode
    assert res.resid > 1e-12
    assert res.npts[-1] >= 30


def test_certified_berry_ahc_kwargs():
    """Observable kwargs thread through (finite-temperature AHC)."""
    from autobzcore_tpu.models.berry import certified_berry

    h = tb_haldane(t1=1.0, t2=0.1, phi=np.pi / 2, M=0.0)
    res = certified_berry(h, _fbz2(), what="ahc", abstol=1e-4, nmin=18,
                          nmax=240, mu=0.0, beta=None)
    assert res.retcode
    I = np.asarray(res.u)
    assert abs(abs(I[0, 1]) - 1 / (2 * np.pi)) < 2e-4
