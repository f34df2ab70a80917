"""SrVO3 optical conductivity at fixed filling — the transport workload the
reference's machinery exists to serve (its cited application paper, SciPost
Phys. 15, 062 (2023), computes exactly these kinetic coefficients with the
BZ layer that ``aps_example`` demonstrates on the DOS).

Flow (all on one chip):
1. load the 3-band t2g Wannier Hamiltonian (``svo_hr.dat``);
2. build the symmetry-reduced (H, dH) spectral grid ONCE;
3. pin the chemical potential to the n=1 (d^1) filling with
   ``ElectronCountSolver.find_mu`` — bisection on the cached grid;
4. sweep the optical conductivity kernel ``sigma_ab(Omega)`` with the
   adaptive Fermi-window frequency integral (``alpha=0``), plus the alpha=1
   thermoelectric numerator at Omega=0.

Usage: python examples/transport_example.py [--npt 60] [--beta 40]
       [--eta 5e-3] [--nomega 32]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hr", default="/root/reference/aps_example/svo_hr.dat")
    p.add_argument("--wout", default="/root/reference/aps_example/svo.wout")
    p.add_argument("--npt", type=int, default=60)
    p.add_argument("--eta", type=float, default=5e-3)
    p.add_argument("--beta", type=float, default=40.0, help="1/kT in 1/eV")
    p.add_argument("--filling", type=float, default=1.0, help="electrons/cell")
    p.add_argument("--nomega", type=int, default=32)
    p.add_argument("--omega-max", type=float, default=2.0, help="eV")
    p.add_argument("--abstol", type=float, default=1e-5)
    p.add_argument("--out", default="svo_sigma.npz")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        # env mutation is too late here: with PALLAS_AXON_POOL_IPS set,
        # sitecustomize registered the axon backend at interpreter startup —
        # the post-import config update is the only effective pin
        jax.config.update("jax_platforms", "cpu")

    from autobzcore_tpu import FBZ, load_bz
    from autobzcore_tpu.io.wannier90 import (hamiltonian_fourier_series,
                                              read_w90_hrdat)
    from autobzcore_tpu.models.observables import spectral_velocity_pack
    from autobzcore_tpu.models.transport import (ElectronCountSolver,
                                                 KineticCoefficientSolver)
    from autobzcore_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    if not args.cpu:
        # TPU has no f64/c128: run the spectral grid and sweeps in c64/f32
        # (the package import force-enables x64 for CPU parity)
        jax.config.update("jax_enable_x64", False)
    hr = read_w90_hrdat(args.hr)
    h = hamiltonian_fourier_series(hr)
    bz = load_bz(FBZ(), args.wout)

    t0 = time.time()
    pack = spectral_velocity_pack(h, bz, args.npt)  # built ONCE, shared below
    ec = ElectronCountSolver(h, bz, args.npt, pack=pack)
    mu = ec.find_mu(args.filling, args.beta)
    t_mu = time.time() - t0
    print(f"mu(n={args.filling}, beta={args.beta}) = {mu:.6f} eV "
          f"[{t_mu:.1f} s incl. spectral build]; n(mu) = {ec(mu, args.beta):.6f}")

    t0 = time.time()
    kc = KineticCoefficientSolver(h, bz, args.npt, eta=args.eta,
                                  beta=args.beta, alpha=0, mu=mu, pack=pack)
    omegas = np.linspace(0.0, args.omega_max, args.nomega)
    sigma = kc.sweep(omegas, abstol=args.abstol)
    t_sig = time.time() - t0
    print(f"sigma(Omega) sweep: {args.nomega} frequencies in {t_sig:.1f} s "
          f"({kc.numevals} GK integrand evals, scan-chunked, "
          f"certified={kc.retcode})")
    print(f"  sigma_xx(0)   = {sigma[0, 0, 0]:.6f}")
    print(f"  sigma_xx(max) = {sigma[-1, 0, 0]:.6f}")

    kc1 = KineticCoefficientSolver(h, bz, args.npt, eta=args.eta,
                                   beta=args.beta, alpha=1, mu=mu, pack=pack)
    a1 = kc1(np.array([0.0]), abstol=args.abstol)[0]
    print(f"  alpha=1 numerator A1_xx(0) = {a1[0, 0]:.6f} (thermopower ~ A1/A0)")

    np.savez(args.out, omegas=omegas, sigma=sigma, mu=mu, a1=a1,
             beta=args.beta, eta=args.eta, npt=args.npt)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
