"""CPU warm-scan anchor: the 12-omega SrVO3 DOS slice used for knob A/Bs.

The flagship warm IAI leg is depth-bound (docs/DESIGN.md), so knob
rankings must come from TPU wall clock — but VALUE CORRECTNESS of a knob
(wider seed consumption, wider leaf bisection) is checkable cheaply on
CPU: every config must reproduce the shipped config's DOS values to the
certificate, with per-omega eval counts recorded for the eval-cost side
of the tradeoff.  This is the "CPU anchor" referenced throughout
BASELINE.md round-4 tables: 12 omegas at 5 meV spacing straddling the
12.5 eV DOS peak, eta=1e-2, abstol=1e-3, warm scan (sorted order).

Usage: python benchmarks/warm_anchor.py [--configs shipped seedw16 ...]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "shipped": {},
    "cold": {"warm": False},
    "leaf2": {"leaf_nbisect": 2},
    "leaf4": {"leaf_nbisect": 4},
    "seedw8": {"inner_seed_width": 8},
    "seedw16": {"inner_seed_width": 16},
    "leaf4+seedw8": {"leaf_nbisect": 4, "inner_seed_width": 8},
    "leaf4+seedw16": {"leaf_nbisect": 4, "inner_seed_width": 16},
    "presplit4": {"leaf_presplit": 4},
    "presplit8": {"leaf_presplit": 8},
    "presplit4+seedw8": {"leaf_presplit": 4, "inner_seed_width": 8},
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="*", default=None)
    p.add_argument("--hr", default="/root/reference/aps_example/svo_hr.dat")
    p.add_argument("--wout", default="/root/reference/aps_example/svo.wout")
    p.add_argument("--abstol", type=float, default=1e-3)
    p.add_argument("--chunk", type=int, default=12)
    args = p.parse_args(argv)

    import jax

    if jax.devices()[0].platform == "cpu":
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import jax.numpy as jnp

    from autobzcore_tpu import CubicSymIBZ, FourierIntegrand, IntegralProblem, load_bz
    from autobzcore_tpu.brillouin import IAI
    from autobzcore_tpu.io.wannier90 import hamiltonian_fourier_series, read_w90_hrdat
    from autobzcore_tpu.models.observables import dos_trace
    from autobzcore_tpu.parallel.sweep import SweepSolver

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        jax.config.update("jax_enable_x64", False)
    cdtype = jnp.complex64 if on_tpu else jnp.complex128

    hr = read_w90_hrdat(args.hr)
    h = hamiltonian_fourier_series(hr, dtype=cdtype)
    bz = load_bz(CubicSymIBZ(), args.wout)
    eta = 1e-2
    integrand = FourierIntegrand(lambda hv, om, eta=None: dos_trace(hv, om, eta=eta),
                                 h, eta=eta)
    prob = IntegralProblem(integrand, bz)
    omegas = 12.5 + 0.005 * (np.arange(12) - 5.5)

    names = args.configs or list(CONFIGS)
    ref = None
    for name in names:
        kw = dict(CONFIGS[name])
        warm = kw.pop("warm", True)
        alg = IAI(inner_cap=128, warm_width=8, **kw)
        solver = SweepSolver(prob, alg, abstol=args.abstol,
                             chunk=args.chunk, scan=True, warm=warm)
        t0 = time.time()
        vals = np.asarray(solver(omegas), dtype=np.complex128).real
        wall = time.time() - t0
        rec = {"config": name, "wall_s": round(wall, 2),
               "evals_per_omega": float(solver.numevals) / len(omegas),
               "retcode": bool(solver.retcode),
               "dos": [round(float(v), 8) for v in vals]}
        if name == "shipped":
            ref = vals
        elif ref is not None:
            rec["max_delta_vs_shipped"] = float(np.max(np.abs(vals - ref)))
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
