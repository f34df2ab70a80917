"""Flagship benchmark: SrVO3 Wannier DOS throughput on TPU.

Measures the BASELINE.json headline metric — H(k) evaluation + eigh k-points
per second on the SrVO3 3-band Wannier Hamiltonian — plus the end-to-end
1000-omega broadened-DOS sweep (the aps_example workload, reference
``aps_example/aps_example.jl:25-39``).  The baseline is a measured
single-threaded numpy implementation of the identical computation (proxy for
the reference's single-threaded Julia, which is not installed in this image).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("OMP_NUM_THREADS", "1")  # keep the numpy baseline honest


def _wait_for_tunnel():
    """Hosted-TPU tunnels fail by HANGING: a dead worker blocks the first
    PJRT client creation forever (no timeout in the dial), so a wedged
    tunnel would hang this whole benchmark at ``jax.devices()``.  Probe in
    a KILLABLE subprocess and wait up to BENCH_TUNNEL_WAIT seconds (default
    1800 — observed outages heal on worker restart) before touching the
    device in-process.  If the deadline expires with the tunnel still dead,
    fall back to CPU (re-exec without the tunnel env) rather than hang: an
    honestly-annotated CPU artifact beats a killed run with no artifact.
    No-op when the tunnel env is absent (CPU runs)."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    import subprocess

    deadline = time.time() + float(os.environ.get("BENCH_TUNNEL_WAIT", "1800"))
    probe = ("import jax, jax.numpy as jnp; "
             "x = jnp.ones((64, 64)); assert float((x @ x).sum()) == 64.0**3")
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe], timeout=90,
                               capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print("bench: TPU tunnel still unresponsive after BENCH_TUNNEL_WAIT; "
                  "falling back to CPU (result annotated)", file=sys.stderr)
            env = dict(os.environ)
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env["JAX_PLATFORMS"] = "cpu"
            env["BENCH_CPU_FALLBACK"] = "1"
            os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)
        print("bench: TPU tunnel unresponsive, retrying in 60 s", file=sys.stderr)
        time.sleep(60)


def main():
    _wait_for_tunnel()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_series
    from autobzcore_tpu.ops.fourier_eval import evaluate_grid

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    cdtype = jnp.complex64 if on_tpu else jnp.complex128
    s = _flagship_series(cdtype)
    m = s.c.shape[-1]

    npt = 100
    u = [np.arange(npt) / npt] * 3
    offsets, periods, sndim = s.offset, s.period, s.sndim

    # complex coefficients enter split as (re, im): TPU backends reject
    # complex runtime parameters
    from autobzcore_tpu.ops.eigh3 import eigvalsh_small

    @jax.jit
    def hk_eigh(c_re, c_im):
        hk = evaluate_grid(c_re + 1j * c_im, sndim, u, offsets, periods, None, cdtype)
        hk = hk.reshape(-1, m, m)
        e = eigvalsh_small(hk)  # closed-form 3x3 Hermitian eigenvalues
        # checksum forces materialization through the remote-device tunnel
        return e, jnp.sum(e).astype(jnp.float32)

    FULL = os.environ.get("BENCH_FULL", "") == "1"

    # XLA's fusion is already bandwidth-optimal for this reduction: a Pallas
    # VMEM-tiled kernel measured 40.5/33.3/28.8 ms vs XLA's 38.9/27.5/30.0 ms
    # on (K=1e6,m=3), (22k,3), (30k,30) x 1000 omegas (v5e, r2) — no win, so
    # the kernel was removed (docs/DESIGN.md "Pallas verdict").
    @jax.jit
    def dos_sweep(e, omegas, eta):
        lor = eta / ((omegas[:, None, None] - e[None, :, :]) ** 2 + eta**2) / jnp.pi
        d = jnp.mean(jnp.sum(lor, axis=2), axis=1)
        return d, jnp.sum(d).astype(jnp.float32)

    c_np = np.asarray(s.c)
    rdt = np.float32 if on_tpu else np.float64
    c_re = jax.device_put(jnp.asarray(c_np.real, rdt), dev)
    c_im = jax.device_put(jnp.asarray(c_np.imag, rdt), dev)

    # warmup + compile; float(checksum) blocks on the actual computation
    e, chk = hk_eigh(c_re, c_im)
    float(chk)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        e, chk = hk_eigh(c_re, c_im)
        float(chk)
    t_grid = (time.perf_counter() - t0) / reps

    # sustained device throughput: chain LOOPS iterations inside one program
    # so per-dispatch transport latency (which floors t_grid ~8x through the
    # hosted tunnel) amortizes away — the number production sweeps see, where
    # dispatches chain on device
    LOOPS = 20

    @jax.jit
    def hk_eigh_rep(c_re, c_im):
        def body(i, acc):
            hk = evaluate_grid((c_re + acc * 0) + 1j * c_im, sndim, u, offsets,
                               periods, None, cdtype)
            hk = hk.reshape(-1, m, m)
            return acc + jnp.sum(eigvalsh_small(hk)).astype(jnp.float32)

        return jax.lax.fori_loop(0, LOOPS, body, jnp.float32(0.0))

    float(hk_eigh_rep(c_re, c_im))
    t0 = time.perf_counter()
    float(hk_eigh_rep(c_re, c_im))
    t_amort = (time.perf_counter() - t0) / LOOPS
    kpts_per_sec = npt**3 / t_amort

    omegas = jnp.linspace(10.0, 15.0, 1000, dtype=np.float32 if on_tpu else np.float64)
    eta = jnp.asarray(0.01, omegas.dtype)
    d, dchk = dos_sweep(e, omegas, eta)
    float(dchk)
    t0 = time.perf_counter()
    d, dchk = dos_sweep(e, omegas, eta)
    float(dchk)
    t_sweep = time.perf_counter() - t0

    # single-threaded numpy baseline on a subsample, extrapolated
    # (rebuild coefficients host-side; device->host c64 transfer is not
    # supported by the TPU tunnel)
    try:
        from autobzcore_tpu.io.wannier90 import hamiltonian_fourier_series, read_w90_hrdat

        hr = read_w90_hrdat("/root/reference/aps_example/svo_hr.dat")
        import jax as _jax

        with _jax.default_device(_jax.devices("cpu")[0]):
            C = np.asarray(hamiltonian_fourier_series(hr).c, dtype=np.complex128)
    except (OSError, ValueError):
        C = np.zeros(s.c.shape, dtype=np.complex128)
    nb = 4096
    rng = np.random.default_rng(0)
    ks = rng.uniform(size=(nb, 3))
    freqs = [o + np.arange(n) for o, n in zip(offsets, C.shape[:3])]
    t0 = time.perf_counter()
    ph = [np.exp(2j * np.pi * np.outer(ks[:, j], freqs[j])) for j in range(3)]
    hk_np = np.einsum("ka,kb,kc,abcij->kij", ph[0], ph[1], ph[2], C, optimize=True)
    np.linalg.eigvalsh(hk_np)
    t_np = time.perf_counter() - t0
    np_rate = nb / t_np

    # secondary: full-f64 split-complex path (the abstol<=1e-5 tier).
    # The default lane measures a small grid so every recorded round artifact
    # carries a real f64 number (VERDICT r2 weak #3); BENCH_FULL=1 runs the
    # full npt=100^3 f64 grid as well.
    from autobzcore_tpu.ops.csplit_eval import evaluate_grid_split
    from autobzcore_tpu.ops.eigh3 import eigvalsh3_split

    npt64 = npt if FULL else 48
    u64 = [np.arange(npt64) / npt64] * 3
    LOOPS64 = 1 if FULL else 5  # amortize dispatch latency on the small grid

    @jax.jit
    def hk_eigh_f64(c_re, c_im):
        def body(i, acc):
            hr, hi = evaluate_grid_split(c_re + acc * 0, c_im, sndim, u64, offsets,
                                         periods, jnp.float64)
            hr = hr.reshape(-1, m, m)
            hi = hi.reshape(-1, m, m)
            return acc + jnp.sum(eigvalsh3_split(hr, hi)).astype(jnp.float32)

        return jax.lax.fori_loop(0, LOOPS64, body, jnp.float32(0.0))

    try:
        c_re64 = jax.device_put(jnp.asarray(c_np.real, jnp.float64), dev)
        c_im64 = jax.device_put(jnp.asarray(c_np.imag, jnp.float64), dev)
        float(hk_eigh_f64(c_re64, c_im64))
        t0 = time.perf_counter()
        float(hk_eigh_f64(c_re64, c_im64))
        t_f64 = (time.perf_counter() - t0) / LOOPS64
        f64_rate = npt64**3 / t_f64
    except Exception as exc:  # pragma: no cover - informational
        t_f64, f64_rate = float("nan"), float("nan")
        print(f"# f64 split path failed: {str(exc)[:80]}", file=sys.stderr)

    # north-star canary: a small certified auto-ladder on the REAL SrVO3
    # curve (rate-fitted rung scheduler, dos/fullgrid.next_rung_npt +
    # ops/grid_sweep engine — the machinery behind the 94 s converged-ladder
    # record).  eta=0.1 keeps the rungs CPU-safe (~16-96); the recorded
    # certificate/wall catch regressions in the scheduler or the slab engine
    # that the throughput lanes above cannot see (VERDICT r3 weak #5).
    ladder_wall, ladder_cert, ladder_rungs, ladder_ok, ladder_dos = (
        float("nan"), float("nan"), [], False, float("nan"))
    try:
        from autobzcore_tpu import FBZ, load_bz
        from autobzcore_tpu.dos import (DOSProblem, LorentzianFullGrid,
                                        init as dos_init)
        from autobzcore_tpu.io.wannier90 import hamiltonian_fourier_series

        h = hamiltonian_fourier_series(hr)
        bz3 = load_bz(FBZ(), np.eye(3))
        Es = np.linspace(10.0, 15.0, 32)
        alg = LorentzianFullGrid(0.1, nmin=16, nmax=256, schedule="auto")
        cache = dos_init(DOSProblem(h, Es, bz3), alg, abstol=1e-5)
        alg.dos_sweep(cache.cacheval, Es, abstol=1e-5)  # warm compile
        cache.cacheval.pop("ladder_hint", None)  # measure the FULL ladder
        t0 = time.perf_counter()
        D, lerr, lok, lnev = alg._ladder(cache.cacheval, Es, 1e-5, None, None)
        ladder_wall = time.perf_counter() - t0
        ladder_cert = float(lerr)
        ladder_ok = bool(lok)
        ladder_dos = float(D[np.argmin(np.abs(Es - 12.5))])
        # the certifying rung pair the scheduler landed on
        hint = cache.cacheval.get("ladder_hint")
        ladder_rungs = [int(x) for x in hint[:2]] if hint else []
    except Exception as exc:  # pragma: no cover - informational
        print(f"# ladder lane failed: {str(exc)[:120]}", file=sys.stderr)

    # warm-machinery canary: a small warm-vs-cold adaptive scan (2D
    # tight-binding Green's function).  The cross-omega warm start's hot
    # path (coarsen_pool / _coarsen_partition / mid-seed harvest) has a
    # MEASURED failure mode — naive coarsening made warm seeds cost MORE
    # than cold (2.43e6 vs 1.58e6 evals/omega, BASELINE.md r4) — so the
    # artifact records the evals ratio (< 1 expected) and the value delta
    # (certificate-bounded) every round (VERDICT r4 #5).
    warm_ratio, warm_delta = float("nan"), float("nan")
    try:
        from autobzcore_tpu import (FBZ as _FBZ, IAI, FourierIntegrand,
                                    IntegralProblem, load_bz as _load_bz)
        from autobzcore_tpu.models import tb_integer
        from autobzcore_tpu.models.observables import dos_trace
        from autobzcore_tpu.parallel.sweep import SweepSolver

        # the canary is a MACHINERY check (eval counts are
        # hardware-independent); it runs f64 on the CPU backend — the
        # package import enables x64, and an f64 warm-scan program
        # SIGABRTs the hosted TPU compile helper
        with jax.default_device(jax.devices("cpu")[0]):
            bz2 = _load_bz(_FBZ(), 2 * np.pi * np.eye(2))
            fi = FourierIntegrand(dos_trace, tb_integer(2), eta=0.1)
            prob2 = IntegralProblem(fi, bz2)
            oms2 = np.linspace(-3.0, 3.0, 64)
            alg2 = IAI(inner_cap=64, inner_nbisect=2)
            # abstol 1e-5: at 1e-4 the COLD solve's single-segment GK
            # estimate is deceived at omega=+-0.905 (true error 2.8e-3 at
            # certified 1e-4 — see NestedQuad.nest_presplit), which would
            # dominate warm_max_delta and mask real warm-machinery
            # regressions; at 1e-5 both paths are honest (measured ratio
            # 0.66, delta 5.5e-6)
            cold_sw = SweepSolver(prob2, alg2, abstol=1e-5, chunk=16,
                                  scan=True)
            uc2 = np.asarray(cold_sw(oms2))
            warm_sw = SweepSolver(prob2, alg2, abstol=1e-5, chunk=16,
                                  scan=True, warm=True)
            uw2 = np.asarray(warm_sw(oms2))
        warm_ratio = warm_sw.numevals / max(cold_sw.numevals, 1)
        warm_delta = float(np.max(np.abs(uw2 - uc2)))
    except Exception as exc:  # pragma: no cover - informational
        print(f"# warm canary failed: {str(exc)[:120]}", file=sys.stderr)

    result = {
        "metric": "svo3_hk_eigh_kpoints_per_sec",
        "value": round(kpts_per_sec, 1),
        "unit": "k-points/s sustained (npt=100^3, 3-band H(k) contraction + eigh, device-chained)",
        "vs_baseline": round(kpts_per_sec / np_rate, 2),
        "f64_split_kpoints_per_sec": round(f64_rate, 1),
        "ladder_wall_s": round(ladder_wall, 3),
        "ladder_cert": ladder_cert,
        "ladder_retcode": ladder_ok,
        "ladder_final_rungs": ladder_rungs,
        "ladder_dos_12p5": ladder_dos,
        "warm_evals_ratio": round(warm_ratio, 4),
        "warm_max_delta": warm_delta,
    }
    if os.environ.get("BENCH_CPU_FALLBACK") == "1":
        result["device"] = "cpu-fallback (TPU tunnel unreachable past BENCH_TUNNEL_WAIT)"
    print(
        f"# device={dev.platform} grid_dispatch={t_grid:.4f}s grid_amortized={t_amort:.4f}s "
        f"sweep_1000w={t_sweep:.4f}s f64split_time={t_f64:.4f}s at npt={npt64} "
        f"({f64_rate:.0f} kpts/s) numpy_1thread={np_rate:.0f} kpts/s",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
