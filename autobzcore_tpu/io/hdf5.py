"""HDF5 persistence for parameter sweeps.

Native equivalent of reference ``ext/HDF5Ext.jl``: ``batchsolve(h5, solver,
ps)`` allocates datasets ``I, E, t, retcode, numevals`` plus the parameter
record (``HDF5Ext.jl:123-133``) and writes + flushes each result as it
completes (``:135-149``) so a crash loses at most in-flight parameters.
``AuxValue`` results are split into ``I/val`` and ``I/aux`` groups for
interoperability (``:48-55``).  Also NamedTuple<->h5 (de)serialization
(``:17-38``) as dict<->h5.

No lock is needed: results stream from the (already parallel, on-device)
sweep in order.
"""
from __future__ import annotations

import sys
import time

import numpy as np

from ..interfaces import IntegralSolver
from ..parameters import MixedParameters
from ..wrappers import AuxValue


def _h5py():
    import h5py

    return h5py


def write_dict_to_h5(d: dict, filename):
    h5py = _h5py()
    with h5py.File(filename, "w") as h5:
        _write_group(d, h5)


def _write_group(d, g):
    for key, val in d.items():
        if isinstance(val, dict):
            _write_group(val, g.create_group(str(key)))
        else:
            g[str(key)] = np.asarray(val)


def read_h5_to_dict(filename):
    h5py = _h5py()

    def rec(g):
        out = {}
        for key in g:
            item = g[key]
            out[key] = rec(item) if isinstance(item, h5py.Group) else item[()]
        return out

    with h5py.File(filename, "r") as h5:
        return rec(h5)


def _param_record(h5, ps):
    """Record the swept parameters under ``args``/``kwargs`` groups."""
    first = ps[0]
    g = h5.create_group("p")
    if isinstance(first, MixedParameters):
        args = g.create_group("args")
        for i in range(len(first.args)):
            args[str(i + 1)] = np.asarray([p.args[i] for p in ps])
        kwargs = g.create_group("kwargs")
        for key in first.kwargs:
            kwargs[key] = np.asarray([p.kwargs[key] for p in ps])
    else:
        g["args"] = np.asarray(ps)


def batchsolve_h5(filename_or_h5, solver: IntegralSolver, ps, verbose=True,
                  resume=False, nthreads=1):
    """Threaded-sweep-with-persistence equivalent: solve ``solver`` at each
    parameter, writing each result incrementally with flush.

    With ``resume=True`` an existing file is reopened and parameters whose
    results were already written (``retcode >= 0``) are skipped — a crashed
    sweep continues from the first missing entry (auto-resume, beyond the
    reference's flush-only persistence, ``ext/HDF5Ext.jl:133-149``).

    ``nthreads > 1`` pipelines the solves across host threads (the
    reference's h5 ``batchsolve`` is threaded with a locked writer callback,
    ``ext/HDF5Ext.jl:135-149``); completions are re-ordered so rows are
    written and flushed **in index order** — the resume invariant (done rows
    form a prefix-per-order pattern) and the file contents are identical to
    the serial sweep, only the wall-time column reflects the pipelining.

    Returns the array of integral values.
    """
    import os

    h5py = _h5py()
    own = isinstance(filename_or_h5, str)
    resuming = resume and own and os.path.exists(filename_or_h5)
    h5 = h5py.File(filename_or_h5, "a" if resuming else "w") if own else filename_or_h5
    try:
        ps = list(ps)
        n = len(ps)
        if resuming and "retcode" in h5:
            if h5["retcode"].shape[0] != n:
                raise ValueError(
                    f"resume: file has {h5['retcode'].shape[0]} parameters, sweep has {n}"
                )
            aux = "I" in h5 and isinstance(h5["I"], h5py.Group)
            if aux:
                dval, daux = h5["I/val"], h5["I/aux"]
            else:
                dI = h5["I"]
            dE, dt, drc, dnev = h5["E"], h5["t"], h5["retcode"], h5["numevals"]
            sol0 = None
            tcache = None
        else:
            wall0 = time.time()
            if nthreads is not None and int(nthreads) > 1:
                # solve row 0 through the same shared cache the threads will
                # use, instead of compiling a second one via solver.solve_p
                from ..interfaces import IntegralProblem, init as _init
                from ..parallel.sweep import threaded_solve_iter

                prob = IntegralProblem(solver.f, solver.dom)
                tcache = _init(prob, solver.alg, **solver.kwargs)
                _, sol0, _ = next(threaded_solve_iter(
                    prob, solver.alg, [ps[0]], cache=tcache))
            else:
                tcache = None
                sol0 = solver.solve_p(ps[0])
            wall0 = time.time() - wall0
            u0 = sol0.u
            aux = isinstance(u0, AuxValue)

            def make_dset(name, proto):
                arr = np.asarray(proto)
                return h5.create_dataset(name, shape=(n,) + arr.shape, dtype=arr.dtype)

            if aux:
                h5.create_group("I")
                dval = make_dset("I/val", u0.val)
                daux = make_dset("I/aux", u0.aux)
            else:
                dI = make_dset("I", u0)
            dE = h5.create_dataset("E", shape=(n,), dtype=np.float64)
            dt = h5.create_dataset("t", shape=(n,), dtype=np.float64)
            drc = h5.create_dataset("retcode", shape=(n,), dtype=np.int8)
            drc[...] = -1  # -1 == not yet computed (resume sentinel)
            dnev = h5.create_dataset("numevals", shape=(n,), dtype=np.int64)
            _param_record(h5, ps)

        done = np.asarray(drc[...]) >= 0

        def write_row(i, sol, wall):
            if aux:
                dval[i] = np.asarray(sol.u.val)
                daux[i] = np.asarray(sol.u.aux)
            else:
                dI[i] = np.asarray(sol.u)
            dE[i] = float(np.real(np.complex128(0 if sol.resid is None else np.asarray(sol.resid).sum())))
            dt[i] = wall
            dnev[i] = sol.numevals
            drc[i] = 1 if sol.retcode else 0  # written LAST: marks the row done
            h5.flush()  # crash loses at most the in-flight parameter
            if verbose:
                # progress logging parity with the reference's per-batch
                # @info (ext/HDF5Ext.jl:140-147); writes are index-ordered
                print(f"batchsolve_h5: wrote {i + 1}/{n} ({wall:.3g}s)",
                      file=sys.stderr)

        out = [None] * n
        for i in np.nonzero(done)[0]:
            out[i] = AuxValue(dval[i], daux[i]) if aux else dI[i]
        pending = [i for i in range(n) if not done[i]]
        if nthreads is not None and int(nthreads) > 1 and pending:
            from ..interfaces import IntegralProblem, init as _init
            from ..parallel.sweep import threaded_solve_iter

            prob = IntegralProblem(solver.f, solver.dom)
            if tcache is None:  # resuming: no warmup solve was needed
                tcache = _init(prob, solver.alg, **solver.kwargs)
            if sol0 is not None:  # row 0 already solved for dataset sizing
                write_row(0, sol0, wall0)
                out[0] = sol0.u
                pending = [i for i in pending if i != 0]
            for j, sol, wall in threaded_solve_iter(
                prob, solver.alg, [ps[i] for i in pending],
                nthreads=nthreads, cache=tcache,
            ):
                i = pending[j]
                write_row(i, sol, wall)
                out[i] = sol.u
        else:
            for i in pending:
                t0 = time.time()
                sol = sol0 if (i == 0 and sol0 is not None) else solver.solve_p(ps[i])
                write_row(i, sol, time.time() - t0)
                out[i] = sol.u
        return out
    finally:
        if own:
            h5.close()
