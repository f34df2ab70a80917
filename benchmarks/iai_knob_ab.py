"""Depth-knob A/B matrix for the flagship warm IAI leg (round 4).

The warm scan leg is depth-bound, not eval-bound (docs/DESIGN.md): three
nested while_loops whose trip counts multiply, each iteration far below
device saturation.  The levers are shipped as default-preserving knobs
(--iai-chunk / --iai-leaf-nbisect / --iai-inner-seed-width); CPU eval
counts mis-rank them (extra evals ride in idle vmap lanes), so the
ranking A/B runs on the real chip and is recorded as multi-run spreads
(the hosted tunnel has 4-7x per-run dispatch variance — BASELINE.md).

Each config runs ``examples/aps_example.py --with-iai --skip-ptr`` in a
subprocess, parses the IAI wall + eval telemetry off stderr, checks the
DOS values against the first config's (the knobs must not change
results), and appends a JSON line to the log so the sweep is
restartable.

Usage: python benchmarks/iai_knob_ab.py [--reps 2] [--log FILE]
       [--configs NAME ...]
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> extra argv for aps_example.py
CONFIGS = {
    "shipped": [],
    "leaf4": ["--iai-leaf-nbisect", "4"],
    "seedw8": ["--iai-inner-seed-width", "8"],
    "leaf4+seedw8": ["--iai-leaf-nbisect", "4", "--iai-inner-seed-width", "8"],
    "chunk66": ["--iai-chunk", "66"],
    "chunk16": ["--iai-chunk", "16"],
    "leaf2": ["--iai-leaf-nbisect", "2"],
    "seedw16": ["--iai-inner-seed-width", "16"],
    "presplit4": ["--iai-leaf-presplit", "4"],
    "presplit8": ["--iai-leaf-presplit", "8"],
    "presplit4+seedw8": ["--iai-leaf-presplit", "4",
                         "--iai-inner-seed-width", "8"],
    "cold": ["--cold-iai"],
}

WALL_RE = re.compile(r"IAI interpolant \((\w[\w-]*)\): ([0-9.]+)s"
                     r"(?:, ([0-9.e+]+) integrand evals over (\d+) omegas)?")


def run_one(name, extra, rep, log):
    out_npz = f"/tmp/iai_ab_{name.replace('+', '_')}_{rep}.npz"
    cmd = [sys.executable, os.path.join(ROOT, "examples", "aps_example.py"),
           "--with-iai", "--skip-ptr", "--out", out_npz] + extra
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT,
                          timeout=3600)
    wall_total = time.time() - t0
    rec = {"config": name, "rep": rep, "wall_total_s": round(wall_total, 1),
           "rc": proc.returncode, "ts": time.time()}
    m = WALL_RE.search(proc.stderr)
    if m:
        rec["iai_wall_s"] = float(m.group(2))
        if m.group(3):
            rec["evals"] = float(m.group(3))
            rec["omegas"] = int(m.group(4))
    cm = re.search(r"IAI chunk evals: (.+)", proc.stderr)
    if cm:
        rec["chunk_evals"] = [float(v) for v in cm.group(1).split()]
    if proc.returncode != 0:
        rec["stderr_tail"] = proc.stderr[-2000:]
    else:
        rec["npz"] = out_npz
    with open(log, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    return rec


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--log", default="/tmp/iai_knob_ab.jsonl")
    p.add_argument("--configs", nargs="*", default=None,
                   help="subset of config names (default: all)")
    args = p.parse_args(argv)

    names = args.configs or list(CONFIGS)
    done = set()
    if os.path.exists(args.log):
        with open(args.log) as fh:
            for line in fh:
                r = json.loads(line)
                if r.get("rc") == 0:
                    done.add((r["config"], r["rep"]))

    ref_dos = None
    for rep in range(args.reps):
        for name in names:
            if (name, rep) in done:
                print(f"skip {name} rep{rep} (logged)", file=sys.stderr)
                continue
            rec = run_one(name, CONFIGS[name], rep, args.log)
            tag = f"{name} rep{rep}"
            if rec["rc"] != 0:
                print(f"FAIL {tag}: rc={rec['rc']}", file=sys.stderr)
                continue
            # knobs must not change results: compare DOS curves
            dos = np.load(rec["npz"])["dos_iai"]
            if name != "cold":  # cold vs warm may differ within abstol
                if ref_dos is None:
                    ref_dos = dos
                else:
                    delta = float(np.max(np.abs(dos - ref_dos)))
                    rec["max_dos_delta"] = delta
                    # knobs change the refinement PATH, so agreement is
                    # within the certificate, not bitwise
                    if delta > 2e-3:
                        print(f"WARN {tag}: DOS delta {delta:.2e}",
                              file=sys.stderr)
            print(f"done {tag}: iai={rec.get('iai_wall_s')}s "
                  f"evals/omega={rec.get('evals', 0) / max(rec.get('omegas', 1), 1):.3g}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
