"""Smoke tests: the shipped example scripts stay runnable (tiny configs).

The flagship aps_example needs the TPU tunnel and minutes of compile, so it
is exercised by the driver/BASELINE runs instead; these cover the pure-CPU
examples' argument plumbing and happy paths.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu")


def _run(args, timeout=240):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "topology_example.py"),
         *args, "--cpu"],
        capture_output=True, text=True, timeout=timeout, env=ENV, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_topology_example_weyl(tmp_path):
    os.chdir(tmp_path)
    stdout = _run(["weyl", "--npt", "12", "--nkz", "5"])
    assert "slice Chern" in stdout
    assert "-1.0" in stdout and "+0.0" in stdout


def test_topology_example_phase(tmp_path):
    os.chdir(tmp_path)
    stdout = _run(["phase", "--n", "5", "--npt", "10"])
    assert "phase diagram 5x5" in stdout
    # both topological lobes and the trivial region appear
    assert "+" in stdout and "-" in stdout and "." in stdout
