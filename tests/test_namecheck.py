"""Static undefined-name audit as CI (VERDICT r3 weak #1 bug class)."""
import ast
import sys
import textwrap
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import namecheck  # noqa: E402


def test_package_has_no_undefined_names(tmp_path):
    findings = namecheck.run()
    assert findings == [], "\n".join(findings)


def test_checker_catches_planted_nameerror(tmp_path):
    bad = tmp_path / "bad.py"
    bad.write_text(textwrap.dedent("""
        def outer(a, b):
            def inner(x):
                return x + axis  # undefined: the r3 bug shape
            return inner(a)
    """))
    findings = namecheck.run([bad])
    assert len(findings) == 1 and "axis" in findings[0]


def test_checker_scope_chain_no_false_positives(tmp_path):
    ok = tmp_path / "ok.py"
    ok.write_text(textwrap.dedent("""
        import numpy as np
        G = 3
        class C:
            def m(self, coords):
                def batch(xs, pp):
                    def one(x):
                        return coords, pp, xs, x, G, np, C, helper
                    return [one(v) for v in xs]
                return batch
        def helper(y=None, *args, **kw):
            with open("f") as fh:
                z = [w + y for w in args]
            try:
                pass
            except ValueError as e:
                z.append(e)
            lam = lambda t: t + y
            for i, j in enumerate(z):
                pass
            return fh, z, lam, i, j, kw
    """))
    assert namecheck.run([ok]) == []
