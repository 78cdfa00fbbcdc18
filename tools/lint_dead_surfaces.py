"""Dead-surface lint: no op module or public symbol may be unreachable.

Role-port of tools/lint-wasm-dead-code.js (reference: Twiggy over the WASM
binaries, --strict in CI — "primary modules must have zero dead functions").
Here: every module under watfft_tpu/ must be imported somewhere else in the
package/tests/tools/bench, and every name in a module's __all__ must be
referenced outside its defining module. Exits nonzero in --strict mode.

Usage: python tools/lint_dead_surfaces.py [--strict]
"""

import ast
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _iter_py(dirs):
    for d in dirs:
        for base, _, files in os.walk(os.path.join(ROOT, d)):
            if "__pycache__" in base:
                continue
            for f in files:
                if f.endswith(".py"):
                    yield os.path.join(base, f)


def main():
    package_files = list(_iter_py(["watfft_tpu"]))
    all_files = list(_iter_py(["watfft_tpu", "tests", "tools", "scripts",
                               "examples"])) + [
        os.path.join(ROOT, "bench.py"), os.path.join(ROOT, "__graft_entry__.py")]
    sources = {p: open(p).read() for p in all_files if os.path.exists(p)}

    problems = []

    # 1. module reachability
    for p in package_files:
        rel = os.path.relpath(p, ROOT)
        mod = os.path.splitext(os.path.basename(p))[0]
        if mod in ("__init__", "__main__"):
            continue
        referenced = any(mod in src for q, src in sources.items() if q != p)
        if not referenced:
            problems.append(f"dead module: {rel} (never imported)")

    # 2. __all__ symbol reachability
    for p in package_files:
        rel = os.path.relpath(p, ROOT)
        try:
            tree = ast.parse(sources[p])
        except SyntaxError as e:
            problems.append(f"syntax error in {rel}: {e}")
            continue
        exported = []
        for node in ast.walk(tree):
            if (isinstance(node, ast.Assign) and len(node.targets) == 1
                    and isinstance(node.targets[0], ast.Name)
                    and node.targets[0].id == "__all__"
                    and isinstance(node.value, (ast.List, ast.Tuple))):
                exported = [e.value for e in node.value.elts
                            if isinstance(e, ast.Constant)]
        for name in exported:
            used = any(name in src for q, src in sources.items() if q != p)
            if not used:
                problems.append(f"dead export: {rel}:__all__ -> {name}")

    if problems:
        print("\n".join(problems))
        if "--strict" in sys.argv:
            sys.exit(1)
    else:
        print(f"OK: {len(package_files)} modules, no dead surfaces")
    sys.exit(0)


if __name__ == "__main__":
    main()
