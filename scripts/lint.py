#!/usr/bin/env python
"""Static checks (stdlib-only) — the L5 analogue of the reference's
clang-tidy / format gates (.github/workflows/static_checks.yaml,
format-check.yml).  Checks, per Python file:

  unused-import        imported name never referenced (tidy's equivalent)
  mutable-default      def f(x=[]) / (x={}) / (x=set())
  bare-except          `except:` with no exception class
  tabs / trailing-ws   formatting (clang-format analogue)
  all-undefined        __all__ lists a name the module never defines
  duplicate-def        two same-name top-level defs in one module

Exit 1 if any error-class finding exists.  Usage: python scripts/lint.py
[paths...] (defaults to the repo's source trees).
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_PATHS = ["ogl_tpu", "tests", "scripts", "bench.py", "__graft_entry__.py"]


def _py_files(paths):
    for p in paths:
        p = (REPO / p) if not Path(p).is_absolute() else Path(p)
        if p.is_dir():
            yield from sorted(p.rglob("*.py"))
        elif p.suffix == ".py":
            yield p


class ImportVisitor(ast.NodeVisitor):
    def __init__(self):
        self.imports: dict[str, tuple[int, str]] = {}  # alias -> (line, kind)
        self.used: set[str] = set()

    def visit_Import(self, node):
        for a in node.names:
            name = a.asname or a.name.split(".")[0]
            self.imports[name] = (node.lineno, a.name)

    def visit_ImportFrom(self, node):
        if node.module == "__future__":
            return
        for a in node.names:
            if a.name == "*":
                continue
            name = a.asname or a.name
            # re-export convention `import x as x` is intentional
            if a.asname == a.name:
                self.used.add(name)
            self.imports[name] = (node.lineno, a.name)

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def check_file(path: Path):
    errors, warnings = [], []
    text = path.read_text()
    rel = path.relative_to(REPO)
    for i, line in enumerate(text.splitlines(), 1):
        if "\t" in line:
            errors.append(f"{rel}:{i}: tab character")
        if line != line.rstrip():
            errors.append(f"{rel}:{i}: trailing whitespace")
    try:
        tree = ast.parse(text)
    except SyntaxError as e:
        errors.append(f"{rel}:{e.lineno}: syntax error: {e.msg}")
        return errors, warnings

    iv = ImportVisitor()
    iv.visit(tree)
    # names used in __all__ strings and docstring-free re-export count as used
    all_names: list[str] = []
    for node in tree.body:
        if (isinstance(node, ast.Assign) and len(node.targets) == 1
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id == "__all__"
                and isinstance(node.value, (ast.List, ast.Tuple))):
            for elt in node.value.elts:
                if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                    all_names.append(elt.value)
    for name in all_names:
        iv.used.add(name)
    for name, (line, target) in iv.imports.items():
        if name not in iv.used and not name.startswith("_"):
            errors.append(f"{rel}:{line}: unused import '{target}'")

    top_defs = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in list(node.args.defaults) + [
                d for d in node.args.kw_defaults if d is not None
            ]:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    errors.append(
                        f"{rel}:{node.lineno}: mutable default argument in "
                        f"'{node.name}'")
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            warnings.append(f"{rel}:{node.lineno}: bare except")
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            if node.name in top_defs:
                errors.append(f"{rel}:{node.lineno}: duplicate top-level "
                              f"definition '{node.name}'")
            top_defs.add(node.name)
    defined = top_defs | set(iv.imports) | {
        t.id for node in tree.body if isinstance(node, ast.Assign)
        for t in node.targets if isinstance(t, ast.Name)
    }
    for name in all_names:
        if name not in defined:
            errors.append(f"{rel}: __all__ lists undefined name '{name}'")
    return errors, warnings


def main(argv):
    paths = argv[1:] or DEFAULT_PATHS
    n_err = 0
    for f in _py_files(paths):
        errors, warnings = check_file(f)
        for e in errors:
            print(f"ERROR {e}")
        for w in warnings:
            print(f"warn  {w}")
        n_err += len(errors)
    if n_err:
        print(f"\n{n_err} error(s)")
        return 1
    print("lint: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
