#!/usr/bin/env python
"""Minimal in-tree linter (CI gate; VERDICT r2 directive #8).

The image ships no ruff/flake8 and installs are off-limits, so this
provides the golangci-lint role of the reference's CI
(`.github/workflows/ci.yml`) with the checks that matter for this tree:

  * syntax: every file must parse (ast.parse);
  * unused imports (respecting ``__all__`` re-exports, ``# noqa`` lines,
    and conventional underscore bindings);
  * tabs in indentation, trailing whitespace, missing final newline;
  * lines over 100 columns (the tree's own style is ~79; 100 is the
    hard fail so URLs/citations don't trip it);
  * ``from module import *`` (never used in this tree).

Exit 0 when clean, 1 with one ``path:line: message`` per finding.
"""

import ast
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
TARGETS = ["steroscopic_hardware_tpu", "tests", "tools", "examples",
           "bench.py", "__graft_entry__.py"]
MAX_LINE = 100

PROBLEMS = []


def problem(path, line, msg):
    PROBLEMS.append(f"{path.relative_to(ROOT)}:{line}: {msg}")


class ImportCollector(ast.NodeVisitor):
    def __init__(self):
        self.imports = {}  # binding name -> (lineno, 'import x' repr)

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
            self.imports[name] = (node.lineno, a.name)


def used_names(tree):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # the root of a dotted use is a Name and is caught above
            pass
    return used


def string_mentions(tree):
    """Names mentioned in __all__ or string annotations."""
    out = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    for elt in ast.walk(node.value):
                        if isinstance(elt, ast.Constant) and isinstance(
                                elt.value, str):
                            out.add(elt.value)
    return out


def lint_file(path: Path):
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        problem(path, e.lineno or 0, f"syntax error: {e.msg}")
        return

    lines = src.split("\n")
    if src and not src.endswith("\n"):
        problem(path, len(lines), "missing final newline")
    noqa = {i + 1 for i, ln in enumerate(lines) if "# noqa" in ln}
    for i, ln in enumerate(lines, 1):
        if i in noqa:
            continue
        if ln != ln.rstrip():
            problem(path, i, "trailing whitespace")
        if ln.startswith("\t") or (ln[: len(ln) - len(ln.lstrip())]
                                   .find("\t") != -1):
            problem(path, i, "tab in indentation")
        if len(ln) > MAX_LINE:
            problem(path, i, f"line too long ({len(ln)} > {MAX_LINE})")

    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and any(
                a.name == "*" for a in node.names):
            if node.lineno not in noqa:
                problem(path, node.lineno, "star import")

    coll = ImportCollector()
    coll.visit(tree)
    used = used_names(tree)
    exported = string_mentions(tree)
    is_init = path.name == "__init__.py"
    for name, (lineno, target) in coll.imports.items():
        if lineno in noqa or name.startswith("_"):
            continue
        if name in used or name in exported:
            continue
        if is_init:  # __init__ re-exports are the point
            continue
        problem(path, lineno, f"unused import: {name} (from {target})")


def main():
    files = []
    for t in TARGETS:
        p = ROOT / t
        if p.is_file():
            files.append(p)
        elif p.is_dir():
            files.extend(sorted(p.rglob("*.py")))
    for f in files:
        lint_file(f)
    if PROBLEMS:
        print("\n".join(PROBLEMS))
        print(f"\n{len(PROBLEMS)} problem(s) in {len(files)} files")
        return 1
    print(f"lint clean: {len(files)} files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
