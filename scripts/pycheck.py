#!/usr/bin/env python
"""Static quality gate (stdlib-only) — the warnings-as-errors analog of the
reference's strict flag set (reference CMakeLists.txt:20-48) for an image
with no ruff/flake8/mypy installed.  scripts/check.sh runs this plus
compileall; pyproject.toml carries ruff+mypy configs for environments that
do have the real tools.

Rules (each a real bug class, tuned to run clean on this codebase):
  F401  unused import              (module scope; skipped in __init__.py)
  F811  redefined top-level def/class
  B006  mutable default argument   ([] / {} / set())
  E722  bare `except:`
  E711  comparison to None with == / !=
  W605  invalid escape sequence in a non-raw string (SyntaxWarning)

`# noqa` on the offending line suppresses it.
"""

from __future__ import annotations

import ast
import pathlib
import sys
import warnings


def _used_names(tree: ast.AST) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # leftmost name of dotted access (jnp.asarray -> jnp)
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    # names referenced in __all__ strings count as used (re-export)
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and any(isinstance(t, ast.Name) and t.id == "__all__"
                        for t in node.targets)):
            for el in ast.walk(node.value):
                if isinstance(el, ast.Constant) and isinstance(el.value, str):
                    used.add(el.value)
    return used


def check_file(path: pathlib.Path) -> list[str]:
    src = path.read_text()
    lines = src.split("\n")

    def noqa(lineno: int) -> bool:
        return "# noqa" in lines[lineno - 1] if lineno <= len(lines) else False

    problems: list[str] = []
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always", SyntaxWarning)
        try:
            tree = ast.parse(src, filename=str(path))
        except SyntaxError as e:
            return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]
        for w in caught:
            ln = getattr(w.message, "lineno", 0) or 0
            if not noqa(ln):
                problems.append(f"{path}:{ln}: W605 {w.message}")

    used = _used_names(tree)

    # F401 — module-scope imports only (function-local reimports are a
    # deliberate lazy-import idiom here)
    if path.name != "__init__.py":
        for node in tree.body:
            if isinstance(node, ast.Import):
                for a in node.names:
                    name = (a.asname or a.name).split(".")[0]
                    if name not in used and not noqa(node.lineno):
                        problems.append(
                            f"{path}:{node.lineno}: F401 unused import "
                            f"{a.name}")
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__":
                    continue
                for a in node.names:
                    if a.name == "*":
                        continue
                    name = a.asname or a.name
                    # `import x as x` is the explicit re-export idiom
                    if a.asname == a.name:
                        continue
                    if name not in used and not noqa(node.lineno):
                        problems.append(
                            f"{path}:{node.lineno}: F401 unused import "
                            f"{name}")

    # F811 — duplicate top-level defs
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            if node.name in seen and not noqa(node.lineno):
                problems.append(
                    f"{path}:{node.lineno}: F811 {node.name} redefined "
                    f"(first at line {seen[node.name]})")
            seen[node.name] = node.lineno

    for node in ast.walk(tree):
        # B006 — mutable defaults
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in list(node.args.defaults) + [
                    x for x in node.args.kw_defaults if x is not None]:
                bad = isinstance(d, (ast.List, ast.Dict, ast.Set)) or (
                    isinstance(d, ast.Call)
                    and isinstance(d.func, ast.Name)
                    and d.func.id in ("list", "dict", "set"))
                if bad and not noqa(node.lineno):
                    problems.append(
                        f"{path}:{node.lineno}: B006 mutable default "
                        f"argument in {node.name}()")
        # E722 — bare except
        elif isinstance(node, ast.ExceptHandler):
            if node.type is None and not noqa(node.lineno):
                problems.append(f"{path}:{node.lineno}: E722 bare except")
        # E711 — == None / != None
        elif isinstance(node, ast.Compare):
            for op, cmp in zip(node.ops, node.comparators):
                if (isinstance(op, (ast.Eq, ast.NotEq))
                        and isinstance(cmp, ast.Constant)
                        and cmp.value is None and not noqa(node.lineno)):
                    problems.append(
                        f"{path}:{node.lineno}: E711 comparison to None "
                        "(use `is`)")
    return problems


def main() -> int:
    roots = [pathlib.Path(a) for a in (sys.argv[1:] or ["herdsman_tpu"])]
    files: list[pathlib.Path] = []
    for r in roots:
        if r.is_file():
            files.append(r)
        else:
            files.extend(sorted(r.rglob("*.py")))
    files = [f for f in files if "_proto" not in f.parts]  # generated
    problems: list[str] = []
    for f in files:
        problems.extend(check_file(f))
    for p in problems:
        print(p)
    print(f"pycheck: {len(files)} files, {len(problems)} problems",
          file=sys.stderr)
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
