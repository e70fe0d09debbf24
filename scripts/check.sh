#!/usr/bin/env bash
# Static quality gates — the reference ships warnings-as-errors + CodeQL
# (reference CMakeLists.txt:20-48, .github/workflows/ubuntu.yml); this is
# the rebuild's equivalent, runnable in any environment:
#   1. byte-compile everything (syntax gate)
#   2. scripts/pycheck.py (stdlib AST linter: unused imports, redefinitions,
#      mutable defaults, bare excepts, None comparisons, bad escapes)
#   3. ruff + mypy when installed (configs in pyproject.toml); skipped with
#      a note otherwise (this image has neither and installs are frozen)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== compileall =="
python -m compileall -q herdsman_tpu tests scripts bench.py __graft_entry__.py

echo "== pycheck =="
python scripts/pycheck.py herdsman_tpu tests scripts bench.py __graft_entry__.py

if python -c "import ruff" 2>/dev/null || command -v ruff >/dev/null; then
  echo "== ruff =="
  ruff check herdsman_tpu tests scripts
else
  echo "== ruff not installed; skipped (config ready in pyproject.toml) =="
fi

if command -v mypy >/dev/null; then
  echo "== mypy =="
  mypy herdsman_tpu
else
  echo "== mypy not installed; skipped (config ready in pyproject.toml) =="
fi

echo "ALL CHECKS PASSED"
