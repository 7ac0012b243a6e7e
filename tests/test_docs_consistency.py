"""COVERAGE.md must not drift from the code it maps.

Round 3 shipped a docs-drift fix commit; this pins the invariant
mechanically: every backticked `path`, `path::symbol`, and registry
query name referenced in COVERAGE.md must actually exist.
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_REF = re.compile(r"`([A-Za-z0-9_./]+\.(?:py|md))(?:::([A-Za-z0-9_.]+))?`")


def _module_symbols(path: str) -> set[str]:
    import ast

    tree = ast.parse(open(os.path.join(REPO, path)).read())
    out = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out.add(node.name)
    return out


def test_coverage_md_references_resolve():
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    missing = []
    for m in _REF.finditer(text):
        rel, symbol = m.group(1), m.group(2)
        # paths are written repo-relative, package-relative, or
        # tests-relative
        candidates = [
            rel,
            os.path.join("tensei_agent_spark", rel),
            os.path.join("tests", rel),
        ]
        path = next(
            (c for c in candidates if os.path.exists(os.path.join(REPO, c))),
            None,
        )
        if path is None:
            missing.append(rel)
            continue
        if symbol and path.endswith(".py"):
            # test references may point at test functions; symbol may be
            # dotted (Class.method) — check the head only
            head = symbol.split(".")[0]
            if head not in _module_symbols(path):
                missing.append(f"{rel}::{symbol}")
    assert not missing, f"COVERAGE.md references that do not resolve: {missing}"


def test_readme_artifact_references_exist():
    """Artifacts the README points readers at must be committed."""
    text = open(os.path.join(REPO, "README.md")).read()
    for name in re.findall(r"`((?:CORRECTNESS|PLAN_AUDIT|BENCH)[A-Za-z0-9_.]+\.json)`", text):
        assert os.path.exists(os.path.join(REPO, name)), name
