"""Doc-drift guard: COVERAGE.md must reference every registry query."""

from __future__ import annotations

import os

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.abspath(__file__)) + "/.."


def test_coverage_references_every_registry_query():
    cov = open(os.path.join(REPO, "COVERAGE.md")).read()
    missing = [n for n in entrymod.queries() if f"`{n}`" not in cov]
    assert not missing, f"COVERAGE.md missing rows for: {missing}"
