"""Committed-artifact consistency guards.

Round 9 caught a real failure mode: two concurrent check_oracles
processes interleaved writes into ORACLE_FULL.txt, duplicating 19
status lines and clobbering 30 — the file still ended in "0 failures".
These tests make a stale or torn artifact fail CI instead of reading
as green.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _declared():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


def test_oracle_full_artifact_covers_declared_surface():
    qs, oracles = _declared()
    raw = (REPO / "ORACLE_FULL.txt").read_text().replace("\r", "\n")
    names = re.findall(r"(?:OK|FAIL|rows)\s{2,}(\w+):", raw)
    assert len(names) == len(set(names)), "duplicated status lines (torn write)"
    missing = set(qs) - set(names)
    assert not missing, f"declared queries absent from artifact: {missing}"
    assert not re.findall(r"FAIL\s{2,}(\w+):", raw)
    assert re.search(r"^0 failures", raw, re.M), "artifact lacks clean footer"


def test_bench_full_artifact_covers_declared_surface():
    qs, _ = _declared()
    d = json.loads((REPO / "BENCH_FULL.json").read_text())
    missing = set(qs) - set(d["queries"])
    assert not missing, f"declared queries absent from bench: {missing}"
    assert d.get("errors") in (0, [], None, {})
