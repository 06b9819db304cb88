"""CI teeth for the shared-text oracle audit protocol (r17 verdict #3).

The r17 audit (SCALE.md "shared-text oracle audit") enumerated every
oracle member that shares text/constants with its Spark side and named
an independently-derived test for each; the protocol says any NEW
shared-text member must land with a row. Until now nothing failed if a
future query skipped that. These tests make it mechanical:

- discovery (tools/shared_text_manifest.discover, the audit's own grep
  codified with ast) must equal the committed MANIFEST key set — a new
  oracle interpolating a new module constant / package symbol reds CI
  until a manifest row classifies it;
- every mech A/B/C row must name at least one test, and every named
  test must exist in tests/*.py — a row pointing at a deleted or
  misspelled test also reds CI.

No Spark session needed: this is pure source analysis.
"""

from __future__ import annotations

import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from shared_text_manifest import MANIFEST, discover  # noqa: E402


def _all_test_defs() -> set[str]:
    defs: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "tests", "test_*.py")):
        defs.update(re.findall(r"^def (test_\w+)", open(path).read(), re.M))
    return defs


def test_every_discovered_shared_text_member_has_a_manifest_row():
    found = discover()
    missing = sorted(found - set(MANIFEST))
    assert not missing, (
        "oracle-side symbols with no shared-text manifest row (add one "
        f"to tools/shared_text_manifest.py, per the r17 audit protocol): {missing}"
    )


def test_manifest_has_no_stale_rows():
    found = discover()
    stale = sorted(set(MANIFEST) - found)
    assert not stale, f"manifest rows no longer discovered in the source: {stale}"


def test_shared_rows_name_existing_independent_tests():
    defs = _all_test_defs()
    for member, row in MANIFEST.items():
        assert row["mech"] in ("A", "B", "C", "independent"), member
        if row["mech"] == "independent":
            assert row["note"], member  # must say WHY nothing is shared
            continue
        assert row["tests"], f"{member}: mech {row['mech']} requires a test"
        for t in row["tests"]:
            assert t in defs, f"{member}: named test {t} does not exist"


def test_discover_flags_lowercase_string_constants(tmp_path):
    """r19 (r18 advice #5): discover() must flag module-level string
    constants interpolated into oracle scopes REGARDLESS of case — a
    future lowercase constant must not silently escape the audit gate.
    Non-string lowercase module state (counters etc.) stays exempt."""
    src = '''
_upper_limit = 5
shared_sql_fragment = "sum(x) OVER (ORDER BY y)"
_counter = 0

def my_oracle():
    return f"SELECT {shared_sql_fragment} FROM t LIMIT {_upper_limit + _counter}"
'''
    p = tmp_path / "fake_entry.py"
    p.write_text(src)
    found = discover(str(p))
    assert "shared_sql_fragment" in found  # lowercase, string-bearing
    assert "my_oracle" in found
    assert "_counter" not in found  # lowercase non-string stays exempt
    assert "_upper_limit" not in found
