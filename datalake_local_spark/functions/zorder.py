"""Z-order (Morton) interleaved clustering keys — the multi-dimensional
sort key a lakehouse uses so that RANGE PRUNING works on BOTH join/filter
dimensions at once (Morton 1966; the technique behind Delta/Iceberg
OPTIMIZE ZORDER BY). Sorting 100 TB by (custkey) alone makes orderdate
pruning useless; sorting by the interleaved key keeps every file's
min/max envelope tight on BOTH columns, so a two-dimensional predicate
skips ~√-proportionally instead of scanning.

The key is pure integer arithmetic — ((x div 2^i) % 2) · 2^(2i) terms —
expressed once and rendered for either engine (Spark `div`, DuckDB `//`),
so the oracle computes bit-identical keys with no bit-function dialect
drift."""

from __future__ import annotations


def zvalue_sql(x: str, y: str, bits: int = 16, div: str = "div") -> str:
    """Integer SQL expression interleaving the low ``bits`` of ``x``
    (even positions) and ``y`` (odd positions). ``div`` is the
    integer-division operator spelling: Spark ``div``, DuckDB ``//``.
    Inputs must already be non-negative integers < 2**bits."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({y}) {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def normalize_sql(col: str, mn: str, mx: str, bits: int = 16, div: str = "div") -> str:
    """Affine map of ``col`` from [mn, mx] onto [0, 2**bits − 1] in pure
    integer arithmetic (exact same floor both engines); degenerate
    ranges (mx = mn) map everything to 0.

    OVERFLOW PRECONDITION (r17 review-pass find): the offset is
    multiplied by 2**bits − 1 in 64-bit integer arithmetic, so the
    dimension SPAN (mx − mn) must stay below 2**63 / (2**bits − 1)
    (≈ 1.4e14 at bits=16) — Spark wraps silently past it while DuckDB
    raises, a cross-engine seam invisible at small spans. Feed
    reduced-resolution values when a raw dimension can exceed this
    (e.g. epoch MICROseconds overflow past a ~4.4-year span — floor to
    milliseconds first, as lake_zorder_skipping does; floor-div of a
    non-negative value is monotone, so min/max commute with the
    rescale and bucketing is unchanged). Prescale the min-OFFSET value
    ((col − mn) div k with mn=0 bounds), never the raw column: the
    offset is non-negative by construction, where Spark ``div``
    (truncate toward zero) and DuckDB ``//`` (floor) agree — a raw
    negative value (pre-1970 epoch) floors differently per engine
    (r17 ADVICE, fixed r18)."""
    top = (1 << bits) - 1
    return (
        f"((({col}) - ({mn})) * {top}) {div} greatest(1, ({mx}) - ({mn}))"
    )
