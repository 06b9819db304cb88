"""Hilbert-curve clustering keys — the second space-filling curve in
the layout framework, beside the Morton key (:mod:`.zorder`). Hilbert
ordering (Hilbert 1891; the iterative per-bit rotate/reflect index of
the public xy2d algorithm) preserves locality strictly better than
Morton — consecutive indices are always grid neighbors, so file
envelopes along the curve are at least as tight on both dimensions —
at the cost of a deeper key expression. ``lake_hilbert_skipping``
certifies the A/B number (Hilbert vs Morton file-skipping rate on the
same predicate workload) so the "which curve" layout decision is a
measured fact, not folklore.

Like the Morton key, everything is engine-portable integer arithmetic
(div/mod bit extraction, CASE rotation — no ``&``/``^``, whose
spellings differ across engines: DuckDB ``^`` is POWER), generated once
and rendered for either engine, so the DuckDB oracle computes
bit-identical indices. The iterative state update (x, y, d mutate per
level) is expressed as a CHAIN of ``bits`` projections — chained
``select`` calls on the Spark side, chained CTEs in the oracle — with
every level's expressions referencing the previous level's columns by
name, evaluated simultaneously (both engines evaluate a projection
against its input row).

All intermediate values stay in [0, 2**bits): the reflection is
(2**bits − 1) − v, so div/mod never see a negative operand (the same
non-negativity discipline as the r18 zorder prescale fix).
"""

from __future__ import annotations


def hilbert_step_sql(
    s: int, n: int, div: str = "div", x: str = "hx", y: str = "hy", d: str = "hd"
) -> tuple[str, str, str]:
    """One level of the public xy2d loop at sub-square size ``s``:
    returns ``(d_sql, x_sql, y_sql)`` — the new accumulator and the
    rotated/reflected coordinates — referencing the PREVIOUS level's
    ``x``/``y``/``d`` columns. Quadrant index (3·rx) XOR ry is spelled
    arithmetically (3·rx + ry − 2·rx·ry, identical on {0,1}²) to avoid
    the cross-engine ``^`` seam."""
    rx = f"((({x}) {div} {s}) % 2)"
    ry = f"((({y}) {div} {s}) % 2)"
    d_sql = f"({d}) + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})"
    x_sql = (
        f"CASE WHEN {ry} = 1 THEN ({x}) "
        f"WHEN {rx} = 1 THEN {n - 1} - ({y}) ELSE ({y}) END"
    )
    y_sql = (
        f"CASE WHEN {ry} = 1 THEN ({y}) "
        f"WHEN {rx} = 1 THEN {n - 1} - ({x}) ELSE ({x}) END"
    )
    return d_sql, x_sql, y_sql


def hilbert_chain(
    bits: int = 16,
    div: str = "div",
    x: str = "hx",
    y: str = "hy",
    d: str = "hd",
    levels: int | None = None,
) -> list[tuple[str, str, str]]:
    """The xy2d loop as chained projection levels, most significant
    sub-square first. Inputs must be non-negative integers < 2**bits
    (use :func:`..zorder.normalize_sql` with the offset-first
    prescale); after all ``bits`` levels ``d`` is the full Hilbert
    index in [0, 4**bits).

    ``levels`` truncates the chain (prefix property): after ``k``
    levels ``d`` equals the full index with its low 2·(bits − k) bits
    zeroed — every later level adds < 4**(bits−k) (Σ 3·4^i < 4^k) and
    every earlier term is a multiple of it. So a consumer that only
    needs the TOP 2k bits (file assignment into n_files ≤ 4**k equal
    index ranges) runs k levels instead of ``bits`` with bit-identical
    output — the 100 TB posture: 3 projection levels for 64 files, not
    16 (asserted by test_hilbert_truncated_levels_match_full_prefix)."""
    n = 1 << bits
    steps = []
    s = n >> 1
    while s > 0 and (levels is None or len(steps) < levels):
        steps.append(hilbert_step_sql(s, n, div, x, y, d))
        s >>= 1
    return steps
