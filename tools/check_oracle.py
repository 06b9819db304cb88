"""Local stand-in for the driver's t2 correctness gate: run every
``queries()`` entry at a given SF dir, run the matching ``oracle_sql()``
in DuckDB over the same parquet, and compare row-count + column names/
types + order-insensitive values (exact for non-floats, tiny epsilon for
floats since both sides round explicitly).

Usage: python tools/check_oracle.py [--exact] [--require-rows] [sf_dir] [query ...]

``--exact``: compare floats EXACTLY (bit-for-bit after NaN pairing) —
this matches the driver's value-hash semantics. The default epsilon
compare is blind to exactly the class of bug that sank dq_ab_ttest in
round 9 (accumulation-order drift flipping a 4dp rounding boundary:
~1e-7 deltas pass epsilon but change the hash). Run --exact before
certifying anything.

``--require-rows``: treat 0 Spark rows as a failure for EVERY query,
oracle-backed or rows-only — a hash match on the empty set proves
nothing (the r9 join_anti lesson).
"""

from __future__ import annotations

import sys

import numpy as np

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from datalake_local_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object and df[c].map(
            lambda v: isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray",
            na_action="ignore",
        ).any():
            df[c] = df[c].map(
                lambda v: str(list(v)) if v is not None else None, na_action="ignore"
            )
        elif df[c].dtype == object and df[c].map(
            lambda v: v is None or hasattr(v, "toordinal"), na_action="ignore"
        ).all():
            try:
                df[c] = pd.to_datetime(df[c])
            except (ValueError, TypeError):
                pass
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df, oracle_df, exact: bool = False) -> list[str]:
    problems = []
    s = normalize(spark_df)
    o = normalize(oracle_df)
    if len(s) != len(o):
        problems.append(f"rowcount spark={len(s)} oracle={len(o)}")
        return problems
    if list(s.columns) != list(o.columns):
        problems.append(f"columns spark={list(s.columns)} oracle={list(o.columns)}")
        return problems
    for c in s.columns:
        sv, ov = s[c], o[c]
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            sn = sv.astype(float)
            on = ov.astype(float)
            if exact:
                # driver-hash semantics: exact value identity, NaN==NaN,
                # and matching sign bits (round() can emit -0.0, which
                # float == treats as equal to 0.0 but a string/bit hash
                # does not)
                bad = ~(
                    (sn.isna() & on.isna())
                    | (
                        (sn == on)
                        & (np.signbit(sn.fillna(0.0)) == np.signbit(on.fillna(0.0)))
                    )
                )
            else:
                bad = ~(
                    (sn.isna() & on.isna())
                    | ((sn - on).abs() <= 1e-9 + 1e-9 * on.abs().fillna(0))
                )
        else:
            bad = ~((sv.isna() & ov.isna()) | (sv.astype(str) == ov.astype(str)))
        if bad.any():
            i = bad.idxmax()
            problems.append(
                f"col {c}: {int(bad.sum())} mismatches, first at row {i}: "
                f"spark={sv[i]!r} oracle={ov[i]!r}"
            )
        # dtype-kind check (loose — driver compares schemas)
        if sv.dtype.kind != ov.dtype.kind and {sv.dtype.kind, ov.dtype.kind} != {"i", "O"}:
            problems.append(f"col {c}: dtype spark={sv.dtype} oracle={ov.dtype}")
    return problems


def main() -> int:
    known_flags = {"--exact", "--require-rows"}
    unknown = [a for a in sys.argv[1:] if a.startswith("--") and a not in known_flags]
    if unknown:
        print(f"unknown flag(s): {unknown}; valid: {sorted(known_flags)}")
        return 2
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    exact = "--exact" in sys.argv
    require_rows = "--require-rows" in sys.argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark(cpus="8")
    con = duck_con(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        if require_rows and len(sdf) == 0:
            print(f"FAIL  {name}: 0 spark rows (vacuous certification)")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error {str(e)[:300]}")
            failed.append(name)
            continue
        problems = compare(name, sdf, odf, exact=exact)
        if problems:
            print(f"FAIL  {name}: " + " | ".join(problems[:4]))
            failed.append(name)
        else:
            print(f"OK    {name}: {len(sdf)} rows")
    spark.stop()
    print(f"\n{len(failed)} failures: {failed}" if failed else "\nall green")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
