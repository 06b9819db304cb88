"""Registry-wide plan census: post-execution parquet-scan counts.

Counts `FileScan parquet` nodes in each registered query's
POST-EXECUTION adaptive plan — the honest number (static plans
overstate where AQE would reuse; in practice runtime ReusedExchange
fired nowhere in this repo because multi-consumer subtrees diverge
canonically, which is exactly what this tool exists to catch).

Usage:
    python tools/plan_census.py [sf_dir] [threshold]

Prints one line per query with scans > threshold (default 4), sorted
descending — anything large means a shared relation needs a
``localCheckpoint`` materialization (see SCALE.md "plan census").
Streaming runners are skipped (they execute a streaming query, not a
batch plan). Queries whose builders checkpoint eagerly report the
residual plan scans; the materialization itself is the one real scan.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import __spark_entry__ as entry
    from datalake_local_spark.session import get_spark

    spark = get_spark(app_name="plan-census", cpus="8")
    rows = []
    for name, fn in sorted(entry.queries().items()):
        if name.startswith("streaming_"):
            continue
        try:
            df = fn(spark, sf_dir)
            df.count()  # force execution so the ADAPTIVE plan is final
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows.append((plan.count("FileScan parquet"), name))
        except Exception as exc:  # pragma: no cover - diagnostic tool
            rows.append((-1, f"{name} ERR {type(exc).__name__}"))
    flagged = [(n, q) for n, q in sorted(rows, reverse=True) if n > threshold or n < 0]
    for n, q in flagged:
        print(n, q)
    print(
        f"census: {len(rows)} queries, {len(flagged)} over threshold {threshold}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
