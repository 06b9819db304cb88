"""Registry-wide plan census: post-execution parquet-scan counts.

Counts `FileScan parquet` nodes in each registered query's FINALIZED
adaptive plan — collect() first (count() executes a DERIVED query
execution, leaving df's own plan un-finalized at its static shape),
then split off the `== Initial Plan ==` section, which repeats every
node pre-reuse (the tests/test_llm.py::_final_plan recipe). Static
counts overstate wherever runtime ReusedExchange fires; finalized
counts are the honest number. Residual scans above the threshold mean
a shared relation needs a `localCheckpoint` materialization (see
SCALE.md "plan census").

Usage:
    python tools/plan_census.py [sf_dir] [threshold]

Prints one line per query with scans > threshold (default 4), sorted
descending. Streaming runners are skipped (they execute a streaming
query, not a batch plan). Queries whose builders checkpoint eagerly
report the residual plan scans; the materialization itself is the one
real scan. collect() makes this a heavyweight diagnostic — run at
sf0.001.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
            # collect() (NOT count(): that executes a derived plan and
            # leaves df's own un-finalized), then drop the Initial Plan
            # echo which repeats every pre-reuse node
            df.collect()
            plan = (
                df._jdf.queryExecution()
                .executedPlan()
                .toString()
                .split("+- == Initial Plan ==")[0]
            )
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
