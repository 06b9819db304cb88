"""Time one registry query in isolation: build time, 3 forced noop runs,
and the job/stage/task counts of the LAST run (steady state) via the
status tracker. Usage:

    python tools/isolate_query.py <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from datalake_local_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="isolate-query")
    sc = spark.sparkContext
    qs = entrymod.queries()
    # one warmup query so JVM/codegen cold-start does not pollute run 1
    qs["agg_order_stats"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    tracker = sc.statusTracker()
    for name in sys.argv[1:]:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        t_build = time.perf_counter() - t0
        runs = []
        n_jobs = 0
        for i in range(3):
            sc.setJobGroup(f"iso-{name}-{i}", name)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            n_jobs = len(tracker.getJobIdsForGroup(f"iso-{name}-{i}"))
        # bench-style: the suite re-CALLS the registry callable each
        # pass, so eager build work (checkpoints, counts) is re-paid —
        # time (build + force) the way bench.py does, warm
        bench_style = []
        for i in range(3):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            bench_style.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name}: build={t_build:.3f}s runs={runs} "
            f"bench_style={bench_style} jobs_last_run={n_jobs}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
