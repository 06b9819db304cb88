"""Registry-wide plan census: post-execution parquet-scan counts and
unpartitioned-WindowExec counts.

Counts `FileScan parquet` nodes in each registered query's FINALIZED
adaptive plan — collect() first (count() executes a DERIVED query
execution, leaving df's own plan un-finalized at its static shape),
then split off the `== Initial Plan ==` section, which repeats every
node pre-reuse (the tests/test_llm.py::_final_plan recipe). Static
counts overstate wherever runtime ReusedExchange fires; finalized
counts are the honest number. Residual scans above the threshold mean
a shared relation needs a `localCheckpoint` materialization (see
SCALE.md "plan census").

r19 (r18 verdict #3): the census also counts UNPARTITIONED WindowExec
nodes per query — `Window` operators whose windowspecdefinition has no
PARTITION BY, which Spark executes on a single partition ("No Partition
Defined for Window operation" at runtime). Each current site is benign
(calendar/bucket/duration grain — a bounded dimension, never a
data-scaled frame), and tests/test_llm.py pins that benign set the way
residual scans are pinned: a new entrant reds CI until adjudicated.

Usage:
    python tools/plan_census.py [sf_dir] [threshold]

Prints one line per query with scans > threshold (default 4) OR
unpartitioned windows > 0, sorted descending, as
`<scans> <upwindows> <name>`. Streaming runners are skipped (they
execute a streaming query, not a batch plan). Queries whose builders
checkpoint eagerly report the residual plan scans; the materialization
itself is the one real scan. collect() makes this a heavyweight
diagnostic — run at sf0.001.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


#: The adjudicated benign set (r19 census at sf0.001): every current
#: unpartitioned WindowExec runs at a BOUNDED grain — n_buckets offset
#: frames (<= 1024 rows: dq_ks_test, dq_mann_whitney, text_cm_*,
#: pipeline_global_shuffle second level), calendar/day spines (dq_psi,
#: dq_page_hinkley, dq_ljung_box, dq_control_chart, events_survival_km,
#: events_stl_decompose, events_cumulative_users, events_slo_burn),
#: vocab/rank curves capped upstream (text_zipf_profile,
#: text_heaps_curve, text_frequent_tokens, text_rake_keywords,
#: text_pmi_pairs, text_rrf_fusion, pipeline_token_budget) — never a
#: data-scaled row domain. A query appearing with a HIGHER count, or a
#: query not in this map appearing at all, is a new entrant: adjudicate
#: it (bounded grain?) and re-pin, exactly like residual scans.
UPW_BENIGN: dict[str, int] = {
    "dq_control_chart": 1,
    "dq_ks_test": 1,
    "dq_ljung_box": 1,
    "dq_mann_whitney": 1,
    "dq_page_hinkley": 2,
    "dq_psi_drift": 1,
    "events_cumulative_users": 1,
    "events_slo_burn": 1,
    "events_stl_decompose": 2,
    "events_survival_km": 2,
    "pipeline_global_shuffle": 1,
    "pipeline_token_budget": 2,
    "text_cm_heavy_hitters": 1,
    "text_frequent_tokens": 1,
    "text_heaps_curve": 1,
    "text_pmi_pairs": 1,
    "text_rake_keywords": 1,
    "text_rrf_fusion": 2,
    "text_zipf_profile": 1,
}


def count_unpartitioned_windows(plan: str) -> int:
    """Count WindowExec NODES (plan lines whose operator is `Window`)
    whose window spec defines no partitioning.

    In the executed-plan string every window node renders as
    `Window [<fn> windowspecdefinition(<partition cols...>,
    <sort orders...>, specifiedwindowframe(...)) ...], ...`.
    A node with no PARTITION BY has a spec whose FIRST top-level
    argument is already a sort order (`... ASC NULLS FIRST` /
    `... DESC ...`) or the frame itself (an unordered, unpartitioned
    global window). One line may carry several window functions over
    the same spec — count nodes, not spec occurrences.
    """
    n = 0
    for line in plan.splitlines():
        m = re.search(r"\bWindow(?:GroupLimit)? \[", line)
        if not m:
            continue
        s = line.find("windowspecdefinition(", m.end())
        if s < 0:
            continue
        # first top-level argument of the spec, balanced-paren scan
        i = s + len("windowspecdefinition(")
        depth, start = 0, i
        first = None
        while i < len(line):
            c = line[i]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    first = line[start:i]
                    break
                depth -= 1
            elif c == "," and depth == 0:
                first = line[start:i]
                break
            i += 1
        if first is None:
            continue
        first = first.strip()
        if (
            first.startswith("specifiedwindowframe")
            or " ASC" in first
            or " DESC" in first
        ):
            n += 1
    return n


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
            rows.append(
                (
                    plan.count("FileScan parquet"),
                    count_unpartitioned_windows(plan),
                    name,
                )
            )
        except Exception as exc:  # pragma: no cover - diagnostic tool
            rows.append((-1, 0, f"{name} ERR {type(exc).__name__}"))
    flagged = [
        (n, u, q)
        for n, u, q in sorted(rows, reverse=True)
        if n > threshold or n < 0 or u > 0
    ]
    entrants = []
    for n, u, q in flagged:
        new = u > UPW_BENIGN.get(q, 0)
        print(n, u, q, "UPW-NEW-ENTRANT" if new else "")
        if new:
            entrants.append(q)
    n_upw = sum(1 for _, u, _ in rows if u > 0)
    print(
        f"census: {len(rows)} queries, "
        f"{sum(1 for n, _, _ in rows if n > threshold or n < 0)} over scan "
        f"threshold {threshold}, {n_upw} with unpartitioned WindowExec, "
        f"{len(entrants)} UPW new entrants{': ' if entrants else ''}"
        f"{', '.join(entrants)}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
