"""Capture .explain("formatted") for every BENCH query into
plans/<round>/<name>_<tag>.txt (tag = before/after; round defaults to
r21, override with $PLANS_ROUND). Streaming queries execute on
.start(), not on explain — for those the BATCH-equivalent plan is not
captured here; the runner functions are noted instead.

Usage: python tools/capture_bench_plans.py <tag> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import BENCH_QUERIES  # noqa: E402
from datalake_local_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", os.environ.get("PLANS_ROUND", "r21"))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        if only and name not in only:
            continue
        if name.startswith("streaming_"):
            # streaming runners execute the micro-batch engine on call;
            # their plan story lives in the runner docstrings + the
            # captured batch twins
            continue
        try:
            import contextlib
            import io

            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {exc}"
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
