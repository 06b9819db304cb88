"""Data-layout analytics: does the physical sort order of the lake
actually support the query patterns? (The OPTIMIZE/ZORDER decision
support a 100 TB lakehouse runs before rewriting petabytes.)"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_local_spark.functions.zorder import normalize_sql, zvalue_sql


def zorder_layout(orders: DataFrame, bucket_bits: int = 8) -> DataFrame:
    """Z-order clustering report for orders over (custkey, orderdate):
    every order gets a 32-bit Morton key interleaving the two
    normalized dimensions; keys are grouped into the top
    ``bucket_bits`` buckets (the files an OPTIMIZE ZORDER rewrite
    would produce) and each bucket reports its min/max envelope on
    BOTH dimensions plus the envelope area — the number a layout
    advisor compares against the 1-D-sorted baseline (z-buckets keep
    both envelopes ~√n tight; a custkey sort leaves the date envelope
    at full width, so date predicates prune nothing).

    All integer arithmetic end to end (affine normalization and bit
    interleave via div/mod terms — :mod:`..functions.zorder`), so the
    oracle computes bit-identical keys. One scan + one broadcast 1-row
    bounds aggregate + one bucket-grain aggregate; nothing here
    scales past the bucket count after the scan."""
    bounds = orders.agg(
        F.min("o_custkey").alias("min_c"),
        F.max("o_custkey").alias("max_c"),
        F.min(F.datediff("o_orderdate", F.lit("1990-01-01"))).alias("min_d"),
        F.max(F.datediff("o_orderdate", F.lit("1990-01-01"))).alias("max_d"),
    )
    x = normalize_sql("o_custkey", "min_c", "max_c", 16, "div")
    y = normalize_sql(
        "datediff(o_orderdate, date'1990-01-01')", "min_d", "max_d", 16, "div"
    )
    z = zvalue_sql(x, y, 16, "div")
    keyed = orders.crossJoin(F.broadcast(bounds)).select(
        F.expr(f"{z} div {1 << (32 - bucket_bits)}").cast("int").alias("zbucket"),
        F.col("o_custkey"),
        F.datediff("o_orderdate", F.lit("1990-01-01")).alias("dday"),
    )
    return (
        keyed.groupBy("zbucket")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.min("dday").alias("min_day"),
            F.max("dday").alias("max_day"),
        )
        .select(
            "zbucket", "n_orders", "min_custkey", "max_custkey",
            "min_day", "max_day",
            (
                (F.col("max_custkey") - F.col("min_custkey") + 1)
                * (F.col("max_day") - F.col("min_day") + 1)
            )
            .cast("long")
            .alias("envelope_area"),
        )
        .orderBy("zbucket")
    )
