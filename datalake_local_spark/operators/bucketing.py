"""Hive-style bucketed tables — the co-located-join layout the scale
notes promise (SCALE.md global posture: 'co-locate joins via bucketing').

A fact table written with ``bucketBy(n, key)`` is hash-clustered into a
fixed bucket count at WRITE time; a join between two tables bucketed on
the same key with the same count needs NO shuffle on either side — the
map tasks read matching buckets pairwise. At 100 TB this converts every
repeated orders⋈lineitem-style join from two full-table shuffles into a
scan, which is the single biggest recurring-join win a lakehouse layout
can buy. The cost: a fixed bucket count (pick for the LARGEST expected
size; AQE cannot re-bucket) and saveAsTable (catalog) instead of plain
parquet paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8, sort: bool = True
) -> None:
    """Write ``df`` as a parquet-backed bucketed (and bucket-sorted)
    catalog table. Sorting within buckets lets the bucketed join skip
    its per-task sort too when Spark can prove the order."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_order_revenue(
    spark: SparkSession, orders_table: str, lineitem_table: str
) -> DataFrame:
    """Per-priority revenue over two co-bucketed tables: with both sides
    bucketed on the order key at equal counts, the join plans as a
    SortMergeJoin over bucketed scans with ZERO pre-join exchanges
    (asserted in tests via the executed plan); the only shuffle in the
    query is the final small groupBy."""
    o = spark.table(orders_table).select("o_orderkey", "o_orderpriority")
    l = spark.table(lineitem_table).select(
        "l_orderkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"), F.count("*").alias("n_items"))
    )
