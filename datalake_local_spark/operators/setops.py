"""Set operations + sort/limit (SURVEY.md §2.5) — Trino-surface parity.

union/unionByName, intersect, exceptAll, distinct, orderBy/limit.
Scale notes: intersect/except are aggregate-based under the hood (shuffle on
all columns) — keep projections narrow before them; a deterministic LIMIT
requires a total order including a unique tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _active_months(orders: DataFrame, year: int) -> DataFrame:
    return (
        orders.filter(F.year("o_orderdate") == year)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )


def customers_active_both_years(orders: DataFrame, y1: int = 1996, y2: int = 1997) -> DataFrame:
    """INTERSECT: customers ordering in both years."""
    return _active_months(orders, y1).intersect(_active_months(orders, y2))


def customers_active_only_first_year(orders: DataFrame, y1: int = 1996, y2: int = 1997) -> DataFrame:
    """EXCEPT: active in y1 but not y2."""
    return _active_months(orders, y1).exceptAll(_active_months(orders, y2))


def union_high_value_entities(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """UNION ALL with schema alignment (unionByName) + distinct tag."""
    c = customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    s = supplier.filter(F.col("s_acctbal") > 5000).select(
        F.col("s_name").alias("name"),
        F.round("s_acctbal", 2).alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s)


def top_orders_global(orders: DataFrame, n: int = 25) -> DataFrame:
    """ORDER BY + LIMIT with unique tiebreaker (deterministic top-N).
    Spark implements global limit as per-partition top-N + single-partition
    final — no full global sort materialized."""
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(n)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
    )
