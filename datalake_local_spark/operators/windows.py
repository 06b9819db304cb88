"""Window-function suite (SURVEY.md §2.5 + A6 `*_relative` pattern).

Ranking, analytic (lag/lead/first/last), running frames, top-k per group,
and the Cube `price_*_relative` pattern (value relative to the first value
in its partition, StockMarkets.js:90-112).

Scale notes: a window partitioned by a key shuffles once on that key; all
functions over the same (partitionBy, orderBy) share one shuffle+sort.
Unbounded-preceding frames stream in sort order (no state blowup). The
anti-pattern at scale is a window with NO partitionBy — a global sort onto
a single task — avoided everywhere here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def rank_orders_per_customer(orders: DataFrame) -> DataFrame:
    """row_number / rank / dense_rank — tiebreak on o_orderkey so results
    are deterministic for the oracle."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


def lag_lead_order_dates(orders: DataFrame) -> DataFrame:
    """Analytic lag/lead: days since a customer's previous order."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.lag("o_orderdate", 1).over(w).alias("prev_orderdate"),
        F.lead("o_orderdate", 1).over(w).alias("next_orderdate"),
        F.datediff("o_orderdate", F.lag("o_orderdate", 1).over(w)).alias("days_since_prev"),
    )


def running_revenue_per_customer(orders: DataFrame) -> DataFrame:
    """Running-total frame (rowsBetween unboundedPreceding → current)."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.count("*").over(w).alias("running_n"),
    )


def top_k_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Top-K per group — the scalable idiom (window + filter) instead of
    per-group collect/sort."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rn")
    )


def range_frame_weekly_revenue(orders: DataFrame) -> DataFrame:
    """RANGE frame: per order, revenue of the same customer's orders in
    the trailing 7 days (value-based frame over epoch seconds — rows
    frames count rows, range frames bound by ORDER BY value distance)."""
    # NTZ timestamps can't cast straight to long; hop via TIMESTAMP (session
    # is pinned UTC, so the epoch is unambiguous)
    epoch = F.col("o_orderdate").cast("timestamp").cast("long")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-7 * 86400, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_7d_revenue"),
        F.count("*").over(w).alias("trailing_7d_orders"),
    )


def relative_value_per_user(events: DataFrame) -> DataFrame:
    """A6 `*_relative`: each event's value relative to the user's first
    event value (value / first(value) over user ordered by ts) — the Cube
    price_*_relative measures (StockMarkets.js:90-112)."""
    w = W.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    first_val = F.first("value").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 4).alias("value"),
        F.round(
            F.when(first_val != 0, F.col("value") / first_val),
            6,
        ).alias("value_relative"),
    )
