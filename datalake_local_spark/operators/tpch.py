"""TPC-H-style depth queries over the driver's star schema — the
multi-join analytical shapes the reference's Trino layer exists to serve
(SURVEY.md §2.3 J2 'full ANSI join surface' exercised end-to-end).

Scale notes per query are inline; the common principles: bounded dims
broadcast explicitly, SF-scaled dims left to AQE, aggregation keys kept
narrow, top-k via window-free global limit where a total order exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shipping_priority(lineitem: DataFrame, orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Q3 shape: revenue of unshipped orders for one segment, top 10.
    customer filter applied BEFORE the join (Catalyst pushes it anyway —
    stated here because at 100 TB the segment filter is what makes the
    customer side broadcastable)."""
    seg = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    cutoff = "1998-03-15"
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(seg, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def local_supplier_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Q5 shape: revenue where customer and supplier share a nation,
    grouped by nation. Six-way join; the c_nationkey = s_nationkey
    equality is the 'local' constraint."""
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def returned_item_losses(lineitem: DataFrame, orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Q10 shape: revenue lost to returned items per customer, top 20."""
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def big_spender_segments(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Correlated-subquery shape (decorrelated by Catalyst): customers
    whose total spend exceeds 2× the average customer total, per segment."""
    totals = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spend"))
    avg_spend = totals.agg(F.avg("spend").alias("avg_spend"))
    return (
        totals.join(F.broadcast(avg_spend))
        .filter(F.col("spend") > 2 * F.col("avg_spend"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_big_spenders"),
            F.round(F.sum("spend"), 2).alias("total_spend"),
        )
    )


def pivot_status_by_priority(orders: DataFrame) -> DataFrame:
    """PIVOT: order counts, statuses as columns. Explicit value list keeps
    the plan static (no extra distinct-collect job at scale)."""
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


def unpivot_order_measures(orders: DataFrame) -> DataFrame:
    """UNPIVOT via stack(): wide per-priority stats to long (measure,
    value) rows — the inverse-of-pivot surface."""
    wide = orders.groupBy("o_orderpriority").agg(
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )
    return wide.select(
        "o_orderpriority",
        F.expr(
            "stack(3, 'min_price', min_price, 'max_price', max_price, 'avg_price', avg_price)"
        ).alias("measure", "value"),
    )


def deterministic_sample_stats(orders: DataFrame, modulus: int = 10) -> DataFrame:
    """Deterministic key-hash sampling (o_orderkey % N = 0) — the
    reproducible alternative to TABLESAMPLE for pipeline debugging; the
    modulo predicate pushes to the scan."""
    return (
        orders.filter(F.col("o_orderkey") % modulus == 0)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_sampled"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


def exact_percentiles(orders: DataFrame) -> DataFrame:
    """Exact percentile (continuous interpolation) per group — the exact
    counterpart of percentile_approx; at 100 TB use the approx version
    (sketch, one pass) and reserve this for bounded groups."""
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
    )
