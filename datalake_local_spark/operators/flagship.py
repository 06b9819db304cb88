"""Flagship query: monthly revenue by region.

Mirrors the analytical contract of the reference's Cube semantic layer —
time-grain × dimension rollups with additive measures
(conf/cube/schema/StockMarkets.js:12-127, StockMarketsMonthly.js:1-2) —
expressed over the driver's TPC-H-ish star schema:

    lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region
    GROUP BY month(o_orderdate), r_name
    SUM(l_extendedprice * (1 - l_discount))

Scale design (100 TB): the fact-fact join (lineitem ⋈ orders) is the only
real shuffle; customer is left to AQE (broadcastable at small SF, shuffled
at scale), while nation/region are bounded catalog dims and explicitly
broadcast so the plan never shuffles on them regardless of statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def revenue_by_month_region(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
            F.col("r_name").alias("region_name"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("order_month", "region_name")
    )
