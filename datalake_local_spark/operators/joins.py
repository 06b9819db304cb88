"""Join suite — the full surface the reference delegates to Trino
(SURVEY.md §2.3: J1 left composite-key, J2 full ANSI surface, J3 provenance).

Each function is one join capability expressed declaratively so Catalyst
picks the physical strategy (broadcast-hash vs sort-merge vs shuffled-hash);
explicit ``F.broadcast`` only where the side is bounded by construction.

Scale notes: equi-joins shuffle both sides on the key — at 100 TB the win is
(a) broadcasting genuinely bounded dims, (b) pre-bucketing fact tables on the
join key so repeated joins reuse the partitioning, (c) AQE skew-join for hot
keys. Theta/range joins that cannot be equi-reduced are kept to bounded
inputs (or bucketized first — see operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inner_join_order_customer(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Plain inner equi-join + projection; AQE decides broadcast vs shuffle."""
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")
    )


def left_join_customer_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left outer join preserving customers with no orders (J1 shape:
    StockMarketsPrediction.js:2-11 is the same left-join-then-aggregate)."""
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


def semi_join_customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """EXISTS: customers having ≥1 order. Semi-join avoids materializing the
    right side — at scale this is a shuffle on the key with early-out probe."""
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def anti_join_customers_without_orders(
    customer: DataFrame, orders: DataFrame, since: str = "2000-01-01"
) -> DataFrame:
    """NOT EXISTS over a date-windowed right side: lapsed customers — no
    order on/after ``since``. The filter is applied to the right side
    BEFORE the anti-join so the shuffle only moves the recent slice
    (partition-prunable when orders is date-partitioned at 100 TB).

    The date window is what makes this certification non-vacuous: in the
    driver testdata every customer has some order, so an unfiltered
    NOT-EXISTS certifies the empty set (14/135/1355 rows at
    sf0.001/0.01/0.1 with the default window)."""
    recent = orders.filter(F.col("o_orderdate") >= F.lit(since).cast("date"))
    return customer.join(recent, customer.c_custkey == recent.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def broadcast_join_lineitem_part(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Explicit broadcast-hash join: the part projection is narrow; at true
    100 TB part is SF-scaled so this hint assumes a pre-filtered slice — the
    general rule is hint only what is bounded."""
    narrow_part = part.select("p_partkey", "p_brand")
    return (
        lineitem.join(F.broadcast(narrow_part), lineitem.l_partkey == narrow_part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_items"),
        )
    )


def composite_key_join_orders_lineitem(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Composite-key equi-join (J1 semantics ``ON p.dt=m.dt AND p.symbol=
    m.symbol``): join on (orderkey, shipdate-after-orderdate flag)."""
    o = orders.select("o_orderkey", "o_orderdate", "o_orderstatus")
    # EXACT 4dp mean of integer day-counts: (2·S·10⁴ + n) div 2n, half-up
    # — a float avg of integers is a small-denominator rational whose
    # double can shortest-print as an exact 4dp half, where Spark's
    # BigDecimal round and DuckDB's multiply-rint disagree (the r9
    # events_anomaly_zscore divergence class)
    return (
        lineitem.join(
            o,
            (lineitem.l_orderkey == o.o_orderkey) & (lineitem.l_shipdate >= o.o_orderdate),
            "inner",
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("nl"),
            F.sum(F.datediff("l_shipdate", "o_orderdate").cast("long")).alias("sd"),
        )
        .select(
            "o_orderstatus",
            F.col("nl").alias("n_shipped_after_order"),
            (
                F.expr("(2 * sd * 10000 + nl) div (2 * nl)").cast("double")
                / F.lit(10000.0)
            ).alias("avg_ship_delay_days"),
        )
    )


def theta_join_nation_pairs(nation: DataFrame) -> DataFrame:
    """Theta (non-equi) self-join on a bounded dim: ordered nation pairs in
    the same region. Non-equi joins are nested-loop/broadcast in Spark —
    acceptable only because nation is catalog-sized at any SF."""
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    return (
        n1.join(
            F.broadcast(n2),
            (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
            & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
        )
        .select(
            F.col("n1.n_name").alias("nation_a"),
            F.col("n2.n_name").alias("nation_b"),
            F.col("n1.n_regionkey").alias("region_key"),
        )
    )


def full_outer_reconcile(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """FULL OUTER reconciliation — the ETL-validation query (and the
    one ANSI join type the batch surface was missing): the order
    header's stated total vs the sum of its line gross amounts,
    FULL-OUTER-joined at order grain so BOTH orphan classes surface —
    headers with no lines, line groups with no header — plus the
    matched-with-value-drift class, each with exact integer-cent
    delta totals.

    Plan: map-side-combined line rollup, then ONE full-outer shuffle
    join co-partitioned on the order key; classification and deltas
    are map-only integer arithmetic on the joined row (never a second
    pass). Output is the 3-row class summary every reconciliation
    dashboard starts from."""
    header = orders.select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("decimal(38,0)")
        .cast("long")
        .alias("header_cents"),
    )
    lines = lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
                "decimal(38,0)"
            )
        )
        .cast("long")
        .alias("line_cents")
    )
    joined = header.join(lines, "o_orderkey", "full_outer").select(
        F.when(F.col("header_cents").isNull(), "lines_only")
        .when(F.col("line_cents").isNull(), "header_only")
        .otherwise("both")
        .alias("klass"),
        F.coalesce("header_cents", F.lit(0)).alias("hc"),
        F.coalesce("line_cents", F.lit(0)).alias("lc"),
    )
    return (
        joined.groupBy("klass")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("hc").cast("long").alias("header_cents"),
            F.sum("lc").cast("long").alias("line_cents"),
            F.sum(F.abs(F.col("hc") - F.col("lc"))).cast("long").alias("abs_delta_cents"),
        )
        .orderBy("klass")
    )
