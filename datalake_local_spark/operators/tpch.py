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
    cents = (F.col("o_totalprice").cast("decimal(18,6)") * 100).cast("long")
    wide = orders.groupBy("o_orderpriority").agg(
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.sum(cents).alias("sc"),
        F.count("*").alias("n"),
    )
    # exact integer-cents 2dp mean (the round(avg(2dp),·) hazard class)
    wide = wide.withColumn(
        "avg_price",
        F.expr("(2 * sc + n) div (2 * n)").cast("double") / F.lit(100.0),
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
    cents = (F.col("o_totalprice").cast("decimal(18,6)") * 100).cast("long")
    return (
        orders.filter(F.col("o_orderkey") % modulus == 0)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum(cents).alias("sc"),
        )
        .select(
            "o_orderstatus",
            "n_sampled",
            # exact integer-cents 4dp mean (round(avg) hazard class)
            (
                F.expr("(2 * sc * 100 + n_sampled) div (2 * n_sampled)").cast("double")
                / F.lit(10000.0)
            ).alias("avg_price"),
        )
    )


def forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """Q6 shape: revenue increase from eliminating small-quantity discounts
    in a ship-year. Pure scan + filter + global agg — the query exists to
    prove every predicate reaches the parquet scan (PushedFilters shows
    shipdate/discount/quantity) and nothing shuffles but one partial-agg
    row per task."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Q14 shape: fraction of one month's revenue from PROMO parts.
    part is SF-scaled, so no explicit broadcast hint — AQE picks
    broadcast at small SF and sort-merge at scale; conditional sum, no
    second pass."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1997-06-01") & (F.col("l_shipdate") < "1997-07-01")
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("promo_pct"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
    )


def top_supplier(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """Q15 shape: supplier(s) with maximum revenue in a quarter. The
    'WHERE total = (SELECT max(...))' correlated form becomes agg(max) +
    broadcast cross-join over the supplier-grain aggregate: the scalar
    max is a partial-aggregating reduce (map-side combine, no single-
    partition funnel — supplier is SF-scaled, so an unpartitioned window
    here would pull the whole relation through one task at 100 TB), and
    lineitem is never re-scanned."""
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    best = rev.crossJoin(
        F.broadcast(rev.agg(F.max("total_revenue").alias("max_rev")))
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    # broadcast the max-revenue rows (≈1 row), not SF-scaled supplier
    return (
        supplier.join(F.broadcast(best), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("s_suppkey").alias("suppkey"), "s_name", "total_revenue")
    )


def large_orders(lineitem: DataFrame, orders: DataFrame, customer: DataFrame, min_qty: float = 200.0) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds a threshold, with
    customer context, top 50 by price. The HAVING reduces lineitem to
    order-grain BEFORE the joins — the joins carry only qualifying keys."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
    )


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Q7 shape: cross-border revenue by (supplier nation, customer
    nation, year). nation joins twice under two aliases — both broadcast;
    the inequality keeps only cross-border flows."""
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        # round(4), not round(2): the term has at most 4 exact decimals, so
        # the true group sum is never ON a 4-decimal rounding boundary —
        # engine tie-breaking (Spark HALF_UP on shortest-repr vs DuckDB
        # binary-value) can therefore never diverge. At round(2) ~0.5% of
        # groups land on an exact .xx5 half-cent and flip.
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


def small_quantity_revenue(lineitem: DataFrame, part: DataFrame, brand: str = "Brand#1") -> DataFrame:
    """Q17 shape: revenue from lineitems below 20% of their part's average
    quantity. The correlated scalar subquery decorrelates into a per-part
    aggregate joined back. Both the brand-filtered part projection and
    the per-part aggregate are part-grain, i.e. SF-scaled — no explicit
    broadcast hints; AQE broadcasts them while they fit and falls back
    to shuffled joins at scale."""
    brand_parts = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(brand_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    avg_qty = li.groupBy("l_partkey").agg((0.2 * F.avg("l_quantity")).alias("qty_cut"))
    return (
        li.join(avg_qty.withColumnRenamed("l_partkey", "a_partkey"),
                F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = "NATION_3",
) -> DataFrame:
    """Q8 shape: one nation's share of revenue per year within one
    region's market for one part type — conditional-sum ratio over a
    six-way join; both nation aliases and region broadcast."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    supp_n = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_n = nation.select(F.col("n_nationkey").alias("cn_key"), "n_regionkey")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == target_nation, rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(rev), 4).alias("total_revenue"),
        )
    )


def customer_order_distribution(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Q13 shape: distribution of customers by order count (including
    zero-order customers via left join) — the two-level aggregation:
    per-customer count, then count of customers per count."""
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("n_customers"))


def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Q19 shape: revenue under OR-of-ANDs predicates (brand × size ×
    quantity bands). The disjunction stays one scan — Catalyst pushes the
    common join key and evaluates the OR during the probe; no union of
    three scans. part is SF-scaled — join strategy left to AQE, no
    broadcast hint."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    p1 = (F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15)) & (
        F.col("l_quantity").between(1, 11)
    )
    p2 = (F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25)) & (
        F.col("l_quantity").between(10, 20)
    )
    p3 = (F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35)) & (
        F.col("l_quantity").between(20, 30)
    )
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(p1 | p2 | p3)
        .agg(F.round(F.sum(rev), 4).alias("revenue"), F.count("*").alias("n_items"))
    )


def global_sales_opportunity(
    orders: DataFrame, customer: DataFrame, inactive_since: str = "2000-01-01"
) -> DataFrame:
    """Q22 shape: above-average-balance customers with no RECENT orders
    (lapsed high-value accounts), grouped by a derived country code
    (custkey mod as the stand-in) — anti join against a date-filtered
    order set after an aggregate-derived balance filter."""
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    eligible = customer.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    recent = orders.filter(F.col("o_orderdate") >= inactive_since)
    no_orders = eligible.join(
        recent, eligible.c_custkey == recent.o_custkey, "left_anti"
    )
    return no_orders.groupBy((F.col("c_custkey") % 7).alias("cntrycode")).agg(
        F.count("*").alias("n_custs"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


def exact_percentiles(orders: DataFrame) -> DataFrame:
    """Exact percentile (continuous interpolation) per group — the exact
    counterpart of percentile_approx; at 100 TB use the approx version
    (sketch, one pass) and reserve this for bounded groups."""
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
    )


def approx_percentiles(orders: DataFrame, accuracy: int = 1000) -> DataFrame:
    """Sketch percentiles (Greenwald-Khanna): single mergeable pass, the
    100 TB path for quantiles — exact percentile must buffer each group.
    Deterministic for fixed input+accuracy but sketch-specific → rows-only
    correctness; error vs the exact operator is bounded in tests."""
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile_approx("o_totalprice", 0.5, accuracy), 4).alias("median_price"),
        F.round(F.percentile_approx("o_totalprice", 0.9, accuracy), 4).alias("p90_price"),
        F.count("*").alias("n_orders"),
    )


def approx_percentiles_certified(
    orders: DataFrame, accuracy: int = 1000
) -> DataFrame:
    """GK sketch percentiles with an in-row rank-error certificate
    (r15 rows-only -> oracle conversion, r14 verdict #3).

    ``approx_percentiles`` publishes the GK values themselves, which —
    like any mergeable sketch — may legally vary with partition/merge
    layout, so they cannot be hash-checked against an ANSI oracle.
    This panel publishes only what is LAYOUT-INDEPENDENT: per group the
    exact order statistics bounding the admissible GK answer (values at
    ranks floor(499n/1000) and floor(501n/1000)+1 around the median
    target ceil(n/2), same ±(n/accuracy + 1 rank) window at p90 — all
    integer arithmetic, cross-engine exact), plus booleans asserting
    the sketch output landed inside its window. The booleans are
    guaranteed TRUE by the GK epsilon bound (Greenwald & Khanna,
    SIGMOD'01; Spark targets rank ceil(p*n) with error <= n/accuracy),
    so the oracle emits literal TRUE — a rank-bound violation in the
    sketch flips the Spark boolean and hash-reds the row.

    Scale note: the certificate side computes exact per-group order
    statistics (a per-group sort the sketch exists to avoid) — this is
    the VERIFICATION query; production quantiles at 100 TB use the
    sketch alone (approx_percentiles). Group count here is bounded
    (order priorities), so the sort is per-partition-feasible."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    ranked = orders.select("o_orderpriority", "o_totalprice").select(
        "*",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderpriority"))
        .alias("n"),
    )

    def _at(rank_expr):
        return F.max(
            F.when(F.col("r") == rank_expr, F.col("o_totalprice"))
        )

    lo_med = F.greatest(F.lit(1), F.expr("(n * 499) div 1000"))
    hi_med = F.least(F.col("n"), F.expr("(n * 501) div 1000 + 1"))
    lo_p90 = F.greatest(F.lit(1), F.expr("(n * 899) div 1000"))
    hi_p90 = F.least(F.col("n"), F.expr("(n * 901) div 1000 + 1"))
    bounds = ranked.groupBy("o_orderpriority").agg(
        F.max("n").alias("n_orders"),
        _at(lo_med).alias("median_lo"),
        _at(hi_med).alias("median_hi"),
        _at(lo_p90).alias("p90_lo"),
        _at(hi_p90).alias("p90_hi"),
    )
    gk = orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, accuracy).alias("_gk_med"),
        F.percentile_approx("o_totalprice", 0.9, accuracy).alias("_gk_p90"),
    )
    return bounds.join(gk, "o_orderpriority").select(
        "o_orderpriority",
        "n_orders",
        "median_lo",
        "median_hi",
        "p90_lo",
        "p90_hi",
        (
            (F.col("median_lo") <= F.col("_gk_med"))
            & (F.col("_gk_med") <= F.col("median_hi"))
        ).alias("median_in_bound"),
        (
            (F.col("p90_lo") <= F.col("_gk_p90"))
            & (F.col("_gk_p90") <= F.col("p90_hi"))
        ).alias("p90_in_bound"),
    )


def priority_late_count(lineitem: DataFrame, orders: DataFrame, late_days: int = 30) -> DataFrame:
    """Q4 shape: per-priority count of orders having AT LEAST ONE late
    lineitem (EXISTS-correlated subquery → left-semi join; the semi join
    stops probing an order on first match, never multiplying rows).
    'Late' = shipped more than ``late_days`` after the order date."""
    late = lineitem.select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late_orders"))
    )


def product_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    name_fragment: str = "a",
) -> DataFrame:
    """Q9 shape: profit by supplier nation × order year for parts whose
    name matches a fragment. The reference schema has no partsupp, so
    supply cost is derived (half retail price × quantity) — the shape
    (filtered part dim joined into a 4-way fact join, derived measure,
    two-level group) is Q9's. Filter on part BEFORE the join: the
    fragment prunes the build side early."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cost = 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    parts = part.filter(F.col("p_name").contains(name_fragment)).select("p_partkey", "p_retailprice")
    return (
        lineitem.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(F.round(F.sum(rev - cost), 4).alias("profit"))
    )


def waiting_supplier(
    lineitem: DataFrame, orders: DataFrame, supplier: DataFrame, late_days: int = 30, k: int = 20
) -> DataFrame:
    """Q21 shape: suppliers who were the ONLY late supplier on a
    multi-supplier order. The classic EXISTS(other supplier) AND NOT
    EXISTS(other LATE supplier) double-correlation decorrelates into one
    (order, supplier)-grain aggregate + one order-grain aggregate:
    n_supps >= 2 (the EXISTS) and n_late_supps == 1 (the NOT EXISTS,
    given this supplier is late) — two shuffles total, no correlated
    re-scans."""
    li = lineitem.join(orders.select("o_orderkey", "o_orderdate"),
                       F.col("l_orderkey") == F.col("o_orderkey"))
    per_os = (
        li.groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")).cast("int")
            ).alias("is_late")
        )
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.sum("is_late").alias("n_late_supps"),
    )
    culprits = (
        per_os.filter(F.col("is_late") == 1)
        .join(
            per_order.filter((F.col("n_supps") >= 2) & (F.col("n_late_supps") == 1)),
            "l_orderkey",
        )
    )
    return (
        culprits.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(k)
    )


def supplier_part_counts(lineitem: DataFrame, part: DataFrame, supplier: DataFrame) -> DataFrame:
    """Q16 shape: how many distinct suppliers serve each (brand, type
    prefix, size band), excluding a supplier blocklist (the NOT IN
    subquery → anti join). The observed (part, supplier) pairs come from
    lineitem (stand-in for partsupp) — distinct-pair reduction FIRST, so
    the join and count-distinct run at pair grain, not lineitem grain."""
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    blocked = supplier.filter(F.col("s_name").contains("7")).select(
        F.col("s_suppkey").alias("b_suppkey")
    )
    kept = pairs.join(
        blocked, F.col("l_suppkey") == F.col("b_suppkey"), "left_anti"
    )
    return (
        kept.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            "p_brand",
            F.substring("p_type", 1, 5).alias("type_prefix"),
            (F.col("p_size") % 10).alias("size_band"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def stratified_sample_stats(orders: DataFrame, per_group: int = 100) -> DataFrame:
    """Stratified fixed-size sampling: exactly ``per_group`` rows per
    stratum (order status), chosen by ranking on a content hash — the
    deterministic, engine-portable alternative to TABLESAMPLE when every
    stratum needs representation (rare-class QA sampling at corpus
    scale). One window shuffle on the stratum key; md5 keeps the rank
    order identical across engines."""
    from pyspark.sql import Window as W

    w = W.partitionBy("o_orderstatus").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), F.col("o_orderkey")
    )
    sampled = orders.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= per_group
    )
    cents = (F.col("o_totalprice").cast("decimal(18,6)") * 100).cast("long")
    return (
        sampled.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum(cents).alias("sc"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            "o_orderstatus",
            "n_sampled",
            # exact integer-cents 4dp mean (round(avg) hazard class)
            (
                F.expr("(2 * sc * 100 + n_sampled) div (2 * n_sampled)").cast("double")
                / F.lit(10000.0)
            ).alias("avg_price"),
            "sum_price",
        )
    )


def rfm_segments(orders: DataFrame) -> DataFrame:
    """RFM customer segmentation without a global ranking window: the
    recency / frequency / monetary quartile THRESHOLDS are exact
    percentile scalar aggregates (tree-reduced, broadcast back), and
    each customer buckets by comparison — the scale-safe form of the
    classic ntile() formulation, whose global orderBy window
    single-partitions the customer table at 100 TB. Output is the
    segment-grain distribution (≤ 4³ rows)."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    q = per_cust.agg(
        *[
            F.percentile(c, F.lit(p)).alias(f"{c}_q{int(p * 4)}")
            for c in ("frequency", "monetary")
            for p in (0.25, 0.5, 0.75)
        ],
        *[
            F.percentile(F.unix_timestamp("last_order"), F.lit(p)).alias(
                f"recency_q{int(p * 4)}"
            )
            for p in (0.25, 0.5, 0.75)
        ],
    )

    def bucket(col, pre):
        return (
            F.when(col <= F.col(f"{pre}_q1"), 1)
            .when(col <= F.col(f"{pre}_q2"), 2)
            .when(col <= F.col(f"{pre}_q3"), 3)
            .otherwise(4)
        )

    scored = per_cust.crossJoin(F.broadcast(q)).select(
        bucket(F.unix_timestamp("last_order"), "recency").alias("r_bucket"),
        bucket(F.col("frequency"), "frequency").alias("f_bucket"),
        bucket(F.col("monetary"), "monetary").alias("m_bucket"),
    )
    return (
        scored.groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r_bucket", "f_bucket", "m_bucket")
    )


def min_cost_supplier(part: DataFrame, supplier: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    """Q2 shape (minimum-cost supplier): for each europe-region part of
    a given type class (STANDARD on this part domain), the supplier(s) offering the corpus-minimum
    supply cost — the classic correlated-scalar-subquery pattern
    (``WHERE ps_supplycost = (SELECT min(...) ...)``) expressed as a
    per-part min aggregate joined back, never a correlated re-scan.

    The testdata has no partsupp table, so both engines DERIVE one
    deterministically: supplier s offers part p iff
    ``(p_partkey + s_suppkey) % 4 = 0`` (¼ density), at supplycost
    ``((p_partkey * 31 + s_suppkey * 17) % 10000) / 100`` — pure
    arithmetic, identical in Spark and the ANSI oracle, so the Q2
    semantics are exercised end-to-end without inventing data files.

    Scale shape: the derived partsupp is a theta-join the engine
    evaluates as a filtered cross product of two SF-scaled dims — fine
    at dim scale (part × supplier, not facts); the per-part min is a
    partial aggregate; the winner join is key-equi on
    (partkey, supplycost). Region/nation prune suppliers FIRST (the
    bounded dims broadcast), so the derived relation never includes
    out-of-region rows."""
    eur = (
        supplier.join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "n_name")
    )
    parts = part.filter(F.col("p_type").contains("STANDARD")).select(
        "p_partkey", "p_brand"
    )
    ps = parts.join(
        F.broadcast(eur),
        (F.col("p_partkey") + F.col("s_suppkey")) % 4 == 0,
    ).withColumn(
        "supplycost",
        ((F.col("p_partkey") * 31 + F.col("s_suppkey") * 17) % 10000) / 100,
    )
    mins = ps.groupBy("p_partkey").agg(F.min("supplycost").alias("min_cost"))
    return (
        ps.join(mins, "p_partkey")
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.col("n_name").alias("nation"),
            F.round("min_cost", 2).alias("supplycost"),
        )
    )


def important_stock(supplier: DataFrame, nation: DataFrame, part: DataFrame) -> DataFrame:
    """Q11 shape (important stock identification): the parts whose
    supply value held by one nation's suppliers exceeds a fixed
    fraction of that nation's total supply value — the
    aggregate-vs-global-scalar HAVING pattern (``HAVING sum(...) >
    (SELECT sum(...) * frac ...)``), expressed as the grouped aggregate
    joined to a broadcast 1-row total, never a re-scan.

    Runs over the SAME derived deterministic partsupp as
    :func:`min_cost_supplier` (supplier s offers part p iff
    (p_partkey + s_suppkey) % 4 = 0; supplycost = ((p*31 + s*17) %
    10000)/100) extended with availqty = (p*7 + s*3) % 1000 + 1 — pure
    arithmetic, identical in the ANSI oracle, so the Q11 semantics run
    end-to-end without a partsupp file (reference analog: the TPC-H
    surface of its Trino endpoint).

    Scale shape: the nation-group filter prunes suppliers FIRST
    (broadcast dim; a ``%5`` nation group rather than one nation so the
    relation is non-vacuous at every test SF — sf0.001 has zero
    suppliers in any single nation), the derived relation is a dim×dim
    theta join (never fact-scaled), the per-part sum is a map-side
    partial aggregate, and the global cutoff re-aggregates the
    per-part sums (one extra reduce over group-grain rows) and
    broadcasts one row into the HAVING filter. The cutoff is a
    MULTIPLE OF THE AVERAGE part value — TPC-H's literal
    fraction-of-total needs its 0.0001/SF rescaling to stay
    non-degenerate across scale factors, while avg×1.2 keeps the
    selectivity meaningful at any SF. The compare runs on EXACT integer
    cents (10·n·part_cents > 12·total_cents), so no accumulation order
    anywhere can flip boundary membership."""
    nat = nation.filter(F.col("n_nationkey") % 5 == 2).select("n_nationkey")
    sups = supplier.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    # INTEGER CENTS end to end: supplycost is (...)%10000 cents by
    # construction, so every sum and the avg×1.2 cutoff compare are
    # exact integer arithmetic (10·n·part_cents > 12·total_cents) —
    # order-invariant across engines and partition layouts, where a
    # float avg() cutoff could flip boundary membership at an ulp
    ps = part.select("p_partkey").join(
        F.broadcast(sups), (F.col("p_partkey") + F.col("s_suppkey")) % 4 == 0
    ).select(
        "p_partkey",
        (
            ((F.col("p_partkey") * 31 + F.col("s_suppkey") * 17) % 10000)
            * ((F.col("p_partkey") * 7 + F.col("s_suppkey") * 3) % 1000 + 1)
        ).cast("long").alias("value_cents"),
    )
    per_part = ps.groupBy("p_partkey").agg(
        F.sum("value_cents").alias("part_cents")
    )
    total = per_part.agg(
        F.sum("part_cents").alias("total_cents"),
        F.count("*").alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        # decimal(38,0), not long: part_cents*n_parts*10 wraps a silent
        # non-ANSI int64 above ~sf100 while DuckDB promotes to HUGEINT —
        # the compare must stay exact on both engines at any SF
        .filter(
            F.col("part_cents").cast("decimal(38,0)")
            * F.col("n_parts").cast("decimal(38,0)") * 10
            > F.col("total_cents").cast("decimal(38,0)") * 12
        )
        .select(
            "p_partkey",
            F.round(F.col("part_cents") / 100, 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


def part_promotion(lineitem: DataFrame, supplier: DataFrame, nation: DataFrame, part: DataFrame) -> DataFrame:
    """Q20 shape (potential part promotion): suppliers holding EXCESS
    stock — derived availqty greater than half the quantity they
    actually shipped in 1995 — the correlated
    ``ps_availqty > (SELECT 0.5*sum(l_quantity) ...)`` decorrelated
    into a (part, supplier)-grain shipment aggregate joined to the
    derived partsupp (same deterministic relation as
    :func:`min_cost_supplier` / :func:`important_stock`: offer iff
    (p+s)%4=0, availqty = (p*7+s*3)%1000+1), suppliers pruned to the
    %5-nation group FIRST. Output: supplier grain with how many parts
    are overstocked — the Q20 mailing list.

    Scale shape: the shipment aggregate is the only fact-scaled input
    (map-side partial on (l_partkey, l_suppkey)); the derived partsupp
    is dim×dim; the excess filter is a key-equi join of the two
    aggregates; final supplier-grain rollup is dim-bounded. No
    correlated re-scan, two shuffles total."""
    nat = nation.filter(F.col("n_nationkey") % 5 == 2).select("n_nationkey")
    sups = supplier.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    ps = part.select("p_partkey").join(
        F.broadcast(sups), (F.col("p_partkey") + F.col("s_suppkey")) % 4 == 0
    ).select(
        "p_partkey",
        "s_suppkey",
        ((F.col("p_partkey") * 7 + F.col("s_suppkey") * 3) % 1000 + 1).alias("availqty"),
    )
    shipped = (
        lineitem.filter(
            (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
        )
        .groupBy(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
        )
        .agg(F.sum("l_quantity").alias("shipped_qty"))
    )
    excess = ps.join(shipped, ["p_partkey", "s_suppkey"]).filter(
        F.col("availqty") > 0.5 * F.col("shipped_qty")
    )
    return (
        excess.groupBy("s_suppkey")
        .agg(
            F.count("*").cast("long").alias("n_excess_parts"),
            F.sum("availqty").cast("long").alias("total_excess_avail"),
        )
        .orderBy("s_suppkey")
    )


def basket_affinity(
    lineitem: DataFrame, min_pairs: int = 3, top: int = 100
) -> DataFrame:
    """Market-basket pair affinity: for every pair of parts co-ordered in
    the same order, the co-occurrence count, support, and LIFT
    (P(a,b) / (P(a)·P(b)) — Agrawal et al. 1993 association-rule
    mining's core statistic), top-``top`` pairs by lift. The
    recommender / cross-sell primer the reference's BI surface would
    express as a Cube measure over an order-items fact.

    Scale shape: the pair generation is a SELF-JOIN WITHIN ORDER — the
    fanout is quadratic in basket size, never in table size (baskets
    are small by domain; a 100-item pathological basket contributes
    4950 pairs, still bounded). Item and order totals are one grouped
    aggregate each; the pair aggregate shuffles on (part_a, part_b).
    The final top-k is a global sort of the pair-grain aggregate —
    pair cardinality ≤ Σ basket², orders of magnitude below lineitem.

    Determinism: counts are exact integers on both engines, and lift /
    support are single identical double expressions over those
    integers (ratio-of-ints, no accumulation) → bit-identical; ties
    broken by (part_a, part_b).

    Min-support prune BELOW the pair join (r15 verdict #5; the
    apriori item-prune, Agrawal et al. §2.1): a pair can only reach
    ``n_together >= min_pairs`` if BOTH parts sit in at least
    ``min_pairs`` distinct baskets, so items of infrequent parts are
    semi-joined away BEFORE the quadratic self-join — at 100× the
    pair fanout, not the scan, is the killer term, and long-tail
    parts (the vast majority in a real catalog) never enter it. The
    result is provably unchanged: support/lift still use the
    UNPRUNED part counts."""
    # materialize once: items feeds totals, part_counts and BOTH sides
    # of the self-join — uncheckpointed, each consumer re-ran the
    # lineitem scan + distinct (3 finalized scans; r16 plan audit).
    # (orderkey, partkey) pairs are a fraction of lineitem width.
    items = lineitem.select("l_orderkey", "l_partkey").distinct().localCheckpoint()
    totals = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    # 20k-row aggregate with three consumers (frequent, ca, cb)
    part_counts = (
        items.groupBy("l_partkey").agg(F.count("*").alias("cnt")).localCheckpoint()
    )
    frequent = part_counts.filter(F.col("cnt") >= min_pairs).select("l_partkey")
    pruned = items.join(frequent, "l_partkey", "semi")
    a = pruned.alias("a")
    b = pruned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_together"))
        .filter(F.col("n_together") >= min_pairs)
    )
    ca = part_counts.select(F.col("l_partkey").alias("part_a"), F.col("cnt").alias("cnt_a"))
    cb = part_counts.select(F.col("l_partkey").alias("part_b"), F.col("cnt").alias("cnt_b"))
    lift = (
        F.col("n_together").cast("double")
        * F.col("n_orders").cast("double")
        / F.col("cnt_a")
        / F.col("cnt_b")
    )
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "part_a",
            "part_b",
            "n_together",
            "cnt_a",
            "cnt_b",
            F.round(F.col("n_together") / F.col("n_orders").cast("double"), 6).alias("support"),
            F.round(lift, 6).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(top)
    )


def seasonal_index(orders: DataFrame) -> DataFrame:
    """Calendar-month seasonal index of order revenue: for each month
    of year, the ratio of that month's average monthly revenue (across
    years) to the overall monthly average — the classical multiplicative
    seasonal decomposition's seasonal factor, the input to any
    deseasonalized forecast (forecast_revenue's Q6 shape prices a
    policy; this prices the calendar).

    Scale shape: orders collapse to (year, month) grain in one grouped
    aggregate (map-side combined); everything after runs on ≤ years×12
    rows. Determinism: revenue is summed as exact integer cents
    (DECIMAL(18,6)×100 → long); monthly averages use (2S+n) div 2n
    half-up (values positive); the index is one identical
    ratio-of-exact-integers double expression per row, rounded at 6dp
    (a derived 17-digit double, no grid hazard)."""
    cents = (F.col("o_totalprice").cast("decimal(18,6)") * 100).cast("long")
    monthly = (
        orders.select(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            cents.alias("c"),
        )
        .groupBy("y", "m")
        .agg(F.sum("c").alias("month_cents"))
    )
    per_month = monthly.groupBy("m").agg(
        F.count("*").alias("n_years"),
        F.sum("month_cents").alias("sum_cents"),
    )
    overall = per_month.agg(
        F.sum("sum_cents").alias("total_cents"),
        F.sum("n_years").alias("n_months"),
    )
    avg_cents = F.expr("(2 * sum_cents + n_years) div (2 * n_years)")
    index = (
        F.col("sum_cents").cast("double")
        / F.col("n_years")
        / (F.col("total_cents").cast("double") / F.col("n_months"))
    )
    return (
        per_month.crossJoin(F.broadcast(overall))
        .select(
            F.col("m").alias("month_of_year"),
            "n_years",
            (avg_cents.cast("double") / 100.0).alias("avg_month_revenue"),
            F.round(index, 6).alias("seasonal_index"),
        )
        .orderBy("month_of_year")
    )


def yoy_growth(orders: DataFrame) -> DataFrame:
    """Year-over-year monthly revenue growth, fully in integer
    arithmetic: monthly order totals as exact DECIMAL cents, self-joined
    on an integer (year·12 + month) key 12 months apart, growth reported
    in BASIS POINTS via integer division — no float ever touches the
    output, so cross-engine parity is structural (the r9 threshold-
    compare rule applied to period-over-period analytics).

    Plan: one map-side-combined month-grain aggregate, then a self-join
    of the ~|months| relation on the shifted key — both sides are
    month-grain (broadcastable at any corpus size); the base aggregate
    is the only table-sized stage.

    Overflow envelope: 10000·month_cents must fit BIGINT → month
    revenue < $9.2e12, ~sf10⁵ headroom; beyond that keep DECIMAL(38,0).
    """
    monthly = (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"))
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("decimal(38,0)"))
            .cast("long")
            .alias("revenue_cents")
        )
        .withColumn(
            "mkey", F.year("month") * 12 + F.month("month")
        )
    )
    prev = monthly.select(
        (F.col("mkey") + 12).alias("mkey"),
        F.col("revenue_cents").alias("prev_year_cents"),
    )
    return (
        monthly.join(prev, "mkey")
        .select(
            "month",
            "revenue_cents",
            "prev_year_cents",
            F.expr("(10000 * revenue_cents) div prev_year_cents").alias("growth_bps"),
        )
        .orderBy("month")
    )


def pareto_abc(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """ABC / Pareto inventory classification per brand: parts ranked by
    revenue within their brand, classified A (first parts covering
    ≤ 70% of brand revenue), B (≤ 90%), C (tail) — the 80/20
    concentration report purchasing teams run; the training-data twin
    is source-concentration triage (which sources carry the token
    mass).

    Integer-exact throughout: revenue as DECIMAL cents, class
    boundaries decided by integer cross-multiplication
    (100·cum ≤ 70·total), shares in basis points via integer division —
    no float ever touches class membership or the output, so
    cross-engine parity is structural.

    Scale shape: ONE part-grain map-side-combined aggregate is the only
    table-sized stage; the ranked/cumulative window partitions BY BRAND
    (part-catalog-bounded groups, the gini_spend_concentration shape —
    never an unpartitioned global sort); the final class rollup is a
    ~|brands|·3-row relation. Tie order deterministic: cents DESC,
    partkey ASC."""
    from pyspark.sql import Window as W

    rev = (
        lineitem.groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
                    "decimal(38,0)"
                )
            )
            .cast("long")
            .alias("cents")
        )
        .join(part.select(F.col("p_partkey").alias("l_partkey"), "p_brand"), "l_partkey")
    )
    wcum = (
        W.partitionBy("p_brand")
        .orderBy(F.col("cents").desc(), F.col("l_partkey"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wtot = W.partitionBy("p_brand")
    classed = rev.select(
        "p_brand",
        "cents",
        F.sum("cents").over(wcum).alias("cum_cents"),
        F.sum("cents").over(wtot).alias("total_cents"),
    ).select(
        "p_brand",
        "cents",
        F.when(F.col("cum_cents") * 100 <= F.col("total_cents") * 70, "A")
        .when(F.col("cum_cents") * 100 <= F.col("total_cents") * 90, "B")
        .otherwise("C")
        .alias("abc_class"),
        "total_cents",
    )
    return (
        classed.groupBy("p_brand", "abc_class")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("class_cents"),
            F.expr("(10000 * sum(cents)) div any_value(total_cents)")
            .cast("long")
            .alias("share_bps"),
        )
        .orderBy("p_brand", "abc_class")
    )


def cohort_ltv(orders: DataFrame) -> DataFrame:
    """Customer-cohort lifetime-value triangle: customers grouped by
    FIRST-ORDER month, revenue tracked by months-since-acquisition —
    the standard LTV curve (cohort × age grid), all in exact integer
    cents with per-customer LTV via integer division.

    Plan: ONE shuffle of orders on o_custkey feeds an unbounded
    per-customer window (min order month = the cohort; no second scan,
    no join-back — the groupBy-then-rejoin alternative shuffles the
    fact table twice); everything downstream is the cohort × age
    month-grain grid. Cohort size needs no extra relation: BY
    DEFINITION every cohort customer is active at months_since = 0, so
    cohort_customers = n_active(0), read off with a month-grain
    window."""
    from pyspark.sql import Window as W

    month_key = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    w_cust = W.partitionBy("o_custkey")
    aged = orders.select(
        "o_custkey",
        F.min(F.date_trunc("month", F.col("o_orderdate")).cast("date"))
        .over(w_cust)
        .alias("cohort_month"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("omonth"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("decimal(38,0)")
        .alias("cents"),
    ).select(
        "cohort_month",
        (month_key(F.col("omonth")) - month_key(F.col("cohort_month")))
        .cast("int")
        .alias("months_since"),
        "o_custkey",
        "cents",
    )
    grid = aged.groupBy("cohort_month", "months_since").agg(
        F.count_distinct("o_custkey").cast("long").alias("n_active"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    w_ord = W.partitionBy("cohort_month").orderBy("months_since")
    wcum = w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        grid.select(
            "cohort_month",
            "months_since",
            "n_active",
            "revenue_cents",
            F.sum("revenue_cents").over(wcum).cast("long").alias("cum_cents"),
            F.first("n_active").over(w_ord).cast("long").alias("cohort_customers"),
        )
        .withColumn(
            "ltv_cents_per_cust",
            F.expr("cum_cents div cohort_customers").cast("long"),
        )
        .orderBy("cohort_month", "months_since")
    )


def fulfillment_lead_time(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Order-fulfillment lead time SLA table: days from order placement
    to the LAST line shipment, summarized per priority with an exact
    integer-cent... integer-DAY mean ((2S+n) div 2n half-up at 2dp) and
    exact P50/P90/P99 percentiles (the certified F.percentile ≡
    quantile_cont pair over integer day counts) — the classic
    fulfillment-SLA report, at ORDER grain (the line-grain ship-delay
    twin is join_composite_theta).

    Plan: one map-side-combined max() at order grain, ONE shuffle
    co-partitioned on the order key for the join, then a 5-group
    aggregate. Lead times are small integers; no float enters until
    the final percentile interpolation."""
    last_ship = lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.max("l_shipdate").alias("last_ship")
    )
    lead = orders.join(last_ship, "o_orderkey").select(
        "o_orderpriority",
        F.datediff("last_ship", "o_orderdate").cast("long").alias("days"),
    )
    return (
        lead.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            (
                F.expr("(2 * sum(days) * 100 + count(*)) div (2 * count(*))")
                .cast("double")
                / 100.0
            ).alias("mean_days"),
            F.round(F.percentile(F.col("days"), F.lit(0.5)), 6).alias("p50_days"),
            F.round(F.percentile(F.col("days"), F.lit(0.9)), 6).alias("p90_days"),
            F.round(F.percentile(F.col("days"), F.lit(0.99)), 6).alias("p99_days"),
        )
        .orderBy("o_orderpriority")
    )


def realized_margin(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Price-realization report per brand: billed line revenue vs the
    catalog's retail value of the same units — the realized-price /
    discount-depth table merchandising reads (realized_bps < 10000 ⇒
    selling under list). Exact throughout: both sides are DECIMAL
    cent products (quantity enters as DECIMAL, so fractional units
    stay exact), the ratio is integer-division basis points.

    One partkey-keyed shuffle join (AQE broadcasts the part side at
    small SF), one brand-grain map-side-combined aggregate. Quantities
    are integral in this schema (asserted by the harness), so the
    retail product is an exact integer-cents DECIMAL — fractional
    units would need the DECIMAL(38,6) variant with an explicit
    rounding contract."""
    ext_cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "decimal(38,0)"
    )
    retail_cents = (
        (F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("decimal(38,0)")
        * F.col("l_quantity").cast("decimal(18,0)")
    )
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(ext_cents).cast("long").alias("billed_cents"),
            F.sum(retail_cents).cast("long").alias("retail_cents"),
        )
        .select(
            "p_brand",
            "n_lines",
            "billed_cents",
            "retail_cents",
            F.expr("(10000 * billed_cents) div retail_cents")
            .cast("long")
            .alias("realized_bps"),
        )
        .orderBy("p_brand")
    )


def order_aging(orders: DataFrame) -> DataFrame:
    """Order-book aging table: orders bucketed by STATUS × AGE (whole
    years between order date and the book's latest date) with counts
    and exact open-value cents — the WIP/receivables aging report
    every order book answers first ('how much value sits in old open
    orders?').

    Ages are integer day differences floor-divided into years (pure
    integer both engines); value is exact DECIMAL cents. One scan +
    one broadcast 1-row max-date + one (status, age) map-side-combined
    aggregate."""
    book_end = orders.agg(F.max("o_orderdate").alias("end_d"))
    return (
        orders.crossJoin(F.broadcast(book_end))
        .select(
            "o_orderstatus",
            F.expr("datediff(end_d, o_orderdate) div 365").cast("int").alias(
                "age_years"
            ),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("decimal(38,0)")
            .alias("cents"),
        )
        .groupBy("o_orderstatus", "age_years")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("value_cents"),
        )
        .orderBy("o_orderstatus", "age_years")
    )


def return_rates(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Return-rate quality screen per brand: share of line items (and
    of revenue) flagged 'R', in exact integer basis points — the
    product-quality table that decides which brand gets a supplier
    review. Counts and cent sums are exact; both rates are integer
    divisions, so ranking brands by return rate is boundary-stable
    across engines.

    One partkey-keyed join (AQE broadcasts part at small SF), one
    brand-grain conditional aggregate."""
    r_flag = (F.col("l_returnflag") == "R").cast("long")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "decimal(38,0)"
    )
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(r_flag).cast("long").alias("n_returned"),
            F.sum(cents).cast("long").alias("billed_cents"),
            F.sum(F.when(F.col("l_returnflag") == "R", cents).otherwise(F.lit(0).cast("decimal(38,0)")))
            .cast("long")
            .alias("returned_cents"),
        )
        .select(
            "p_brand",
            "n_lines",
            "n_returned",
            F.expr("(10000 * n_returned) div n_lines").cast("long").alias("return_rate_bps"),
            "billed_cents",
            "returned_cents",
            F.expr("(10000 * returned_cents) div billed_cents")
            .cast("long")
            .alias("returned_value_bps"),
        )
        .orderBy("p_brand")
    )


def supplier_concentration_hhi(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Supplier-concentration screen per brand: the Herfindahl–
    Hirschman index (HHI — the DOJ/FTC market-concentration measure,
    public) of each supplier's revenue share within a brand, plus the
    top-supplier share — the procurement-risk view of the supply base
    ("is this brand single-sourced?"), classified with the standard
    DOJ bands (< 1500 unconcentrated, 1500-2500 moderate, ≥ 2500
    high).

    Determinism: revenue is exact DECIMAL(38,0) cents; shares are
    integer basis points ``(10000·sup_cents) div brand_cents`` and
    HHI = Σ share_bps² div 10000 — the conventional 0-10000 point
    scale in pure integer arithmetic, no float division anywhere.

    Scale shape: one partkey-co-partitioned lineitem⨝part join (the
    realized_margin shuffle), a (brand, supplier)-grain map-side
    combined aggregate, then brand-grain windows over the SUPPLIER
    dimension (bounded per brand) for shares and the index."""
    from pyspark.sql import Window as W

    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "decimal(38,0)"
    )
    sup = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), "l_suppkey")
        .agg(F.sum(cents).alias("sup_cents"))
    )
    w_brand = W.partitionBy("brand")
    shared = sup.select(
        "brand",
        "l_suppkey",
        F.expr("(10000 * sup_cents) div (sum(sup_cents) OVER (PARTITION BY brand))")
        .cast("long")
        .alias("share_bps"),
    )
    return (
        shared.groupBy("brand")
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            F.expr("sum(share_bps * share_bps) div 10000").alias("hhi_points"),
            F.max("share_bps").cast("long").alias("top_share_bps"),
        )
        .select(
            "brand",
            "n_suppliers",
            "hhi_points",
            "top_share_bps",
            F.when(F.col("hhi_points") >= 2500, "high")
            .when(F.col("hhi_points") >= 1500, "moderate")
            .otherwise("unconcentrated")
            .alias("concentration"),
        )
        .orderBy("brand")
    )


def demand_variability_xyz(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """XYZ demand-variability classification per brand — the standard
    inventory-planning companion to ABC value analysis (the ABC/XYZ
    matrix of operations-management textbooks; Silver, Pyke & Peterson
    — public): X = steady demand (CV < 0.5, forecastable), Y =
    variable (0.5 ≤ CV < 1), Z = erratic (CV ≥ 1, safety-stock or
    make-to-order). Demand = monthly shipped quantity per brand.

    Determinism: quantities are integral (asserted upstream by
    realized_margin's discipline); monthly sums and the moment sums
    (n, Σq, Σq²) are exact integers, and the CLASS BOUNDARIES compare
    in cross-multiplied integer arithmetic — CV ≥ 1 ⇔ n·Σq² − (Σq)²
    ≥ (Σq)²·(n−1)/n... cleared of divisions: n·(nΣq²−(Σq)²) ≥
    (n−1)·(Σq)² for the sample-variance CV, and the 0.5 bound
    likewise ×4 — so no float ever decides a class. The reported CV
    itself is one identical sqrt tree, 6dp.

    Scale shape: one partkey-co-partitioned join, a (brand, month)
    map-side-combined aggregate, then a brand-grain moment aggregate —
    no window, no skew beyond brand popularity."""
    monthly = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_trunc("month", F.col("l_shipdate")).alias("month"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    )
    g = monthly.groupBy("brand").agg(
        F.count("*").alias("n"),
        F.sum("q").cast("decimal(38,0)").alias("sq"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("sqq"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    dvar = nd * F.col("sqq") - F.col("sq") * F.col("sq")  # n²·σ²_pop·... exact
    # CV² = [n·(nΣq²−(Σq)²)] / [(n−1)·(Σq)²]  (sample variance / mean²)
    lhs = nd * dvar
    rhs = (nd - 1) * F.col("sq") * F.col("sq")
    n_f = F.col("n").cast("double")
    cv = F.sqrt(
        dvar.cast("double") / (n_f * (n_f - 1))
    ) / (F.col("sq").cast("double") / n_f)
    return g.filter(F.col("n") > 1).select(
        "brand",
        F.col("n").cast("long").alias("n_months"),
        F.col("sq").cast("long").alias("total_qty"),
        (F.round(cv, 6) + F.lit(0.0)).alias("demand_cv"),
        F.when(4 * lhs < rhs, "X")
        .when(lhs < rhs, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    ).orderBy("brand")


def rfm_migration(orders: DataFrame, split_date: str = "1995-06-01") -> DataFrame:
    """Customer segment MIGRATION matrix: segment every customer in the
    first half of the order history (orders before ``split_date``) and
    again in the second half, then count the transitions — the
    retention-marketing view on top of ``rfm_segments``'s static
    distribution ("how many champions decayed to casual, how many new
    customers arrived big-ticket?"). Segments are the 2×2
    frequency × monetary split at each period's own MEDIAN (per-period
    thresholds, so the matrix reads mix shift, not volume growth);
    customers absent from a period enter as NEW / exit as LOST.

    Determinism: frequency and monetary are exact integers (count,
    cents); the medians interpolate integers at dyadic fractions
    (exactly representable doubles, identical via F.percentile ≡
    quantile_cont); bucket membership is an exact compare. Shares in
    integer basis points.

    Scale shape: two per-customer aggregates (one scan each, map-side
    combined), scalar median aggregates broadcast back (the
    rfm_segments discipline — no global ntile window), one full-outer
    join at customer grain, bounded (5×5) matrix out."""
    split = F.lit(split_date).cast("date")
    cents = (F.col("o_totalprice").cast("decimal(18,6)") * 100).cast("long")

    def _segmented(df, tag):
        per = df.groupBy("o_custkey").agg(
            F.count("*").alias("freq"), F.sum(cents).alias("mon")
        )
        q = per.agg(
            F.percentile("freq", F.lit(0.5)).alias("f_med"),
            F.percentile("mon", F.lit(0.5)).alias("m_med"),
        )
        return per.crossJoin(F.broadcast(q)).select(
            "o_custkey",
            F.concat(
                F.when(F.col("freq") > F.col("f_med"), "Fhi").otherwise("Flo"),
                F.lit("_"),
                F.when(F.col("mon") > F.col("m_med"), "Mhi").otherwise("Mlo"),
            ).alias(f"seg_{tag}"),
        )

    p1 = _segmented(orders.filter(F.col("o_orderdate") < split), "from")
    p2 = _segmented(orders.filter(F.col("o_orderdate") >= split), "to")
    matrix = (
        p1.join(p2, "o_custkey", "full_outer")
        .select(
            F.coalesce("seg_from", F.lit("NEW")).alias("seg_from"),
            F.coalesce("seg_to", F.lit("LOST")).alias("seg_to"),
        )
        .groupBy("seg_from", "seg_to")
        .agg(F.count("*").alias("n_customers"))
    )
    total = matrix.agg(F.sum("n_customers").alias("t"))
    return (
        matrix.crossJoin(F.broadcast(total))
        .select(
            "seg_from",
            "seg_to",
            F.col("n_customers").cast("long").alias("n_customers"),
            F.expr("(10000 * n_customers) div t").cast("long").alias("share_bps"),
        )
        .orderBy("seg_from", "seg_to")
    )


def order_fill_rate(
    orders: DataFrame, lineitem: DataFrame, late_days: int = 30
) -> DataFrame:
    """On-time-in-full (OTIF) fill rate by month × priority: an order
    counts as OTIF when EVERY lineitem shipped within ``late_days`` of
    the order date (the testdata carries no l_commitdate, so the
    lateness definition is the 30-day one ``priority_late_count`` and
    ``waiting_supplier`` already use) — the customer-facing
    service-level rate next to those offender counts.

    Exact: the per-order verdict is a min() over integer 0/1 flags;
    rates in integer basis points. Scale shape: one lineitem-grain
    aggregate keyed by orderkey co-partitioned with the orders join,
    bounded month × priority rollup. (The flag needs o_orderdate, so
    the join precedes the per-order aggregate; both shuffle on the
    SAME order key — one exchange each, reused.)"""
    j = orders.join(
        lineitem.select("l_orderkey", "l_shipdate"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    per_order = j.groupBy(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    ).agg(
        F.min(
            F.when(
                F.col("l_shipdate")
                <= F.date_add(F.col("o_orderdate"), late_days),
                1,
            ).otherwise(0)
        ).alias("otif")
    )
    return (
        per_order.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("otif").cast("long").alias("n_otif"),
        )
        .select(
            "month",
            "priority",
            "n_orders",
            "n_otif",
            F.expr("(10000 * n_otif) div n_orders").cast("long").alias("fill_bps"),
        )
        .orderBy("month", "priority")
    )


def discount_elasticity(lineitem: DataFrame) -> DataFrame:
    """Quantity response by discount band — the merchandising "does
    discounting move volume?" table behind Q19's revenue bands: per
    discount level (exact integer percent), line count, total
    quantity, realized revenue, mean quantity, and the quantity lift
    vs the zero-discount baseline.

    Determinism: the band is round(l_discount·100) (an exact integer
    on TPC-H's 2dp discount domain); quantity and revenue are exact
    integers (revenue in 10⁻⁴-dollar units: cents × (100 − pct));
    avg_qty and the lift are single divisions of exact BIGINT
    products (hash-safe unrounded ratios).

    Scale shape: ONE map-side-combined aggregate at band grain
    (≤ 11 rows), the baseline row broadcast back. No second scan."""
    pct = F.round(F.col("l_discount") * 100, 0).cast("long")
    qty = F.col("l_quantity").cast("decimal(18,6)").cast("long")
    ext_cents = (F.col("l_extendedprice").cast("decimal(18,6)") * 100).cast(
        "long"
    )
    bands = (
        lineitem.groupBy(pct.alias("discount_pct"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(qty).alias("sum_qty"),
            F.sum(ext_cents * (100 - pct)).alias("revenue_e4"),
        )
        .localCheckpoint()  # ≤ 11 rows; baseline row re-consumed
    )
    zero = bands.filter(F.col("discount_pct") == 0).select(
        F.col("n_lines").alias("n0"), F.col("sum_qty").alias("sq0")
    )
    return (
        bands.crossJoin(F.broadcast(zero))
        .select(
            "discount_pct",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("sum_qty").cast("long").alias("sum_qty"),
            F.col("revenue_e4").cast("long").alias("revenue_e4"),
            (
                F.col("sum_qty").cast("double") / F.col("n_lines").cast("double")
            ).alias("avg_qty"),
            (
                (F.col("sum_qty") * F.col("n0")).cast("double")
                / (F.col("n_lines") * F.col("sq0")).cast("double")
            ).alias("qty_lift_vs_zero"),
        )
        .orderBy("discount_pct")
    )


#: Default parameters for the inventory-planning quartet, shared with
#: the DuckDB oracles in ``__spark_entry__`` (the _WILSON_SQL pattern:
#: one source of truth so an entry-lambda kwarg change cannot silently
#: diverge from the oracle-baked literals; formula correctness is
#: carried by the independent hand-computed tests, not by this sharing).
CROSTON_ALPHA = 0.2
NEWSVENDOR_CR = (3, 4)
EOQ_ORDER_COST = 100
EOQ_HOLDING_COST = 2


def croston_demand(lineitem: DataFrame, alpha: float = CROSTON_ALPHA) -> DataFrame:
    """Croston's method for INTERMITTENT demand (Croston 1972,
    "Forecasting and stock control for intermittent demands", Oper.
    Res. Quarterly — public; the standard forecaster for the erratic
    "Z" class that :func:`demand_variability_xyz` flags): per part,
    smooth the nonzero demand SIZES and the INTER-DEMAND intervals as
    two separate SES recursions and forecast the demand RATE as their
    ratio —
    ``level_k = α·z_k + (1−α)·level_{k−1}``;
    ``interval_k = α·q_k + (1−α)·interval_{k−1}``;
    ``rate = level/interval`` (units per month). Plain SES (Holt
    without trend) applied to sparse series collapses toward zero
    between demands; Croston's split is the fix inventory systems use.

    Demand = monthly shipped quantity per part; only months WITH
    shipments appear (the series is intermittent by construction), and
    ``q_k`` is the calendar-month gap between successive demand months
    (``q_1`` = months from the global series anchor to the first
    demand, +1 — a documented deterministic init; ``level_1 = z_1``).
    Each emitted row carries the one-step-ahead rate forecast made
    BEFORE that demand arrived (the holt_forecast discipline) plus the
    post-update state. Parts with a single demand month emit nothing.

    Determinism (the events_cusum/holt toolbox): monthly quantities
    are exact integer sums (integral l_quantity, the demand_xyz
    discipline); month indexes are exact integers off one global
    anchor; the two-state recursion is the same correctly-rounded op
    sequence on both engines (1−α COMPUTED, never a 0.8 literal — the
    r15 ADVICE ulp class) and values publish UNROUNDED, so the DuckDB
    recursive-CTE oracle replays it bit-exactly.

    Scale shape: one (part, month) map-side-combined aggregate, a
    broadcast scalar anchor, then applyInPandas over BUCKET groups
    (p_partkey mod 64), NOT part groups: the recursion state is two
    doubles per part either way, but per-group Arrow/pandas overhead
    at 20k-parts-×-25-rows grain dominated the fold itself (13.5 s →
    1.4 s warm at sf0.1, measured) — the kernel walks one
    (part, idx)-sorted batch and resets state at part boundaries. At
    1000 executors, raise the bucket count to match parallelism; skew
    is structurally absent (parts hash-uniform over buckets)."""
    import numpy as np
    import pandas as pd

    one_a = 1.0 - alpha

    monthly = (
        lineitem.groupBy(
            F.col("l_partkey").alias("p_partkey"),
            F.date_trunc("month", F.col("l_shipdate")).alias("month"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        # materialize once: the anchor branch below would otherwise
        # re-expand this aggregate and scan lineitem a second time —
        # at corpus scale that is two full fact scans for one tiny
        # demand-grain relation (plan-census discipline)
        .localCheckpoint()
    )
    anchor = monthly.agg(F.min("month").alias("m0"))
    monthly = (
        monthly.crossJoin(F.broadcast(anchor))
        .withColumn("idx", F.months_between(F.col("month"), F.col("m0")).cast("long"))
        .drop("m0")
        .withColumn("bucket", F.pmod(F.col("p_partkey"), F.lit(64)).cast("int"))
    )

    def kernel(key, pdf):
        pdf = pdf.sort_values(["p_partkey", "idx"], ignore_index=True)
        pk = pdf["p_partkey"].to_numpy()
        q = pdf["q"].to_numpy()
        idx = pdf["idx"].to_numpy()
        sel, gaps, fcs, lvls, itvs = [], [], [], [], []
        level = itv = 0.0
        for i in range(len(pdf)):
            if i == 0 or pk[i] != pk[i - 1]:
                # first demand of a part: init state, emit nothing
                level = float(q[i])
                itv = float(idx[i] + 1)
                continue
            fc = level / itv
            gap = int(idx[i] - idx[i - 1])
            level = alpha * float(q[i]) + one_a * level
            itv = alpha * float(gap) + one_a * itv
            sel.append(i)
            gaps.append(gap)
            fcs.append(fc)
            lvls.append(level)
            itvs.append(itv)
        return pd.DataFrame(
            {
                "p_partkey": pk[sel],
                "month": pdf["month"].iloc[sel].to_numpy(),
                "gap_months": np.asarray(gaps, dtype=np.int64),
                "demand_qty": q[sel],
                "rate_forecast": np.asarray(fcs, dtype=np.float64),
                "level": np.asarray(lvls, dtype=np.float64),
                "smoothed_interval": np.asarray(itvs, dtype=np.float64),
            }
        )

    return monthly.groupBy("bucket").applyInPandas(
        kernel,
        "p_partkey long, month timestamp, gap_months long, demand_qty long, "
        "rate_forecast double, level double, smoothed_interval double",
    )


def newsvendor_stock(
    lineitem: DataFrame,
    part: DataFrame,
    cr_num: int = NEWSVENDOR_CR[0],
    cr_den: int = NEWSVENDOR_CR[1],
) -> DataFrame:
    """Newsvendor stock target per brand (Arrow 1951 / the classic
    single-period inventory model, operations-management textbooks —
    public): stock to the CRITICAL-RATIO quantile of the demand
    distribution — with CR = cu/(cu+co) = ``cr_num/cr_den`` (default
    3/4: underage costs 3× overage), the optimal order-up-to level is
    the smallest demand level whose empirical CDF reaches CR. The
    planning companion to :func:`croston_demand` (what rate to expect)
    and :func:`demand_variability_xyz` (how noisy): HOW MUCH to stock.

    Demand = monthly shipped quantity per brand (exact integer sums,
    the demand_xyz discipline). The quantile is the exact ORDER
    STATISTIC k = ⌈CR·n⌉ (integer arithmetic, no interpolation — the
    two engines' interpolating percentile() kernels differ in op
    order, an order statistic cannot), so every output is exact
    integers until the two documented single divisions (mean and
    safety stock, round 6 half-up on both engines).

    Scale shape: one partkey-co-partitioned join, a (brand, month)
    map-side-combined aggregate, then brand-partitioned windows over
    ≤ n_months rows per brand — no global window, no driver collect."""
    from pyspark.sql import Window

    monthly = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_trunc("month", F.col("l_shipdate")).alias("month"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    )
    w = Window.partitionBy("brand").orderBy("q", "month")
    wb = Window.partitionBy("brand")
    ranked = monthly.select(
        "brand",
        "q",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wb).cast("long").alias("n_months"),
        F.sum("q").over(wb).cast("long").alias("total_qty"),
    )
    # ⌈cr_num·n/cr_den⌉ in pure integer arithmetic
    picked = ranked.where(
        F.col("rn")
        == F.expr(f"({cr_num} * n_months + {cr_den - 1}) div {cr_den}")
    )
    mean_expr = F.col("total_qty").cast("double") / F.col("n_months").cast("double")
    return picked.select(
        "brand",
        "n_months",
        "total_qty",
        F.round(mean_expr, 6).alias("mean_monthly_qty"),
        F.col("q").alias("stock_target_qty"),
        F.round(F.col("q").cast("double") - mean_expr, 6).alias("safety_stock_qty"),
    )


#: Wilson score interval, ONE expression string parsed by BOTH Spark
#: and DuckDB (the verbatim-SQL discipline: identical parse tree →
#: identical IEEE op sequence → bit-exact cross-engine). Every literal
#: is CAST(... AS DOUBLE) — bare decimal literals parse as DECIMAL on
#: both engines and would promote differently.
_WILSON_SQL = {
    "p": "(CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE))",
    "z2n": "(CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)"
    " / CAST(n_lines AS DOUBLE))",
}
_WILSON_SQL["center"] = (
    f"(({_WILSON_SQL['p']} + {_WILSON_SQL['z2n']} / CAST(2.0 AS DOUBLE))"
    f" / (CAST(1.0 AS DOUBLE) + {_WILSON_SQL['z2n']}))"
)
_WILSON_SQL["half"] = (
    f"((CAST(1.96 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + {_WILSON_SQL['z2n']}))"
    f" * sqrt({_WILSON_SQL['p']} * (CAST(1.0 AS DOUBLE) - {_WILSON_SQL['p']})"
    f" / CAST(n_lines AS DOUBLE)"
    f" + {_WILSON_SQL['z2n']}"
    f" / (CAST(4.0 AS DOUBLE) * CAST(n_lines AS DOUBLE))))"
)


def return_rate_wilson_ci(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Wilson score interval on the per-brand return rate (Wilson 1927,
    JASA — public; the interval behind every "sort by lower confidence
    bound" ranking): the point return rate over-ranks low-volume brands
    — a brand with 1 return in 2 lines reads 50% — while the Wilson
    LOWER bound shrinks toward the prior exactly as the evidence thins,
    which is why review systems rank by it. One row per brand: counts,
    point rate, and the 95% Wilson bounds; consumers rank by
    ``wilson_lo``.

    Determinism: counts are exact integers; the interval is ONE shared
    expression string parsed verbatim by Spark and the DuckDB oracle
    (identical parse tree → identical IEEE op order → bit-exact), with
    every literal an explicit CAST(... AS DOUBLE) — bare decimal
    literals are DECIMAL-typed on both engines and would promote
    differently (the r15 ADVICE literal class). Outputs unrounded.

    The half-width's variance term is p(1−p)/n + z²/(4n²), written as
    (z²/n)/(4n) so the shared string reuses the z2n fragment — r16
    review-pass fix: the first cut shipped z⁴/(4n²) (z2n squared), a
    ~38%-too-wide interval the cross-engine gate is structurally blind
    to (both engines parse the same wrong string); the contract test
    now pins hand-derived bounds instead of re-evaluating the
    implementation's own formula.

    Scale shape: one partkey-co-partitioned join + one brand-grain
    conditional aggregate (map-side combined); the interval math is
    per-brand scalar expressions on ≤ |brands| rows."""
    r_flag = (F.col("l_returnflag") == "R").cast("long")
    base = (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(r_flag).cast("long").alias("n_returned"),
        )
    )
    return base.select(
        "brand",
        "n_lines",
        "n_returned",
        F.expr(_WILSON_SQL["p"]).alias("return_rate"),
        F.expr(f"{_WILSON_SQL['center']} - {_WILSON_SQL['half']}").alias("wilson_lo"),
        F.expr(f"{_WILSON_SQL['center']} + {_WILSON_SQL['half']}").alias("wilson_hi"),
    )


def economic_order_quantity(
    lineitem: DataFrame,
    part: DataFrame,
    order_cost: int = EOQ_ORDER_COST,
    holding_cost: int = EOQ_HOLDING_COST,
) -> DataFrame:
    """Economic order quantity per brand (Harris 1913 — the original
    lot-size formula, public): EOQ = sqrt(2·D·S / H) with D = observed
    total demand, S = fixed cost per order, H = holding cost per unit
    — closing the inventory-planning quartet
    (:func:`demand_variability_xyz` classifies the noise,
    :func:`croston_demand` forecasts the rate,
    :func:`newsvendor_stock` sets the service-level buffer, EOQ sets
    the REPLENISHMENT LOT SIZE and with it the order cadence).

    Determinism: D is an exact integer quantity sum; S and H are
    integer parameters, so 2·D·S/H enters sqrt as ONE exact-integer-
    ratio double, and IEEE-754 sqrt is CORRECTLY ROUNDED on every
    conforming engine (unlike ln/log2 — no libm drift class exists
    for it), so eoq_qty publishes unrounded and bit-exact. The order
    count is one further division of the same exact inputs.

    Scale shape: one partkey-co-partitioned join + one brand-grain
    aggregate; the formula is per-brand scalar math on ≤ |brands|
    rows."""
    base = (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("total_qty"))
    )
    eoq = (
        f"sqrt(CAST(2 * total_qty * {order_cost} AS DOUBLE)"
        f" / CAST({holding_cost} AS DOUBLE))"
    )
    return base.select(
        "brand",
        "total_qty",
        F.expr(eoq).alias("eoq_qty"),
        F.expr(f"CAST(total_qty AS DOUBLE) / ({eoq})").alias("orders_per_horizon"),
    )
