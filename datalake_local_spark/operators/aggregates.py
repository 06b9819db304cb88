"""Aggregation suite (SURVEY.md §2.4 A1-A10).

The Cube semantic layer declares count/sum/avg/min/max measures grouped by
symbol × time grain (StockMarkets.js:12-127); Trino adds distinct aggs,
rollup/cube/grouping sets, approx_count_distinct. All are Catalyst built-ins
with map-side partial aggregation — the scale property that matters: a
groupBy over 100 TB shuffles only the partial aggregate states, not rows.

Every computed column is aliased (and doubles rounded) so results hash-match
the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: the canonical multi-measure scan-agg.

    The three averages use EXACT integer means ((2S·scale + n) div 2n,
    half-up over integer quantities / price cents / discount cents) —
    round(avg(double), 4) of grid-valued columns is the exact-4dp-half
    divergence class the r11 signbit-exact sweep exposed in
    agg_monthly_rollup."""
    ql = F.col("l_quantity").cast("long")
    pc = (F.col("l_extendedprice").cast("decimal(18,6)") * 100).cast("long")
    dc = (F.col("l_discount").cast("decimal(18,6)") * 100).cast("long")
    g = (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.sum(ql).alias("sq"),
            F.sum(pc).alias("spc"),
            F.sum(dc).alias("sdc"),
            F.count("*").alias("count_order"),
        )
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        (
            F.expr("(2 * sq * 10000 + count_order) div (2 * count_order)").cast("double")
            / F.lit(10000.0)
        ).alias("avg_qty"),
        (
            F.expr("(2 * spc * 100 + count_order) div (2 * count_order)").cast("double")
            / F.lit(10000.0)
        ).alias("avg_price"),
        (
            F.expr("(2 * sdc * 100 + count_order) div (2 * count_order)").cast("double")
            / F.lit(10000.0)
        ).alias("avg_disc"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


def order_stats_by_priority(orders: DataFrame) -> DataFrame:
    """Full basic-measure family incl. exact distinct (A1-A5, A10).
    avg_price is the exact integer-cents 4dp mean (see pricing_summary)."""
    cents = (F.col("o_totalprice").cast("decimal(18,6)") * 100).cast("long")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.sum(cents).alias("sc"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            "sum_price",
            (
                F.expr("(2 * sc * 100 + n_orders) div (2 * n_orders)").cast("double")
                / F.lit(10000.0)
            ).alias("avg_price"),
            "min_price",
            "max_price",
            "n_customers",
        )
    )


def rollup_returnflag_linestatus(lineitem: DataFrame) -> DataFrame:
    """ROLLUP hierarchy totals; NULL group labels coalesced for stable
    oracle comparison."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


def cube_status_priority(orders: DataFrame) -> DataFrame:
    """CUBE over two dims — all 4 grouping combinations."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "sum_price",
        )
    )


def grouping_sets_events(spark: SparkSession) -> DataFrame:
    """Explicit GROUPING SETS via SQL (Trino-surface parity). Expects the
    ``events`` temp view registered by session.load_tables."""
    return spark.sql(
        """
        SELECT coalesce(event_type, 'ALL') AS event_type,
               coalesce(CAST(user_id % 10 AS STRING), 'ALL') AS user_bucket,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        """
    )


def approx_distinct_parts(lineitem: DataFrame) -> DataFrame:
    """HLL approximate distinct (A10). No exact oracle — DuckDB's sketch
    differs — so the driver records a rows-only check; the companion exact
    query `agg_order_stats` covers countDistinct correctness."""
    return lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.round(F.percentile_approx("l_extendedprice", 0.5, 10000), 0).alias("approx_median_price"),
    )


def approx_distinct_parts_certified(lineitem: DataFrame) -> DataFrame:
    """HLL approximate distinct with an in-row error certificate (r15
    rows-only -> oracle conversion; the approx_percentiles_certified
    pattern applied to A10's sketch pair).

    ``approx_distinct_parts`` publishes the HLL++ estimate and the GK
    median themselves — engine-specific values no ANSI oracle can
    reproduce. This panel publishes what is DETERMINISTIC and
    oracle-computable: the exact distinct count and exact
    order-statistic bounds, plus booleans certifying each sketch
    landed inside its error window. Both sketches are layout-
    independent for fixed data (HLL++ merges registers by MAX —
    commutative/associative; GK is certified by rank bounds, not
    values), so the booleans are fixed properties of the data:
    - ``parts_in_bound``: |hll - exact| <= 6% of exact (3 sigma at the
      requested rsd 0.02), integer cross-multiplied.
    - ``median_in_bound``: the GK(accuracy=10000) output lies between
      the exact order statistics at ranks (4999n/10000) and
      (5001n/10000)+1 — the epsilon-rank window plus one rank.
    The oracle computes the same exact values and emits literal TRUE;
    a sketch-error violation flips the Spark boolean and reds the row."""
    from pyspark.sql import Window

    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = lineitem.select("l_returnflag", "l_extendedprice").select(
        "*",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("l_returnflag"))
        .alias("n"),
    )
    lo = F.greatest(F.lit(1), F.expr("(n * 4999) div 10000"))
    hi = F.least(F.col("n"), F.expr("(n * 5001) div 10000 + 1"))
    bounds = ranked.groupBy("l_returnflag").agg(
        F.max("n").alias("n_rows"),
        F.max(F.when(F.col("r") == lo, F.col("l_extendedprice"))).alias(
            "median_lo"
        ),
        F.max(F.when(F.col("r") == hi, F.col("l_extendedprice"))).alias(
            "median_hi"
        ),
    )
    sketches = lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("_hll"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_gk"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    return bounds.join(sketches, "l_returnflag").select(
        "l_returnflag",
        "n_rows",
        "exact_parts",
        "median_lo",
        "median_hi",
        (
            F.abs(F.col("_hll") - F.col("exact_parts")) * 100
            <= F.col("exact_parts") * 6
        ).alias("parts_in_bound"),
        (
            (F.col("median_lo") <= F.col("_gk"))
            & (F.col("_gk") <= F.col("median_hi"))
        ).alias("median_in_bound"),
    )


def argmax_aggregates(orders: DataFrame) -> DataFrame:
    """min_by/max_by (arg-extremum) + first/last-in-order aggregates: per
    priority, which order carries the extreme price. One pass, no window."""
    return orders.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_orderkey"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_orderkey"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
    )


def conditional_aggregates(lineitem: DataFrame) -> DataFrame:
    """Filtered/conditional aggregation: count_if + sum(CASE) measures —
    several filtered measures in ONE scan instead of N filtered scans."""
    returned = F.col("l_returnflag") == "R"
    big = F.col("l_quantity") > 30
    return lineitem.groupBy("l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.count_if(returned).alias("n_returned"),
        F.count_if(big).alias("n_big"),
        F.round(F.sum(F.when(returned, F.col("l_extendedprice")).otherwise(0.0)), 2).alias(
            "returned_value"
        ),
        F.round(F.avg(F.when(big, F.col("l_discount"))), 6).alias("avg_disc_big"),
    )


def null_handling_orders(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """NULL-handling surface over a null-producing left join: coalesce,
    nullif, nvl2-style flags, and null-safe equality."""
    big_customers = customer.filter(F.col("c_acctbal") > 7000).select(
        "c_custkey", F.col("c_name").alias("big_name")
    )
    joined = orders.join(big_customers, orders.o_custkey == big_customers.c_custkey, "left")
    return joined.select(
        "o_orderkey",
        F.coalesce("big_name", F.lit("(small)")).alias("display_name"),
        F.col("big_name").isNull().alias("is_small"),
        F.when(F.col("big_name").isNotNull(), "BIG").otherwise("SMALL").alias("tier"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
    )


def statistical_aggregates(lineitem: DataFrame) -> DataFrame:
    """Statistical aggregate family: correlation, covariance, stddev,
    variance — one pass, map-side partial states (sum/sum² moments)."""
    return lineitem.groupBy("l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
    )


def price_histogram(orders: DataFrame, bins: int = 10) -> DataFrame:
    """Equal-width histogram via arithmetic binning (floor over the global
    min/max, broadcast as a 1-row bound) — the distributed form of
    width_bucket; bin edges computed once, counts are one groupBy."""
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    # r19 guard: an all-identical price column makes hi == lo — the
    # bin-width division RAISED under ANSI; everything lands in bin 0
    binned = orders.join(F.broadcast(bounds)).select(
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.floor(
                    (F.col("o_totalprice") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / bins)
                ),
                F.lit(bins - 1).cast("long"),
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("bin")
    )
    return binned.groupBy("bin").agg(F.count("*").alias("n_orders"))


def monthly_rollup(orders: DataFrame) -> DataFrame:
    """A8: the Cube `stock_markets_monthly` materialization shape —
    month-grain rollup as a reusable aggregate.

    avg_price uses the EXACT integer-cents (2S·100 + n) div 2n half-up
    mean, not round(avg(double), 4): a float mean of 2dp values is a
    small-denominator rational whose double shortest-prints as an exact
    4dp half on real rows (2 rows at sf0.001 — caught by the r11
    signbit-aware exact sweep after ten rounds of epsilon compares
    missed it)."""
    cents = (F.col("o_totalprice").cast("decimal(18,6)") * 100).cast("long")
    return (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
            F.col("o_orderstatus").alias("orderstatus"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.sum(cents).alias("sum_cents"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .select(
            "order_month",
            "orderstatus",
            "n_orders",
            "sum_price",
            (
                F.expr("(2 * sum_cents * 100 + n_orders) div (2 * n_orders)").cast(
                    "double"
                )
                / F.lit(10000.0)
            ).alias("avg_price"),
            "min_price",
            "max_price",
        )
    )


def equidepth_histogram(orders: DataFrame, buckets: int = 10) -> DataFrame:
    """Equi-depth (equal-height) histogram: bucket boundaries at exact
    quantiles, then per-bucket counts — the histogram shape optimizers
    keep for selectivity estimation (complements the equi-width
    price_histogram). Two passes: a tiny exact-percentile aggregate
    (bounded output: buckets-1 doubles, broadcast back), then one scan
    assigning each row its bucket via a fold over the cutoff array —
    no per-row UDF, no sort of the data itself."""
    qs = [i / buckets for i in range(1, buckets)]
    cutoffs = orders.agg(
        F.expr(f"percentile(o_totalprice, array({','.join(str(q) for q in qs)}))").alias("cuts")
    )
    bucketed = orders.join(F.broadcast(cutoffs)).select(
        F.aggregate(
            F.col("cuts"),
            F.lit(0),
            lambda acc, c: acc + F.when(F.col("o_totalprice") > c, 1).otherwise(0),
        ).alias("bucket")
    )
    return bucketed.groupBy("bucket").agg(F.count("*").alias("n_orders"))


def mad_outliers(events: DataFrame) -> DataFrame:
    """Robust anomaly profile per event_type: median, MAD (median
    absolute deviation), and how many events fall outside
    median ± 3·1.4826·MAD (the Gaussian-consistent robust z-score).

    Exact medians (percentile), two grouped passes over one shuffle key:
    per-type median → per-type MAD of deviations → outlier count. Robust
    stats resist the heavy tails that break stddev-based gates — the
    standard data-quality monitor on metric streams."""
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("median_value")
    )
    with_dev = events.join(F.broadcast(med), "event_type").withColumn(
        "abs_dev", F.abs(F.col("value") - F.col("median_value"))
    )
    mad = with_dev.groupBy("event_type").agg(
        F.first("median_value").alias("median_value"),
        F.expr("percentile(abs_dev, 0.5)").alias("mad"),
    )
    flagged = with_dev.drop("median_value").join(F.broadcast(mad), "event_type")
    return flagged.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.first("median_value"), 6).alias("median_value"),
        F.round(F.first("mad"), 6).alias("mad"),
        F.sum(
            (F.col("abs_dev") > 3 * 1.4826 * F.col("mad")).cast("long")
        ).alias("n_outliers"),
    )


def trend_regression(events: DataFrame) -> DataFrame:
    """Per-series linear trend: least-squares slope and R² of value
    against event-time (hours since epoch), per event_type — drift/trend
    detection over metric streams. Single grouped aggregate using the
    SQL regression aggregates (regr_*): one shuffle at series grain,
    partial-aggregated map-side like any sum.

    The epoch-0 intercept is deliberately NOT reported: extrapolating
    ~490k hours outside the data range amplifies engine-level float
    noise into the 4th decimal (and the value is physically
    meaningless); the series mean is the stable level statistic.

    Determinism (r11 class fix): the engines' regr_* builtins
    accumulate raw doubles in different orders, and round(avg(2dp),4)
    sits on the exact-half grid — so slope/r2/mean are computed from
    EXACT integer moments instead: time as epoch seconds centered on
    900000000 (1998-07-09; slope/r² are shift-invariant,
    centering keeps (Σt)² inside DECIMAL(38,0) through ~sf1000),
    value as integer cents. The derived statistics are then one
    identical IEEE expression tree per column; +0.0 normalizes the
    signed zero a flat series' slope can round to."""
    t = (F.expr("unix_micros(ts) div 1000000") - F.lit(900000000)).alias("t")
    c = (F.col("value").cast("decimal(18,6)") * 100).cast("long").alias("c")
    raw = events.select("event_type", t, c)
    td = F.col("t").cast("decimal(38,0)")
    cd = F.col("c").cast("decimal(38,0)")
    s = raw.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(td).alias("st"),
        F.sum(td * td).alias("stt"),
        F.sum("c").alias("sc"),
        F.sum(cd * cd).alias("scc"),
        F.sum(td * cd).alias("stc"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    scd = F.col("sc").cast("decimal(38,0)")
    m = s.select(
        "event_type",
        "n",
        "sc",
        (nd * F.col("stc") - F.col("st") * scd).cast("double").alias("dty"),
        (nd * F.col("stt") - F.col("st") * F.col("st")).cast("double").alias("dtt"),
        (nd * F.col("scc") - scd * scd).cast("double").alias("dcc"),
    )
    # degenerate-group guards (r12, ADVICE): a single-event group or a
    # constant-time series has dtt == 0 (and a constant-value one
    # dcc == 0) — 0/0 is NaN on Spark but configuration-dependent in
    # DuckDB, and the regr_* builtins this rewrite replaced returned
    # NULL there; F.when with no otherwise restores explicit NULL.
    return m.select(
        "event_type",
        "n",
        F.when(
            F.col("dtt") > 0,
            F.round(F.col("dty") / F.col("dtt") * 3600.0 / 100.0, 6) + F.lit(0.0),
        ).alias("slope_per_hour"),
        (
            F.expr("(2 * sc * 100 + n) div (2 * n)").cast("double") / F.lit(10000.0)
        ).alias("mean_value"),
        F.when(
            (F.col("dtt") > 0) & (F.col("dcc") > 0),
            F.round(F.col("dty") * F.col("dty") / (F.col("dtt") * F.col("dcc")), 6),
        ).alias("r2"),
    )


def hll_sketch_rollup(events: DataFrame) -> DataFrame:
    """Mergeable HLL sketches (Spark 4 Apache DataSketches surface): per
    event_type a binary HLL sketch of distinct users, then the
    TYPE-SKETCHES themselves are merged (hll_union_agg) into the global
    distinct-user estimate — the two-level pattern that makes sketches
    the 100 TB answer for distinct-count rollups: partial sketches are
    a few KB each and re-aggregable along any dimension without
    re-reading the data (store them in a daily rollup table; any date
    range is a union of sketches, never a rescan).

    Approximate (~1.6% at lgConfigK=12) → rows-only driver check; the
    error bound vs exact distinct counts is asserted in tests."""
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 12).alias("sketch"),
        F.count("*").alias("n_events"),
    )
    global_row = per_type.agg(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_users"),
        F.sum("n_events").alias("n_events"),
    )
    return (
        per_type.select(
            "event_type",
            F.hll_sketch_estimate("sketch").alias("distinct_users"),
            "n_events",
        )
        .unionByName(global_row)
        .orderBy("event_type")
    )


def hll_sketch_rollup_certified(events: DataFrame) -> DataFrame:
    """The two-level HLL sketch rollup with an in-row error certificate
    (r15 rows-only -> oracle conversion). Same plan as
    ``hll_sketch_rollup`` — per-type DataSketches HLL of distinct
    users, sketches THEMSELVES merged for the global row — but the
    published value is the EXACT distinct count (oracle-computable)
    plus a boolean certifying the sketch estimate landed within 6% of
    it (3+ sigma at lgConfigK=12, rsd ~1.6%). Register merges are MAX
    — commutative/associative — so the estimates, and hence the
    booleans, are layout-independent properties of the data. The
    sketch pipeline stays fully in the plan: a register-merge defect
    or error blow-up flips the boolean and reds the row."""
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 12).alias("sketch"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    global_row = per_type.agg(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("_est"),
        F.sum("n_events").alias("n_events"),
    )
    global_exact = events.agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    global_full = global_row.crossJoin(F.broadcast(global_exact)).select(
        "event_type", "_est", "n_events", "exact_users"
    )
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("_est"),
        "n_events",
        "exact_users",
    )
    return (
        typed.unionByName(global_full)
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("_est") - F.col("exact_users")) * 100
                <= F.col("exact_users") * 6
            ).alias("estimate_in_bound"),
        )
        .orderBy("event_type")
    )


def bitmap_exact_distinct(events: DataFrame) -> DataFrame:
    """Exact distinct counting via bitmap aggregation (the Spark 3.5+
    bitmap function family): ids fold into fixed-size bucket bitmaps
    (``bitmap_bucket_number`` / ``bitmap_bit_position`` /
    ``bitmap_construct_agg``), counted with ``bitmap_count`` and summed
    per group. EXACT like count(DISTINCT) but without the Expand-based
    distinct aggregate's per-value shuffle rows: the shuffle carries one
    ≤4 KB bitmap per (group, bucket) regardless of how many ids fall in
    the bucket — the engine-native form of the roaring-bitmap distinct
    that warehouse engines use for billion-id audiences. Certified
    against the plain ``count(DISTINCT ...)`` oracle — exactness, not
    approximation (compare ``approx_distinct``'s HLL rows-only
    entries)."""
    return (
        events.groupBy(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
        )
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_distinct_users"))
    )


def boolean_aggregate_family(orders: DataFrame) -> DataFrame:
    """Boolean/conditional aggregate family (Spark 3.x additions:
    ``count_if``, ``bool_and``, ``bool_or``) — the predicates-as-
    aggregates surface auditors and quality gates lean on. All three
    are deterministic (unlike any_value/max_by under ties, deliberately
    excluded); DuckDB mirrors them with FILTER and its own
    bool_and/bool_or."""
    return orders.groupBy("o_orderpriority").agg(
        F.expr("count_if(o_totalprice > 100000)").cast("long").alias("n_big"),
        F.expr("bool_and(o_totalprice > 0)").alias("all_positive"),
        F.expr("bool_or(o_orderstatus = 'F')").alias("any_finished"),
        F.count("*").alias("n_orders"),
    )


def regression_family(lineitem: DataFrame) -> DataFrame:
    """The complete ANSI bivariate-regression aggregate family
    (regr_count/avgx/avgy/slope/intercept/r2 + corr + covar_samp/pop)
    of extended price against quantity, per return flag — the one-pass
    answer to "how does price scale with quantity in each segment"
    (reference analog: the Trino SQL surface the reference delegates
    aggregation to, trino/catalog config; every function here is ANSI
    and exists verbatim in both engines).

    Scale shape: ONE grouped aggregate — every regr_* function is a
    composition of the same five streaming moments (n, Σx, Σy, Σxy,
    Σx², Σy²), so the whole family partial-aggregates map-side and
    shuffles one row per group, exactly like a sum.

    Determinism (the r10 class fix): the engines' regr_*/corr/covar
    builtins use DIFFERENT internal accumulation (co-moment updates vs
    naive sums) over raw doubles, so their low bits drift with
    partition order and a 4dp round can flip — the same defect that
    sank dq_ab_ttest in r9. The certified form therefore computes the
    textbook identities from EXACT moments: quantity is integer-valued
    (long), price is 2dp (integer cents via DECIMAL(18,6)×100 →
    DECIMAL(38,0); DuckDB mirrors with HUGEINT), so (n, Σx, Σy, Σxy,
    Σx², Σy²) and the cross-products D_xy = nΣxy−ΣxΣy etc. are exact
    integers through ~sf1000 (n·Σc² ≈ 3.6e33 < 1e38). Cast to double,
    every derived value is the same IEEE expression tree on both
    engines. The 4dp means use exact (2S+n) div 2n integer rounding
    (half-up; both columns positive). The ANSI regr_* builtins remain
    the idiomatic production spelling — this form exists to be
    bit-reproducible under the driver's value hash."""
    q = F.col("l_quantity").cast("long")
    c = (F.col("l_extendedprice").cast("decimal(18,6)") * 100).cast("decimal(38,0)")
    s = (
        lineitem.select("l_returnflag", q.alias("q"), c.alias("c"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("nl"),
            F.sum("q").alias("sq"),
            F.sum(F.col("q") * F.col("q")).alias("sq2"),
            F.sum("c").alias("scd"),
            F.sum(F.col("c") * F.col("c")).alias("sc2d"),
            F.sum(F.col("c") * F.col("q")).alias("sqcd"),
        )
    )
    nd = F.col("nl").cast("decimal(38,0)")
    sqd = F.col("sq").cast("decimal(38,0)")
    sq2d = F.col("sq2").cast("decimal(38,0)")
    m = s.select(
        "l_returnflag",
        "nl",
        "sq",
        "scd",
        F.col("nl").cast("double").alias("n"),
        F.col("sq").cast("double").alias("sqf"),
        F.col("scd").cast("double").alias("scf"),
        (nd * F.col("sqcd") - sqd * F.col("scd")).cast("double").alias("dxy"),
        (nd * sq2d - sqd * sqd).cast("double").alias("dxx"),
        (nd * F.col("sc2d") - F.col("scd") * F.col("scd"))
        .cast("double")
        .alias("dyy"),
        (F.col("scd") * 100).cast("decimal(38,0)").alias("sc100"),
    )
    n = F.col("n")
    dxy, dxx, dyy = F.col("dxy"), F.col("dxx"), F.col("dyy")
    slope = dxy / dxx / 100.0
    avg_q4 = F.expr("(2 * sq * 10000 + nl) div (2 * nl)")
    avg_p4 = F.expr("(2 * sc100 + nl) div (2 * nl)")
    # r19 degenerate guards (ANSI division-by-zero class): a 1-row
    # group zeroes dxx/dyy AND n-1; a constant-quantity group zeroes
    # dxx alone; a constant-price group zeroes dyy — each previously
    # RAISED where the DuckDB oracle NULLs on x/0. Conditions carry no
    # divisions, so they are safe to evaluate unconditionally.
    gx = dxx > 0
    gxy = (dxx > 0) & (dyy > 0)
    return m.select(
        "l_returnflag",
        F.col("nl").alias("n_pairs"),
        (avg_q4.cast("double") / F.lit(10000.0)).alias("avg_qty"),
        (avg_p4.cast("double") / F.lit(10000.0)).alias("avg_price"),
        # r20 rounding-tie class (found by the salted fuzzer on the
        # sibling moments family): quantities derived as ratios of
        # EXACT integers (dxy/200 for a 2-row covar_s, dxy/dxx/100 for
        # slope) land on (d+1)-decimal midpoints, where Spark's round
        # (half-up on the double's SHORTEST decimal repr) and DuckDB's
        # (on the true binary value, usually a hair below) flip
        # opposite ways. 6dp publishes every such small-denominator
        # rational EXACTLY (the absorption discipline's grid), leaving
        # only astronomically-unlikely irrational near-boundary cases.
        F.when(gx, F.round(slope, 6)).alias("slope"),
        F.when(
            gx,
            F.round(
                F.col("scf") / 100.0 / n
                - (dxy / dxx / 100.0) * (F.col("sqf") / n),
                6,
            ),
        ).alias("intercept"),
        F.when(gxy, F.round((dxy * dxy) / (dxx * dyy), 6)).alias("r2"),
        F.when(gxy, F.round(dxy / F.sqrt(dxx * dyy), 6)).alias("pearson_r"),
        F.when(n >= 2, F.round(dxy / (n * (n - 1)) / 100.0, 6)).alias(
            "covar_s"
        ),
        F.round(dxy / (n * n) / 100.0, 6).alias("covar_p"),
    ).orderBy("l_returnflag")


def higher_moment_family(lineitem: DataFrame) -> DataFrame:
    """Third/fourth standardized moments — skewness and kurtosis, both
    population (g1, excess g2) and sample-corrected (G1, G2) — of
    extended price per return flag (the tail-shape screen of a numeric
    DQ profile; reference analog: the Trino aggregate surface's
    skewness/kurtosis). Engines DISAGREE on which convention the bare
    function returns (Spark ``skewness`` is population g1, DuckDB's is
    sample G1), so the family is computed from EXPLICIT raw power sums
    (n, Σx..Σx⁴) with the textbook conversions — byte-identical
    arithmetic on both sides, every convention surfaced by name.

    Scale shape: one grouped aggregate over four power sums — partial
    aggregation map-side, one row per group on the wire, the same cost
    as a sum. Cancellation note: central-from-raw moments lose digits
    when mean/σ is large; here mean/σ ≈ 1.6 and doubles carry 15-16
    digits.

    Determinism (the r10 class fix — this query shared dq_ab_ttest's
    raw-double-power-sum hazard and was green only by accumulation-
    order luck): the power sums run over EXACT integer cents —
    DECIMAL(18,6) cast (2dp data, lossless) × 100 → DECIMAL(38,0),
    powered and summed in DECIMAL(38,0) (DuckDB mirrors with HUGEINT).
    Σc⁴ needs ~29 digits per row-term and ~37 at sf100 lineitem
    (1.05e7⁴ · 6e8 rows ≈ 7e36 < 1e38) — exact through sf100; beyond
    that, shard the sum or coarsen the grid. The exact sums cast to
    double identically on both engines, and every derived moment is
    the same IEEE expression tree — deterministic regardless of
    partition count or scan order. g1/g2 are scale-invariant, so the
    cents domain changes nothing; mean/stddev are rescaled by 100 at
    the end, the 2dp mean via exact (2S+n) div 2n integer cents
    (half-up; prices positive) so no round-half divergence exists."""
    c = (F.col("l_extendedprice").cast("decimal(18,6)") * 100).cast("decimal(38,0)")
    pow_sums = (
        lineitem.select("l_returnflag", c.alias("c"), (c * c).alias("c2"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("nl"),
            F.sum("c").alias("s1d"),
            F.sum("c2").alias("s2d"),
            F.sum(F.col("c2") * F.col("c")).alias("s3d"),
            F.sum(F.col("c2") * F.col("c2")).alias("s4d"),
        )
    )
    n = F.col("nl").cast("double")
    s1, s2, s3, s4 = (
        F.col(c_).cast("double") for c_ in ("s1d", "s2d", "s3d", "s4d")
    )
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - 3 * mean * s2 / n + 2 * mean * mean * mean
    m4 = (
        s4 / n
        - 4 * mean * s3 / n
        + 6 * mean * mean * s2 / n
        - 3 * mean * mean * mean * mean
    )
    g1 = m3 / F.pow(m2, 1.5)
    g2 = m4 / (m2 * m2) - 3
    big_g1 = g1 * F.sqrt(n * (n - 1)) / (n - 2)
    big_g2 = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
    mean_c = F.expr("(2 * s1d + nl) div (2 * nl)")
    # r19 degenerate guards (ANSI division-by-zero class): a constant
    # group makes m2 exactly 0 (or, float-cancelled, a hair negative)
    # and tiny groups zero n-2 / n-3 — standardized moments RAISED /
    # NaN'd there. m2 is the identical double on both engines, so the
    # CASE branches agree; the oracle carries the same guards.
    gm = m2 > 0
    return pow_sums.select(
        "l_returnflag",
        F.col("nl").alias("n_rows"),
        (mean_c.cast("double") / F.lit(100.0)).alias("mean_price"),
        # r20 rounding-tie fix (the salted fuzzer's find): a 2-row
        # group's stddev is |a-b|/200 exactly — a 3-decimal rational
        # ending in 5 whenever |a-b| has an odd hundredths digit, i.e.
        # a COMMON 2dp midpoint where Spark's repr-based round and
        # DuckDB's binary-based round flip opposite ways. 6dp is exact
        # on that grid (absorption discipline).
        F.when(m2 >= 0, F.round(F.sqrt(m2) / 100.0, 6)).alias("stddev_pop"),
        F.when(gm, F.round(g1, 4)).alias("skew_pop"),
        F.when(gm & (n > 2), F.round(big_g1, 4)).alias("skew_samp"),
        F.when(gm, F.round(g2, 4)).alias("kurt_excess_pop"),
        F.when(gm & (n > 3), F.round(big_g2, 4)).alias("kurt_excess_samp"),
    ).orderBy("l_returnflag")


def weighted_median_family(lineitem: DataFrame) -> DataFrame:
    """Weighted median and weighted quartiles of unit-extended price
    with QUANTITY as the weight, per line status — "the price level at
    which half the VOLUME (not half the line items) trades", the
    inventory-weighted robust center every mixture/sampling policy
    needs when rows carry unequal mass (a training-data twin: token
    counts weighting per-document quality thresholds).

    Lower weighted-percentile definition: the smallest value whose
    cumulative weight reaches q·W — exact, order-based, no
    interpolation (the definition that is identical and
    tie-deterministic in both engines). Scale shape: collapse to VALUE
    grain first (groupBy value: map-side combine kills duplicate-value
    skew), ONE value-ordered cumulative window per status partition,
    then a plain conditional-min aggregate; the window partitions are
    value-distinct rows per status — bounded by value cardinality, not
    row count."""
    wv = lineitem.groupBy("l_linestatus", "l_extendedprice").agg(
        F.sum("l_quantity").alias("w")
    )
    win = (
        W.partitionBy("l_linestatus")
        .orderBy("l_extendedprice")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tot = W.partitionBy("l_linestatus")
    cum = wv.select(
        "l_linestatus",
        "l_extendedprice",
        "w",
        F.sum("w").over(win).alias("cw"),
        F.sum("w").over(tot).alias("tw"),
    )
    pick = lambda q: F.min(
        F.when(F.col("cw") >= q * F.col("tw"), F.col("l_extendedprice"))
    )
    return (
        cum.groupBy("l_linestatus")
        .agg(
            F.round(F.min("tw"), 1).alias("total_weight"),
            F.round(pick(0.25), 2).alias("w_p25"),
            F.round(pick(0.5), 2).alias("w_median"),
            F.round(pick(0.75), 2).alias("w_p75"),
        )
        .orderBy("l_linestatus")
    )


def multigrain_time_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style continuous-aggregate hierarchy in ONE scan:
    hour → day → event-type → grand-total rollup of event counts and
    value sums (the TimescaleDB/Druid multi-grain rollup pattern,
    expressed as ANSI ROLLUP so the hierarchy is one grouping-sets
    aggregate instead of four stacked jobs). Each row is labeled with
    its grain so downstream dashboards index one relation at serving
    time.

    Scale shape: Catalyst expands ROLLUP into one Expand + one grouped
    aggregate — partial aggregation applies at every grain map-side;
    the shuffle carries (4 × groups) pre-combined rows, and the
    day/hour buckets keep group cardinality calendar-bounded. No
    window, no self-union, no re-scan per grain."""
    day = F.date_trunc("day", F.col("ts"))
    hour = F.date_trunc("hour", F.col("ts"))
    agg = (
        events.select(F.col("event_type").alias("etype"), day.alias("day"), hour.alias("hour"), "value")
        .rollup("etype", "day", "hour")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            # GROUPING(), not column NULL-ness: a genuine NULL data value
            # at the finest grouping set must not masquerade as a
            # subtotal row (nor a literal 'ALL' event_type collide with
            # the coalesced total label)
            F.grouping("etype").alias("g_etype"),
            F.grouping("day").alias("g_day"),
            F.grouping("hour").alias("g_hour"),
        )
    )
    grain = (
        F.when(F.col("g_hour") == 0, "hour")
        .when(F.col("g_day") == 0, "day")
        .when(F.col("g_etype") == 0, "type")
        .otherwise("total")
    )
    return agg.select(
        F.when(F.col("g_etype") == 1, "ALL").otherwise(F.col("etype")).alias("event_type"),
        "day",
        "hour",
        grain.alias("grain"),
        "n_events",
        "sum_value",
    )


def gini_spend_concentration(orders: DataFrame) -> DataFrame:
    """Gini coefficient of customer spend per order priority — the
    inequality screen (Gini 1912; the sorted-cumulative formula
    G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending xᵢ): is revenue
    spread across customers or concentrated in a whale tail? The
    training-data twin is token-mass concentration across sources —
    same operator, different columns.

    Scale shape: customer-grain pre-aggregation first (map-side
    combine), then ONE ranked window per priority group to attach i
    (deterministic tie order: spend, then custkey), and a final grouped
    sum — group partitions are customer-bounded. The rank-weighted sum
    with ties broken by key is still exactly Gini because Σ i·xᵢ over
    equal xᵢ is permutation-invariant."""
    spend = orders.groupBy("o_orderpriority", "o_custkey").agg(
        F.sum("o_totalprice").alias("x")
    )
    w = W.partitionBy("o_orderpriority").orderBy("x", "o_custkey")
    ranked = spend.select(
        "o_orderpriority", "x", F.row_number().over(w).alias("i")
    )
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.round(F.sum("x"), 2).alias("total_spend"),
            F.round(
                2 * F.sum(F.col("i") * F.col("x")) / (F.count("*") * F.sum("x"))
                - (F.count("*") + 1) / F.count("*"),
                6,
            ).alias("gini"),
        )
        .orderBy("o_orderpriority")
    )


def mode_family(lineitem: DataFrame) -> DataFrame:
    """Deterministic MODE — the aggregate ``argmax_aggregates``
    deliberately excluded because both engines' bare ``mode()`` is
    tie-nondeterministic: most frequent quantity per return flag with
    an explicit LOWEST-VALUE tie-break, spelled as value-grain counts →
    one ranked window → rn=1 (the idiom works identically in both
    engines, so the oracle is exact where mode() could legally differ).

    Scale shape: the value-grain pre-aggregate is map-side combined and
    bounds the window input at value cardinality per group (the
    weighted-median discipline); the window partitions are
    group-bounded. One extra column reports how contested the mode is
    (share of rows holding the modal value)."""
    counts = lineitem.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("n")
    )
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity").asc()
    )
    totals = W.partitionBy("l_returnflag")
    return (
        counts.select(
            "l_returnflag",
            "l_quantity",
            "n",
            F.row_number().over(w).alias("rn"),
            F.sum("n").over(totals).alias("total"),
            F.count("*").over(totals).alias("n_distinct"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("n").cast("long").alias("mode_n"),
            F.col("n_distinct").cast("long").alias("n_distinct_qty"),
            F.round(F.col("n") / F.col("total"), 6).alias("mode_share"),
        )
        .orderBy("l_returnflag")
    )
