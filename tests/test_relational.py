"""Plan-quality + semantics tests for the relational operator library.

Value correctness is covered by the DuckDB oracle harness
(tools/check_oracle.py / the driver's t2); these tests assert the things
the oracle can't see: physical-plan properties (broadcast, pushdown) and
operator invariants.
"""

from pyspark.sql import functions as F

from datalake_local_spark.operators import aggregates as agg
from datalake_local_spark.operators import flagship, joins, quality, setops, tpch, windows
from datalake_local_spark.session import load_tables

from tests.conftest import SF_DIR


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_broadcasts_bounded_dims(tables):
    df = flagship.revenue_by_month_region(
        tables["lineitem"], tables["orders"], tables["customer"], tables["nation"], tables["region"]
    )
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan, "nation/region should be broadcast"


def test_filter_pushdown_reaches_parquet(tables):
    df = tables["lineitem"].filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = _physical_plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)" in plan

def test_column_pruning_reaches_parquet(tables):
    df = tables["lineitem"].select("l_orderkey", "l_quantity")
    plan = _physical_plan(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_semi_plus_anti_partition_customers(tables):
    """Semi and anti partition the customer table when run against the
    SAME right side — the anti-join is date-windowed, so give the semi
    join the same windowed orders slice; and the anti side must be
    non-empty (the vacuous-certification lesson)."""
    recent = tables["orders"].filter(F.col("o_orderdate") >= "2000-01-01")
    semi = joins.semi_join_customers_with_orders(tables["customer"], recent).count()
    anti = joins.anti_join_customers_without_orders(tables["customer"], tables["orders"]).count()
    assert anti > 0
    assert semi + anti == tables["customer"].count()


def test_rollup_total_row_matches_count(tables):
    out = agg.rollup_returnflag_linestatus(tables["lineitem"])
    total = out.filter((F.col("returnflag") == "ALL") & (F.col("linestatus") == "ALL")).collect()
    assert total[0]["n_rows"] == tables["lineitem"].count()


def test_topk_per_group_bounded(tables):
    out = windows.top_k_orders_per_customer(tables["orders"], k=3)
    worst = out.groupBy("o_custkey").count().agg(F.max("count")).collect()[0][0]
    assert worst <= 3


def test_intersect_except_disjoint(tables):
    both = setops.customers_active_both_years(tables["orders"])
    only_first = setops.customers_active_only_first_year(tables["orders"])
    assert both.intersect(only_first).count() == 0


def test_bucketized_range_join_avoids_nested_loop(tables):
    """The whole point of the bucketized range join: the physical plan
    must be hash-based (broadcast/sort-merge/shuffled-hash), never a
    BroadcastNestedLoopJoin, because the range predicate rides on an
    equi-join prefix."""
    from datalake_local_spark.operators.asof import range_join_bucketized

    plan = _physical_plan(range_join_bucketized(tables["events"]))
    assert "NestedLoop" not in plan
    assert any(j in plan for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"))


def test_funnel_reduces_before_join(tables):
    """Funnel conversion must aggregate events to user grain before the
    stage join — the plan should show partial aggregation below the join."""
    from datalake_local_spark.operators.funnel import funnel_click_to_purchase

    out = funnel_click_to_purchase(tables["events"]).collect()
    assert len(out) == 1
    row = out[0]
    assert 0 <= row["n_converted"] <= row["n_clicked"]
    assert row["conversion_rate"] is None or 0.0 <= row["conversion_rate"] <= 1.0


def test_top_orders_sorted_desc(tables):
    rows = setops.top_orders_global(tables["orders"], n=10).collect()
    prices = [r["totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)
    assert len(rows) == 10


def test_forecast_revenue_pushes_every_predicate(tables):
    """Q6 is a pure pushdown scan: shipdate/discount/quantity must all
    reach the parquet source, and only the two payload columns are read."""
    from datalake_local_spark.operators import tpch

    plan = _physical_plan(tpch.forecast_revenue(tables["lineitem"]))
    assert "PushedFilters" in plan
    for col in ("l_discount", "l_quantity"):
        assert col in plan.split("PushedFilters")[1].split("]")[0], col


def test_no_broadcast_hint_on_sf_scaled_relations(tables):
    """part/lineitem/orders grow with SF: a hard broadcast hint on them is
    an OOM at scale. The three Q14/Q17/Q19 shapes must carry NO explicit
    hint — join strategy is AQE's call (it still broadcasts at tiny SF,
    which is fine; the hint in the logical plan is what's forbidden)."""
    from datalake_local_spark.operators import tpch

    dfs = [
        tpch.promo_revenue(tables["lineitem"], tables["part"]),
        tpch.small_quantity_revenue(tables["lineitem"], tables["part"]),
        tpch.disjunctive_revenue(tables["lineitem"], tables["part"]),
    ]
    for df in dfs:
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed, analyzed[:500]


def test_volume_shipping_broadcasts_both_nation_aliases(tables):
    from datalake_local_spark.operators import tpch

    plan = _physical_plan(
        tpch.volume_shipping(
            tables["lineitem"], tables["orders"], tables["customer"],
            tables["supplier"], tables["nation"],
        )
    )
    assert plan.count("BroadcastHashJoin") >= 2


def test_large_orders_aggregates_before_join(tables):
    """The HAVING reduction must sit below the orders join in the plan:
    the first join input is the aggregated order-grain side, not raw
    lineitem rows."""
    from datalake_local_spark.operators import tpch

    plan = _physical_plan(
        tpch.large_orders(tables["lineitem"], tables["orders"], tables["customer"])
    )
    first_join = min(
        [i for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
         if (i := plan.find(j)) >= 0] or [len(plan)]
    )
    assert "HashAggregate" in plan[first_join:], "aggregate must feed the join"


def test_approx_percentiles_within_sketch_error(tables):
    from datalake_local_spark.operators import tpch

    exact = {r["o_orderpriority"]: r for r in tpch.exact_percentiles(tables["orders"]).collect()}
    approx = {r["o_orderpriority"]: r for r in tpch.approx_percentiles(tables["orders"]).collect()}
    assert set(exact) == set(approx)
    for k in exact:
        for col in ("median_price", "p90_price"):
            # GK guarantees a rank error <= n/accuracy; translate to a
            # loose value tolerance on this distribution
            assert abs(exact[k][col] - approx[k][col]) / exact[k][col] < 0.05


def test_salting_balances_skewed_shuffle(spark):
    """Deliberate skew: 95% of rows share one key. Shuffling on the bare
    key sends them all to ONE reduce partition (the straggler that kills
    a 1000-executor job); shuffling on (key, salt) bounds every
    partition near the mean. salted_two_phase_agg's phase 1 rides the
    balanced layout; its result equals the naive agg (oracle-checked as
    events_salted_agg)."""
    from datalake_local_spark.operators import merge

    n, n_parts = 40_000, 8
    skewed = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 20 != 0, F.lit("hot")).otherwise(
                F.concat(F.lit("cold_"), (F.col("id") % 97).cast("string"))
            ).alias("event_type"),
            F.col("id").alias("event_id"),
            (F.col("id") % 100 / 10.0).alias("value"),
        )
    )

    def max_partition_rows(df, *cols):
        counts = (
            df.repartition(n_parts, *[F.col(c) for c in cols])
            .select(F.spark_partition_id().alias("pid"))
            .groupBy("pid")
            .count()
            .collect()
        )
        return max(r["count"] for r in counts)

    # salt granularity must exceed reducer count by enough that hashing
    # (key, salt) groups into partitions balances — 64 salts over 8 parts
    salted = skewed.withColumn("salt", F.col("event_id") % 64)
    naive_max = max_partition_rows(skewed, "event_type")
    salted_max = max_partition_rows(salted, "event_type", "salt")
    assert naive_max >= 0.95 * n, "hot key must concentrate in one partition"
    assert salted_max <= 2 * n / n_parts, "salted layout must be near-balanced"

    agg_rows = {
        r["event_type"]: (r["n_events"], r["sum_value"])
        for r in merge.salted_two_phase_agg(skewed).collect()
    }
    direct = {
        r["event_type"]: (r["n"], r["v"])
        for r in skewed.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .collect()
    }
    assert agg_rows == direct


def test_sequence_patterns_invariants(tables):
    from datalake_local_spark.operators import funnel

    rows = funnel.sequence_pattern_counts(tables["events"]).collect()
    total = sum(r["n_events"] for r in rows)
    assert total == tables["events"].count()
    for r in rows:
        assert 0 <= r["first_click_streak"] <= r["n_events"]


def test_mad_outliers_invariants(tables):
    out = agg.mad_outliers(tables["events"]).collect()
    assert sum(r["n_events"] for r in out) == tables["events"].count()
    for r in out:
        assert r["mad"] >= 0 and 0 <= r["n_outliers"] <= r["n_events"]


def test_integrity_report_catches_planted_violations(spark, tables):
    from datalake_local_spark.operators import quality

    clean = {r["rule"]: r for r in quality.integrity_report(
        tables["orders"], tables["customer"]).collect()}
    assert all(r["passed"] for r in clean.values())

    bad = spark.createDataFrame(
        [
            (None, 1, "F", 10.0),          # null orderkey
            (1, 1, "F", 10.0), (1, 1, "F", 10.0),  # duplicate key
            (2, 99_999_999, "O", 5.0),     # orphan custkey
            (3, 1, "X", -4.0),             # bad status AND nonpositive price
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    )
    rep = {r["rule"]: r["n_violations"] for r in quality.integrity_report(
        bad, tables["customer"]).collect()}
    assert rep["null_orderkey"] == 1
    assert rep["duplicate_orderkeys"] == 1
    assert rep["orphan_custkeys"] == 1
    assert rep["bad_status"] == 1 and rep["nonpositive_price"] == 1


def test_hll_sketch_rollup_error_bound(tables):
    """Mergeable-HLL guarantees: each per-type estimate and the
    union-merged global estimate land within 5% of the exact distinct
    counts (lgConfigK=12 ⇒ ~1.6% standard error), and the global row
    merges SKETCHES, never re-reads rows."""
    from datalake_local_spark.operators import aggregates as agg
    from pyspark.sql import functions as F

    events = tables["events"]
    got = {r["event_type"]: r["distinct_users"] for r in agg.hll_sketch_rollup(events).collect()}
    exact_per = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact_all = events.select("user_id").distinct().count()
    for t, n in exact_per.items():
        assert abs(got[t] - n) / n < 0.05, (t, got[t], n)
    assert abs(got["ALL"] - exact_all) / exact_all < 0.05


def test_rfm_segments_plan_has_no_window(tables):
    """Scale shape: RFM buckets come from percentile scalar thresholds,
    never a global ntile() window (which would single-partition the
    customer table); and the result partitions sum to the customer
    count."""
    from datalake_local_spark.operators import tpch
    from pyspark.sql import functions as F

    df = tpch.rfm_segments(tables["orders"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    total = df.agg(F.sum("n_customers")).first()[0]
    assert total == tables["orders"].select("o_custkey").distinct().count()


def test_load_tables_memo_hit_reasserts_conf_and_sweeps(spark):
    """Memo hits must re-apply configure() (conf drift between calls is
    re-asserted) and the memo must hold its owner weakly enough that a
    foreign-session entry is replaced, not served."""
    from datalake_local_spark import session as sess

    t1 = sess.load_tables(spark, "/root/testdata/sf0.001")
    # drift a conf configure() owns, then hit the memo: must be restored
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    t2 = sess.load_tables(spark, "/root/testdata/sf0.001")
    assert t2 is t1
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    # entries are weakly keyed on the owning session object
    key = __import__("os").path.abspath("/root/testdata/sf0.001")
    with sess._TABLES_MEMO_LOCK:
        ref, _ = sess._TABLES_MEMO[key]
    assert ref() is spark


def test_batch_drift_report_ground_truth(spark):
    """Hand-computed drift on a planted corpus: batch doubles mean chars,
    drops a language, adds a new one, introduces nulls."""
    from datalake_local_spark.operators import quality

    rows = []
    for i in range(10):  # old: lang en, 4 tokens, 20 chars
        rows.append((i, "a b c d", "en", 20))
    for i in range(10, 14):  # old: lang fr
        rows.append((i, "e f", "fr", 20))
    for i in range(250, 258):  # new: en only, 40 chars, one null text
        rows.append((i, None if i == 257 else "w x y z", "en", 40))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    out = {r["metric"]: r for r in quality.batch_drift_report(docs).collect()}
    assert out["row_count"]["old_value"] == 14.0 and out["row_count"]["new_value"] == 8.0
    assert out["null_text_rate"]["new_value"] == 0.125
    assert out["mean_n_chars"]["old_value"] == 20.0 and out["mean_n_chars"]["new_value"] == 40.0
    assert out["mean_n_chars"]["delta"] == 20.0
    # tokens: old = (10*4 + 4*2)/14; new = (7*4 + 0)/8  (null -> 0 tokens)
    assert out["mean_n_tokens"]["old_value"] == round(48 / 14, 6)
    assert out["mean_n_tokens"]["new_value"] == round(28 / 8, 6)
    lang = out["lang_l1_distance"]
    assert lang["old_value"] == 2.0 and lang["new_value"] == 1.0  # fr dropped
    # L1 = |10/14 - 8/8| + |4/14 - 0|
    assert lang["delta"] == round(abs(10 / 14 - 1.0) + 4 / 14, 6)


def test_interpolate_hourly_ground_truth(spark):
    """Planted series: observed hours keep their exact average, interior
    gaps interpolate linearly (exact fixed-point), edge gaps stay NULL,
    and the grid spans exactly [first, last] observed hour."""
    from datetime import datetime

    from datalake_local_spark.operators import windows as win

    rows = [
        (1, datetime(2024, 1, 1, 0, 30), 1, "A", 10.0),
        (2, datetime(2024, 1, 1, 0, 45), 1, "A", 20.0),  # hour 0 avg 15.0
        (3, datetime(2024, 1, 1, 4, 10), 1, "A", 35.0),  # hours 1-3 gap
        (4, datetime(2024, 1, 1, 2, 0), 1, "B", 7.0),    # single point
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {(r["series"], r["hour"].hour): r for r in win.interpolate_hourly(ev).collect()}
    a = [out[("A", h)] for h in range(5)]
    assert [r["observed"] for r in a] == [True, False, False, False, True]
    assert [r["value"] for r in a] == [15.0, 20.0, 25.0, 30.0, 35.0]
    assert len([k for k in out if k[0] == "B"]) == 1
    assert out[("B", 2)]["value"] == 7.0 and out[("B", 2)]["observed"]


def test_key_skew_profile_ground_truth(spark):
    """Planted 10-row/3-key distribution: hand-computed shares, skew
    ratio and entropy; top-k rows ordered by count then key string."""
    import math

    from datalake_local_spark.operators import quality

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = quality.key_skew_profile(df, "k", k=2)
    m = {(r["metric"], r["key"]): r["value"] for r in out.collect()}
    assert m[("top_key_rows", "a")] == 6.0
    assert m[("top_key_rows", "b")] == 3.0
    assert ("top_key_rows", "c") not in m  # k=2 cuts the tail
    assert m[("top_key_share", "a")] == 0.6
    assert m[("n_keys", None)] == 3.0 and m[("n_rows", None)] == 10.0
    assert m[("max_share", None)] == 0.6
    assert m[("topk_share", None)] == 0.9
    assert m[("skew_ratio_max_avg", None)] == round(6 / (10 / 3), 6)
    want_entropy = -(0.6 * math.log(0.6) + 0.3 * math.log(0.3) + 0.1 * math.log(0.1))
    assert abs(m[("entropy_nats", None)] - want_entropy) < 1e-6


def test_lttb_downsample_shape_preservation(spark):
    """LTTB on a planted series: endpoints always kept, output size is
    exactly n_out, a huge interior spike survives (the property uniform
    striding lacks), short series pass through, reruns identical."""
    import datetime

    from datalake_local_spark.operators import windows as ops_windows

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(500):
        v = 10.0 + (i % 7) * 0.1
        if i == 333:
            v = 999.0  # spike that must survive
        rows.append((i, base + datetime.timedelta(minutes=i), 1, "a", v, "{}"))
    for i in range(20):  # short series: pass-through
        rows.append((1000 + i, base + datetime.timedelta(minutes=i), 1, "b", float(i), "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = ops_windows.lttb_downsample(df, n_out=50).collect()
    a = sorted([r for r in out if r["event_type"] == "a"], key=lambda r: r["ts"])
    b = sorted([r for r in out if r["event_type"] == "b"], key=lambda r: r["ts"])
    assert len(a) == 50 and len(b) == 20
    assert a[0]["point_index"] == 0 and a[-1]["point_index"] == 499
    assert any(r["value"] == 999.0 for r in a), "spike must survive LTTB"
    assert [r["point_index"] for r in b] == list(range(20))
    again = ops_windows.lttb_downsample(df, n_out=50).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_join_cardinality_estimate_is_exact(spark, tables):
    """The 'estimate' is exact on equi-keys: join_rows equals the real
    join's count; top-key contributions are cl*cr; shares sum <= 1."""
    from datalake_local_spark.operators import quality

    events, orders = tables["events"], tables["orders"]
    out = quality.join_cardinality_estimate(events, orders, "user_id", "o_custkey")
    m = {(r["metric"], r["key"]): r["value"] for r in out.collect()}
    real = events.join(orders, F.col("user_id") == F.col("o_custkey")).count()
    assert m[("join_rows", None)] == float(real)
    assert m[("left_rows", None)] == float(events.count())
    assert m[("right_rows", None)] == float(orders.count())
    shares = [v for (met, k), v in m.items() if met == "top_key_share"]
    assert 0 < sum(shares) <= 1.0 + 1e-9
    for (met, k), v in m.items():
        if met == "top_key_rows":
            cl = events.filter(F.col("user_id").cast("string") == k).count()
            cr = orders.filter(F.col("o_custkey").cast("string") == k).count()
            assert v == float(cl * cr)


def test_arrow_byte_profile_matches_expressions(spark, tables):
    """mapInArrow kernel vs Catalyst expressions: byte/char counts and
    the ASCII flag agree row-for-row (zero-copy path returns identical
    data)."""
    from datalake_local_spark.operators import grouped_pandas

    docs = tables["documents"]
    got = {r["doc_id"]: r for r in grouped_pandas.arrow_byte_profile(docs).collect()}
    ref = docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.length("text").cast("long").alias("n_chars"),
    ).collect()
    for r in ref:
        g = got[r["doc_id"]]
        assert (g["n_bytes"], g["n_chars"]) == (r["n_bytes"], r["n_chars"])
        assert g["is_ascii"] == (r["n_bytes"] == r["n_chars"])


def test_cusum_detects_planted_level_shift(spark):
    """A series with a +8-sigma level shift at hour 60 alarms shortly
    after the shift (direction 'up'); a stationary series never alarms;
    reruns identical."""
    import datetime

    from datalake_local_spark.operators import windows as ops_windows

    base = datetime.datetime(2024, 3, 1)
    rows = []
    for i in range(120):
        v = 10.0 + (i % 5) * 0.01  # tiny periodic wiggle
        if i >= 60:
            v += 1.0  # large vs the tiny sd
        rows.append((i, base + datetime.timedelta(hours=i), 1, "shifted", v, "{}"))
    for i in range(120):
        rows.append((1000 + i, base + datetime.timedelta(hours=i), 1, "flat",
                     5.0 + (i % 5) * 0.01, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = ops_windows.cusum_changepoints(df).collect()
    shifted = [r for r in out if r["event_type"] == "shifted"]
    flat = [r for r in out if r["event_type"] == "flat"]
    assert not flat
    assert shifted, "level shift must alarm"
    first = min(shifted, key=lambda r: r["hour"])
    assert first["direction"] == "up"
    assert base + datetime.timedelta(hours=60) <= first["hour"] <= base + datetime.timedelta(hours=75)
    again = ops_windows.cusum_changepoints(df).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_regression_family_closed_form(spark):
    """On a planted exact line y = 3x + 7 the full regr_* family is
    closed-form: slope 3, intercept 7, r2 = corr = 1, covariances equal
    slope x var(x); a noisy group keeps r2 strictly below 1."""
    rows = [("L", float(x), 3.0 * x + 7.0) for x in range(1, 21)]
    rows += [("N", float(x), 3.0 * x + 7.0 + (-1.0) ** x * 5) for x in range(1, 21)]
    df = spark.createDataFrame(rows, "l_returnflag string, l_quantity double, l_extendedprice double")
    out = {r["l_returnflag"]: r for r in agg.regression_family(df).collect()}
    lin = out["L"]
    assert lin["n_pairs"] == 20
    assert lin["slope"] == 3.0 and lin["intercept"] == 7.0
    assert lin["r2"] == 1.0 and lin["pearson_r"] == 1.0
    # covar_samp(y,x) = slope * var_samp(x); var_samp(1..20) = 35
    assert lin["covar_s"] == round(3.0 * 35.0, 2)
    noisy = out["N"]
    assert noisy["r2"] < 1.0 and noisy["n_pairs"] == 20


def test_benford_profile_contract(spark, tables):
    """Shares sum to 1, Benford expectations are the exact log10 curve,
    and a planted uniform-leading-digit feed shows the flat-histogram
    deviation signature (digit-1 share far below 0.301)."""
    from datalake_local_spark.operators import quality

    out = quality.benford_profile(tables["orders"]).collect()
    assert [r["digit"] for r in out] == sorted({r["digit"] for r in out})
    assert abs(sum(r["share"] for r in out) - 1.0) < 1e-5
    import math
    for r in out:
        assert r["benford_share"] == round(math.log10(1 + 1 / r["digit"]), 6)
        assert abs(r["deviation"] - (r["share"] - r["benford_share"])) < 1e-6

    flat = spark.createDataFrame(
        [(i, float(d) * 1000 + 1) for i in range(900) for d in range(1, 10) if i % 9 + 1 == d],
        "o_orderkey long, o_totalprice double",
    )
    fout = {r["digit"]: r for r in quality.benford_profile(flat).collect()}
    assert abs(fout[1]["share"] - 1 / 9) < 0.01
    assert fout[1]["deviation"] < -0.15  # uniform feed: digit-1 mass missing


def test_moving_median_hand_computed(spark):
    """Hand-checked rolling median/quartiles on one user: the frame is
    rows-based (last 11), warmup rows below 3 observations are trimmed,
    and the median of an even frame is the interpolated midpoint."""
    import datetime

    rows = [
        (1, i, datetime.datetime(2024, 1, 1, 0, i), float(v))
        for i, v in enumerate([10, 20, 30, 40, 100])
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    out = {r["event_id"]: r for r in windows.moving_median_user_spend(df).collect()}
    assert set(out) == {2, 3, 4}  # first two frames have < 3 rows
    assert out[2]["med_11"] == 20.0
    assert out[3]["med_11"] == 25.0  # even frame: (20+30)/2
    assert out[4]["med_11"] == 30.0
    assert out[4]["p75_11"] == 40.0 and out[4]["p25_11"] == 20.0


def test_activity_streaks_hand_computed(spark):
    """Planted calendar: user 1 has runs of 3 and 2 consecutive days,
    user 2 a single day — longest/total/streak counts are exact, and
    multiple same-day events collapse to one active day."""
    import datetime

    def ts(d, h=0):
        return datetime.datetime(2024, 3, d, h)

    rows = [
        (1, ts(1)), (1, ts(1, 5)), (1, ts(2)), (1, ts(3)),  # run of 3
        (1, ts(10)), (1, ts(11)),                            # run of 2
        (2, ts(7)),
    ]
    df = spark.createDataFrame(
        [(u, t, 0.0) for u, t in rows], "user_id long, ts timestamp, value double"
    )
    out = {r["user_id"]: r for r in windows.activity_streaks(df).collect()}
    assert out[1]["n_active_days"] == 5
    assert out[1]["longest_streak"] == 3
    assert out[1]["n_streaks"] == 2
    assert out[2]["n_active_days"] == 1 and out[2]["longest_streak"] == 1


def test_url_funcs_golden(spark):
    """Golden URL → parts: the synthesized order-page URL round-trips
    through the regexp family to exactly the components that built it,
    and canonicalization strips the utm tracking param (plus a dangling
    '?') while preserving real query params — the pre-dedup URL
    normalization contract."""
    from datalake_local_spark.operators.scalars import url_functions_orders

    orders = spark.createDataFrame(
        [(42, "1-URGENT", "O")],
        "o_orderkey long, o_orderpriority string, o_orderstatus string",
    )
    r = url_functions_orders(orders).collect()[0]
    assert r["url"] == (
        "https://shop.example.com/orders/42?priority=1&status=o&utm_source=mail"
    )
    assert r["scheme"] == "https"
    assert r["host"] == "shop.example.com"
    assert r["path"] == "/orders/42"
    assert r["q_priority"] == "1"
    assert r["q_status"] == "o"
    assert r["canonical_url"] == (
        "https://shop.example.com/orders/42?priority=1&status=o"
    )


def test_higher_moments_closed_form(spark):
    """Skewness/kurtosis vs scipy-free closed forms on a planted sample
    whose moments are hand-checkable: [1,2,3,4,10] — asymmetric, known
    g1/g2 computed with a pure-python reference at full precision."""
    vals = [1.0, 2.0, 3.0, 4.0, 10.0]
    rows = [("A", v) for v in vals]
    li = spark.createDataFrame(rows, "l_returnflag string, l_extendedprice double")
    r = agg.higher_moment_family(li).collect()[0]
    n = len(vals)
    mean = sum(vals) / n
    m2 = sum((v - mean) ** 2 for v in vals) / n
    m3 = sum((v - mean) ** 3 for v in vals) / n
    m4 = sum((v - mean) ** 4 for v in vals) / n
    g1 = m3 / m2**1.5
    g2 = m4 / m2**2 - 3
    G1 = g1 * (n * (n - 1)) ** 0.5 / (n - 2)
    G2 = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
    assert r["n_rows"] == n and abs(r["mean_price"] - round(mean, 2)) < 1e-9
    assert abs(r["skew_pop"] - round(g1, 4)) < 1e-9
    assert abs(r["skew_samp"] - round(G1, 4)) < 1e-9
    assert abs(r["kurt_excess_pop"] - round(g2, 4)) < 1e-9
    assert abs(r["kurt_excess_samp"] - round(G2, 4)) < 1e-9


def test_weighted_median_hand_computed(spark):
    """Lower weighted percentile on a hand-worked case: values 10,20,30
    with weights 1,1,6 → total 8; cumw(10)=1 < 2=0.25·8 ≤ cumw(20),
    median and p75 both land on 30 (its cum 8 ≥ 4 and ≥ 6); an
    unweighted-median engine would answer 20."""
    rows = [("O", 10.0, 1.0), ("O", 20.0, 1.0), ("O", 30.0, 6.0)]
    li = spark.createDataFrame(
        rows, "l_linestatus string, l_extendedprice double, l_quantity double"
    )
    r = agg.weighted_median_family(li).collect()[0]
    assert r["total_weight"] == 8.0
    assert r["w_p25"] == 20.0
    assert r["w_median"] == 30.0
    assert r["w_p75"] == 30.0


def test_rolling_zscore_flags_planted_spike(spark):
    """A flat per-user series with one 100σ-style spike: the spike (and
    only the spike) is flagged; it cannot mask itself (prior-only
    frame); the first rows never flag (cold-start min_prior guard);
    values after the spike are judged against a baseline that now
    CONTAINS the spike — and stay unflagged here."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(30):
        v = 1000.0 if i == 20 else 10.0 + (i % 3)  # mild wiggle, one spike
        rows.append((1, i, base + dt.timedelta(minutes=i), "buy", v))
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string, value double"
    )
    out = windows.rolling_zscore_anomalies(ev).collect()
    assert [r["event_id"] for r in out] == [20]
    assert out[0]["z"] > 100

    # constant heartbeat then a jump: var == 0 → z is NULL but the row
    # IS flagged (the review-pass hole: the var>0-only filter silently
    # dropped the most extreme anomaly class)
    hb = [(2, i, base + dt.timedelta(minutes=i), "ping", 10.0) for i in range(15)]
    hb.append((2, 15, base + dt.timedelta(minutes=15), "ping", 999.0))
    ev2 = spark.createDataFrame(
        hb, "user_id long, event_id long, ts timestamp, event_type string, value double"
    )
    out2 = windows.rolling_zscore_anomalies(ev2).collect()
    assert [r["event_id"] for r in out2] == [15]
    assert out2[0]["z"] is None and out2[0]["base_mean"] == 10.0


def test_multigrain_rollup_conservation(tables):
    """Grain hierarchy conservation: hour-grain counts sum to the
    day-grain sum, day to type, type to the grand total, and the grand
    total equals the events row count — one ROLLUP, four consistent
    grains."""
    out = agg.multigrain_time_rollup(tables["events"]).collect()
    by_grain = {}
    for r in out:
        by_grain.setdefault(r["grain"], []).append(r)
    n_events = tables["events"].count()
    assert sum(r["n_events"] for r in by_grain["hour"]) == n_events
    assert sum(r["n_events"] for r in by_grain["day"]) == n_events
    assert sum(r["n_events"] for r in by_grain["type"]) == n_events
    assert by_grain["total"][0]["n_events"] == n_events
    assert len(by_grain["total"]) == 1


def test_ip_funcs_golden(spark):
    """Golden IPv4 row: event_id=4710, user_id=266 → 6.10.202.232
    (4710%224=6, 266%256=10, 32970%256=202, 8168%256=232); octet
    parse, 32-bit int, /16 prefix, RFC-1918 flag (6.x is public), PTR
    octet reversal — plus a synthesized 10.x row flags private."""
    from datalake_local_spark.operators.scalars import ip_functions_events

    ev = spark.createDataFrame(
        [(4710, 266), (10 + 224, 0)],  # second row: o1 = 234%224 = 10
        "event_id long, user_id long",
    )
    rows = {r["event_id"]: r for r in ip_functions_events(ev).collect()}
    r = rows[4710]
    assert r["ip"] == "6.10.202.232"
    assert r["octet1"] == 6
    assert r["ip_int"] == 6 * 16777216 + 10 * 65536 + 202 * 256 + 232
    assert r["prefix16"] == "6.10"
    assert r["is_private"] is False
    assert r["ptr_octets"] == "232.202.10.6"
    assert rows[234]["is_private"] is True  # 10.0.x.x


def test_important_stock_cutoff_contract(spark, tables):
    """Q11 HAVING contract at fixture SF: non-vacuous result, every
    returned part strictly above the independently recomputed
    avg×1.2 cutoff, and no qualifying part missing (completeness)."""
    from datalake_local_spark.operators import tpch

    out = tpch.important_stock(
        tables["supplier"], tables["nation"], tables["part"]
    ).collect()
    assert out, "must be non-vacuous at sf0.001"
    sups = (
        tables["supplier"]
        .join(
            tables["nation"].filter(F.col("n_nationkey") % 5 == 2),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    ps = tables["part"].select("p_partkey").join(
        sups, (F.col("p_partkey") + F.col("s_suppkey")) % 4 == 0
    )
    per_part = (
        ps.select(
            "p_partkey",
            (
                (((F.col("p_partkey") * 31 + F.col("s_suppkey") * 17) % 10000) / 100)
                * ((F.col("p_partkey") * 7 + F.col("s_suppkey") * 3) % 1000 + 1)
            ).alias("value"),
        )
        .groupBy("p_partkey")
        .agg(F.round(F.sum("value"), 2).alias("part_value"))
        .collect()
    )
    cents = {k: round(v * 100) for k, v in (
        (r["p_partkey"], r["part_value"]) for r in per_part
    )}
    total_cents, n = sum(cents.values()), len(cents)
    got = {r["p_partkey"]: r["part_value"] for r in out}
    want = {
        k: round(c / 100.0, 2)
        for k, c in cents.items()
        if c * n * 10 > total_cents * 12  # exact integer rule, no fp boundary
    }
    assert got == want


def test_ab_welch_ttest_closed_form(spark):
    """Welch t/df vs a pure-python reference on planted two-group data
    (group A vs its complement B): exact formula agreement at the
    rounding grid, symmetric t (t_A = −t_B), equal df."""
    a = [10.0, 12.0, 11.0, 13.0, 9.0, 12.5]
    b = [20.0, 25.0, 22.0, 21.0]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    out = {r["event_type"]: r for r in __import__(
        "datalake_local_spark.operators.quality", fromlist=["quality"]
    ).ab_welch_ttest(ev).collect()}

    def welch(x, y):
        nx, ny = len(x), len(y)
        mx, my = sum(x) / nx, sum(y) / ny
        vx = sum((v - mx) ** 2 for v in x) / (nx - 1)
        vy = sum((v - my) ** 2 for v in y) / (ny - 1)
        se2 = vx / nx + vy / ny
        t = (mx - my) / se2**0.5
        df = se2**2 / ((vx / nx) ** 2 / (nx - 1) + (vy / ny) ** 2 / (ny - 1))
        return t, df

    t, df = welch(a, b)
    assert abs(out["A"]["t_stat"] - round(t, 4)) < 1e-9
    assert abs(out["A"]["welch_df"] - round(df, 4)) < 1e-9
    assert out["A"]["mean_group"] == round(sum(a) / len(a), 2)
    assert out["A"]["t_stat"] == -out["B"]["t_stat"]
    assert out["A"]["welch_df"] == out["B"]["welch_df"]
    assert out["A"]["nominal_sig"] is True  # clearly separated groups


def test_cumulative_users_contract(spark):
    """Hand-planted calendar: users first-seen on known days; running
    distinct equals the set-union count a naive expanding
    count(DISTINCT) window would compute, day rows with no new users
    carry the total forward."""
    import datetime as dt

    d = lambda day, h=0: dt.datetime(2024, 1, day, h)
    rows = [  # (user, ts): u1 day1; u2 day1; u1 again day2 (not new); u3 day3
        (1, d(1)), (2, d(1, 5)), (1, d(2)), (1, d(2, 3)), (3, d(3)),
        (2, d(4)),  # day4: activity but no new users
    ]
    ev = spark.createDataFrame(
        [(i, u, ts) for i, (u, ts) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp",
    )
    out = {r["day"].day: r for r in windows.cumulative_distinct_users(ev).collect()}
    assert [out[i]["new_users"] for i in (1, 2, 3, 4)] == [2, 0, 1, 0]
    assert [out[i]["cumulative_users"] for i in (1, 2, 3, 4)] == [2, 2, 3, 3]


def test_gini_known_distributions(spark):
    """Gini closed-form sanity: perfectly equal spend → 0; one customer
    holding everything (others ≈ 0 via a tiny epsilon-free construction
    of n=2: [0-ish impossible with sums, use extreme skew]) → the
    sorted-cumulative formula value computed by a pure-python
    reference."""
    eq = spark.createDataFrame(
        [("A", c, 100.0) for c in range(10)],
        "o_orderpriority string, o_custkey long, o_totalprice double",
    )
    r = agg.gini_spend_concentration(eq).collect()[0]
    assert r["gini"] == 0.0 and r["n_customers"] == 10

    vals = [1.0, 1.0, 1.0, 1.0, 96.0]  # heavy whale tail
    sk = spark.createDataFrame(
        [("A", i, v) for i, v in enumerate(vals)],
        "o_orderpriority string, o_custkey long, o_totalprice double",
    )
    xs = sorted(vals)
    n, s = len(xs), sum(xs)
    ref = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * s) - (n + 1) / n
    got = agg.gini_spend_concentration(sk).collect()[0]["gini"]
    assert abs(got - round(ref, 6)) < 1e-9
    assert got > 0.7  # concentrated


def test_dedup_rate_by_source_contract(spark):
    """Planted sources: one clean feed (rate 0), one feed with a
    triplicated doc — rate, unique count, and freed bytes all
    hand-checked (freed = duplicate copies' chars, keeping the min)."""
    rows = [
        (0, "clean one", "feedA", 9), (1, "clean two", "feedA", 9),
        (10, "dup text here", "feedB", 13), (11, "dup text here", "feedB", 13),
        (12, "dup text here", "feedB", 13), (13, "only self", "feedB", 9),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long") \
        .withColumnRenamed("lang", "source")
    from datalake_local_spark.llm import dedup as dd
    out = {r["source"]: r for r in dd.dedup_rate_by_source(docs).collect()}
    assert out["feedA"]["dup_rate"] == 0.0 and out["feedA"]["n_unique"] == 2
    b = out["feedB"]
    assert b["n_docs"] == 4 and b["n_unique"] == 2
    assert b["dup_rate"] == 0.5
    assert b["chars_freed_if_deduped"] == 26  # two extra 13-char copies


def test_peak_concurrency_sweep_semantics(spark):
    """Planted intervals: three 5-min presences starting 2 min apart all
    overlap at the third start (peak 3); an event starting exactly when
    the previous ends never counts as concurrent (end-before-start tie
    rule → peak 1)."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 10, m)
    ev = spark.createDataFrame(
        [
            (1, "x", t(0)), (2, "x", t(2)), (3, "x", t(4)),
            (4, "y", t(0)), (5, "y", t(5)),
        ],
        "event_id long, event_type string, ts timestamp",
    )
    out = {r["event_type"]: r for r in windows.peak_concurrency(ev).collect()}
    assert out["x"]["peak_concurrency"] == 3
    assert out["x"]["peak_at"] == t(4)
    assert out["y"]["peak_concurrency"] == 1


def test_shard_manifest_fingerprint_contract(tables, spark):
    """Manifest invariants: doc counts conserve; the xor fingerprint is
    ORDER-INDEPENDENT (a fully shuffled input produces the identical
    manifest); editing one doc's text changes exactly its own shard's
    fingerprint and nothing else."""
    from datalake_local_spark.llm import pipeline as pl

    docs = tables["documents"]
    m1 = {r["shard"]: r for r in pl.shard_manifest(docs).collect()}
    assert sum(r["n_docs"] for r in m1.values()) == docs.count()
    shuffled = docs.repartition(13)
    m2 = {r["shard"]: r for r in pl.shard_manifest(shuffled).collect()}
    assert {k: (v["n_docs"], v["content_fingerprint"]) for k, v in m1.items()} == {
        k: (v["n_docs"], v["content_fingerprint"]) for k, v in m2.items()
    }
    edited = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 0, F.lit("EDITED")).otherwise(F.col("text")),
    )
    m3 = {r["shard"]: r for r in pl.shard_manifest(edited).collect()}
    changed = [k for k in m1 if m1[k]["content_fingerprint"] != m3[k]["content_fingerprint"]]
    assert len(changed) == 1  # only doc 0's shard moved
    assert all(m1[k]["n_docs"] == m3[k]["n_docs"] for k in m1)


def test_part_promotion_excess_contract(tables):
    """Q20 contract: non-vacuous; every reported supplier's count equals
    the independently recomputed number of parts with derived availqty
    above half their 1995 shipments; no qualifying supplier missing."""
    from datalake_local_spark.operators import tpch

    out = {r["s_suppkey"]: r for r in tpch.part_promotion(
        tables["lineitem"], tables["supplier"], tables["nation"], tables["part"]
    ).collect()}
    assert out
    sups = [
        r["s_suppkey"]
        for r in tables["supplier"].filter(F.col("s_nationkey") % 5 == 2).collect()
    ]
    parts = [r["p_partkey"] for r in tables["part"].collect()]
    shipped = {
        (r["l_partkey"], r["l_suppkey"]): r["q"]
        for r in tables["lineitem"]
        .filter((F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .collect()
    }
    want = {}
    for s in sups:
        n = tot = 0
        for p in parts:
            if (p + s) % 4 == 0 and (p, s) in shipped:
                avail = (p * 7 + s * 3) % 1000 + 1
                if avail > 0.5 * shipped[(p, s)]:
                    n += 1
                    tot += avail
        if n:
            want[s] = (n, tot)
    assert {k: (v["n_excess_parts"], v["total_excess_avail"]) for k, v in out.items()} == want


def test_mode_family_tie_break(spark):
    """Deterministic mode contract: a two-way frequency tie resolves to
    the LOWEST value (where bare mode() may return either); counts,
    distinct-cardinality, and modal share are hand-checked."""
    rows = [("A", 5.0)] * 3 + [("A", 2.0)] * 3 + [("A", 9.0)] * 2
    li = spark.createDataFrame(rows, "l_returnflag string, l_quantity double")
    r = agg.mode_family(li).collect()[0]
    assert r["mode_qty"] == 2.0  # tie with 5.0 → lowest wins
    assert r["mode_n"] == 3 and r["n_distinct_qty"] == 3
    assert r["mode_share"] == round(3 / 8, 6)


def test_interarrival_hand_computed(spark):
    """Planted per-user gaps: user 1 events at 0s/10s/40s and user 2 at
    5s/5.5s — gaps are exact microsecond integers (10s, 30s, 0.5s);
    grouping is by the LATER event's type; p50 over {10s,30s} per type
    interpolates to 20s."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    mk = lambda s: t0 + dt.timedelta(seconds=s)
    ev = spark.createDataFrame(
        [
            (1, 1, mk(0), "x"), (2, 1, mk(10), "x"), (3, 1, mk(40), "x"),
            (4, 2, mk(5), "y"), (5, 2, mk(5.5), "y"),
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    out = {r["event_type"]: r for r in windows.interarrival_stats(ev).collect()}
    x = out["x"]
    assert x["n_gaps"] == 2 and x["sum_gap_us"] == 40_000_000
    assert x["min_gap_us"] == 10_000_000 and x["max_gap_us"] == 30_000_000
    assert x["p50_gap_s"] == 20.0
    y = out["y"]
    assert y["n_gaps"] == 1 and y["sum_gap_us"] == 500_000
    assert y["p50_gap_s"] == 0.5


def test_basket_affinity_hand_computed(spark):
    """Planted baskets: {A,B,C}, {A,B}, {A,B}, {C} → pair (A,B) appears
    in 3 of 4 orders, each part in 3 → lift = 3·4/(3·3) = 1.333333;
    (A,C)/(B,C) fall below min_pairs and are excluded."""
    rows = [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20), (3, 10), (3, 20), (4, 30)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = tpch.basket_affinity(li, min_pairs=2, top=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["part_a"], r["part_b"]) == (10, 20)
    assert r["n_together"] == 3 and r["cnt_a"] == 3 and r["cnt_b"] == 3
    assert r["support"] == 0.75
    assert r["lift"] == 1.333333


def test_chi_squared_independent_mix_scores_zero(spark):
    """A perfectly independent contingency (every type × quarter cell
    equal) must score chi2_stat == 0.0 exactly; skewing one cell makes
    it positive."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for typ in ("a", "b"):
        for hour in (0, 6, 12, 18):
            for _ in range(5):
                rows.append((eid, t0 + datetime.timedelta(hours=hour), 1, typ, 1.0, "{}"))
                eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = quality.chi_squared_screen(ev).collect()
    assert len(out) == 8
    assert all(r["chi2_stat"] == 0.0 and r["chi2_contrib"] == 0.0 for r in out)
    skewed = ev.union(
        spark.createDataFrame(
            [(999, t0, 1, "a", 1.0, "{}")] * 10,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )
    )
    out2 = quality.chi_squared_screen(skewed).collect()
    assert out2[0]["chi2_stat"] > 0.0


def test_completeness_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x"), (None, "y")],
        "a int, b string",
    )
    prof = {r["column_name"]: r for r in quality.completeness_profile(df).collect()}
    assert prof["a"]["n_rows"] == 4 and prof["a"]["n_filled"] == 3
    assert prof["a"]["n_distinct"] == 3 and prof["a"]["null_share"] == 0.25
    assert prof["b"]["n_filled"] == 3 and prof["b"]["n_distinct"] == 2


def test_seasonal_index_averages_to_one(tables):
    """The weighted mean of seasonal indices (weights = months observed)
    is exactly 1 by construction; every index is positive and the month
    panel is the full calendar."""
    out = tpch.seasonal_index(tables["orders"]).collect()
    assert [r["month_of_year"] for r in out] == list(range(1, 13))
    assert all(r["seasonal_index"] > 0 for r in out)
    # weighted mean of UNROUNDED index = 1; rounded values stay within
    # rounding tolerance of that identity
    n = sum(r["n_years"] for r in out)
    wmean = sum(r["seasonal_index"] * r["n_years"] for r in out) / n
    assert abs(wmean - 1.0) < 1e-4


def test_yoy_growth_hand_computed(spark):
    """Two Marches a year apart: $100.00 → $250.00 is 25000 bps in pure
    integer arithmetic; the first year has no predecessor and must not
    emit a row."""
    from datalake_local_spark.operators import tpch

    orders = spark.createDataFrame(
        [
            (1, "2023-03-05", 60.0), (2, "2023-03-20", 40.0),
            (3, "2024-03-01", 250.0),
            (4, "2024-07-01", 10.0),
        ],
        "o_orderkey long, o_orderdate string, o_totalprice double",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    rows = tpch.yoy_growth(orders).collect()
    assert len(rows) == 1
    r = rows[0]
    assert str(r["month"]) == "2024-03-01"
    assert (r["revenue_cents"], r["prev_year_cents"], r["growth_bps"]) == (
        25000, 10000, 25000,
    )


def test_pareto_abc_hand_computed(spark):
    """One brand, four parts with revenue 70/20/5/5 cents: the 70-cent
    part alone covers exactly 70% (boundary INCLUDES it in A), the next
    reaches 90% (B), the two 5-cent parts are C. Shares in bps are
    integer-exact; per-class part counts close the balance."""
    li = spark.createDataFrame(
        [(1, 0.70), (2, 0.20), (3, 0.05), (4, 0.05)],
        "l_partkey long, l_extendedprice double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#1"), (2, "Brand#1"), (3, "Brand#1"), (4, "Brand#1")],
        "p_partkey long, p_brand string",
    )
    rows = {r["abc_class"]: r for r in tpch.pareto_abc(li, part).collect()}
    assert set(rows) == {"A", "B", "C"}
    assert (rows["A"]["n_parts"], rows["A"]["class_cents"], rows["A"]["share_bps"]) == (1, 70, 7000)
    assert (rows["B"]["n_parts"], rows["B"]["class_cents"], rows["B"]["share_bps"]) == (1, 20, 2000)
    assert (rows["C"]["n_parts"], rows["C"]["class_cents"], rows["C"]["share_bps"]) == (2, 10, 1000)


def test_cohort_ltv_hand_computed(spark):
    """Customer 1 acquired Jan (orders Jan $10, Mar $30), customer 2
    acquired Jan (Jan $20), customer 3 acquired Mar ($5): the Jan
    cohort has size 2 with ages 0 (revenue 3000¢, both active) and 2
    (3000¢, one active, cum 6000¢ → LTV 3000¢/cust); the Mar cohort is
    a singleton at age 0."""
    orders = spark.createDataFrame(
        [
            (1, 1, "2024-01-05", 10.0),
            (2, 2, "2024-01-20", 20.0),
            (3, 1, "2024-03-01", 30.0),
            (4, 3, "2024-03-10", 5.0),
        ],
        "o_orderkey long, o_custkey long, o_orderdate string, o_totalprice double",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    rows = {(str(r["cohort_month"]), r["months_since"]): r
            for r in tpch.cohort_ltv(orders).collect()}
    assert set(rows) == {("2024-01-01", 0), ("2024-01-01", 2), ("2024-03-01", 0)}
    j0 = rows[("2024-01-01", 0)]
    assert (j0["n_active"], j0["revenue_cents"], j0["cum_cents"]) == (2, 3000, 3000)
    assert (j0["cohort_customers"], j0["ltv_cents_per_cust"]) == (2, 1500)
    j2 = rows[("2024-01-01", 2)]
    assert (j2["n_active"], j2["revenue_cents"], j2["cum_cents"]) == (1, 3000, 6000)
    assert j2["ltv_cents_per_cust"] == 3000
    m0 = rows[("2024-03-01", 0)]
    assert (m0["n_active"], m0["cohort_customers"], m0["ltv_cents_per_cust"]) == (1, 1, 500)


def test_survival_km_hand_computed(spark):
    """Six signups at t0 (+one at +50h): conversions at 0h and 2h,
    censorings at 50h (data-window truncation), and 72h (horizon: one
    never-purchaser, one whose only purchase is BEFORE the signup —
    strictly-after must ignore it — and one whose purchase lands past
    the horizon). KM: S(0) = 5/6 → 0.833333, S(2) = 5/6 · 4/5 →
    0.666667, flat thereafter; hazards in exact integer bps."""
    import datetime

    from datalake_local_spark.operators import funnel

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    h = lambda x: t0 + datetime.timedelta(hours=x)  # noqa: E731
    rows_in = [
        (1, h(0), 1, "signup"), (2, h(0.5), 1, "purchase"),      # dur 0
        (3, h(0), 2, "signup"), (4, h(2.99), 2, "purchase"),     # dur 2
        (5, h(0), 3, "signup"),                                   # censored 72
        (6, h(50), 4, "signup"),                                  # censored 50 (end)
        (7, h(0), 5, "signup"), (8, h(80), 5, "purchase"),       # past horizon → 72
        (9, h(-1), 6, "purchase"), (10, h(0), 6, "signup"),      # before-only → 72
        (11, h(100), 7, "view"),                                  # pins end_ep
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, et, 1.0, "{}") for i, ts, u, et in rows_in],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = {r["duration_hours"]: r for r in funnel.survival_km(ev).collect()}
    assert set(out) == {0, 2, 50, 72}
    assert (out[0]["n_risk"], out[0]["n_converted"], out[0]["n_censored"]) == (6, 1, 0)
    assert out[0]["hazard_bps"] == 1666 and out[0]["survival"] == 0.833333
    assert (out[2]["n_risk"], out[2]["n_converted"]) == (5, 1)
    assert out[2]["hazard_bps"] == 2000 and out[2]["survival"] == 0.666667
    assert (out[50]["n_risk"], out[50]["n_censored"], out[50]["survival"]) == (4, 1, 0.666667)
    assert (out[72]["n_risk"], out[72]["n_censored"], out[72]["survival"]) == (3, 3, 0.666667)
    assert out[72]["n_converted"] == 0 and out[72]["hazard_bps"] == 0


def test_bootstrap_ci_constant_data_degenerates(spark):
    """All orders the same price → every replicate mean is exactly that
    price regardless of the Poisson weights, so the CI collapses to
    [point, point] — pins the weight/mean plumbing without fixing the
    md5 draws."""
    orders = spark.createDataFrame(
        [(i, "1-URGENT", 10.0) for i in range(200)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    rows = quality.bootstrap_mean_ci(orders).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_orders"] == 200 and r["mean_cents"] == 1000
    assert r["n_replicates"] == 50
    assert r["ci_lo_cents"] == 1000.0 and r["ci_hi_cents"] == 1000.0


def test_bootstrap_ci_brackets_point(spark):
    """Mixed prices: the 95% CI must bracket the full-sample mean, be
    ordered, and be reproducible run-to-run (deterministic md5 draws)."""
    orders = spark.createDataFrame(
        [(i, "2-HIGH", float(10 + (i * 37) % 100)) for i in range(500)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    a = quality.bootstrap_mean_ci(orders).collect()[0]
    b = quality.bootstrap_mean_ci(orders).collect()[0]
    assert a == b
    assert a["ci_lo_cents"] <= a["mean_cents"] <= a["ci_hi_cents"]
    assert a["ci_lo_cents"] < a["ci_hi_cents"]


def test_psi_drift_identical_and_shifted(spark):
    """Identical price mixes in the first and last year → every band's
    p = q exactly and PSI is 0.0; a total shift (cheap baseline year,
    expensive current year) must score far above the 0.25 alert line."""
    import datetime

    d = lambda y: datetime.date(y, 6, 1)  # noqa: E731
    same = spark.createDataFrame(
        [(i, d(2020), 10_000.0 * (1 + i % 5)) for i in range(50)]
        + [(100 + i, d(2024), 10_000.0 * (1 + i % 5)) for i in range(50)],
        "o_orderkey long, o_orderdate date, o_totalprice double",
    )
    out = quality.psi_drift(same).collect()
    assert all(r["psi_contrib"] == 0.0 for r in out)
    assert all(r["psi_total"] == 0.0 for r in out)

    shifted = spark.createDataFrame(
        [(i, d(2020), 10_000.0) for i in range(50)]
        + [(100 + i, d(2024), 490_000.0) for i in range(50)],
        "o_orderkey long, o_orderdate date, o_totalprice double",
    )
    rows = {r["band"]: r for r in quality.psi_drift(shifted).collect()}
    assert set(rows) == {0, 9}
    assert rows[0]["baseline_n"] == 50 and rows[0]["current_n"] == 0
    assert rows[9]["current_n"] == 50
    assert rows[0]["psi_total"] > 0.25


def test_zvalue_interleave_hand_computed(spark):
    """x=3 (011₂), y=5 (101₂), 3 bits: x occupies even bit positions,
    y odd → z = 1 + 2 + 4 + 32 = 39; identical from the DuckDB
    rendering of the same generated expression."""
    import duckdb

    from datalake_local_spark.functions.zorder import zvalue_sql

    sexpr = zvalue_sql("x", "y", 3, "div")
    got = (
        spark.createDataFrame([(3, 5)], "x long, y long")
        .selectExpr(f"{sexpr} as z")
        .collect()[0]["z"]
    )
    assert got == 39
    dexpr = zvalue_sql("3", "5", 3, "//")
    assert duckdb.sql(f"SELECT {dexpr} AS z").fetchall()[0][0] == 39


def test_zorder_buckets_are_locally_tight(spark):
    """A 64×64 uniform (custkey, day) grid: the 256 z-buckets form a
    16×16 spatial grid, so every bucket's envelope must stay within a
    16th of EACH dimension (±1 for normalization rounding) — the
    property a 1-D sort provably lacks (a custkey sort would leave
    max_day − min_day at full width 63 in every bucket)."""
    import datetime

    from datalake_local_spark.operators import layout

    base = datetime.date(2024, 1, 1)
    rows = [
        (c * 64 + d, c, base + datetime.timedelta(days=d))
        for c in range(64)
        for d in range(64)
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date"
    )
    out = layout.zorder_layout(orders).collect()
    assert len(out) == 256
    assert sum(r["n_orders"] for r in out) == 64 * 64
    for r in out:
        assert r["max_custkey"] - r["min_custkey"] <= 4
        assert r["max_day"] - r["min_day"] <= 4


def test_daily_autocorrelation_antiphase(spark):
    """Events on even days only (2/day), odd days silent: the ZERO-
    FILLED series alternates 2,0,2,0,…, so lag-1 and lag-7 (both odd
    shifts) are exactly −1.0 — this pins both the calendar zero-fill
    (odd days appear as real 0s, not gaps) and the exact integer
    moment arithmetic."""
    import datetime

    ev = spark.createDataFrame(
        [
            (d * 10 + j, datetime.datetime(2024, 1, 1 + d, 12, j), 1, "view", 1.0, "{}")
            for d in range(0, 14, 2)
            for j in range(2)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = {r["lag_days"]: r for r in windows.daily_autocorrelation(ev).collect()}
    assert set(out) == {1, 7}
    assert out[1]["n_pairs"] == 12 and out[1]["autocorr"] == -1.0
    assert out[7]["n_pairs"] == 6 and out[7]["autocorr"] == -1.0


def test_daily_autocorrelation_constant_is_null(spark):
    """A constant series has zero variance at every lag — autocorr must
    be NULL (the explicit 0/0 guard), never NaN or ±1."""
    import datetime

    ev = spark.createDataFrame(
        [(d, datetime.datetime(2024, 1, 1 + d, 12, 0), 1, "view", 1.0, "{}")
         for d in range(10)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    for r in windows.daily_autocorrelation(ev).collect():
        assert r["autocorr"] is None


def test_survival_km_same_second_conversion(spark):
    """A purchase 400 ms after the signup — same whole second — must
    still count as converted (microsecond strictly-after), the hazard
    whole-second truncation would silently drop."""
    import datetime

    from datalake_local_spark.operators import funnel

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    ev = spark.createDataFrame(
        [
            (1, t0, 1, "signup", 1.0, "{}"),
            (2, t0 + datetime.timedelta(milliseconds=400), 1, "purchase", 1.0, "{}"),
            (3, t0 + datetime.timedelta(hours=100), 2, "view", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    rows = funnel.survival_km(ev).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["duration_hours"], r["n_converted"], r["n_censored"]) == (0, 1, 0)
    assert r["survival"] == 0.0


def test_canonicalize_url_edge_cases(spark):
    """Edge cases beyond the query's synthetic variants: all-utm
    querystrings collapse to a bare URL (no dangling '?'), root paths
    keep nothing after the host, http :80 strips like https :443,
    non-default ports are PRESERVED, and param sorting is
    byte-lexicographic."""
    from datalake_local_spark.operators.scalars import canonicalize_url

    cases = [
        ("HTTP://X.COM:80/?utm_source=a&utm_campaign=b", "http://x.com"),
        ("https://x.com/a/b/?z=1&a=2#frag", "https://x.com/a/b?a=2&z=1"),
        ("https://x.com:8080/a", "https://x.com:8080/a"),
        ("https://x.com", "https://x.com"),
        ("https://x.com/?B=1&a=2", "https://x.com?B=1&a=2"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_scd2_snapshot_at_picks_correct_version(spark):
    """One key, two versions (A from 2020, B from 2021): the 2020-06-01
    snapshot sees A, the 2021-06-01 snapshot sees B, and a pre-history
    date sees nothing."""
    from datalake_local_spark.operators import merge

    current = spark.createDataFrame(
        [(1, "A", "2020-01-01")],
        "k long, seg string, effective_from string",
    ).withColumn("effective_from", F.to_date("effective_from"))
    updates = spark.createDataFrame(
        [(1, "B", "2021-01-01")],
        "k long, seg string, effective_from string",
    ).withColumn("effective_from", F.to_date("effective_from"))
    hist = merge.scd2_apply(current, updates, "k", ["seg"], "effective_from")
    mid = merge.scd2_snapshot_at(hist, "effective_from", "2020-06-01").collect()
    assert [r["seg"] for r in mid] == ["A"]
    late = merge.scd2_snapshot_at(hist, "effective_from", "2021-06-01").collect()
    assert [r["seg"] for r in late] == ["B"]
    assert merge.scd2_snapshot_at(hist, "effective_from", "2019-06-01").count() == 0


def test_fulfillment_lead_time_hand_computed(spark):
    """Three orders, last-ship lead times 2/4/10 days: mean is the
    exact half-up 2dp integer mean (16/3 → 5.33), P50 the middle
    value; an order with no lineitems never reports."""
    orders = spark.createDataFrame(
        [
            (1, "1-URGENT", "2024-01-01"),
            (2, "1-URGENT", "2024-01-01"),
            (3, "1-URGENT", "2024-01-01"),
            (9, "1-URGENT", "2024-01-01"),
        ],
        "o_orderkey long, o_orderpriority string, o_orderdate string",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    li = spark.createDataFrame(
        [
            (1, "2024-01-02"), (1, "2024-01-03"),
            (2, "2024-01-05"),
            (3, "2024-01-11"),
        ],
        "l_orderkey long, l_shipdate string",
    ).withColumn("l_shipdate", F.to_date("l_shipdate"))
    rows = tpch.fulfillment_lead_time(li, orders).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_orders"] == 3
    assert r["mean_days"] == 5.33  # (2*16*100+3) div 6 = 533 -> 5.33
    assert r["p50_days"] == 4.0


def test_zorder_layout_prunes_columns(tables):
    """The Morton-key report touches only o_custkey and o_orderdate —
    the parquet ReadSchema must not carry payload columns."""
    from datalake_local_spark.operators import layout

    plan = _physical_plan(layout.zorder_layout(tables["orders"]))
    read = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "o_custkey" in read and "o_orderdate" in read
    assert "o_totalprice" not in read and "o_comment" not in read


def test_cohort_ltv_single_orders_scan(tables):
    """The single-shuffle rewrite's contract: cohort assignment rides a
    window over ONE scan of orders — the plan must contain exactly one
    parquet scan of the orders table (the groupBy+join-back shape
    would show two)."""
    from datalake_local_spark.operators import tpch

    plan = _physical_plan(tpch.cohort_ltv(tables["orders"]))
    assert plan.count("orders.parquet") == 1


def test_bootstrap_ci_partial_aggregates(tables):
    """The replicate means must map-side combine: partial HashAggregate
    below the exchange, and no nested-loop join anywhere (the only
    join is the 5-row priority merge)."""
    plan = _physical_plan(quality.bootstrap_mean_ci(tables["orders"]))
    assert "partial" in plan.lower() or "HashAggregate" in plan
    assert plan.count("orders.parquet") == 2  # weights pass + point pass


def test_path_trigrams_hand_computed(spark):
    """User 1's view→click→purchase→view stream yields two overlapping
    trigrams; user 2 repeats view→click→purchase so that path counts 2;
    a two-event user contributes nothing; ties order by path ASC."""
    import datetime

    from datalake_local_spark.operators import funnel

    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, t(0), 1, "view", 1.0, "{}"),
            (2, t(1), 1, "click", 1.0, "{}"),
            (3, t(2), 1, "purchase", 1.0, "{}"),
            (4, t(3), 1, "view", 1.0, "{}"),
            (5, t(0), 2, "view", 1.0, "{}"),
            (6, t(1), 2, "click", 1.0, "{}"),
            (7, t(2), 2, "purchase", 1.0, "{}"),
            (8, t(0), 3, "view", 1.0, "{}"),
            (9, t(1), 3, "click", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    rows = funnel.path_trigrams(ev).collect()
    got = [(r["path"], r["n_paths"]) for r in rows]
    assert got == [
        ("view > click > purchase", 2),
        ("click > purchase > view", 1),
    ]


def test_seasonal_anomaly_weekday_conditioning(spark):
    """Four Mondays at 10 events and one at 100: only the spike Monday
    flags (direction high), even though 10 < the global mean would —
    wrongly — flag quiet Mondays if the baseline weren't
    weekday-conditioned; Tuesdays (constant 50) never flag."""
    import datetime

    ev = []
    eid = 0
    # Mondays 2024-01-01 +7k: counts 10,10,10,10,100
    for k, cnt in enumerate([10, 10, 10, 10, 100]):
        for j in range(cnt):
            eid += 1
            ev.append((eid, datetime.datetime(2024, 1, 1 + 7 * k, 8, j % 60, j // 60), 1, "view", 1.0, "{}"))
    # Tuesdays: constant 50
    for k in range(5):
        for j in range(50):
            eid += 1
            ev.append((eid, datetime.datetime(2024, 1, 2 + 7 * k, 8, j % 60, j // 60), 1, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    rows = windows.seasonal_anomaly_days(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert str(r["day"]) == "2024-01-29" and r["dow"] == 1
    assert r["n_events"] == 100 and r["direction"] == "high"
    assert r["dow_mean"] == 28.0  # (10*4+100)/5


def test_full_outer_reconcile_all_classes(spark):
    """All three reconciliation classes planted: order 1 matches its
    lines exactly (delta 0), order 2 has no lines (header_only), line
    group 9 has no header (lines_only), order 3 drifts by 5 cents —
    counted in 'both' with the exact absolute delta."""
    orders = spark.createDataFrame(
        [(1, 30.00), (2, 10.00), (3, 20.00)],
        "o_orderkey long, o_totalprice double",
    )
    li = spark.createDataFrame(
        [(1, 10.00), (1, 20.00), (3, 19.95), (9, 7.00)],
        "l_orderkey long, l_extendedprice double",
    )
    rows = {r["klass"]: r for r in joins.full_outer_reconcile(orders, li).collect()}
    assert set(rows) == {"both", "header_only", "lines_only"}
    b = rows["both"]
    assert (b["n_orders"], b["abs_delta_cents"]) == (2, 5)
    assert (b["header_cents"], b["line_cents"]) == (5000, 4995)
    assert (rows["header_only"]["n_orders"], rows["header_only"]["header_cents"]) == (1, 1000)
    assert (rows["lines_only"]["n_orders"], rows["lines_only"]["line_cents"]) == (1, 700)


def test_realized_margin_hand_computed(spark):
    """One brand: 2 units billed at $9 against $5 list (retail value
    $10) → realized 9000 bps; a second brand sells AT list → exactly
    10000 bps."""
    li = spark.createDataFrame(
        [(1, 2.0, 9.00), (2, 3.0, 30.00)],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#1", 5.00), (2, "Brand#2", 10.00)],
        "p_partkey long, p_brand string, p_retailprice double",
    )
    rows = {r["p_brand"]: r for r in tpch.realized_margin(li, part).collect()}
    b1 = rows["Brand#1"]
    assert (b1["billed_cents"], b1["retail_cents"], b1["realized_bps"]) == (900, 1000, 9000)
    assert rows["Brand#2"]["realized_bps"] == 10000


def test_order_aging_hand_computed(spark):
    """Book end pins to the newest order: a same-day order ages 0, a
    399-day-old one lands in year bucket 1, a 1094-day-old in bucket 2;
    value sums in exact cents per (status, bucket)."""
    orders = spark.createDataFrame(
        [
            (1, "O", "2024-01-01", 10.00),
            (2, "O", "2022-11-28", 20.00),   # 399 days -> bucket 1
            (3, "F", "2021-01-02", 30.00),   # 1094 days -> bucket 2
        ],
        "o_orderkey long, o_orderstatus string, o_orderdate string, o_totalprice double",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    rows = {(r["o_orderstatus"], r["age_years"]): r
            for r in tpch.order_aging(orders).collect()}
    assert set(rows) == {("O", 0), ("O", 1), ("F", 2)}
    assert rows[("O", 0)]["value_cents"] == 1000
    assert rows[("O", 1)]["value_cents"] == 2000
    assert rows[("F", 2)]["n_orders"] == 1


def test_return_rates_hand_computed(spark):
    """Brand#1: one of two lines returned (5000 bps by count) but the
    returned line carries $30 of $40 billed → 7500 bps by value — the
    count/value divergence the two-rate design exists to show."""
    li = spark.createDataFrame(
        [(1, "R", 30.00), (1, "N", 10.00), (2, "N", 5.00)],
        "l_partkey long, l_returnflag string, l_extendedprice double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#1"), (2, "Brand#2")], "p_partkey long, p_brand string"
    )
    rows = {r["p_brand"]: r for r in tpch.return_rates(li, part).collect()}
    b1 = rows["Brand#1"]
    assert (b1["n_lines"], b1["n_returned"], b1["return_rate_bps"]) == (2, 1, 5000)
    assert (b1["returned_cents"], b1["returned_value_bps"]) == (3000, 7500)
    assert rows["Brand#2"]["return_rate_bps"] == 0


def test_slo_burn_hand_computed(spark):
    """Day 1: 1 error in 100 (100 bps — exactly the budget, burn
    10000 bps); day 2 clean, so the cumulative rate halves and burn
    drops to 5000 bps of budget."""
    import datetime

    ev = []
    for j in range(100):
        ev.append((j, datetime.datetime(2024, 1, 1, 8, j % 60), 1,
                   "error" if j == 0 else "view", 1.0, "{}"))
    for j in range(100):
        ev.append((100 + j, datetime.datetime(2024, 1, 2, 8, j % 60), 1,
                   "view", 1.0, "{}"))
    df = spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    rows = {str(r["day"]): r for r in windows.slo_burn_table(df).collect()}
    d1, d2 = rows["2024-01-01"], rows["2024-01-02"]
    assert (d1["err_bps"], d1["budget_burn_bps"]) == (100, 10000)
    assert (d2["err_bps"], d2["cum_err_bps"], d2["budget_burn_bps"]) == (0, 50, 5000)


def test_latency_percentile_trend_hand_computed(spark):
    """Five values 1..5 on one day: p50 = 3 exactly; p95 interpolates
    to 4.8 (the certified percentile-pair arithmetic)."""
    import datetime

    ev = spark.createDataFrame(
        [(j, datetime.datetime(2024, 1, 1, 8, j), 1, "view", float(j + 1), "{}")
         for j in range(5)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    rows = windows.latency_percentile_trend(ev).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_events"], r["p50"], r["p95"]) == (5, 3.0, 4.8)


def test_cuped_matches_numpy_reference(spark):
    """CUPED θ and adjusted means against a plain numpy computation on
    the same synthetic per-user (pre, post) pairs — the public Deng et
    al. 2013 formulas, no Spark in the reference path."""
    import datetime

    import numpy as np

    from datalake_local_spark.operators import quality

    rows = []
    eid = 0
    # 12 users, deterministic spends; two events each (one pre, one post)
    for u in range(1, 13):
        pre = float(10 + 3 * u + (u % 3))
        post = float(20 + 2 * u + (u % 5))
        rows.append((eid, datetime.datetime(2024, 1, 1, 0, 0, u), u, "view", pre, "{}"))
        eid += 1
        rows.append((eid, datetime.datetime(2024, 1, 3, 0, 0, u), u, "view", post, "{}"))
        eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {r["arm"]: r for r in quality.cuped_adjustment(ev).collect()}

    # numpy reference with the same md5-parity arm assignment
    import hashlib

    def arm(u):
        return "A" if int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2 == 0 else "B"

    xs, ys, arms = [], [], []
    for u in range(1, 13):
        xs.append(10 + 3 * u + (u % 3))
        ys.append(20 + 2 * u + (u % 5))
        arms.append(arm(u))
    x, y = np.array(xs), np.array(ys)
    theta = ((len(x) * (x * y).sum() - x.sum() * y.sum())
             / (len(x) * (x * x).sum() - x.sum() ** 2))
    mx_pool = x.mean()
    adj = y - theta * (x - mx_pool)
    for a in ("A", "B"):
        sel = np.array(arms) == a
        assert got[a]["n_users"] == int(sel.sum())
        assert abs(got[a]["theta"] - theta) < 1e-5
        want_adj = y[sel].mean() - theta * (x[sel].mean() - mx_pool)
        assert abs(got[a]["mean_cuped"] - want_adj) < 1e-5
        assert abs(got[a]["mean_post"] - y[sel].mean()) < 1e-5
        # variance outputs against the numpy reference (sample, ddof=1)
        want_vp = y[sel].var(ddof=1)
        want_vc = adj[sel].var(ddof=1)
        assert abs(got[a]["var_post"] - want_vp) < 1e-5
        assert abs(got[a]["var_cuped"] - want_vc) < 1e-5
        assert abs(got[a]["var_reduction"] - (1.0 - want_vc / want_vp)) < 1e-5


def test_mann_kendall_hand_computed(spark):
    """Strictly increasing daily revenue: S = n(n−1)/2 = 45, no ties,
    Var·18 = n(n−1)(2n+5) = 2250, z = 44/√125 → 'increasing'; a flat
    series is all ties → zero variance → NULL z, 'no_trend'."""
    import datetime
    import math

    from datalake_local_spark.operators import quality

    rows = []
    k = 1
    for d in range(10):
        rows.append((k, 1, "O", float(100 + d), datetime.date(2024, 1, d + 1), "1-URGENT"))
        k += 1
        rows.append((k, 1, "F", 50.0, datetime.date(2024, 1, d + 1), "1-URGENT"))
        k += 1
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    got = {r["status"]: r for r in quality.mann_kendall_trend(orders).collect()}
    o = got["O"]
    assert (o["n_days"], o["s_stat"], o["var_s_x18"]) == (10, 45, 2250)
    assert abs(o["z"] - round(44 / math.sqrt(2250 / 18.0), 4)) < 1e-9
    assert o["trend"] == "increasing"
    f = got["F"]
    assert (f["s_stat"], f["var_s_x18"], f["z"], f["trend"]) == (0, 0, None, "no_trend")


def test_mann_kendall_plan_single_base_pass(spark, tables):
    """r20 guard: the returned plan's four consumers (both self-join
    sides, n_days, ties) all ride the MATERIALIZED day×status table —
    the executed plan must not rescan the orders parquet (the pre-r20
    shape finalized at 2 scans after partial reuse; the one real scan
    happens once, inside the localCheckpoint build)."""
    from datalake_local_spark.operators import quality

    df = quality.mann_kendall_trend(tables["orders"])
    df.collect()
    final = (
        df._jdf.queryExecution().executedPlan().toString()
        .split("+- == Initial Plan ==")[0]
    )
    assert final.count("FileScan parquet") == 0


def test_supplier_hhi_hand_computed(spark):
    """Two brands: one single-sourced (HHI = 10000, 'high'), one with
    an even 4-way split (HHI = 2500² shares → 4·2500² / 10⁴ = 2500,
    boundary-'high' by the ≥ rule)."""
    from datalake_local_spark.operators import tpch

    li = spark.createDataFrame(
        [(1, 1, 100.0), (1, 1, 50.0)]
        + [(2, s, 25.0) for s in (1, 2, 3, 4)],
        "l_partkey long, l_suppkey long, l_extendedprice double",
    )
    part = spark.createDataFrame(
        [(1, "MONO"), (2, "QUAD")], "p_partkey long, p_brand string"
    )
    got = {r["brand"]: r for r in tpch.supplier_concentration_hhi(li, part).collect()}
    m = got["MONO"]
    assert (m["n_suppliers"], m["hhi_points"], m["top_share_bps"], m["concentration"]) == (
        1, 10000, 10000, "high")
    q = got["QUAD"]
    assert (q["n_suppliers"], q["hhi_points"], q["top_share_bps"], q["concentration"]) == (
        4, 2500, 2500, "high")


def test_burstiness_metronome_and_burst(spark):
    """A metronome user (constant gaps) has σ = 0 → B = −1, CV = 0; a
    burst-silence user has positive B; a same-timestamp user yields
    NULL (0/0 guard)."""
    import datetime

    from datalake_local_spark.operators import windows

    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1)
    for i in range(5):  # user 1: every 60 s exactly
        rows.append((eid, base + datetime.timedelta(seconds=60 * i), 1, "view", 1.0, "{}")); eid += 1
    for sec in (0, 1, 2, 3, 3600):  # user 2: burst then silence
        rows.append((eid, base + datetime.timedelta(seconds=sec), 2, "view", 1.0, "{}")); eid += 1
    for i in range(3):  # user 3: all at the same instant
        rows.append((eid, base, 3, "view", 1.0, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {r["user_id"]: r for r in windows.user_burstiness(ev).collect()}
    assert (got[1]["cv"], got[1]["burstiness"]) == (0.0, -1.0)
    assert got[1]["mean_gap_us"] == 60_000_000
    # population σ for n = 4 gaps with one dominant gap: B = 0.267433
    # (bounded below (√(n−1)−1)/(√(n−1)+1) ≈ 0.268 — the finite-n cap
    # of Kim & Jo 2016); positive = bursty is the assertion
    assert 0.2 < got[2]["burstiness"] < 0.27
    assert got[3]["cv"] is None and got[3]["burstiness"] is None


def test_asof_nearest_direction_and_ties(spark):
    """Hand case: click between two purchases picks the nearer; exact
    tie goes backward; same-timestamp purchase matches forward at
    delta 0; out-of-tolerance clicks stay unmatched."""
    import datetime

    from datalake_local_spark.operators import asof

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, sec, typ):
        return (eid, base + datetime.timedelta(seconds=sec), 1, typ, 1.0, "{}")

    ev_rows = [
        ev(1, 0, "purchase"),
        ev(2, 100, "click"),      # prev at 100s, next at 250s → backward
        ev(3, 350, "purchase"),
        ev(4, 475, "click"),      # 125s to both → tie → backward
        ev(5, 600, "purchase"),
        ev(6, 700, "click"),      # same-ts purchase below → forward, 0
        ev(7, 700, "purchase"),
        ev(8, 10000, "click"),    # > 30 min from any purchase → NULL
    ]
    df = spark.createDataFrame(
        ev_rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {r["click_id"]: r for r in asof.asof_nearest_join(df).collect()}
    assert (got[2]["purchase_id"], got[2]["direction"], got[2]["delta_us"]) == (
        1, "backward", -100_000_000)
    assert (got[4]["purchase_id"], got[4]["direction"]) == (3, "backward")
    assert (got[6]["purchase_id"], got[6]["direction"], got[6]["delta_us"]) == (
        7, "forward", 0)
    assert got[8]["purchase_id"] is None and got[8]["direction"] is None


def test_theil_sen_outlier_resistance(spark):
    """A clean +$1/day trend with one wild outlier day: the Sen slope
    stays 1.0 $/day (median of pairwise slopes) where a least-squares
    fit would be dragged far off."""
    import datetime

    from datalake_local_spark.operators import quality

    rows = []
    for d in range(11):
        price = 10000.0 if d == 5 else 100.0 + d  # day 5 is the outlier
        rows.append((d + 1, 1, "O", price, datetime.date(2024, 1, d + 1), "1-URGENT"))
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    got = quality.theil_sen_slope(orders).collect()[0]
    assert got["n_pairs"] == 55
    assert abs(got["sen_slope_per_day"] - 1.0) < 1e-9


def test_stl_decompose_reconstructs_exactly(spark):
    """Additive-model identity on a planted weekly pattern: for every
    interior day, trend + seasonal + residual == revenue exactly (one
    division each of exact integers), and the weekly spike day carries
    the dominant positive seasonal component."""
    import datetime

    from datalake_local_spark.operators import windows

    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1)  # a Monday
    for d in range(28):
        value = 700.0 if d % 7 == 3 else 100.0  # Thursday spike
        rows.append((eid, base + datetime.timedelta(days=d), 1, "view", value, "{}"))
        eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = windows.stl_decompose_daily(ev).collect()
    assert len(out) == 28
    interior = [r for r in out if r["trend_cents"] is not None]
    assert len(interior) == 22
    for r in interior:
        recon = r["trend_cents"] + r["seasonal_cents"] + r["residual_cents"]
        assert abs(recon - r["revenue_cents"]) < 1e-6
        # constant weekly pattern → flat trend at the weekly mean
        assert abs(r["trend_cents"] - (6 * 10000 + 70000) / 7.0) < 1e-6
    spikes = [r for r in interior if r["revenue_cents"] == 70000]
    assert all(r["seasonal_cents"] > 50000 for r in spikes)


def test_ks_two_sample_hand_computed(spark):
    """First year {10,20,30}, last year {40,50,60}: fully separated
    samples give D = 1 (max gap at x = 30: F1 = 1, F2 = 0), λ = √1.5,
    no rejection at n = 3 (λ ≈ 1.22 < 1.358)."""
    import datetime
    import math

    from datalake_local_spark.operators import quality

    rows = [(i + 1, 1, "O", float(v), datetime.date(2020, 1, i + 1), "x")
            for i, v in enumerate([10, 20, 30])]
    rows += [(i + 4, 1, "O", float(v), datetime.date(2024, 1, i + 1), "x")
             for i, v in enumerate([40, 50, 60])]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    r = quality.ks_two_sample(orders).collect()[0]
    assert (r["n_first_year"], r["n_last_year"]) == (3, 3)
    assert abs(r["d_stat"] - 1.0) < 1e-12
    assert abs(r["ks_lambda"] - round(math.sqrt(1.5), 6)) < 1e-9
    assert r["reject_at_05"] == (math.sqrt(1.5) > 1.358)


def test_retention_matrix_hand_computed(spark):
    """Cohort of 4 users in week 0; 2 return in week 1, 1 in week 2:
    retention 10000 / 5000 / 2500 bps."""
    import datetime

    from datalake_local_spark.operators import funnel

    base = datetime.datetime(2024, 1, 1)  # a Monday

    def ev(eid, user, weeks):
        return (eid, base + datetime.timedelta(weeks=weeks), user, "view", 1.0, "{}")

    rows = [ev(i, u, 0) for i, u in enumerate([1, 2, 3, 4])]
    rows += [ev(10, 1, 1), ev(11, 2, 1), ev(12, 1, 2)]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {r["age_weeks"]: r for r in funnel.retention_matrix_weekly(events).collect()}
    assert got[0]["cohort_size"] == 4 and got[0]["retention_bps"] == 10000
    assert got[1]["n_active"] == 2 and got[1]["retention_bps"] == 5000
    assert got[2]["n_active"] == 1 and got[2]["retention_bps"] == 2500


def test_js_divergence_identical_and_disjoint(spark):
    """Identical source vocabularies give JS = 0; fully disjoint ones
    give the ln 2 maximum (normalized 1.0); a half-overlap sits
    strictly between."""
    from datalake_local_spark.llm import text as t

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "same1"),
            (2, "alpha beta gamma delta", "same2"),
            (3, "epsilon zeta eta theta", "disjoint"),
        ],
        "doc_id long, text string, source string",
    )
    got = {(r["src_a"], r["src_b"]): r for r in t.source_js_divergence(docs).collect()}
    assert got[("same1", "same2")]["js_nats"] == 0.0
    assert got[("same1", "same2")]["js_normalized"] == 0.0
    assert abs(got[("disjoint", "same1")]["js_normalized"] - 1.0) < 1e-9
    assert got[("disjoint", "same1")]["n_shared_tokens"] == 0
    assert len(got) == 3  # every pair in the universe, disjoint included


def test_hampel_flags_spike_not_trend(spark):
    """Planted series: flat 100s with one 10x spike — the spike day is
    flagged, its neighbors are not, and a clean linear trend produces
    zero flags (the robustness property a mean/sigma rule lacks)."""
    import datetime

    from datalake_local_spark.operators import windows

    base = datetime.datetime(2024, 1, 1)

    def series(values, uid):
        return [
            (uid * 1000 + i, base + datetime.timedelta(days=i), uid, "view", float(v), "{}")
            for i, v in enumerate(values)
        ]

    spike = [100] * 15
    spike[7] = 1000
    ev = spark.createDataFrame(
        series(spike, 1),
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {r["day"].day: r for r in windows.hampel_outlier_days(ev).collect()}
    assert got[8]["is_outlier"] is True  # the spike (day index 7 → Jan 8)
    assert all(not r["is_outlier"] for d, r in got.items() if d != 8)
    # clean trend: MAD > 0, deviations bounded → no flags
    trend = series(list(range(100, 130, 2)), 1)
    ev2 = spark.createDataFrame(
        trend,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    assert all(not r["is_outlier"] for r in windows.hampel_outlier_days(ev2).collect())


def test_little_law_identity_structural(spark, tables):
    """The concurrency integral must equal the session-duration sum
    EXACTLY on real data (Fubini over presence rectangles), and
    L = lambda x W reconstructs from the published exact ratios."""
    from datalake_local_spark.operators import windows

    r = windows.little_law_reconciliation(tables["events"]).collect()[0]
    assert r["identity_violation_us"] == 0
    assert r["n_sessions"] > 0
    lam_per_us = r["lambda_per_hour"] / 3.6e9
    assert abs(r["l_avg_sessions"] - lam_per_us * (r["sum_dur_us"] / r["n_sessions"])) < 1e-9


def test_demand_xyz_boundary_classes(spark):
    """Hand series: constant demand is X (CV = 0); a CV exactly 1
    series classes Z by the >= boundary (integer cross-multiplication,
    no float decides)."""
    import datetime

    from datalake_local_spark.operators import tpch

    li, pid = [], 1

    def add(brand_key, quantities):
        nonlocal pid
        for m, q in enumerate(quantities):
            li.append((brand_key, float(q), datetime.date(2024, m + 1, 1)))

    add(1, [10, 10, 10, 10])          # CV 0 → X
    add(2, [0, 2, 0, 2])              # mean 1, sample var 4/3 → CV > 1 → Z
    rows = spark.createDataFrame(
        li, "l_partkey long, l_quantity double, l_shipdate date"
    )
    part = spark.createDataFrame(
        [(1, "BRAND_X"), (2, "BRAND_Z")], "p_partkey long, p_brand string"
    )
    got = {r["brand"]: r for r in tpch.demand_variability_xyz(rows, part).collect()}
    assert got["BRAND_X"]["xyz_class"] == "X" and got["BRAND_X"]["demand_cv"] == 0.0
    assert got["BRAND_Z"]["xyz_class"] == "Z"


# ---------------------------------------------------------------------------
# round-13 operators (oracle certs carry value equality; these pin the
# structural invariants the SQL comparison cannot express)
# ---------------------------------------------------------------------------


def test_cramers_v_bounds(spark, tables):
    from datalake_local_spark.operators import quality

    rows = quality.cramers_v_screen(tables["orders"]).collect()
    assert {r["pair"] for r in rows} == {"priority_x_status", "priority_x_year"}
    for r in rows:
        assert 0.0 <= r["cramers_v"] <= 1.0
        assert r["dof"] == (r["r"] - 1) * (r["c"] - 1)
        assert r["chi2"] >= 0.0


def test_page_hinkley_invariants(spark, tables):
    from datalake_local_spark.operators import quality

    rows = quality.page_hinkley_drift(tables["orders"]).collect()
    assert len(rows) > 12  # monthly over the multi-year history
    for r in rows:
        assert r["ph_inc_max"] >= 0.0 and r["ph_dec_max"] >= 0.0
        assert 0 <= r["n_alarm_inc"] <= r["n_days"]
        assert 0 <= r["n_alarm_dec"] <= r["n_days"]


def test_control_chart_invariants(spark, tables):
    from datalake_local_spark.operators import quality

    rows = quality.control_chart_monthly(tables["orders"]).collect()
    assert len(rows) > 12
    for r in rows:
        assert r["n_above_ucl"] + r["n_below_lcl"] <= r["n_days"]
        assert r["center_cents"] > 0 and r["mrbar_cents"] > 0


def test_rfm_migration_accounting(spark, tables):
    from pyspark.sql import functions as F

    from datalake_local_spark.operators import tpch

    orders = tables["orders"]
    rows = tpch.rfm_migration(orders).collect()
    # every customer appears in exactly one matrix cell
    n_matrix = sum(r["n_customers"] for r in rows)
    n_cust = orders.select("o_custkey").distinct().count()
    assert n_matrix == n_cust
    # per-cell floor division loses < 1 bps per populated cell
    assert 10000 - len(rows) <= sum(r["share_bps"] for r in rows) <= 10000
    segs = {"Fhi_Mhi", "Fhi_Mlo", "Flo_Mhi", "Flo_Mlo"}
    for r in rows:
        assert r["seg_from"] in segs | {"NEW"}
        assert r["seg_to"] in segs | {"LOST"}


def test_fill_rate_bounds(spark, tables):
    from datalake_local_spark.operators import tpch

    rows = tpch.order_fill_rate(tables["orders"], tables["lineitem"]).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_otif"] <= r["n_orders"]
        assert 0 <= r["fill_bps"] <= 10000


def test_discount_elasticity_baseline(spark, tables):
    from datalake_local_spark.operators import tpch

    rows = {r["discount_pct"]: r for r in tpch.discount_elasticity(tables["lineitem"]).collect()}
    assert 0 in rows and len(rows) == 11  # 0..10 percent bands
    assert rows[0]["qty_lift_vs_zero"] == 1.0  # the baseline is itself


def test_edit_distance_pairs_metric_bounds(spark, tables):
    rows_df = __import__(
        "datalake_local_spark.operators.scalars", fromlist=["scalars"]
    ).edit_distance_pairs(tables["nation"])
    rows = rows_df.collect()
    assert len(rows) == 25 * 24 // 2
    for r in rows:
        # Levenshtein lower bound: |len_a - len_b|; upper: max(len)
        assert abs(r["len_a"] - r["len_b"]) <= r["edit_distance"] <= max(
            r["len_a"], r["len_b"]
        )
        assert 0 <= r["similarity_bps"] <= 10000
        assert r["banded_distance"] == (
            r["edit_distance"] if r["edit_distance"] <= 3 else -1
        )


def test_sql_groupby_all_matches_dataframe(spark, tables):
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    got = {
        (r["o_orderstatus"], r["o_orderpriority"], r["n_orders"])
        for r in em._q_sql_groupby_all(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    want = {
        (r["o_orderstatus"], r["o_orderpriority"], r["n"])
        for r in tables["orders"]
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_calendar_heatmap_accounting(spark, tables):
    from datalake_local_spark.operators import windows

    events = tables["events"]
    rows = windows.calendar_heatmap(events).collect()
    assert sum(r["n_events"] for r in rows) == events.count()
    for r in rows:
        assert 1 <= r["isodow"] <= 7 and 0 <= r["hour"] <= 23
        assert r["n_users"] <= r["n_events"]


def test_ljung_box_invariants(spark, tables):
    from datalake_local_spark.operators import quality

    (r,) = quality.ljung_box_test(tables["orders"]).collect()
    assert r["q_stat"] >= 0.0
    for k in range(1, 8):
        assert -1.0 <= r[f"rho_{k}"] <= 1.0


def test_load_tables_memo_hit_reasserts_views(spark):
    """r13 regression: temp-view names are session-global while the
    load_tables memo is per-sf_dir — after load_tables(other_sf)
    re-points the views, a memo HIT for the original sf_dir must
    re-register them, or spark.sql() queries silently read the wrong
    scale factor (the order-dependent sql_groupby_all failure)."""
    from datalake_local_spark import session as sess

    t1 = sess.load_tables(spark, "/root/testdata/sf0.001")
    n_small = spark.table("orders").count()
    assert n_small == t1["orders"].count()
    sess.load_tables(spark, "/root/testdata/sf0.01")
    n_big = spark.table("orders").count()
    assert n_big > n_small  # views now point at sf0.01
    sess.load_tables(spark, "/root/testdata/sf0.001")  # memo hit
    assert spark.table("orders").count() == n_small  # views restored


def test_fan_out_probe_contract(spark, tables):
    """r13 wave 9b: the fan_out probe must never run a Spark job (under
    AQE, DataFrame.rdd on an exchange-bearing plan materializes the
    shuffle — a measured 0.78 s throwaway at sf0.1), must pass a
    pre-fanned frame through untouched, and must see through empty
    byte splits to row-group-effective parallelism."""
    from pyspark.sql import functions as F

    from datalake_local_spark.session import fan_out

    docs = tables["documents"]

    def n_jobs():
        return len(spark.sparkContext.statusTracker().getJobIdsForGroup() or [])

    # scan-rooted, one row group -> fanned, probe job-free
    j0 = n_jobs()
    out = fan_out(docs, "doc_id")
    assert n_jobs() == j0
    assert "Repartition" in out._jdf.queryExecution().optimizedPlan().toString()

    # already repartitioned -> SAME object back, probe job-free (the
    # rrf_rank_fusion pass-through case: .rdd here would run a shuffle)
    pre = docs.repartition(8, F.col("doc_id"))
    j0 = n_jobs()
    assert fan_out(pre, "doc_id") is pre
    assert n_jobs() == j0

    # derived in-memory frame -> repartitioned without probing
    mem = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    j0 = n_jobs()
    assert fan_out(mem, "doc_id") is not mem
    assert n_jobs() == j0

    # exchange-bearing NON-scan plan (Aggregate upstream): inputFiles()
    # is non-empty but .rdd would materialize the shuffle — fan_out must
    # stay job-free and repartition unconditionally (r13 ADVICE: the
    # "Repartition" substring alone did not guard this shape)
    agg = docs.groupBy("lang").agg(F.count("*").alias("n"))
    j0 = n_jobs()
    fanned_agg = fan_out(agg, "lang")
    assert n_jobs() == j0
    assert (
        "Repartition"
        in fanned_agg._jdf.queryExecution().optimizedPlan().toString()
    )

    # values are partition-invariant: same rows either way
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, docs.collect()))


def test_fan_out_footer_reads_bounded(spark, tables, tmp_path):
    """r14: the parquet-footer probe must exit early once row groups
    reach the parallelism target — at 100 TB / ~10⁵ files an O(files)
    driver-side metadata sweep per fan_out call is a multi-second stall
    for a decision already settled (r13 verdict #1 / ADVICE)."""
    from datalake_local_spark import session as sess_mod
    from datalake_local_spark.session import fan_out

    par = spark.sparkContext.defaultParallelism
    n_files = par * 3
    path = str(tmp_path / "many_files.parquet")
    tables["documents"].repartition(n_files).write.parquet(path)

    reads = []
    real_pf = sess_mod.pq.ParquetFile

    def counting_pf(p, *a, **k):
        reads.append(p)
        return real_pf(p, *a, **k)

    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # force one byte-split per file so splits >= par and the footer
        # loop actually runs (tiny files otherwise pack into few splits)
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
        sess_mod.pq.ParquetFile = counting_pf
        df = spark.read.parquet(path)
        assert df.rdd.getNumPartitions() >= par
        out = fan_out(df, "doc_id")
        # splits >= par and row groups reach par -> pass-through
        assert out is df
        # Early exit: the loop stops once `groups >= par`, but a
        # zero-row-group file (possible if repartition ever emits empty
        # partitions for this table) doesn't advance the count — bound
        # by par plus the empties actually written (r14 ADVICE; today
        # documents has 500 rows across par*3 files, so n_empty == 0
        # and the bound stays tight). Snapshot first and count empties
        # with real_pf: sess_mod.pq IS pyarrow.parquet, so the counting
        # patch is module-global and would otherwise self-inflate reads.
        n_reads = len(reads)
        n_empty = sum(
            1
            for f in df.inputFiles()
            if real_pf(f[7:]).metadata.num_row_groups == 0
        )
        assert 0 < n_reads <= par + n_empty < n_files
    finally:
        sess_mod.pq.ParquetFile = real_pf
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)


def test_ewma_chart_detects_planted_level_shift(spark):
    """NEW r15 (EWMA control chart, Roberts 1959): a sustained +8-sigma
    level shift at hour 60 crosses the upper limit shortly after the
    shift (side 'high'); a stationary series never alarms; reruns
    identical."""
    import datetime

    from datalake_local_spark.operators import quality as ops_quality

    base = datetime.datetime(2024, 3, 1)
    rows = []
    for i in range(120):
        v = 10.0 + (i % 5) * 0.01
        if i >= 60:
            v += 1.0
        rows.append((i, base + datetime.timedelta(hours=i), 1, "shifted", v, "{}"))
    for i in range(120):
        rows.append((1000 + i, base + datetime.timedelta(hours=i), 1, "flat",
                     5.0 + (i % 5) * 0.01, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = ops_quality.ewma_control_chart(df).collect()
    shifted = [r for r in out if r["event_type"] == "shifted"]
    flat = [r for r in out if r["event_type"] == "flat"]
    assert not flat
    assert shifted, "sustained level shift must cross the EWMA limit"
    first = min(shifted, key=lambda r: r["hour"])
    assert first["side"] == "high"
    assert base + datetime.timedelta(hours=60) <= first["hour"] <= base + datetime.timedelta(hours=70)
    # every violation reports the limit it crossed, on the right side
    for r in shifted:
        if r["side"] == "high":
            assert r["ewma_z"] > r["violated_limit"]
        else:
            assert r["ewma_z"] < r["violated_limit"]
    again = ops_quality.ewma_control_chart(df).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_holt_forecast_matches_recurrence(spark):
    """NEW r15 (Holt 1957 linear trend): one-step-ahead forecasts match
    a pure-python two-state recurrence bit-exactly; series shorter than
    2 hourly points emit nothing."""
    import datetime

    from datalake_local_spark.operators import quality  # noqa: F401
    from datalake_local_spark.operators import windows as ops_windows

    base = datetime.datetime(2024, 4, 1)
    rows = []
    vals = [10.0, 12.5, 11.0, 14.25, 13.0, 15.75, 16.0, 14.5]
    for i, v in enumerate(vals):
        rows.append((i, base + datetime.timedelta(hours=i), 1, "a", v, "{}"))
    rows.append((100, base, 1, "single", 5.0, "{}"))  # 1-point series
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = ops_windows.holt_forecast(df).collect()
    assert not [r for r in out if r["event_type"] == "single"]
    got = sorted([r for r in out if r["event_type"] == "a"], key=lambda r: r["hour"])
    lvl, trd = vals[0], vals[1] - vals[0]
    assert len(got) == len(vals) - 1
    for i, r in enumerate(got, start=1):
        fc = lvl + trd
        assert r["forecast"] == fc and r["actual"] == vals[i]
        assert r["error"] == vals[i] - fc
        prev = lvl
        lvl = 0.3 * vals[i] + (1.0 - 0.3) * (lvl + trd)
        trd = 0.1 * (lvl - prev) + (1.0 - 0.1) * trd


def test_holt_winters_matches_recurrence(spark):
    """NEW r15 (Winters 1960 additive seasonal): forecasts match a
    pure-python three-state recurrence bit-exactly over a 3-day hourly
    series with a planted daily profile; series shorter than two
    seasons emit nothing."""
    import datetime

    from datalake_local_spark.operators import windows as ops_windows

    base = datetime.datetime(2024, 5, 1)
    rows = []
    vals = []
    for t in range(72):
        v = 50.0 + (t % 24) * 0.5 + (t // 24) * 2.0 + (t % 7) * 0.01
        vals.append(round(v, 2))
        rows.append((t, base + datetime.timedelta(hours=t), 1, "a", round(v, 2), "{}"))
    rows.append((500, base, 1, "short", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = ops_windows.holt_winters_forecast(df).collect()
    assert not [r for r in out if r["event_type"] == "short"]
    got = sorted([r for r in out if r["event_type"] == "a"], key=lambda r: r["hour"])
    assert len(got) == 72 - 24
    # reference recurrence (identical op shapes)
    a_, b_, g_ = 0.3, 0.05, 0.2
    acc = 0.0
    for i in range(24):
        acc += vals[i]
    m1 = acc / 24
    acc = 0.0
    for i in range(24, 48):
        acc += vals[i]
    m2 = acc / 24
    lvl, trd = m1, (m2 - m1) / 24
    season = [vals[i] - m1 for i in range(24)]
    for j, t in enumerate(range(24, 72)):
        si = season[t % 24]
        lb = lvl + trd
        fc = lb + si
        r = got[j]
        assert r["forecast"] == fc and r["actual"] == vals[t]
        assert r["error"] == vals[t] - fc
        prev = lvl
        lvl = a_ * (vals[t] - si) + (1.0 - a_) * lb
        trd = b_ * (lvl - prev) + (1.0 - b_) * trd
        season[t % 24] = g_ * (vals[t] - lvl) + (1.0 - g_) * si


def test_hw_residual_ljung_box_matches_fold_reference(spark):
    """NEW r16 (r15 verdict #7): the Holt-Winters residual Ljung-Box
    diagnostics match a pure-python left-fold reference bit-exactly —
    mean, denominator and every lag cross-product are 0.0-init folds
    in series order, each rho one double division, Q one fixed tree.
    Short series (n_obs <= h) emit nothing; flags equal q > chi2."""
    import datetime

    from datalake_local_spark.operators import quality as ops_quality
    from datalake_local_spark.operators import windows as ops_windows

    base = datetime.datetime(2024, 5, 1)
    rows = []
    vals = []
    for t in range(96):
        v = 50.0 + (t % 24) * 0.5 + (t // 24) * 2.0 + ((t * 7) % 11) * 0.13
        vals.append(round(v, 2))
        rows.append((t, base + datetime.timedelta(hours=t), 1, "a", round(v, 2), "{}"))
    # sub-two-season series: HW emits nothing -> no diagnostics row
    # (an HW-emitting series always has >= 24 residuals, so the
    # n_obs > h guard is a belt-and-suspenders bound, never the gate)
    for t in range(47):
        rows.append((1000 + t, base + datetime.timedelta(hours=t), 1, "tiny", 1.0 + t * 0.01, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = ops_quality.hw_residual_ljung_box(df).collect()
    assert not [r for r in out if r["event_type"] == "tiny"]
    (got,) = [r for r in out if r["event_type"] == "a"]

    # reference: HW errors via the certified recurrence, then LB folds
    errs = [
        r["error"]
        for r in sorted(
            ops_windows.holt_winters_forecast(df).collect(),
            key=lambda r: (r["event_type"], r["hour"]),
        )
        if r["event_type"] == "a"
    ]
    n = len(errs)
    assert got["n_obs"] == n == 72
    acc = 0.0
    for e in errs:
        acc = acc + e
    m = acc / float(n)
    devs = [e - m for e in errs]
    den = 0.0
    for d in devs:
        den = den + d * d
    rhos = []
    for k in range(1, 7):
        num = 0.0
        for i in range(n - k):
            num = num + devs[i] * devs[i + k]
        rhos.append(num / den)
        assert got[f"rho_{k}"] == rhos[-1]
    nd = float(n)
    terms = rhos[0] * rhos[0] / (nd - 1)
    for k in range(2, 7):
        terms = terms + rhos[k - 1] * rhos[k - 1] / (nd - float(k))
    q = (nd * (nd + 2)) * terms
    assert got["q_stat"] == q
    assert got["lb_reject"] == (q > ops_quality._CHI2_95_DOF6)


def test_cross_series_correlation_exact_five_sum(spark):
    """NEW r16: pairwise Pearson over hourly series matches a
    pure-python exact-integer five-sum reference bit-exactly; a
    constant series is dropped by the exact integer variance guard,
    and a perfectly anti-correlated pair reports r == -1.0 exactly
    (num == -sqrt(dena)*sqrt(denb) in exact arithmetic)."""
    import datetime
    import math

    from datalake_local_spark.operators import quality as ops_quality

    base = datetime.datetime(2024, 6, 1)
    rows = []
    eid = [0]

    def ev(t, typ, val):
        eid[0] += 1
        rows.append((eid[0], t, 1, typ, val, "{}"))

    # series over 8 common hours: up = 1..8, down = 8..1 (anti),
    # noisy = something else, const = 5.0 always (zero variance)
    for h in range(8):
        t = base + datetime.timedelta(hours=h)
        ev(t, "up", float(h + 1))
        ev(t, "down", float(8 - h))
        ev(t, "noisy", float((h * 3) % 5 + 1))
        ev(t, "const", 5.0)
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {
        (r["type_a"], r["type_b"]): r
        for r in ops_quality.cross_series_correlation(df).collect()
    }
    # const pairs dropped by the exact variance guard
    assert not [k for k in out if "const" in k]
    assert out[("down", "up")]["pearson_r"] == -1.0
    assert out[("down", "up")]["n_hours"] == 8

    # pure-python exact five-sum reference for (noisy, up)
    xa = [((h * 3) % 5 + 1) * 100 for h in range(8)]  # cents
    xb = [(h + 1) * 100 for h in range(8)]
    n = 8
    sa, sb = sum(xa), sum(xb)
    sab = sum(p * q for p, q in zip(xa, xb))
    saa = sum(p * p for p in xa)
    sbb = sum(q * q for q in xb)
    num = n * sab - sa * sb
    dena = n * saa - sa * sa
    denb = n * sbb - sb * sb
    ref = float(num) / (math.sqrt(float(dena)) * math.sqrt(float(denb)))
    assert out[("noisy", "up")]["pearson_r"] == ref


def test_compaction_plan_ffd_invariants(spark):
    """NEW r16: the FFD compaction planner matches a pure-python
    first-fit-decreasing reference assignment exactly on a planted
    manifest, never overfills a bin (capacity = 2x largest file), and
    numbers bins densely from 1 in first-open order."""
    from datalake_local_spark import maintenance

    man = spark.createDataFrame(
        [("p", 1, 60), ("p", 2, 50), ("p", 3, 50), ("p", 4, 30),
         ("p", 5, 25), ("p", 6, 10), ("q", 1, 100)],
        "part string, file_id long, size_bytes long",
    )
    out = {
        (r["part"], r["file_id"]): r
        for r in maintenance.compaction_plan(man).collect()
    }
    # part p: cap = 120; FFD order 60,50,50,30,25,10
    # 60 -> bin1(rem 60); 50 -> bin1(rem 10); 50 -> bin2(rem 70);
    # 30 -> bin2(rem 40); 25 -> bin2(rem 15); 10 -> bin1(rem 0)
    expect = {1: 1, 2: 1, 3: 2, 4: 2, 5: 2, 6: 1}
    for fid, b in expect.items():
        assert out[("p", fid)]["bin_id"] == b, (fid, out[("p", fid)])
    assert out[("q", 1)]["bin_id"] == 1
    # no bin overfilled
    fills: dict = {}
    for (part, fid), r in out.items():
        fills.setdefault((part, r["bin_id"]), 0)
        fills[(part, r["bin_id"])] += r["size_bytes"]
    assert all(v <= 120 for k, v in fills.items() if k[0] == "p")


def test_kalman_level_matches_recurrence(spark):
    """NEW r16 (Kalman 1960 local level): filtered level, gain,
    innovation, and posterior variance match a pure-python
    predict/update recurrence bit-exactly; the gain decreases
    monotonically from the diffuse start toward the steady state; a
    one-point series emits nothing."""
    import datetime

    from datalake_local_spark.operators import windows as ops_windows

    base = datetime.datetime(2024, 7, 1)
    rows = []
    vals = [10.0, 12.5, 11.0, 14.25, 13.0, 15.75, 16.0, 14.5, 15.0, 13.75]
    for i, v in enumerate(vals):
        rows.append((i, base + datetime.timedelta(hours=i), 1, "a", v, "{}"))
    rows.append((100, base, 1, "single", 5.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = ops_windows.kalman_level_filter(df).collect()
    assert not [r for r in out if r["event_type"] == "single"]
    got = sorted([r for r in out if r["event_type"] == "a"], key=lambda r: r["hour"])
    assert len(got) == len(vals) - 1
    x, p = vals[0], 1.0
    gains = []
    for i, r in enumerate(got, start=1):
        p_pred = p + 0.01
        k = p_pred / (p_pred + 1.0)
        innov = vals[i] - x
        x = x + k * innov
        p = (1.0 - k) * p_pred
        assert r["actual"] == vals[i]
        assert r["innovation"] == innov
        assert r["gain"] == k
        assert r["filtered"] == x
        assert r["variance"] == p
        gains.append(k)
    assert all(gains[j] > gains[j + 1] for j in range(len(gains) - 1))


def test_croston_demand_matches_recurrence(spark):
    """NEW r16 (Croston 1972 intermittent demand): per-part rate
    forecasts match a pure-python two-state recurrence bit-exactly,
    gaps are calendar-month integers off the global anchor, and parts
    with a single demand month emit nothing."""
    import datetime

    from datalake_local_spark.operators import tpch as ops_tpch

    d = lambda y, m, day: datetime.datetime(y, m, day)  # noqa: E731
    # part 1: demands in months 0, 2, 3, 7 (gaps 2, 1, 4); two lines in
    # month 2 must sum; part 2: a single month -> no output. The global
    # anchor is 1995-01 (part 1's first month), so q1 for part 1 is 1
    # and part 2's absence is structural, not anchor-dependent.
    rows = [
        (1, d(1995, 1, 5), 10.0),
        (1, d(1995, 3, 9), 4.0),
        (1, d(1995, 3, 21), 6.0),
        (1, d(1995, 4, 2), 8.0),
        (1, d(1995, 8, 30), 20.0),
        (2, d(1995, 6, 1), 7.0),
    ]
    df = spark.createDataFrame(
        rows, "l_partkey long, l_shipdate timestamp, l_quantity double"
    )
    out = ops_tpch.croston_demand(df).collect()
    assert not [r for r in out if r["p_partkey"] == 2]
    got = sorted([r for r in out if r["p_partkey"] == 1], key=lambda r: r["month"])
    assert [(r["gap_months"], r["demand_qty"]) for r in got] == [
        (2, 10), (1, 8), (4, 20)
    ]
    alpha, one_a = 0.2, 1.0 - 0.2
    level, itv = 10.0, 1.0  # z1 = 10, q1 = idx0 + 1 = 1
    zs, gaps = [10.0, 8.0, 20.0], [2, 1, 4]
    for r, z, gap in zip(got, zs, gaps):
        assert r["rate_forecast"] == level / itv
        level = alpha * z + one_a * level
        itv = alpha * float(gap) + one_a * itv
        assert r["level"] == level
        assert r["smoothed_interval"] == itv


def test_skipping_report_matches_python_replay(spark):
    """NEW r16: file-skipping report equals a pure-python replay of the
    integer arithmetic (equal-width file ids, envelopes, half-open
    predicate windows, hit tests) on a scattered fixture; the clustered
    diagonal must out-skip the off-diagonal."""
    import datetime

    from datalake_local_spark.operators import layout as ops_layout

    t0 = datetime.datetime(2024, 3, 1)
    # ts deliberately NOT monotone in user_id: user = (7 * i) % 13
    rows = []
    for i in range(40):
        rows.append(
            (i, t0 + datetime.timedelta(minutes=3 * i + (i % 5)), (7 * i) % 13,
             "view", 1.0, "{}")
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r["layout"], r["pred"]): (
            r["n_files"], r["files_hit"], r["skip_rate"], r["rows_selected"]
        )
        for r in ops_layout.skipping_report(df).collect()
    }

    # naive datetimes are session-UTC in Spark; pin the replay to UTC
    # too (system-TZ independence)
    es = [
        int(r[1].replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
        for r in rows
    ]
    us = [r[2] for r in rows]
    min_e, max_e, min_u, max_u = min(es), max(es), min(us), max(us)
    span_e, span_u = max_e - min_e + 1, max_u - min_u + 1
    fid = {
        "by_ts": [min(63, (e - min_e) * 64 // span_e) for e in es],
        "by_user": [min(63, (u - min_u) * 64 // span_u) for u in us],
    }
    preds = {}
    for k in range(4):
        lo = min_e + k * span_e // 4
        preds[f"ts_{k}"] = ("ts", lo, lo + span_e // 16)
        lo_u = min_u + k * span_u // 4
        preds[f"user_{k}"] = ("user", lo_u, lo_u + span_u // 16)
    want = {}
    for lay in ("by_ts", "by_user"):
        env = {}
        for i in range(len(rows)):
            f = fid[lay][i]
            emin, emax, umin, umax = env.get(f, (es[i], es[i], us[i], us[i]))
            env[f] = (
                min(emin, es[i]), max(emax, es[i]),
                min(umin, us[i]), max(umax, us[i]),
            )
        nf = len(env)
        for pred, (fam, lo, hi) in preds.items():
            if fam == "ts":
                hit = sum(1 for (a, b, _, _) in env.values() if a < hi and b >= lo)
                sel = sum(1 for e in es if lo <= e < hi)
            else:
                hit = sum(1 for (_, _, c, d) in env.values() if c < hi and d >= lo)
                sel = sum(1 for u in us if lo <= u < hi)
            # Spark's round = HALF_UP on the shortest double repr; the
            # replay must mirror that, not Python's banker's rounding
            from decimal import ROUND_HALF_UP, Decimal

            rate = float(
                Decimal(repr((nf - hit) / nf)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
            want[(lay, pred)] = (nf, hit, rate, sel)
    assert got == want
    # the layout diagonal prunes, the off-diagonal does not
    ts_diag = sum(got[("by_ts", f"ts_{k}")][2] for k in range(4))
    ts_off = sum(got[("by_user", f"ts_{k}")][2] for k in range(4))
    assert ts_diag > ts_off


def test_newsvendor_stock_hand_computed(spark):
    """NEW r16: the CR=3/4 stock target is the exact order statistic
    k = ceil(3n/4) of monthly brand demand — hand-checked on a 5-month
    series (sorted demands 10, 20, 30, 40, 100: k = ceil(15/4) = 4 →
    target 40; mean 40.0 → safety stock 0.0)."""
    import datetime

    from datalake_local_spark.operators import tpch as ops_tpch

    d = lambda m: datetime.datetime(1995, m, 10)  # noqa: E731
    li = spark.createDataFrame(
        [
            (1, d(1), 30.0), (1, d(2), 10.0), (1, d(3), 100.0),
            (1, d(4), 40.0), (1, d(5), 20.0),
        ],
        "l_partkey long, l_shipdate timestamp, l_quantity double",
    )
    pt = spark.createDataFrame([(1, "B#1")], "p_partkey long, p_brand string")
    rows = ops_tpch.newsvendor_stock(li, pt).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["brand"], r["n_months"], r["total_qty"]) == ("B#1", 5, 200)
    assert r["stock_target_qty"] == 40
    assert r["mean_monthly_qty"] == 40.0
    assert r["safety_stock_qty"] == 0.0


def test_return_rate_wilson_ci_properties(spark):
    """NEW r16: Wilson interval vs INDEPENDENTLY hand-derived bounds
    (r16 review-pass fix: the first cut of this test re-evaluated the
    implementation's own formula and so verified nothing — it missed a
    z^4/(4n^2)-for-z^2/(4n^2) variance-term bug that widened the
    interval ~38%). For r=5, n=10, z=1.96: p=0.5, z2/n=0.38416,
    center=0.5, half = (1.96/1.38416)*sqrt(0.025 + 3.8416/400)
    = 0.2634104... -> (0.2365896, 0.7634104) to 7dp. Also: bounds stay in
    [0, 1] on a tiny n=2 sample (the buggy formula escaped to
    (-0.187, 1.187) there), and the low-volume brand's LOWER bound
    ranks below the high-volume brand's at the same point rate."""
    import math

    from datalake_local_spark.operators import tpch as ops_tpch

    import datetime
    d0 = datetime.datetime(1995, 1, 1)
    rows = []
    for i in range(10):
        rows.append((1, d0, 1.0, "R" if i < 5 else "N"))
    for i in range(1000):
        rows.append((2, d0, 1.0, "R" if i < 500 else "N"))
    rows.append((3, d0, 1.0, "R"))
    rows.append((3, d0, 1.0, "N"))
    li = spark.createDataFrame(
        rows, "l_partkey long, l_shipdate timestamp, l_quantity double, l_returnflag string"
    )
    pt = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "p_partkey long, p_brand string"
    )
    got = {r["brand"]: r for r in ops_tpch.return_rate_wilson_ci(li, pt).collect()}

    # hand-derived, NOT the implementation's expression: brand A
    a = got["A"]
    assert a["return_rate"] == 0.5
    assert abs(a["wilson_lo"] - 0.2365896) < 5e-7
    assert abs(a["wilson_hi"] - 0.7634104) < 5e-7
    # a second independent spelling of the correct formula
    def wilson(r, n, z=1.96):
        p = r / n
        denom = 1.0 + z * z / n
        center = (p + z * z / (2.0 * n)) / denom
        half = (z / denom) * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
        return center - half, center + half

    for brand, (r, n) in {"A": (5, 10), "B": (500, 1000), "C": (1, 2)}.items():
        lo, hi = wilson(r, n)
        row = got[brand]
        assert abs(row["wilson_lo"] - lo) < 1e-12 and abs(row["wilson_hi"] - hi) < 1e-12
        assert 0.0 <= row["wilson_lo"] <= row["return_rate"] <= row["wilson_hi"] <= 1.0
    assert got["A"]["wilson_lo"] < got["B"]["wilson_lo"]
    assert got["C"]["wilson_lo"] < got["A"]["wilson_lo"]


def test_behavior_entropy_hand_computed(spark):
    """NEW r16: user 1 splits 4 events over two hours (H = ln 2), user
    2 concentrates in one hour (H = 0, uniformity 0); the uniform user
    ranks more bot-like."""
    import datetime
    import math

    from datalake_local_spark.operators import windows as ops_windows

    t = lambda h, m: datetime.datetime(2024, 1, 1, h, m)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, t(9, 0), 1), (2, t(9, 30), 1), (3, t(14, 0), 1), (4, t(14, 5), 1),
            (5, t(9, 1), 2), (6, t(9, 2), 2), (7, t(9, 3), 2),
        ],
        "event_id long, ts timestamp, user_id long",
    )
    got = {r["user_id"]: r for r in ops_windows.user_behavior_entropy(ev).collect()}
    assert (got[1]["n_events"], got[1]["n_active_hours"]) == (4, 2)
    assert got[1]["entropy_nats"] == round(math.log(2), 6)
    assert got[1]["uniformity"] == round(math.log(2) / math.log(24), 6)
    assert (got[2]["n_events"], got[2]["n_active_hours"]) == (3, 1)
    assert got[2]["entropy_nats"] == 0.0 and not math.copysign(1, got[2]["entropy_nats"]) < 0
    assert got[2]["uniformity"] == 0.0 and not math.copysign(1, got[2]["uniformity"]) < 0
    assert got[1]["uniformity"] > got[2]["uniformity"]


def test_max_drawdown_hand_computed(spark):
    """NEW r16: path 10 -> 12 -> 7 -> 11 -> 4: peak 12, trough 4,
    drawdown 8.00 (800 cents), ratio 800/1200; a second flat series
    has drawdown 0 with the FIRST row as the tie-broken argmax."""
    import datetime

    from datalake_local_spark.operators import windows as ops_windows

    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, t(0), 1, "a", 10.0), (2, t(1), 1, "a", 12.0),
            (3, t(2), 1, "a", 7.0), (4, t(3), 1, "a", 11.0),
            (5, t(4), 1, "a", 4.0),
            (6, t(0), 1, "b", 5.0), (7, t(1), 1, "b", 5.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {r["event_type"]: r for r in ops_windows.max_drawdown(ev).collect()}
    a = got["a"]
    assert (a["peak_cents"], a["trough_cents"], a["drawdown_cents"]) == (1200, 400, 800)
    assert a["trough_event_id"] == 5
    assert a["drawdown_ratio"] == round(800 / 1200, 6)
    b = got["b"]
    assert (b["drawdown_cents"], b["trough_event_id"]) == (0, 6)


def test_eoq_hand_computed(spark):
    """NEW r16 (Harris 1913): D=400, S=100, H=2 -> EOQ = sqrt(40000)
    = 200 exactly; orders_per_horizon = 400/200 = 2.0."""
    import datetime

    from datalake_local_spark.operators import tpch as ops_tpch

    li = spark.createDataFrame(
        [(1, datetime.datetime(1995, 1, 1), 400.0)],
        "l_partkey long, l_shipdate timestamp, l_quantity double",
    )
    pt = spark.createDataFrame([(1, "B#1")], "p_partkey long, p_brand string")
    r = ops_tpch.economic_order_quantity(li, pt).collect()[0]
    assert (r["brand"], r["total_qty"]) == ("B#1", 400)
    assert r["eoq_qty"] == 200.0
    assert r["orders_per_horizon"] == 2.0


def test_croston_random_fixture_matches_recurrence(spark):
    """r16 hardening: 40 parts with seeded-random intermittent demand
    (random gaps 1-9 months, random integer quantities) — every emitted
    row must match the pure-python two-state recurrence bit-exactly,
    including the global-anchor q1 for parts that start late."""
    import datetime

    import numpy as np

    from datalake_local_spark.operators import tpch as ops_tpch

    rng = np.random.RandomState(42)
    rows = []
    series = {}
    for pk in range(1, 41):
        idx = 0 if pk == 1 else int(rng.randint(0, 12))  # part 1 anchors month 0
        pts = []
        for _ in range(int(rng.randint(1, 12))):
            q = int(rng.randint(1, 500))
            pts.append((idx, q))
            idx += int(rng.randint(1, 10))
        series[pk] = pts
        for m, q in pts:
            # split quantity across 1-3 lineitems inside the month
            parts = rng.multinomial(q, [1 / 3] * 3)
            for j, qq in enumerate(p for p in parts if p > 0):
                rows.append((pk, m, j, float(qq)))

    # month index -> real calendar month (add m months to 1995-01)
    def month_ts(m, j):
        y, mo = divmod(m, 12)
        return datetime.datetime(1995 + y, mo + 1, min(1 + j * 9, 28))

    rows = [(pk, month_ts(m, j), qq) for (pk, m, j, qq) in rows]
    df = spark.createDataFrame(
        rows, "l_partkey long, l_shipdate timestamp, l_quantity double"
    )
    got = {
        (r["p_partkey"], r["month"]): (
            r["gap_months"], r["demand_qty"], r["rate_forecast"],
            r["level"], r["smoothed_interval"],
        )
        for r in ops_tpch.croston_demand(df).collect()
    }
    alpha, one_a = 0.2, 1.0 - 0.2
    n_checked = 0
    for pk, pts in series.items():
        if len(pts) < 2:
            continue
        level = float(pts[0][1])
        itv = float(pts[0][0] + 1)
        prev_idx = pts[0][0]
        for m, q in pts[1:]:
            fc = level / itv
            gap = m - prev_idx
            level = alpha * float(q) + one_a * level
            itv = alpha * float(gap) + one_a * itv
            key = (pk, month_ts(m, 0).replace(day=1))
            k2 = [k for k in got if k[0] == pk and k[1].year == key[1].year
                  and k[1].month == key[1].month]
            assert len(k2) == 1, (pk, m)
            assert got[k2[0]] == (gap, q, fc, level, itv), (pk, m)
            prev_idx = m
            n_checked += 1
    assert n_checked > 50  # non-vacuous


def test_max_drawdown_random_fixture_matches_bruteforce(spark):
    """r16 hardening: seeded random walks per series — the windowed
    running-max drawdown must equal an O(n^2) brute-force max over all
    ordered (peak, trough) pairs, an INDEPENDENT algorithm."""
    import datetime

    import numpy as np

    from datalake_local_spark.operators import windows as ops_windows

    rng = np.random.RandomState(7)
    rows, eid = [], 0
    series = {}
    for name in ("w1", "w2", "w3"):
        vals = np.round(
            np.abs(np.cumsum(rng.randn(60)) * 10 + 100), 2
        ).tolist()
        series[name] = vals
        for i, v in enumerate(vals):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i),
                 1, name, float(v))
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r["event_type"]: r for r in ops_windows.max_drawdown(df).collect()}
    for name, vals in series.items():
        cents = [int(round(v * 100)) for v in vals]
        best, best_i = -1, None
        peak = cents[0]
        # brute force: for every j, drawdown vs max over prefix
        for j in range(len(cents)):
            dd = max(cents[: j + 1]) - cents[j]
            if dd > best:  # first occurrence wins ties (ts order)
                best, best_i = dd, j
        r = got[name]
        assert r["drawdown_cents"] == best, name
        assert r["trough_cents"] == cents[best_i], name
        assert r["peak_cents"] == max(cents[: best_i + 1]), name


# ---------------------------------------------------------------------------
# r17: shared-text oracle audit — the verbatim sql_* surface.
#
# The five sql_* queries execute ONE ANSI string on both engines, so the
# driver's hash gate certifies engine PARITY but is structurally blind to
# the string itself computing the wrong thing (the r16 Wilson z^4 lesson).
# Each test below runs the shared string against a tiny hand-crafted
# fixture and checks HAND-DERIVED expected rows (computed in pure python
# from the query's documented intent, never by re-evaluating the SQL).
# ---------------------------------------------------------------------------


def _with_fixture_views(spark, views):
    """Register fixture temp views (name -> (rows, schema)); caller must
    re-assert the real testdata views afterwards via load_tables."""
    for name, (rows, schema) in views.items():
        spark.createDataFrame(rows, schema).createOrReplaceTempView(name)


def test_sql_correlated_exists_hand_computed(spark):
    """_CORRELATED_SQL intent: customers having at least one order
    priced above 1.8x the global average order price, ordered by
    custkey, top 10. Fixture: avg = (100+200+300+1000)/4 = 400,
    threshold = 720 -> only customer 2 (order 1000) qualifies; customer
    4 has NO orders and must not appear even though EXISTS's subquery
    is empty for it."""
    import __spark_entry__ as em

    try:
        _with_fixture_views(
            spark,
            {
                "customer": (
                    [(1, "alice"), (2, "bob"), (3, "carol"), (4, "dave")],
                    "c_custkey long, c_name string",
                ),
                "orders": (
                    [(10, 1, 100.0), (11, 2, 200.0), (12, 3, 300.0), (13, 2, 1000.0)],
                    "o_orderkey long, o_custkey long, o_totalprice double",
                ),
            },
        )
        got = [tuple(r) for r in spark.sql(em._CORRELATED_SQL).collect()]
        assert got == [(2, "bob")]
    finally:
        load_tables(spark, SF_DIR)


def test_sql_lateral_topn_hand_computed(spark):
    """_LATERAL_SQL intent: per customer, the single most expensive
    order (ties broken by smaller orderkey); customers with no orders
    are dropped (comma-join LATERAL is inner). Fixture: customer 1 has
    a price tie at 80 between orderkeys 2 and 3 -> orderkey 2 wins;
    customer 3 has no orders -> absent."""
    import __spark_entry__ as em

    try:
        _with_fixture_views(
            spark,
            {
                "customer": ([(1,), (2,), (3,)], "c_custkey long"),
                "orders": (
                    [(1, 1, 50.0), (2, 1, 80.0), (3, 1, 80.0), (4, 2, 10.0)],
                    "o_orderkey long, o_custkey long, o_totalprice double",
                ),
            },
        )
        got = {tuple(r) for r in spark.sql(em._LATERAL_SQL).collect()}
        assert got == {(1, 2, 80.0), (2, 4, 10.0)}
    finally:
        load_tables(spark, SF_DIR)


def test_sql_named_window_hand_computed(spark):
    """_NAMED_WINDOW_SQL intent: per priority, rank orders by price
    desc (orderkey tie-break) and accumulate a running exact-cents sum
    in that same order; keep rank <= 5. Expectations derived by a pure
    python sort + cumulative sum over integer cents, including a price
    tie (70.50 at orderkeys 2 and 5 -> 2 ranks ahead) and a 6th row
    that must be cut."""
    import __spark_entry__ as em

    prices = {1: 20.00, 2: 70.50, 3: 60.25, 4: 50.00, 5: 70.50, 6: 40.00}
    # hand model: sort by (-price, orderkey), rank = position (no peer
    # ties because orderkey is in the ORDER BY), cents accumulate
    order = sorted(prices, key=lambda k: (-prices[k], k))
    assert order == [2, 5, 3, 4, 6, 1]
    cum, want = 0, []
    for pos, k in enumerate(order, start=1):
        cum += int(round(prices[k] * 100))
        if pos <= 5:
            want.append(("P", k, pos, cum))
    try:
        _with_fixture_views(
            spark,
            {
                "orders": (
                    [("P", k, v) for k, v in prices.items()],
                    "o_orderpriority string, o_orderkey long, o_totalprice double",
                ),
            },
        )
        got = [tuple(r) for r in spark.sql(em._NAMED_WINDOW_SQL).collect()]
        assert got == want
    finally:
        load_tables(spark, SF_DIR)


def test_sql_interactive_hand_computed(spark):
    """_INTERACTIVE_SQL intent: per nation name, distinct ordering
    customers and the rounded total order value. Fixture: nation X has
    customers 1 (two orders) and 2 (one order) -> 2 distinct customers,
    10.10 + 20.20 + 30.05 = 60.35; nation Y's customer 3 never orders
    -> Y absent (inner join); customer 4 of nation X never orders and
    must not count."""
    import __spark_entry__ as em

    try:
        _with_fixture_views(
            spark,
            {
                "nation": ([(0, "X"), (1, "Y")], "n_nationkey long, n_name string"),
                "customer": (
                    [(1, 0), (2, 0), (3, 1), (4, 0)],
                    "c_custkey long, c_nationkey long",
                ),
                "orders": (
                    [(10, 1, 10.10), (11, 1, 20.20), (12, 2, 30.05)],
                    "o_orderkey long, o_custkey long, o_totalprice double",
                ),
            },
        )
        got = [tuple(r) for r in spark.sql(em._INTERACTIVE_SQL).collect()]
        assert got == [("X", 2, 60.35)]
    finally:
        load_tables(spark, SF_DIR)


def test_ewma_chart_values_match_roberts_formula(spark):
    """r17 shared-text audit: the EWMA chart's flagged z and limit
    VALUES match a replay transcribed independently from Roberts 1959
    (z_t = (1-l)z_{t-1} + l*x_t from mu0; limits mu0 +/- L*sigma*
    sqrt(l/(2-l)*(1-(1-l)^{2t}))) — the existing test only checks
    detection timing/side, which a mis-transcribed variance term could
    survive (the Wilson z^4 class)."""
    import datetime
    import math

    from datalake_local_spark.operators import quality as ops_quality

    base = datetime.datetime(2024, 3, 1)
    vals = [10.0 + (i % 7) * 0.03 + (1.4 if i >= 50 else 0.0) for i in range(100)]
    rows = [
        (i, base + datetime.timedelta(hours=i), 1, "s", v, "{}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["hour"]: r for r in ops_quality.ewma_control_chart(df).collect()}
    assert got, "planted shift must alarm"

    lam, L = 0.2, 3.0
    burn = vals[:24]
    mu = sum(burn) / len(burn)
    sd = max(math.sqrt(sum((v - mu) ** 2 for v in burn) / len(burn)), 1e-12)
    z, want = mu, {}
    for t, x in enumerate(vals, start=1):
        z = (1.0 - lam) * z + lam * x
        hw = L * sd * math.sqrt(lam / (2.0 - lam) * (1.0 - (1.0 - lam) ** (2 * t)))
        if z > mu + hw or z < mu - hw:
            want[base + datetime.timedelta(hours=t - 1)] = (
                z, "high" if z > mu + hw else "low",
                mu + hw if z > mu + hw else mu - hw,
            )
    assert set(got) == set(want)
    for hour, (wz, wside, wlim) in want.items():
        r = got[hour]
        assert r["side"] == wside, hour
        assert abs(r["ewma_z"] - wz) < 1e-9, hour
        assert abs(r["violated_limit"] - wlim) < 1e-9, hour


def _zorder_skipping_replay_case(spark, t0):
    """Shared replay body for the two epochs below: the three-layout
    skipping report matches a pure-python replay whose Morton key is
    computed with its OWN bit loop (int bit ops, not the generated
    div/mod term sum the two engines share — the independent derivation
    the r17 shared-text audit requires), and the narrative invariant
    holds: by_zorder skips on BOTH predicate families while each
    single-column layout only skips on its own."""
    import datetime
    from decimal import ROUND_HALF_UP, Decimal

    from datalake_local_spark.operators import layout as ops_layout
    # enough distinct users (>= 64) that the user predicate family is
    # non-degenerate; ts NOT monotone in user
    rows = []
    for i in range(400):
        rows.append(
            (i, t0 + datetime.timedelta(minutes=3 * i + (i % 5)),
             (37 * i) % 101, "view", 1.0, "{}")
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r["layout"], r["pred"]): (r["n_files"], r["files_hit"], r["skip_rate"])
        for r in ops_layout.zorder_skipping_report(df).collect()
    }

    es = [
        int(r[1].replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
        for r in rows
    ]
    us = [r[2] for r in rows]
    min_e, max_e, min_u, max_u = min(es), max(es), min(us), max(us)
    span_e, span_u = max_e - min_e + 1, max_u - min_u + 1

    def morton(xv, yv):
        # independent transcription: interleave bit-by-bit with shifts
        z = 0
        for b in range(16):
            z |= ((xv >> b) & 1) << (2 * b)
            z |= ((yv >> b) & 1) << (2 * b + 1)
        return z

    fid = {"by_ts": [], "by_user": [], "by_zorder": []}
    for e, u in zip(es, us):
        fid["by_ts"].append(min(63, (e - min_e) * 64 // span_e))
        fid["by_user"].append(min(63, (u - min_u) * 64 // span_u))
        # ms-resolution Morton input (the r17 overflow fix), offset
        # BEFORE the ms floor-div (the r18 sign fix: e - min_e >= 0, so
        # Spark `div` and DuckDB `//` agree even for pre-1970 epochs)
        nx = ((e - min_e) // 1000) * 65535 // max(1, (max_e - min_e) // 1000)
        ny = (u - min_u) * 65535 // max(1, max_u - min_u)
        fid["by_zorder"].append(morton(nx, ny) // ((1 << 32) // 64))
    preds = {}
    for k in range(4):
        lo = min_e + k * span_e // 4
        preds[f"ts_{k}"] = ("ts", lo, lo + span_e // 16)
        lo_u = min_u + k * span_u // 4
        preds[f"user_{k}"] = ("user", lo_u, lo_u + span_u // 16)
    for lay in ("by_ts", "by_user", "by_zorder"):
        env = {}
        for i in range(len(rows)):
            f = fid[lay][i]
            emin, emax, umin, umax = env.get(f, (es[i], es[i], us[i], us[i]))
            env[f] = (
                min(emin, es[i]), max(emax, es[i]),
                min(umin, us[i]), max(umax, us[i]),
            )
        nf = len(env)
        for pred, (fam, lo, hi) in preds.items():
            if fam == "ts":
                hit = sum(1 for (a, b, _, _) in env.values() if a < hi and b >= lo)
            else:
                hit = sum(1 for (_, _, c, d) in env.values() if c < hi and d >= lo)
            sr = float(
                Decimal(repr((nf - hit) / nf)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
            assert got[(lay, pred)] == (nf, hit, sr), (lay, pred)

    # the certified narrative: zorder prunes on BOTH dimensions
    def mean_skip(lay, fam):
        vals = [got[(lay, p)][2] for p, (f, _, _) in preds.items() if f == fam]
        return sum(vals) / len(vals)

    assert mean_skip("by_ts", "ts") > 0.8 and mean_skip("by_ts", "user") < 0.3
    assert mean_skip("by_user", "user") > 0.8 and mean_skip("by_user", "ts") < 0.3
    assert mean_skip("by_zorder", "ts") > 0.5
    assert mean_skip("by_zorder", "user") > 0.5


def test_zorder_skipping_matches_python_replay(spark):
    import datetime

    _zorder_skipping_replay_case(spark, datetime.datetime(2024, 3, 1))


def test_zorder_skipping_pre1970_epochs_match_replay(spark):
    """r18 regression (r17 ADVICE): a fixture whose epoch micros are
    NEGATIVE (pre-1970). Raw-epoch prescale divided a negative value,
    where Spark `div` truncates toward zero but true floor-div (the
    replay, and DuckDB `//`) floors — silently shifting Morton keys.
    The offset-first prescale divides e - min_e >= 0, so both engines
    and the replay agree regardless of epoch sign."""
    import datetime

    _zorder_skipping_replay_case(spark, datetime.datetime(1969, 12, 25))


def test_betweenness_oracle_sigma_dp_braided_graph():
    """r18 (r17 ADVICE): the graph_betweenness oracle's sigma stage is
    now a per-LEVEL aggregated DP over the shortest-path DAG; this
    exercises it (same CTE shapes, injected edge table) on the exact
    adversarial structure the advice named — a braid of 30 chained
    diamonds, where sigma(head → tail) = 2^30, so the former
    one-row-per-path enumeration would materialize ~10^9 rows while the
    DP keeps sig at <= V^2 rows. Sigma values are checked per source
    against an independent pure-python Brandes BFS accumulation
    (Brandes 2001 alg. 1, a different algorithm)."""
    from collections import deque

    import duckdb

    K = 30  # diamonds; nodes 0..3K, V = 91
    und = []
    for k in range(K):
        a, b, c, d = 3 * k, 3 * k + 1, 3 * k + 2, 3 * (k + 1)
        und += [(a, b), (a, c), (b, d), (c, d)]

    con = duckdb.connect()
    con.execute("CREATE TABLE up(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO up VALUES (?, ?)", und)
    rows = con.execute(
        """
        WITH RECURSIVE edges0 AS (
            SELECT a AS s, b AS d FROM up UNION ALL SELECT b, a FROM up
        ),
        gnodes AS (SELECT DISTINCT s AS id FROM edges0),
        walk AS (
            SELECT id AS src, id AS node, 0 AS dist FROM gnodes
            UNION
            SELECT w.src, e.d AS node, w.dist + 1
            FROM walk w JOIN edges0 e ON e.s = w.node
            WHERE w.dist < 100
        ),
        sp AS (SELECT src, node, min(dist) AS dist FROM walk GROUP BY 1, 2),
        dag AS (
            SELECT su.src, e.s AS u, e.d AS v
            FROM edges0 e
            JOIN sp su ON su.node = e.s
            JOIN sp sv ON sv.src = su.src AND sv.node = e.d
                      AND sv.dist = su.dist + 1
        ),
        sig AS (
            SELECT id AS src, id AS node, CAST(1 AS BIGINT) AS sigma
            FROM gnodes
            UNION ALL
            SELECT l.src, d.v AS node, CAST(sum(l.sigma) AS BIGINT)
            FROM sig l JOIN dag d ON d.src = l.src AND d.u = l.node
            GROUP BY 1, 2
        )
        SELECT src, node, sigma FROM sig
        """
    ).fetchall()
    got = {(s, n): sig for s, n, sig in rows}

    n_nodes = 3 * K + 1
    assert len(rows) == n_nodes * n_nodes, "one sigma row per reachable pair"
    assert got[(0, 3 * K)] == 2**K, "braid end-to-end path count"

    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for s in adj:
        sigma = {s: 1}
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        for n, sg in sigma.items():
            assert got[(s, n)] == sg, (s, n)


def _xy2d_reference(bits, x, y):
    """Independent pure-python Hilbert index: the public xy2d loop
    transcribed with OWN bit ops (&, ^, shifts — not the div/mod CASE
    text the two engines share)."""
    n = 1 << bits
    d = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_hilbert_index_matches_pure_python_xy2d():
    """r18 audit-protocol test for the shared hilbert_chain text: the
    generated div/mod CASE chain, executed over every grid point, must
    equal an independent bit-op transcription of the public xy2d
    algorithm — and that reference must itself be a true Hilbert curve
    (bijective onto [0, 4^bits), consecutive indices grid-adjacent)."""
    import duckdb

    from datalake_local_spark.functions.hilbert import hilbert_chain

    for bits in (2, 4, 5):
        n = 1 << bits
        lvls, prev = [], "grid"
        for i, (d_sql, x_sql, y_sql) in enumerate(hilbert_chain(bits=bits, div="//")):
            lvls.append(
                f"lvl{i} AS (SELECT x0, y0, {x_sql} AS hx, {y_sql} AS hy,"
                f" {d_sql} AS hd FROM {prev})"
            )
            prev = f"lvl{i}"
        got = dict(
            duckdb.sql(
                f"""
                WITH grid AS (
                    SELECT a.x AS x0, b.y AS y0, a.x AS hx, b.y AS hy,
                           CAST(0 AS BIGINT) AS hd
                    FROM (SELECT unnest(range(0, {n})) AS x) a,
                         (SELECT unnest(range(0, {n})) AS y) b
                ),
                {','.join(lvls)}
                SELECT (x0, y0), hd FROM {prev}
                """
            ).fetchall()
        )
        ref = {}
        for x in range(n):
            for y in range(n):
                ref[(x, y)] = _xy2d_reference(bits, x, y)
        assert got == ref, bits
        # the reference is a true Hilbert curve
        inv = {d: xy for xy, d in ref.items()}
        assert sorted(inv) == list(range(n * n))  # bijective
        for d in range(n * n - 1):
            (x1, y1), (x2, y2) = inv[d], inv[d + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1, d  # unit steps


def test_hilbert_truncated_levels_match_full_prefix():
    """The prefix property the operator's 100 TB posture rests on: k
    chained levels produce the full index with its low 2(bits−k) bits
    zeroed, so file = hd div (4^bits / n_files) is bit-identical to the
    full chain whenever n_files <= 4^k. Checked against the independent
    python reference over the whole bits=6 grid."""
    import duckdb

    from datalake_local_spark.functions.hilbert import hilbert_chain

    bits, levels, n_files = 6, 2, 16  # n_files = 16 <= 4^2
    n = 1 << bits
    zdiv = (1 << (2 * bits)) // n_files
    lvls, prev = [], "grid"
    for i, (d_sql, x_sql, y_sql) in enumerate(
        hilbert_chain(bits=bits, div="//", levels=levels)
    ):
        lvls.append(
            f"lvl{i} AS (SELECT x0, y0, {x_sql} AS hx, {y_sql} AS hy,"
            f" {d_sql} AS hd FROM {prev})"
        )
        prev = f"lvl{i}"
    got = dict(
        duckdb.sql(
            f"""
            WITH grid AS (
                SELECT a.x AS x0, b.y AS y0, a.x AS hx, b.y AS hy,
                       CAST(0 AS BIGINT) AS hd
                FROM (SELECT unnest(range(0, {n})) AS x) a,
                     (SELECT unnest(range(0, {n})) AS y) b
            ),
            {','.join(lvls)}
            SELECT (x0, y0), hd FROM {prev}
            """
        ).fetchall()
    )
    mask = 1 << (2 * (bits - levels))
    for x in range(n):
        for y in range(n):
            full = _xy2d_reference(bits, x, y)
            assert got[(x, y)] == full - full % mask, (x, y)
            assert got[(x, y)] // zdiv == full // zdiv, (x, y)


def test_hilbert_skipping_matches_python_replay(spark):
    """r18 ("which curve" A/B closer): the two-curve skipping report
    matches a pure-python replay whose BOTH keys are computed with
    their own bit loops (shift/mask Morton interleave; bit-op xy2d
    Hilbert), and the narrative invariant holds: each curve layout
    skips a large fraction on BOTH predicate families."""
    import datetime
    from decimal import ROUND_HALF_UP, Decimal

    from datalake_local_spark.operators import layout as ops_layout

    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    for i in range(400):
        rows.append(
            (i, t0 + datetime.timedelta(minutes=3 * i + (i % 5)),
             (37 * i) % 101, "view", 1.0, "{}")
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r["layout"], r["pred"]): (r["n_files"], r["files_hit"], r["skip_rate"])
        for r in ops_layout.hilbert_skipping_report(df).collect()
    }

    es = [
        int(r[1].replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
        for r in rows
    ]
    us = [r[2] for r in rows]
    min_e, max_e, min_u, max_u = min(es), max(es), min(us), max(us)
    span_e, span_u = max_e - min_e + 1, max_u - min_u + 1

    def morton(xv, yv):
        z = 0
        for b in range(16):
            z |= ((xv >> b) & 1) << (2 * b)
            z |= ((yv >> b) & 1) << (2 * b + 1)
        return z

    zdiv = (1 << 32) // 64
    fid = {"by_zorder": [], "by_hilbert": []}
    for e, u in zip(es, us):
        nx = ((e - min_e) // 1000) * 65535 // max(1, (max_e - min_e) // 1000)
        ny = (u - min_u) * 65535 // max(1, max_u - min_u)
        fid["by_zorder"].append(morton(nx, ny) // zdiv)
        # the truncated engine chain == full-index floor-div (the
        # prefix property asserted above), so the replay uses the FULL
        # independent reference
        fid["by_hilbert"].append(_xy2d_reference(16, nx, ny) // zdiv)
    preds = {}
    for k in range(4):
        lo = min_e + k * span_e // 4
        preds[f"ts_{k}"] = ("ts", lo, lo + span_e // 16)
        lo_u = min_u + k * span_u // 4
        preds[f"user_{k}"] = ("user", lo_u, lo_u + span_u // 16)
    for lay in ("by_zorder", "by_hilbert"):
        env = {}
        for i in range(len(rows)):
            f = fid[lay][i]
            emin, emax, umin, umax = env.get(f, (es[i], es[i], us[i], us[i]))
            env[f] = (
                min(emin, es[i]), max(emax, es[i]),
                min(umin, us[i]), max(umax, us[i]),
            )
        nf = len(env)
        for pred, (fam, lo, hi) in preds.items():
            if fam == "ts":
                hit = sum(1 for (a, b, _, _) in env.values() if a < hi and b >= lo)
            else:
                hit = sum(1 for (_, _, c, d) in env.values() if c < hi and d >= lo)
            sr = float(
                Decimal(repr((nf - hit) / nf)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
            assert got[(lay, pred)] == (nf, hit, sr), (lay, pred)

    def mean_skip(lay, fam):
        vals = [got[(lay, p)][2] for p, (f, _, _) in preds.items() if f == fam]
        return sum(vals) / len(vals)

    for lay in ("by_zorder", "by_hilbert"):
        assert mean_skip(lay, "ts") > 0.5, lay
        assert mean_skip(lay, "user") > 0.5, lay


def test_pettitt_changepoint_matches_bruteforce(spark):
    """r18 Pettitt test: the O(n log n) W_t-recursion implementation
    matches the DEFINITIONAL O(n^2) double sum U_t = sum_{i<=t, j>t}
    sgn(x_j - x_i) computed in pure python on (a) a planted level
    shift — detected at the plant day — and (b) a flat series, where
    every U_t is 0 and the earliest-day tie-break pins the reported
    changepoint at t = 1."""
    import datetime as dt

    from datalake_local_spark.operators import quality

    base = dt.date(2024, 1, 1)
    # status X: level 100.xx for 15 days then 200.xx for 15 days
    # (deterministic wiggle so values are distinct but the shift
    # dominates); two orders per day to exercise the cents sum
    rows = []
    oid = 1
    daily = []
    for t in range(30):
        level = 100.0 if t < 15 else 200.0
        a = level + (t * 7 % 13) * 0.25
        b = level + (t * 11 % 17) * 0.125
        day = base + dt.timedelta(days=t)
        rows += [(oid, day, "X", a), (oid + 1, day, "X", b)]
        oid += 2
        daily.append((day, round(a * 100) + round(b * 1000) // 10))
    # status Y: flat (identical value every day, one order)
    for t in range(10):
        rows.append((oid, base + dt.timedelta(days=t), "Y", 50.0))
        oid += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_orderstatus string, o_totalprice double"
    )
    got = {
        r["status"]: r for r in quality.pettitt_changepoint(orders).collect()
    }

    # definitional brute force for X over exact integer daily cents
    xs = [c for _, c in daily]
    n = len(xs)
    u = [
        sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(t + 1)
            for j in range(t + 1, n)
        )
        for t in range(n - 1)
    ]
    k = max(abs(v) for v in u)
    t_star = min(t for t, v in enumerate(u) if abs(v) == k)
    rx = got["X"]
    assert rx["n_days"] == 30
    assert rx["k_stat"] == k
    assert rx["u_at_cp"] == u[t_star]
    assert rx["changepoint_day"] == daily[t_star][0]
    assert t_star == 14  # the plant: last low-level day (0-indexed)
    assert rx["n_before"] == 15 and rx["n_after"] == 15
    # daily revenue = two orders/day, so the day-grain means sit at ~2x
    # the per-order level
    assert 200.0 <= rx["mean_before"] < 210.0
    assert 400.0 <= rx["mean_after"] < 410.0
    # exact-integer HALF_UP mean check
    cb = sum(xs[:15])
    assert rx["mean_before"] == ((2 * cb + 15) // 30) / 100.0

    ry = got["Y"]
    assert ry["k_stat"] == 0
    assert ry["changepoint_day"] == base  # all-zero U -> earliest day


def test_mann_whitney_matches_bruteforce(spark):
    """r18 Mann-Whitney: the rank-sum implementation matches the
    DEFINITIONAL pair-count U (U1 = #{a > b} + ties/2, kept x2 as an
    integer) on a seeded fixture dense with ties, and z matches the
    tie-corrected formula computed in pure python. A shifted fixture
    must report 'shift'."""
    import math
    import random

    from datalake_local_spark.operators import quality

    rng = random.Random(42)
    # group A shifted up; coarse grid -> many ties within and across
    a_vals = [round(100 + rng.randint(0, 19) * 0.25, 2) for _ in range(80)]
    b_vals = [round(98 + rng.randint(0, 19) * 0.25, 2) for _ in range(70)]
    rows = [(i, "1-URGENT", v) for i, v in enumerate(a_vals)]
    rows += [(1000 + i, "5-LOW", v) for i, v in enumerate(b_vals)]
    rows += [(5000, "3-MEDIUM", 1.0)]  # must be excluded by the filter
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    got = quality.mann_whitney_u(orders).collect()[0]

    ac = [round(v * 100) for v in a_vals]
    bc = [round(v * 100) for v in b_vals]
    u1_x2 = sum(
        2 * (x > y) + (x == y) for x in ac for y in bc
    )
    n1, n2 = len(ac), len(bc)
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert got["u1_x2"] == u1_x2
    assert got["u2_x2"] == 2 * n1 * n2 - u1_x2
    from collections import Counter
    ties = Counter(ac + bc)
    tie_cubes = sum(t**3 - t for t in ties.values())
    n = n1 + n2
    bracket = (n + 1) * n * (n - 1) - tie_cubes
    assert got["var_bracket"] == bracket
    var_u = (n1 * n2) * float(bracket) / (12.0 * (n * (n - 1)))
    z = (u1_x2 - n1 * n2) / (2.0 * math.sqrt(var_u))
    assert got["z"] == round(z, 4) + 0.0
    assert got["verdict"] == "shift"  # the planted +2 shift at n=150


def test_runs_test_matches_bruteforce(spark):
    """r18 runs test: R, n1, n2 and z match a pure-python replay on
    (a) a planted ALTERNATING series (maximal runs -> 'alternating'),
    (b) a planted two-regime series (2 runs -> 'clustered'), with the
    exact x2-median (even-n two-middle-sum) and median-equal-day drops
    exercised."""
    import datetime as dt
    import math

    from datalake_local_spark.operators import quality

    base = dt.date(2024, 1, 1)
    rows, oid = [], 1
    # status A: alternate 10.00 / 20.00 for 24 days (even n, median 15
    # -> x2 = 3000, no drops, runs = 24)
    for t in range(24):
        rows.append((oid, base + dt.timedelta(days=t), "A",
                     10.0 if t % 2 == 0 else 20.0))
        oid += 1
    # status B: 12 low days then 12 high days + one day ON the median
    # boundary? -> use 25 days: 12 low (10.00), 1 middle (15.00),
    # 12 high (20.00); odd n -> median 15.00 -> the middle day drops,
    # runs = 2 over 24 kept days
    for t in range(25):
        v = 10.0 if t < 12 else (15.0 if t == 12 else 20.0)
        rows.append((oid, base + dt.timedelta(days=t), "B", v))
        oid += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_orderstatus string, o_totalprice double"
    )
    got = {r["status"]: r for r in quality.runs_test(orders).collect()}

    def zref(n1, n2, r):
        n = n1 + n2
        mu = 2 * n1 * n2 / n + 1.0
        var = (2 * n1 * n2) * (2 * n1 * n2 - n) / (n * n) / (n - 1)
        return round((r - mu) / math.sqrt(var), 4) + 0.0

    a = got["A"]
    assert (a["n1"], a["n2"], a["r_runs"]) == (12, 12, 24)
    assert a["z"] == zref(12, 12, 24)
    assert a["verdict"] == "alternating"

    b = got["B"]
    assert (b["n1"], b["n2"], b["r_runs"]) == (12, 12, 2)
    assert b["z"] == zref(12, 12, 2)
    assert b["verdict"] == "clustered"


def test_mann_whitney_zero_variance_null_z_both_engines(spark):
    """r19 (r18 advice #1): when every pooled value is identical the
    tie bracket is 0 and var_u vanishes — both the Spark side and the
    DuckDB oracle must publish NULL z and 'no_shift' (previously Spark
    NULLed via Divide while the oracle's double division produced
    inf/NaN — a cross-engine seam on degenerate input)."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as em
    from datalake_local_spark.operators import quality

    rows = [(i, "1-URGENT" if i < 5 else "5-LOW", 100.0) for i in range(9)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    got = quality.mann_whitney_u(orders).collect()[0]
    assert got["var_bracket"] == 0
    assert got["z"] is None
    assert got["verdict"] == "no_shift"

    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(rows, columns=["o_orderkey", "o_orderpriority", "o_totalprice"]),
    )
    oz, ov = con.execute(
        f"SELECT z, verdict FROM ({em.oracle_sql()['dq_mann_whitney']})"
    ).fetchall()[0]
    assert oz is None and ov == "no_shift"


def test_runs_test_zero_variance_null_z_both_engines(spark):
    """r19 (r18 advice #2): n1 = n2 = 1 makes 2*n1*n2 == n, so the
    runs-test variance is 0 — both engines must publish NULL z and
    NULL verdict instead of divide-by-zero inf vs NULL."""
    import datetime as dt

    import duckdb
    import pandas as pd

    import __spark_entry__ as em
    from datalake_local_spark.operators import quality

    base = dt.date(2024, 1, 1)
    rows = [
        (1, base, "A", 10.0),
        (2, base + dt.timedelta(days=1), "A", 20.0),
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderdate date, o_orderstatus string, o_totalprice double",
    )
    got = quality.runs_test(orders).collect()[0]
    assert (got["n1"], got["n2"], got["r_runs"]) == (1, 1, 2)
    assert got["z"] is None and got["verdict"] is None

    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            rows,
            columns=["o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice"],
        ),
    )
    oz, ov = con.execute(
        f"SELECT z, verdict FROM ({em.oracle_sql()['dq_runs_test']})"
    ).fetchall()[0]
    assert oz is None and ov is None


def test_welch_ttest_degenerate_null_stats_both_engines(spark):
    """r19 proactive (the mann_whitney guard class): a single event
    type leaves an EMPTY complement (n2 = 0 — the oracle's integer //
    divides by zero) and a 1-row group zeroes a variance denominator;
    both engines must publish NULL mean_rest/t/df/sig, identically."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as em
    from datalake_local_spark.operators import quality

    rows = [(i, "only_type", 100.0 + i) for i in range(5)]
    events = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    got = quality.ab_welch_ttest(events).collect()[0]
    assert got["n_group"] == 5 and got["mean_group"] == 102.0
    assert got["mean_rest"] is None and got["t_stat"] is None
    assert got["welch_df"] is None and got["nominal_sig"] is None

    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(rows, columns=["event_id", "event_type", "value"]),
    )
    orow = con.execute(
        f"SELECT mean_rest, t_stat, welch_df, nominal_sig FROM "
        f"({em.oracle_sql()['dq_ab_ttest']})"
    ).fetchall()[0]
    assert orow == (None, None, None, None)

    # two constant sides: se2 = 0 -> NULL t on both engines
    rows2 = [(i, "a" if i < 4 else "b", 50.0) for i in range(8)]
    events2 = spark.createDataFrame(
        rows2, "event_id long, event_type string, value double"
    )
    for r in quality.ab_welch_ttest(events2).collect():
        assert r["t_stat"] is None and r["welch_df"] is None
    con2 = duckdb.connect()
    con2.register(
        "events",
        pd.DataFrame(rows2, columns=["event_id", "event_type", "value"]),
    )
    for oz in con2.execute(
        f"SELECT t_stat, welch_df FROM ({em.oracle_sql()['dq_ab_ttest']})"
    ).fetchall():
        assert oz == (None, None)


def test_cramers_v_single_level_dimension_null_both_engines(spark):
    """r19 proactive: a one-status corpus makes min(r-1, c-1) = 0 for
    the priority x status pair — chi2 is exactly 0 and V must be NULL
    (not NaN) on both engines; the year pair in the same run stays
    well-defined."""
    import datetime as dt

    import duckdb
    import pandas as pd

    import __spark_entry__ as em
    from datalake_local_spark.operators import quality

    rows = [
        (i, "P1" if i % 2 == 0 else "P2", "F",
         dt.date(2023 + i % 2, 1, 1 + i), 10.0 + i)
        for i in range(8)
    ]
    schema = ("o_orderkey long, o_orderpriority string, o_orderstatus string,"
              " o_orderdate date, o_totalprice double")
    orders = spark.createDataFrame(rows, schema)
    got = {r["pair"]: r for r in quality.cramers_v_screen(orders).collect()}
    ps = got["priority_x_status"]
    assert ps["c"] == 1 and ps["chi2"] == 0.0 and ps["cramers_v"] is None
    py = got["priority_x_year"]
    assert py["cramers_v"] is not None

    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(rows, columns=[
            "o_orderkey", "o_orderpriority", "o_orderstatus",
            "o_orderdate", "o_totalprice"]),
    )
    orows = {r[0]: r for r in con.execute(
        f"SELECT pair, cramers_v FROM ({em.oracle_sql()['dq_cramers_v']})"
    ).fetchall()}
    assert orows["priority_x_status"][1] is None
    assert orows["priority_x_year"][1] is not None


def test_ljung_box_constant_series_null_not_crash(spark):
    """r19 proactive: a constant daily series zeroes the deviation
    denominator — previously an ANSI DIVIDE_BY_ZERO; now NULL rho/Q,
    matching the oracle's x/0 -> NULL."""
    import datetime as dt

    from datalake_local_spark.operators import quality

    base = dt.date(2024, 1, 1)
    rows = [(i, base + dt.timedelta(days=i), 100.0) for i in range(10)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    got = quality.ljung_box_test(orders).collect()[0]
    assert got["n_days"] == 10
    assert got["rho_1"] is None and got["q_stat"] is None


def test_cuped_single_user_arm_null_variance_not_crash(spark):
    """r19 proactive: a 1-user arm zeroes n(n-1) — the unguarded
    var_post integer div and the var_y condition evaluation both
    crashed under ANSI; now the arm publishes NULL variance columns
    while multi-user arms stay fully populated."""
    import datetime as dt

    from datalake_local_spark.operators import quality

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # md5-parity arms: users 0/1/3/6 land in arm A, user 2 in arm B
    # (computed from the operator's own md5 bucket rule) -> arm B has
    # exactly ONE user
    for u in (0, 1, 3, 6):
        rows.append((u, t0, 10.0 + u))
        rows.append((u, t0 + dt.timedelta(days=40), 20.0 + u))
    rows.append((2, t0, 5.0))
    rows.append((2, t0 + dt.timedelta(days=40), 7.0))
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    out = {r["arm"]: r for r in quality.cuped_adjustment(events).collect()}
    b = out["B"]
    assert b["n_users"] == 1
    assert b["var_post"] is None and b["var_cuped"] is None
    assert b["var_reduction"] is None
    a = out["A"]
    assert a["n_users"] == 4 and a["var_post"] is not None


def test_batch_drift_empty_side_null_not_crash(spark):
    """r19 proactive: every doc below the split leaves the new side
    with COUNT 0 (otherwise(0) side sums) — the share divisions
    crashed under ANSI; now the ratio metrics publish NULL."""
    from datalake_local_spark.operators import quality

    docs = spark.createDataFrame(
        [(i, "text here", "en", "s", 9) for i in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r["metric"]: r for r in quality.batch_drift_report(
        docs, split=250
    ).collect()}
    assert rows["row_count"]["new_value"] == 0.0
    assert rows["null_text_rate"]["new_value"] is None


def test_regression_family_degenerate_groups_null_not_crash(spark):
    """r19 proactive: a 1-row group (covar_s n-1 div) and a
    constant-quantity group (dxx = 0 slope/r2 div) both crashed under
    ANSI; now NULL stats, matching the oracle's x/0 -> NULL."""
    from datalake_local_spark.operators import aggregates as agg

    rows = [
        ("A", 5.0, 100.0),                 # 1-row group
        ("B", 3.0, 50.0), ("B", 3.0, 60.0),  # constant qty, dxx = 0
        ("C", 1.0, 10.0), ("C", 2.0, 20.0),  # healthy group
    ]
    li = spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double, l_extendedprice double"
    )
    out = {r["l_returnflag"]: r for r in agg.regression_family(li).collect()}
    assert out["A"]["slope"] is None and out["A"]["covar_s"] is None
    assert out["B"]["slope"] is None and out["B"]["r2"] is None
    assert out["B"]["pearson_r"] is None
    assert out["B"]["covar_s"] is not None  # n = 2: defined (zero)
    assert out["C"]["slope"] is not None and out["C"]["r2"] is not None


def test_higher_moments_constant_group_null_not_crash(spark):
    """r19 proactive: a constant-price group zeroes m2 — standardized
    moments crashed/NaN'd; now NULL skew/kurt with stddev 0, and tiny
    groups NULL the sample-corrected variants (n-2 / n-3 guards)."""
    from datalake_local_spark.operators import aggregates as agg

    rows = [("K", 100.0)] * 6 + [("L", 10.0), ("L", 20.0), ("L", 30.0)]
    li = spark.createDataFrame(rows, "l_returnflag string, l_extendedprice double")
    out = {r["l_returnflag"]: r for r in agg.higher_moment_family(li).collect()}
    k = out["K"]
    assert k["stddev_pop"] == 0.0
    assert k["skew_pop"] is None and k["kurt_excess_samp"] is None
    l = out["L"]  # noqa: E741
    assert l["skew_pop"] is not None
    assert l["kurt_excess_samp"] is None  # n = 3 <= 3


def test_price_histogram_constant_prices_single_bin(spark):
    """r19 proactive: hi == lo zeroed the bin width (ANSI crash); all
    rows land in bin 0 on both engines."""
    from datalake_local_spark.operators import aggregates as agg

    orders = spark.createDataFrame(
        [(i, 42.0) for i in range(7)], "o_orderkey long, o_totalprice double"
    )
    out = agg.price_histogram(orders).collect()
    assert len(out) == 1 and out[0]["bin"] == 0 and out[0]["n_orders"] == 7


def test_levene_matches_bruteforce_and_flags_unequal(spark):
    """r19 Brown-Forsythe: W matches a pure-python replay (exact x2
    medians, integer deviations, ANOVA F) on a seeded 5-group fixture
    with planted unequal spreads -> 'unequal' decision; the F cutoff
    is independently derived from the published chi2(0.95, 4) value."""
    import random
    from statistics import median

    from datalake_local_spark.operators import quality

    assert quality._F95[4] == round(9.487729 / 4, 4)  # chi2 table pin

    rng = random.Random(7)
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT", "5-LOW"]
    rows, vals = [], {}
    for gi, p in enumerate(prios):
        spread = (gi + 1) * 7  # planted unequal spreads
        vs = [round(500 + rng.randint(-spread, spread) * 0.25, 2)
              for _ in range(40 + gi)]
        vals[p] = [round(v * 100) for v in vs]
        rows += [(len(rows) + i, p, v) for i, v in enumerate(vs)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    got = quality.levene_variance_screen(orders).collect()[0]

    devs = {
        p: [abs(2 * c - round(2 * median(cs))) for c in cs]
        for p, cs in vals.items()
        for cs in [cs]
    }
    k = len(devs)
    n = sum(len(d) for d in devs.values())
    s_all = sum(sum(d) for d in devs.values())
    q_all = sum(sum(x * x for x in d) for d in devs.values())
    ssb_part = sum(sum(d) ** 2 / len(d) for d in devs.values())
    ssb = ssb_part - s_all * s_all / n
    ssw = q_all - ssb_part
    w = ((n - k) / (k - 1)) * (ssb / ssw)
    assert (got["k"], got["n_total"]) == (k, n)
    assert got["w_stat"] == round(w, 4) + 0.0
    assert got["unequal_at_05"] == (round(w, 4) >= 2.3719)
    assert got["unequal_at_05"] is True  # the planted spread gradient


def test_jarque_bera_matches_bruteforce(spark):
    """r19 Jarque-Bera: skew/kurtosis/JB match a pure-python
    definitional replay (central moments over exact cents) on a seeded
    two-class fixture — one near-uniform class (platykurtic, JB driven
    by negative excess kurtosis) and one spiked class (heavy skew ->
    'non-normal'); a constant class publishes all-NULL stats."""
    import random

    from datalake_local_spark.operators import quality

    assert quality._CHI2_95_DOF2 == 5.9915  # chi2(0.95, 2) table pin

    rng = random.Random(11)
    rows = []
    uni = [round(100 + rng.randint(0, 400) * 0.25, 2) for _ in range(60)]
    spiked = [10.0] * 55 + [5000.0] * 5
    for v in uni:
        rows.append((len(rows), "1-URGENT", v))
    for v in spiked:
        rows.append((len(rows), "5-LOW", v))
    rows.append((len(rows), "3-MEDIUM", 77.0))  # 1-row class -> NULLs
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    got = {r["priority"]: r for r in quality.jarque_bera_screen(orders).collect()}

    def ref(vals):
        cs = [round(v * 100) for v in vals]
        n = len(cs)
        mean = sum(cs) / n
        m2 = sum(c * c for c in cs) / n - mean * mean
        m3 = (sum(c**3 for c in cs) / n - 3 * mean * sum(c * c for c in cs) / n
              + 2 * mean**3)
        m4 = (sum(c**4 for c in cs) / n - 4 * mean * sum(c**3 for c in cs) / n
              + 6 * mean * mean * sum(c * c for c in cs) / n - 3 * mean**4)
        g1 = m3 / m2**1.5
        g2 = m4 / (m2 * m2) - 3.0
        return round(g1, 4) + 0.0, round(g2, 4) + 0.0, round(
            n * (g1 * g1 / 6.0 + g2 * g2 / 24.0), 4) + 0.0

    for prio, vals in (("1-URGENT", uni), ("5-LOW", spiked)):
        s, k, jb = ref(vals)
        r = got[prio]
        assert (r["skew"], r["kurt_excess"], r["jb_stat"]) == (s, k, jb), prio
        assert r["non_normal_at_05"] == (jb >= 5.9915)
    assert got["5-LOW"]["non_normal_at_05"] is True  # planted spike
    m = got["3-MEDIUM"]
    assert (m["skew"], m["jb_stat"], m["non_normal_at_05"]) == (
        None, None, None)


def test_levene_cutoff_table_and_k3_decision(spark):
    """r20 (r19 advice #2): the F cutoff is looked up by the COMPUTED
    k-1, not hard-wired to dof 4. The _F95 table is independently
    pinned against published chi2(0.95, d) quantiles (Abramowitz &
    Stegun 26.8; large-sample F(0.95; d, inf) = chi2(0.95, d)/d), and
    a 3-group fixture with planted unequal spreads gets the dof-2
    cutoff — previously a silent NULL — identically on both engines."""
    import random

    import duckdb
    import pandas as pd

    import __spark_entry__ as em
    from datalake_local_spark.operators import quality

    chi2_95 = {  # published chi2(0.95, d) quantiles, 6dp
        1: 3.841459, 2: 5.991465, 3: 7.814728, 4: 9.487729,
        5: 11.070498, 6: 12.591587, 7: 14.067140, 8: 15.507313,
        9: 16.918978,
    }
    assert set(quality._F95) == set(chi2_95)
    for d, q in chi2_95.items():
        assert quality._F95[d] == round(q / d, 4), d

    rng = random.Random(13)
    rows = []
    for gi, p in enumerate(["A", "B", "C"]):
        spread = (gi + 1) * 9
        for _ in range(35 + gi):
            rows.append((len(rows), p,
                         round(500 + rng.randint(-spread, spread) * 0.25, 2)))
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    got = quality.levene_variance_screen(orders).collect()[0]
    assert got["k"] == 3 and got["w_stat"] is not None
    assert got["unequal_at_05"] == (got["w_stat"] >= quality._F95[2])
    assert got["unequal_at_05"] is True  # planted spread gradient

    con = duckdb.connect()
    con.register("orders", pd.DataFrame(
        rows, columns=["o_orderkey", "o_orderpriority", "o_totalprice"]))
    oz = con.execute(
        f"SELECT w_stat, unequal_at_05 FROM ({em.oracle_sql()['dq_levene']})"
    ).fetchall()[0]
    assert oz == (got["w_stat"], got["unequal_at_05"])


def test_levene_degenerate_null_both_engines(spark):
    """r19: single group (k = 1), all-1-row groups (N = k), and
    all-constant groups (SSW = 0) publish NULL W/decision on BOTH
    engines — guards built in from the start (the ANSI audit class)."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as em
    from datalake_local_spark.operators import quality

    fixtures = {
        "single-group": [(i, "1-URGENT", 100.0 + i) for i in range(5)],
        "all-1-row": [(i, p, 100.0 + i) for i, p in enumerate(["A", "B", "C"])],
        "all-constant": [(i, "A" if i < 4 else "B", 77.0) for i in range(8)],
    }
    for name, rows in fixtures.items():
        orders = spark.createDataFrame(
            rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
        )
        got = quality.levene_variance_screen(orders).collect()[0]
        assert got["w_stat"] is None and got["unequal_at_05"] is None, name

        con = duckdb.connect()
        con.register("orders", pd.DataFrame(
            rows, columns=["o_orderkey", "o_orderpriority", "o_totalprice"]))
        oz = con.execute(
            f"SELECT w_stat, unequal_at_05 FROM ({em.oracle_sql()['dq_levene']})"
        ).fetchall()[0]
        assert oz == (None, None), name


def test_cluster_writers_reject_empty_input(spark, tmp_path):
    """r19 (r18 advice #4): both clustering writers raise a descriptive
    ValueError on an empty input instead of a TypeError from NULL
    bounds arithmetic."""
    import pytest

    from datalake_local_spark import maintenance

    empty = spark.createDataFrame([], "x long, y long")
    with pytest.raises(ValueError, match="empty"):
        maintenance.write_zordered(empty, str(tmp_path / "z"), "x", "y")
    with pytest.raises(ValueError, match="empty"):
        maintenance.write_hilbert_clustered(empty, str(tmp_path / "h"), "x", "y")
