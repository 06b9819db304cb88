"""Product-analytics operators over the events stream: funnel conversion,
cohort retention, and the remaining ranking-function family
(percent_rank / cume_dist / nth_value). The query shapes an events table
exists to answer.

Scale notes: funnel and retention both reduce events to one row per
(user, stage/day) BEFORE any join — the shuffles carry user-grain rows,
not raw events; conversion windows are applied as join predicates on the
already-reduced sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def funnel_click_to_purchase(events: DataFrame, within_hours: int = 1) -> DataFrame:
    """Two-stage funnel: per user, first click and whether a purchase
    followed within the window; rolled up to funnel totals."""
    first_click = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click_ts"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    # micros-precision delay window (cast('long') truncates to seconds
    # and would diverge from the oracle on sub-second timestamps)
    max_delay = within_hours * 3600 * 1_000_000
    converted = (
        first_click.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("first_click_ts"))
            & (
                F.unix_micros(F.col("p_ts").cast("timestamp"))
                - F.unix_micros(F.col("first_click_ts").cast("timestamp"))
                <= max_delay
            ),
            "left_semi",
        )
    )
    return first_click.agg(
        F.count("*").alias("n_clicked"),
    ).join(converted.agg(F.count("*").alias("n_converted"))).select(
        "n_clicked",
        "n_converted",
        F.round(F.col("n_converted") / F.col("n_clicked"), 6).alias("conversion_rate"),
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention: users grouped by first-active day, counted by
    day-offset of later activity. Events reduce to distinct (user, day)
    first; the cohort join is user-grain."""
    user_days = events.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    cohorts = user_days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        user_days.join(cohorts, "user_id")
        .withColumn(
            "day_offset",
            F.datediff(F.col("day").cast("date"), F.col("cohort_day").cast("date")),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


def ranking_distribution_functions(orders: DataFrame) -> DataFrame:
    """The remaining ranking family: percent_rank, cume_dist, nth_value —
    per customer over price order."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice"), F.col("o_orderkey"))
    frame = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(frame).alias("cheapest_key"),
        F.last("o_orderkey").over(frame).alias("priciest_key"),
        F.nth_value("o_orderkey", 2).over(frame).alias("second_cheapest_key"),
    )


def collect_sorted_arrays(orders: DataFrame) -> DataFrame:
    """Deterministic collection aggregates: sorted distinct arrays —
    collect_set order is nondeterministic, so sort before exposing."""
    return orders.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.size(F.collect_set("o_custkey")).alias("n_customers"),
    )


def sequence_pattern_counts(events: DataFrame) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern detection (Spark has no
    native row-pattern operator): per user, events collapse into an
    ordered type string (one char per event type) and regex classifiers
    run over it — 'did a click eventually convert', 'error directly
    after purchase', longest click streak. One (user)-keyed shuffle;
    the per-user sequence string is bounded by the user's event count;
    patterns evaluate JVM-side (regexp), no UDF."""
    first_letter = F.substring(F.col("event_type"), 1, 1)
    seq = (
        events.select("user_id", "ts", "event_id", first_letter.alias("c"))
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "c"))
                ), lambda s: s["c"])
            ).alias("seq")
        )
    )
    return seq.select(
        "user_id",
        F.length("seq").alias("n_events"),
        F.col("seq").rlike("c.*p").alias("click_then_purchase"),
        F.col("seq").rlike("pe").alias("error_right_after_purchase"),
        F.length(F.regexp_extract("seq", "(c+)", 1)).alias("first_click_streak"),
    )


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix between event types: for each
    observed (event_type → next event_type) pair within a user's
    time-ordered stream, the transition count and probability — the
    behavioral-model summary (next-event prediction baselines, anomaly
    detection on improbable transitions).

    Scale shape: the lead() window partitions by user_id (user-grain,
    never global); the matrix itself is |types|² rows, so the final
    probability window over event_type is a handful of rows per
    partition. Ties inside a user's stream order by (ts, event_id) for
    determinism."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    w_type = W.partitionBy("event_type")
    return pairs.select(
        "event_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(w_type), 6
        ).alias("prob"),
    )


def stickiness_profile(events: DataFrame) -> DataFrame:
    """DAU/WAU stickiness per day — the engagement ratio every product
    dashboard tracks (what share of the weekly-active base shows up on
    a given day). Naive SQL writes WAU as count(DISTINCT user) over a
    7-day RANGE window, which holds per-frame distinct state and dies
    at scale; the scalable identity: collapse events to (user, day)
    grain FIRST, then each (user, day) row contributes that user to
    the WAU of days [day, day+6] — a bounded ×7 explode at user-day
    grain, orders of magnitude below event grain, then two exact
    count-distinct aggregates keyed by day (calendar-bounded output).

    Only days with actual activity are emitted (inner join of the DAU
    and WAU series), so the trailing 6-day echo past the last event is
    dropped. Counts are exact integers; stickiness is one
    ratio-of-ints double → deterministic across engines."""
    ud = events.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("day"),
    )
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau").cast("double"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


def touch_attribution(events: DataFrame, lookback_days: int = 7) -> DataFrame:
    """First-touch vs last-touch revenue attribution: every purchase is
    credited to the user's first (resp. most recent) click-or-view
    touchpoint inside a ``lookback_days`` window, the two canonical
    single-touch models of marketing analytics; purchases with no
    touchpoint in the window land in an explicit ``none`` bucket so the
    models always partition total purchase revenue.

    Plan shape: purchases LEFT JOIN touches is an equi-join on
    user_id with the time window as a residual range predicate —
    Catalyst hash-partitions both sides on user_id, so the quadratic
    blow-up is bounded by per-user activity in the window, never the
    table; the two attribution picks are row_number windows
    PARTITIONED by purchase (no global window), and the final rollup
    is a map-side-combined groupBy on a 2×3-value key space.

    Determinism: counts are exact integers; revenue is summed in
    integer cents (DECIMAL, exact on both engines, r9 class rules);
    attribution picks break timestamp ties by event_id."""
    touches = events.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("touch_type"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        (F.col("value").cast("decimal(18,2)") * 100).alias("cents"),
    )
    joined = purchases.join(
        touches,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_ts") <= F.col("ts"))
        & (F.col("t_ts") >= F.col("ts") - F.expr(f"INTERVAL {lookback_days} DAYS")),
        "left",
    )
    w_last = W.partitionBy("event_id").orderBy(
        F.col("t_ts").desc(), F.col("t_id").desc()
    )
    w_first = W.partitionBy("event_id").orderBy(
        F.col("t_ts").asc_nulls_last(), F.col("t_id").asc_nulls_last()
    )
    picked = joined.select(
        "event_id",
        "cents",
        F.coalesce(F.col("touch_type"), F.lit("none")).alias("touch_type"),
        F.row_number().over(w_last).alias("rn_last"),
        F.row_number().over(w_first).alias("rn_first"),
    )
    last = picked.filter(F.col("rn_last") == 1).select(
        F.lit("last_touch").alias("model"), "touch_type", "event_id", "cents"
    )
    first = picked.filter(F.col("rn_first") == 1).select(
        F.lit("first_touch").alias("model"), "touch_type", "event_id", "cents"
    )
    return (
        last.unionAll(first)
        .groupBy("model", "touch_type")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum(F.col("cents").cast("decimal(38,0)")).cast("long").alias("revenue_cents"),
        )
        .orderBy("model", "touch_type")
    )


def growth_accounting(events: DataFrame) -> DataFrame:
    """Weekly growth accounting — every active user classified as NEW
    (first week ever), RETAINED (also active the immediately preceding
    week), or RESURRECTED (returning after ≥1 skipped week), plus the
    CHURNED count (active last week, absent this week) — the standard
    startup-metrics decomposition (new + retained + resurrected =
    active; churned closes the balance against last week's actives).

    Plan: collapse to the distinct user-week grain first (the
    stickiness_profile move — everything downstream is user-week, not
    event, scale), one lag window PARTITIONED BY USER for the state
    machine, then week-grain conditional counts; churned is last
    week's active count minus this week's retained, via a week-grain
    self-join (a ~|weeks| relation, broadcastable anywhere). The
    active count is new + retained + resurrected BY CONSTRUCTION
    (every active user-week is in exactly one state), so the whole
    query is ONE distinct shuffle of events — no second aggregate
    branch re-scanning the table.

    Weeks with no activity at all emit no row (the activity-days
    contract shared with stickiness_profile). All-integer output."""
    uw = events.select(
        "user_id",
        F.to_date(F.date_trunc("week", F.col("ts"))).alias("week"),
    ).distinct()
    w = W.partitionBy("user_id").orderBy("week")
    states = uw.withColumn("prev_week", F.lag("week").over(w)).select(
        "week",
        F.when(F.col("prev_week").isNull(), "new")
        .when(F.col("prev_week") == F.date_sub(F.col("week"), 7), "retained")
        .otherwise("resurrected")
        .alias("state"),
    )
    counts = states.groupBy("week").agg(
        F.sum(F.when(F.col("state") == "new", 1).otherwise(0)).cast("long").alias("n_new"),
        F.sum(F.when(F.col("state") == "retained", 1).otherwise(0)).cast("long").alias("n_retained"),
        F.sum(F.when(F.col("state") == "resurrected", 1).otherwise(0)).cast("long").alias("n_resurrected"),
    )
    prev_active = counts.select(
        F.date_add(F.col("week"), 7).alias("week"),
        (F.col("n_new") + F.col("n_retained") + F.col("n_resurrected")).alias(
            "prev_active"
        ),
    )
    return (
        counts.join(prev_active, "week", "left")
        .select(
            "week",
            "n_new",
            "n_retained",
            "n_resurrected",
            (F.coalesce(F.col("prev_active"), F.lit(0)) - F.col("n_retained"))
            .cast("long")
            .alias("n_churned"),
        )
        .orderBy("week")
    )


def survival_km(events: DataFrame, horizon_hours: int = 72) -> DataFrame:
    """Kaplan–Meier time-to-conversion curve (Kaplan & Meier 1958):
    every SIGNUP event is a subject; the event is the user's first
    PURCHASE strictly after it; subjects with no purchase inside
    ``horizon_hours`` (or truncated by the data window) are right-
    CENSORED at their observed horizon. Output per distinct duration
    hour: at-risk count, conversions, censorings, the discrete hazard
    (bps, integer division), and the KM survival estimate
    S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ).

    Next-purchase lookup is ONE user-partitioned range-frame window
    (min purchase epoch over RANGE 1 FOLLOWING..∞ — strictly-after
    semantics without a per-user theta join); the life table is a
    duration-grain aggregate. The two unpartitioned cumulative windows
    run over ≤ horizon_hours+1 rows — bounded by the HORIZON CONSTANT,
    not the data (the calendar-spine exception to the no-global-window
    rule).

    Determinism: counts/hazard are exact integers. The KM product is
    an exact DECIMAL(18,12) sum of per-row round(ln((n−d)/n), 12)
    factors (order-invariant), exp'd and rounded once at the end —
    the same quantized-log discipline as the certified logprob
    queries; ln/exp of off-grid irrationals round 6dp-safely. A row
    where everyone remaining converts (n = d) pins survival to 0.0
    explicitly (ln(0) guard; structurally only possible at the last
    row).

    Timestamps are compared at MICROSECOND precision (unix_micros /
    epoch_us) — whole-second truncation would make 'strictly after'
    drop a conversion landing in the same second as its signup, the
    same-timestamp hazard funnel_click_to_purchase documents."""
    ep = events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("ep")
    )
    w_next = (
        W.partitionBy("user_id")
        .orderBy("ep")
        .rangeBetween(1, W.unboundedFollowing)
    )
    with_next = ep.withColumn(
        "next_p",
        F.min(F.when(F.col("event_type") == "purchase", F.col("ep"))).over(w_next),
    )
    end = ep.agg(F.max("ep").alias("end_ep"))
    h_us = horizon_hours * 3_600_000_000
    subjects = (
        with_next.filter(F.col("event_type") == "signup")
        .crossJoin(F.broadcast(end))
        .select(
            F.when(
                F.col("next_p").isNotNull()
                & (F.col("next_p") - F.col("ep") <= F.lit(h_us)),
                1,
            )
            .otherwise(0)
            .alias("converted"),
            F.when(
                F.col("next_p").isNotNull()
                & (F.col("next_p") - F.col("ep") <= F.lit(h_us)),
                F.expr("(next_p - ep) div 3600000000"),
            )
            .otherwise(
                F.expr(f"least(cast({h_us} as bigint), end_ep - ep) div 3600000000")
            )
            .cast("int")
            .alias("duration_hours"),
        )
    )
    grid = subjects.groupBy("duration_hours").agg(
        F.sum("converted").cast("long").alias("n_converted"),
        F.sum(1 - F.col("converted")).cast("long").alias("n_censored"),
    )
    w_desc = (
        W.orderBy(F.col("duration_hours").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_asc = (
        W.orderBy("duration_hours")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    risked = grid.withColumn(
        "n_risk",
        F.sum(F.col("n_converted") + F.col("n_censored")).over(w_desc).cast("long"),
    )
    factored = risked.withColumn(
        "lf",
        F.when(
            F.col("n_converted") < F.col("n_risk"),
            F.round(
                F.log(
                    (F.col("n_risk") - F.col("n_converted"))
                    / F.col("n_risk").cast("double")
                ),
                12,
            ).cast("decimal(18,12)"),
        ),
    )
    return (
        factored.withColumn("cum_lf", F.sum("lf").over(w_asc))
        .select(
            "duration_hours",
            "n_risk",
            "n_converted",
            "n_censored",
            F.expr("(10000 * n_converted) div n_risk").cast("long").alias("hazard_bps"),
            F.when(F.col("n_converted") == F.col("n_risk"), F.lit(0.0))
            .otherwise(F.round(F.exp(F.col("cum_lf").cast("double")), 6))
            .alias("survival"),
        )
        .orderBy("duration_hours")
    )


def path_trigrams(events: DataFrame, top_k: int = 20) -> DataFrame:
    """Top user-journey paths: the most frequent ordered TRIPLES of
    consecutive event types per user (the 'view > click > purchase'
    journey-mining table product analytics builds sankeys from —
    pair-grain transitions are events_transition_matrix; trigrams add
    the turn-by-turn context that distinguishes 'error after click'
    from 'error after signup').

    One user-partitioned window (total order: ts, then event_id for
    same-timestamp determinism) produces both lags in a single pass;
    the path rollup is path-grain with map-side combine; top-k by
    (count DESC, path ASC) is a bounded sort. All-integer counts."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.lag("event_type", 2).over(w).alias("e1"),
            F.lag("event_type", 1).over(w).alias("e2"),
            F.col("event_type").alias("e3"),
        )
        .filter(F.col("e1").isNotNull() & F.col("e2").isNotNull())
        .select(
            F.concat_ws(" > ", "e1", "e2", "e3").alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), "path")
        .limit(top_k)
    )


def retention_matrix_weekly(events: DataFrame) -> DataFrame:
    """The weekly cohort-retention TRIANGLE with exact-bps rates — the
    canonical growth table (cohort week × weeks-since-first-active →
    share of the cohort still active) that ``retention_cohorts``'s raw
    day-offset counts feed but don't finish: rates need the cohort
    size denominator and a stable week grain.

    Week identity is the engine-portable anchored integer
    ``floor(datediff(day, 1970-01-05) / 7)`` (a Monday anchor — floor,
    not div, so pre-anchor dates agree across engines; never
    date_trunc('week') locale rules), reconstructed to a date for the
    report; retention is exact integer basis points
    ``(10000·n_active) div cohort_size``.

    Scale shape: events collapse to distinct (user, week) first — the
    one shuffle that matters — then cohort assignment is a user-grain
    min() window-free groupBy + join-back, and the triangle is a
    (cohort, age)-grain map-side-combined count with the age-0 row as
    its own denominator (broadcast join at cohort grain). No window,
    no skew surface beyond user activity."""
    day = F.date_trunc("day", F.col("ts")).cast("date")
    # F.floor, never a truncating cast: pre-anchor timestamps make the
    # index negative, where truncation (Spark) and floor (DuckDB //)
    # diverge — the signed-division rule
    week_idx = F.floor(
        F.datediff(day, F.lit("1970-01-05").cast("date")) / 7
    ).cast("long")
    # user_weeks (the heavy distinct shuffle) and the bounded triangle
    # are each consumed by 2+ canonically-different subtrees —
    # materialize once (the label_separation rule)
    user_weeks = (
        events.select("user_id", week_idx.alias("week_idx"))
        .distinct()
        .localCheckpoint()
    )
    cohorts = user_weeks.groupBy("user_id").agg(
        F.min("week_idx").alias("cohort_idx")
    )
    triangle = (
        user_weeks.join(cohorts, "user_id")
        .groupBy(
            "cohort_idx",
            (F.col("week_idx") - F.col("cohort_idx")).alias("age_weeks"),
        )
        .agg(F.count("*").alias("n_active"))
        .localCheckpoint()
    )
    sizes = triangle.filter(F.col("age_weeks") == 0).select(
        "cohort_idx", F.col("n_active").alias("cohort_size")
    )
    return (
        triangle.join(F.broadcast(sizes), "cohort_idx")
        .select(
            F.date_add(
                F.lit("1970-01-05").cast("date"),
                (F.col("cohort_idx") * 7).cast("int"),
            ).alias("cohort_start"),
            F.col("age_weeks").cast("long").alias("age_weeks"),
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.expr("(10000 * n_active) div cohort_size").alias("retention_bps"),
        )
        .orderBy("cohort_start", "age_weeks")
    )
