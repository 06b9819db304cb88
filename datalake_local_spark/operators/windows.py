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


def _hourly_exact_mean(events: DataFrame) -> DataFrame:
    """(event_type, hour, mean_value): the PARITY-CRITICAL hourly mean
    every sequential-recursion operator (Holt, Holt-Winters, Kalman,
    EWMA chart, CUSUM, LTTB) starts from — ONE division of exact
    integers (cents sum / 100n), so both engines compute the identical
    double regardless of aggregation order. Single source of truth
    (r16 review find: four verbatim copies had accreted; a decimal-
    width change missed at one site would silently red an oracle)."""
    return events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.expr(
            "cast(sum(cast(cast(value as decimal(18,2)) * 100 as long)) as double)"
            " / cast(count(1) * 100 as double)"
        ).alias("mean_value")
    )


def holt_forecast(
    events: DataFrame, alpha: float = 0.3, beta: float = 0.1
) -> DataFrame:
    """Holt's linear-trend exponential smoothing (Holt 1957/2004,
    "Forecasting seasonals and trends by exponentially weighted moving
    averages", IJF reprint — public): per event_type, the hourly
    mean-value series carries a smoothed level and trend
    (l_t = αx_t + (1−α)(l_{t−1}+b_{t−1});
    b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}; l₁ = x₁, b₁ = x₂−x₁) and each
    row reports the ONE-STEP-AHEAD forecast made at t−1
    (ŷ_t = l_{t−1}+b_{t−1}) with its error — the capacity-planning /
    anomaly-baseline forecaster a metrics store runs over every series
    (the SPC trio flags shifts; this one predicts the next hour). The
    first NEW operator of the forecasting family alongside
    theil_sen/seasonal-index trend screens.

    Sequential two-state recursion per series → the cusum/lttb Arrow
    kernel discipline over the (type, hour) pre-aggregate.
    Bit-deterministic cross-engine (the events_cusum toolbox): hourly
    mean is one division of exact integers; the recursion is the same
    correctly-rounded op sequence (1−α / 1−β COMPUTED, matching
    python); values published UNROUNDED; the DuckDB oracle replays the
    two-state recursion O(n) with a recursive CTE. Series shorter than
    2 points emit nothing (no trend is definable)."""
    import numpy as np
    import pandas as pd

    one_a = 1.0 - alpha
    one_b = 1.0 - beta

    hourly = _hourly_exact_mean(events)

    def kernel(key, pdf):
        pdf = pdf.sort_values("hour").reset_index(drop=True)
        x = pdf["mean_value"].to_numpy(dtype=np.float64)
        n = len(x)
        if n < 2:
            return pd.DataFrame(
                columns=["event_type", "hour", "forecast", "actual", "error"]
            )
        lvl = x[0]
        trd = x[1] - x[0]
        rows = []
        for i in range(1, n):
            fc = lvl + trd
            rows.append(
                (key[0], pdf["hour"].iloc[i], float(fc), float(x[i]),
                 float(x[i] - fc))
            )
            prev = lvl
            lvl = alpha * x[i] + one_a * (lvl + trd)
            trd = beta * (lvl - prev) + one_b * trd
        return pd.DataFrame(
            rows, columns=["event_type", "hour", "forecast", "actual", "error"]
        )

    return hourly.groupBy("event_type").applyInPandas(
        kernel,
        "event_type string, hour timestamp, forecast double, "
        "actual double, error double",
    )


def holt_winters_forecast(
    events: DataFrame,
    alpha: float = 0.3,
    beta: float = 0.05,
    gamma: float = 0.2,
    period: int = 24,
) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal forecasting (Winters 1960,
    "Forecasting Sales by Exponentially Weighted Moving Averages",
    Management Science — public): level + trend + a ``period``-slot
    seasonal profile per event_type over the hourly mean series — the
    daily-seasonality forecaster (period=24) that Holt's method
    (events_holt_forecast) cannot express. Each row from the second
    season on reports the one-step-ahead forecast
    ŷ_t = (l+b) + s_{t−period} and its error.

    Init convention (documented, deliberately simple): l = mean of
    season 1, b = (mean of season 2 − mean of season 1)/period,
    s_i = x_i − l over season 1 — all explicit left folds. Recursion:
    l' = α(x−s) + (1−α)(l+b); b' = β(l'−l) + (1−β)b;
    s' = γ(x−l') + (1−γ)s.

    Sequential three-state recursion per series → the cusum Arrow
    kernel discipline. Bit-deterministic cross-engine (the events_cusum
    toolbox; all 1−α/β/γ COMPUTED): the DuckDB oracle replays it with a
    recursive CTE whose state carries the seasonal profile as a
    24-double LIST, rewritten per step by slice concatenation. Series
    shorter than two seasons emit nothing."""
    import numpy as np
    import pandas as pd

    one_a = 1.0 - alpha
    one_b = 1.0 - beta
    one_g = 1.0 - gamma

    hourly = _hourly_exact_mean(events)

    def kernel(key, pdf):
        pdf = pdf.sort_values("hour").reset_index(drop=True)
        x = pdf["mean_value"].to_numpy(dtype=np.float64)
        n = len(x)
        cols = ["event_type", "hour", "forecast", "actual", "error"]
        if n < 2 * period:
            return pd.DataFrame(columns=cols)
        acc = 0.0
        for i in range(period):
            acc = acc + x[i]
        m1 = acc / period
        acc = 0.0
        for i in range(period, 2 * period):
            acc = acc + x[i]
        m2 = acc / period
        lvl = m1
        trd = (m2 - m1) / period
        season = [x[i] - m1 for i in range(period)]
        rows = []
        for t in range(period, n):
            si = season[t % period]
            lb = lvl + trd
            fc = lb + si
            rows.append(
                (key[0], pdf["hour"].iloc[t], float(fc), float(x[t]),
                 float(x[t] - fc))
            )
            prev = lvl
            lvl = alpha * (x[t] - si) + one_a * lb
            trd = beta * (lvl - prev) + one_b * trd
            season[t % period] = gamma * (x[t] - lvl) + one_g * si
        return pd.DataFrame(rows, columns=cols)

    return hourly.groupBy("event_type").applyInPandas(
        kernel,
        "event_type string, hour timestamp, forecast double, "
        "actual double, error double",
    )


def interpolate_hourly(events: DataFrame) -> DataFrame:
    """Time-series gap fill with LINEAR interpolation: per event_type, an
    hourly grid between the series' first and last hour; hours with
    observations carry their exact fixed-point average (the _AVG_E4
    cents discipline from ``semantic.ohlcv_daily`` — float averaging
    diverges between engines at decimal ties), and empty hours
    interpolate linearly between the nearest observed hours on both
    sides (edge gaps stay NULL rather than extrapolate).

    Shapes: the observed aggregate is (type, hour) grain; the grid is
    built with sequence() from each type's min/max (one tiny per-type
    row exploded — never a driver loop); the fill uses two
    ignoreNulls window passes (last_value backward, first_value
    forward) partitioned BY TYPE — at 100 TB a single series' grid is
    bounded by hours-per-year × years, so the per-type window partition
    is small by construction even when the events table is not.
    Interpolation arithmetic is a single deterministic expression over
    exact inputs (integer e4 values and epoch seconds) → hash oracle."""
    cents = F.round(F.col("value") * 100).cast("long")
    hourly = (
        events.select(
            F.col("event_type").alias("series"),
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            cents.alias("cents"),
        )
        .groupBy("series", "hour")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("sum_cents"))
        .select(
            "series",
            "hour",
            F.expr("(sum_cents * 200 + n) div (2 * n)").alias("avg_e4"),
        )
    )
    spine = (
        hourly.groupBy("series")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "series",
            F.explode(
                F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    grid = spine.join(hourly, ["series", "hour"], "left")
    w = W.partitionBy("series").orderBy("hour")
    prev_v = F.last("avg_e4", ignorenulls=True).over(
        w.rowsBetween(W.unboundedPreceding, 0)
    )
    prev_h = F.last(F.when(F.col("avg_e4").isNotNull(), F.col("hour")), ignorenulls=True).over(
        w.rowsBetween(W.unboundedPreceding, 0)
    )
    next_v = F.first("avg_e4", ignorenulls=True).over(
        w.rowsBetween(0, W.unboundedFollowing)
    )
    next_h = F.first(F.when(F.col("avg_e4").isNotNull(), F.col("hour")), ignorenulls=True).over(
        w.rowsBetween(0, W.unboundedFollowing)
    )
    staged = grid.select(
        "series",
        "hour",
        "avg_e4",
        prev_v.alias("pv"),
        next_v.alias("nv"),
        (F.unix_timestamp(F.col("hour")) - F.unix_timestamp(prev_h)).alias("k"),
        (F.unix_timestamp(next_h) - F.unix_timestamp(prev_h)).alias("m"),
    )
    # exact BIGINT fixed-point (half-up at e6): float interpolation would
    # tie at the 6th decimal for rational fractions like k/m = 1/200 and
    # Spark/DuckDB disagree on tie direction; integer arithmetic is
    # engine-independent by construction (nonnegative values only —
    # Spark div truncates, DuckDB // floors)
    value_e6 = F.when(F.col("avg_e4").isNotNull(), F.col("avg_e4") * 100).otherwise(
        F.when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.expr("((pv * (m - k) + nv * k) * 200 + m) div (2 * m)"),
        )
    )
    return staged.select(
        "series",
        "hour",
        F.col("avg_e4").isNotNull().alias("observed"),
        (value_e6 / 1000000.0).alias("value"),
    )


def lttb_downsample(events: DataFrame, n_out: int = 50) -> DataFrame:
    """Largest-Triangle-Three-Buckets time-series downsampling
    (Steinarsson 2013, "Downsampling Time Series for Visual
    Representation", U. Iceland MSc thesis — public): per event_type,
    reduce the (ts, value) series to ``n_out`` points that preserve
    visual shape — both endpoints always survive, and each interior
    bucket keeps the point forming the largest triangle with the
    previously kept point and the next bucket's centroid, which is what
    keeps spikes and inflections that uniform striding would erase (the
    standard dashboard-rendering step in front of a 100 TB metrics
    store).

    LTTB is inherently sequential per series (each choice depends on the
    previous kept point), so it runs as an Arrow-batched
    ``applyInPandas`` kernel per event_type — the sanctioned Python
    path for per-unit sequential algorithms (``chunk_documents_rolling_
    hash`` discipline). Scale shape: one events scan, one shuffle on
    event_type (series-grain task state: that series' points — the same
    per-series boundedness every window in this module assumes); series
    too large for one task would pre-aggregate to a finer grid first
    (``interpolate_hourly``'s (type, hour) grain) before LTTB.

    Deterministic: ties in triangle area resolve to the EARLIEST point
    (strict > comparison), timestamps order totally within a series.
    Series with ≤ n_out points pass through unchanged.

    Oracle-checked (r15, converted from rows-only) — the events_cusum
    bit-determinism discipline applied to the greedy selection: bucket
    bounds are PURE INTEGER arithmetic (1 + (i·(n-2)) div (n_out-2) —
    np.linspace's float grid is not SQL-reproducible), next-bucket
    centroids are explicit left-fold means, x is the int64 epoch-ns
    converted once to double (correctly rounded in both engines), and
    each candidate's triangle area is an identical elementwise op
    sequence — so a DuckDB recursive CTE replays pick-for-pick,
    hash-exact."""
    import numpy as np
    import pandas as pd

    def kernel(key, pdf):
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            keep = np.arange(n)
        else:
            x = pdf["ts"].astype("int64").to_numpy(dtype=np.float64)
            y = pdf["value"].to_numpy(dtype=np.float64)
            keep_list = [0]
            # n_out-1 integer bucket bounds over interior points 1..n-2
            bounds = [
                1 + (i * (n - 2)) // (n_out - 2) for i in range(n_out - 1)
            ]
            prev = 0
            for b in range(n_out - 2):
                lo, hi = bounds[b], bounds[b + 1]
                nxt_lo, nxt_hi = (
                    (bounds[b + 1], bounds[b + 2])
                    if b + 2 <= n_out - 2
                    else (n - 1, n)
                )
                # explicit left-fold means (the cusum discipline: numpy
                # mean uses 8-way partial accumulators, not a fold)
                sx = 0.0
                sy = 0.0
                for j in range(nxt_lo, nxt_hi):
                    sx = sx + x[j]
                    sy = sy + y[j]
                cx = sx / (nxt_hi - nxt_lo)
                cy = sy / (nxt_hi - nxt_lo)
                xs, ys = x[lo:hi], y[lo:hi]
                area = np.abs(
                    (x[prev] - cx) * (ys - y[prev]) - (x[prev] - xs) * (cy - y[prev])
                )
                pick = lo + int(area.argmax())  # argmax: first max = earliest
                keep_list.append(pick)
                prev = pick
            keep_list.append(n - 1)
            keep = np.array(keep_list)
        out = pdf.iloc[keep][["event_type", "ts", "value"]].copy()
        out["point_index"] = keep.astype("int64")
        return out

    series = events.select("event_id", "event_type", "ts", "value")
    return (
        series.groupBy("event_type")
        .applyInPandas(
            kernel, "event_type string, ts timestamp, value double, point_index long"
        )
    )


def cusum_changepoints(
    events: DataFrame, k_sigma: float = 0.5, h_sigma: float = 5.0
) -> DataFrame:
    """CUSUM change-point detection per series (Page 1954, "Continuous
    Inspection Schemes", Biometrika — the classic sequential test): per
    event_type, the hourly mean-value series is scanned with two-sided
    cumulative sums S⁺/S⁻ (drift allowance ``k_sigma``·σ, alarm at
    ``h_sigma``·σ). Calibration is the classical IN-CONTROL convention:
    μ/σ come from the series' first 24 hours (the burn-in), not the
    whole series — retrospective global calibration would fold the
    shifted regime into μ and alarm on the PRE-shift data in the wrong
    direction. An alarm emits the hour, direction and statistic, then
    the sums reset — the standard "did the metric level shift?" monitor
    over a 100 TB event stream's rollups.

    The recursion S⁺_t = max(0, S⁺_{t-1} + x_t - k) is inherently
    sequential per series → Arrow-batched ``applyInPandas`` kernel (the
    ``lttb_downsample`` discipline); the input is the (type, hour)
    pre-aggregate — series-grain task state, corpus never enters the
    kernel. Deterministic: fixed calibration, total hour order.

    Oracle-checked (r15, converted from rows-only) — every float in the
    chain is made BIT-DETERMINISTIC cross-engine so a DuckDB recursive
    CTE can replay the alarms hash-exact: (1) the hourly mean is ONE
    double division of exact integers (2dp cents sum / (100·n)) — never
    an engine-ordered float avg; (2) calibration uses explicit LEFT
    FOLDS (numpy's reducers use 8-way partial accumulators below the
    pairwise threshold, which no SQL engine reproduces); (3) the
    recursion is the same correctly-rounded op sequence both engines
    (greatest/max, identical parenthesization); (4) sqrt is IEEE
    correctly rounded; the emitted stat is one division, published
    UNROUNDED (bit-identical doubles hash exactly; rounding would
    re-introduce the engine-round divergence class)."""
    import numpy as np
    import pandas as pd

    hourly = _hourly_exact_mean(events)

    def kernel(key, pdf):
        pdf = pdf.sort_values("hour").reset_index(drop=True)
        x = pdf["mean_value"].to_numpy(dtype=np.float64)
        burn = x[: min(24, len(x))]
        # explicit left folds (see docstring point 2)
        s = 0.0
        for v in burn:
            s = s + v
        mu = s / len(burn)
        ss = 0.0
        for v in burn:
            d = v - mu
            ss = ss + d * d
        sd = np.sqrt(ss / len(burn))
        sd = max(float(sd), 1e-12)
        k, h = k_sigma * sd, h_sigma * sd
        sp = sn = 0.0
        rows = []
        for i, v in enumerate(x):
            sp = max(0.0, sp + (v - mu) - k)
            sn = max(0.0, sn + (mu - v) - k)
            if sp > h or sn > h:
                # stat published UNROUNDED: the whole chain is the same
                # correctly-rounded double op sequence in both engines,
                # so the raw ratio is bit-identical — rounding would
                # only re-introduce the python-round vs engine-round
                # divergence class (the events_ewma discipline)
                rows.append(
                    (
                        key[0],
                        pdf["hour"].iloc[i],
                        "up" if sp > h else "down",
                        max(sp, sn) / sd,
                    )
                )
                sp = sn = 0.0
        return pd.DataFrame(
            rows, columns=["event_type", "hour", "direction", "stat_sigma"]
        )

    return hourly.groupBy("event_type").applyInPandas(
        kernel, "event_type string, hour timestamp, direction string, stat_sigma double"
    )


def moving_median_user_spend(events: DataFrame) -> DataFrame:
    """Rolling EXACT median and quartiles of a user's event values over
    their last 11 events (ROWS 10 PRECEDING..CURRENT) — the robust
    per-entity baseline for spend/latency anomaly flags, where a mean
    is skew-poisoned. Demonstrates percentile aggregates as WINDOW
    functions over an explicit rows frame (ANSI; `percentile` in Spark
    ≡ `quantile_cont` in DuckDB, the interpolating definition).

    Scale shape: the window is partitioned at USER grain — per-user row
    counts are bounded by user activity, not corpus size, so partitions
    stay small at any SF (the per-type variant would put an SF-scaled
    series through one frame evaluator; user grain is the scale-honest
    key). Deterministic order: (ts, event_id). Output trimmed to users
    with ≥ 3 events to keep the relation result-stable."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, W.currentRow)
    )
    return (
        events.select(
            "user_id",
            "event_id",
            "ts",
            F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias("med_11"),
            F.round(F.expr("percentile(value, 0.25)").over(w), 6).alias("p25_11"),
            F.round(F.expr("percentile(value, 0.75)").over(w), 6).alias("p75_11"),
            F.count("*").over(w).alias("n_in_frame"),
        )
        .filter(F.col("n_in_frame") >= 3)
        .select("user_id", "event_id", "med_11", "p25_11", "p75_11", "n_in_frame")
    )


def activity_streaks(events: DataFrame) -> DataFrame:
    """Gaps-and-islands: per user, the longest run of CONSECUTIVE
    active days, total active days, and number of distinct streaks —
    the classic engagement metric (the row_number difference trick:
    date - rank(date) is constant within a consecutive run; standard
    public SQL idiom).

    Scale shape: distinct (user, day) first — collapses event-grain to
    day-grain BEFORE the window, so the row_number partition carries at
    most days-per-user rows (bounded), never raw events; two grouped
    aggregates after it, both partial-aggregating. One shuffle chain at
    user grain throughout (day-distinct, window, and the final groupBys
    all key on user_id first), so AQE can reuse the partitioning."""
    days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    runs = days.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = runs.groupBy("user_id", "grp").agg(
        F.count("*").alias("streak_len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("streak_len").cast("long").alias("n_active_days"),
            F.max("streak_len").cast("int").alias("longest_streak"),
            F.count("*").cast("int").alias("n_streaks"),
        )
        .orderBy("user_id")
    )


def rolling_zscore_anomalies(
    events: DataFrame, lookback: int = 20, min_prior: int = 8, z_cut: float = 3.0
) -> DataFrame:
    """Rolling-window z-score anomaly flags per user: each event's value
    scored against the mean/stddev of that user's PRIOR ``lookback``
    events (ROWS lookback PRECEDING .. 1 PRECEDING — the current row is
    excluded so an outlier cannot mask itself by inflating its own
    baseline), flagged when |z| ≥ ``z_cut`` with at least ``min_prior``
    prior observations (cold-start guard). The streaming-monitor twin
    of the global MAD screen: MAD finds corpus outliers, this finds
    values anomalous FOR THAT ENTITY's own recent history.

    Scale shape: ONE user-grain window chain (count and both power sums
    share the same frame sort — one exchange, one sort); partitions are
    user-activity-bounded, never SF-scaled (the moving_median key
    discipline). All expressions whole-stage codegen.

    Determinism: the frame sums run over DECIMAL(18,6) (values are 2dp
    — the cast is lossless), so the window sums are EXACT in both
    engines regardless of accumulation order; mean/variance/z are then
    the same double-arithmetic sequence over identical inputs →
    bit-identical, and rounding/threshold membership cannot flip at
    grid boundaries (a float avg() window hit exactly that: one 4dp
    boundary row at sf0.01)."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-lookback, -1)
    )
    dec = F.col("value").cast("decimal(18,6)")
    # exact integer cents alongside the double moments: the constant-
    # baseline tests below must not depend on float round-trips (a
    # 1-ulp drift in s1/n flagged a perfectly constant series as an
    # infinite-z anomaly). Long-exact through cents ≈ 1e8 per value
    # (s1c² ≤ (20·1e8)² < 2^63); events values are ≤ ~1e5 cents.
    cents = (dec * 100).cast("long")
    scored = events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        cents.alias("cents"),
        F.count("value").over(w).alias("n_prior"),
        F.sum(dec).over(w).cast("double").alias("s1"),
        F.sum(dec * dec).over(w).cast("double").alias("s2"),
        F.sum(cents).over(w).alias("s1c"),
        F.sum(cents * cents).over(w).alias("s2c"),
    )
    n = F.col("n_prior")
    mean = F.col("s1") / n
    var = (F.col("s2") - n * mean * mean) / (n - 1)
    # EXACT constant-baseline detection (integer arithmetic, no float):
    # n·Σc² == (Σc)² iff every prior value is identical (Cauchy-Schwarz
    # equality), and then c·n != Σc iff the current value differs from
    # that constant. A jump off a constant baseline is the most
    # anomalous case — infinite z — so it is FLAGGED (z NULL, the
    # cross-engine-stable spelling of ∞); a value EQUAL to its constant
    # baseline is never flagged, even when the double var drifts a few
    # ulp either side of zero.
    const_base = F.col("s2c") * n == F.col("s1c") * F.col("s1c")
    const_jump = const_base & (F.col("cents") * n != F.col("s1c"))
    staged = scored.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        # 6dp, not 4dp: means of 2dp values over n∈[8,20] priors are
        # short-expansion rationals whose doubles can SHORTEST-PRINT as
        # an exact 4dp half — Spark's BigDecimal HALF_UP and DuckDB's
        # multiply-rint then disagree (3 real rows at sf0.1). At 6dp,
        # cents·20000/n is never an odd multiple for any n ≤ 20, so no
        # half boundary exists at all.
        F.round(mean, 6).alias("base_mean"),
        F.when(~const_base & (var > 0), F.round((F.col("value") - mean) / F.sqrt(var), 4)).alias("z"),
        n.alias("n_prior"),
        const_jump.alias("const_jump"),
    )
    return (
        staged.filter(
            (F.col("n_prior") >= min_prior)
            & (
                (F.col("z").isNotNull() & (F.abs(F.col("z")) >= z_cut))
                | F.col("const_jump")
            )
        )
        .select("user_id", "event_id", "event_type", "value", "base_mean", "z")
    )


def cumulative_distinct_users(events: DataFrame) -> DataFrame:
    """Running count of DISTINCT users ever seen, per day — the
    growth-dashboard staple that naive SQL writes as count(DISTINCT)
    over an expanding window, which holds per-frame distinct state and
    dies at scale. The scalable identity: a user adds 1 exactly on
    their FIRST day, so collapse to (user → min(day)) first, count
    first-appearances per day, then one cumulative sum over the
    calendar — the day-grain series is calendar-bounded no matter the
    event volume (the events_streaks collapse-before-window
    discipline).

    Days with events but no new users still appear (left join from the
    day spine derived in the same scan), with new_users = 0 and the
    running total carried forward."""
    day = F.date_trunc("day", F.col("ts")).alias("day")
    firsts = (
        events.select("user_id", day)
        .groupBy("user_id")
        .agg(F.min("day").alias("first_day"))
        .groupBy("first_day")
        .agg(F.count("*").cast("long").alias("new_users"))
    )
    days = events.select(day).distinct()
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        days.join(firsts, days.day == firsts.first_day, "left")
        .select(
            "day", F.coalesce("new_users", F.lit(0)).cast("long").alias("new_users")
        )
        .select(
            "day",
            "new_users",
            F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
        )
    )


def peak_concurrency(events: DataFrame, session_minutes: int = 5) -> DataFrame:
    """Peak concurrent activity per event type — the capacity-planning
    number ("how many sessions were open AT ONCE at the worst moment").
    Each event opens a ``session_minutes`` presence interval; the
    classic sweep-line identity turns interval overlap (a join problem)
    into a SORT problem: emit +1 at each start and −1 at each end, one
    cumulative sum in time order per type, take the max. Ties resolve
    END-BEFORE-START at the same instant (delta ascending in the order
    key), the non-overlapping-at-touch convention, fixed identically in
    both engines.

    Scale shape: 2 rows per event through ONE type-grain window (the
    same exchange serves the final max via a grouped agg); no
    interval self-join — the naive pairwise overlap is O(n²) per hot
    window, the sweep is O(n log n) sort. Type-grain partitions keep
    the window distributed; the "which instant" is also returned
    (earliest instant attaining the peak: min over peak rows)."""
    start = events.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    )
    end = events.select(
        "event_type",
        (F.col("ts") + F.expr(f"INTERVAL {int(session_minutes)} MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    deltas = start.unionAll(end)
    w = (
        W.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    running = deltas.select(
        "event_type", "t", F.sum("delta").over(w).alias("open_now")
    )
    peaks = running.groupBy("event_type").agg(F.max("open_now").alias("peak"))
    return (
        running.join(peaks, "event_type")
        .filter(F.col("open_now") == F.col("peak"))
        .groupBy("event_type")
        .agg(
            F.min("t").alias("peak_at"),
            F.min("peak").cast("long").alias("peak_concurrency"),
        )
        .orderBy("event_type")
    )


def interarrival_stats(events: DataFrame) -> DataFrame:
    """Inter-arrival time profile per event type — the arrival-process
    summary behind rate limiting, capacity models, and bot detection
    (machine-regular gaps have near-zero spread; the peak_concurrency
    companion at the time-BETWEEN-events grain). Gap = seconds since
    the SAME USER's previous event (any type); stats grouped by the
    later event's type.

    Scale shape: one user-grain window (lag over the shared sort) then
    one type-grain aggregate — both map-side-friendly. Gaps are EXACT
    INTEGER MICROSECONDS (unix_micros ≡ DuckDB epoch_us — seconds-level
    unix_timestamp TRUNCATES while epoch() keeps the fraction, a real
    cross-engine trap on µs-precision fixtures); output carries n/sum
    exactly rather than a rounded mean (the r9 exact-half lesson), and
    the interpolated percentiles are safe: both engines run
    a + frac·(b−a) on identical doubles."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = events.select(
        "event_type",
        (us - F.lag(us).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.sum("gap_us").cast("long").alias("sum_gap_us"),
            F.round(F.expr("percentile(gap_us, 0.5)") / 1000000.0, 6).alias("p50_gap_s"),
            F.round(F.expr("percentile(gap_us, 0.9)") / 1000000.0, 6).alias("p90_gap_s"),
            F.min("gap_us").cast("long").alias("min_gap_us"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
        )
        .orderBy("event_type")
    )


def daily_autocorrelation(events: DataFrame, lags: tuple[int, ...] = (1, 7)) -> DataFrame:
    """Lag-k Pearson autocorrelation of the daily event-count series —
    the seasonality screen (lag 7 ≫ lag 1 ⇒ weekly cycle) run before
    choosing a forecasting window or an anomaly baseline (Box &
    Jenkins' ACF, computed at the named lags only).

    The series is ZERO-FILLED onto the complete [min_day, max_day]
    calendar spine first (a gap day is a real 0, and without the spine
    a lag join would silently misalign across gaps); the spine is a
    bounded sequence(), never a data-sized window. Per lag: one
    day-grain self-join (day = day + k), integer moment sums (counts
    are integers, so n·Σxy − Σx·Σy is EXACT; overflow needs Σx² >
    2⁶³ ≈ 10⁵ days of 10⁷ events/day — cast the sums to decimal(38,0)
    beyond), one double expression, one 6dp round.

    Zero-variance sides (constant series) yield NULL autocorr
    explicitly — the 0/0 guard, not an engine-dependent NaN."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    filled = spine.join(daily, "day", "left").select(
        "day", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    grid = filled.sparkSession.createDataFrame(
        [(int(k),) for k in lags], "lag_days int"
    )
    lagged = (
        filled.crossJoin(F.broadcast(grid))
        .select(F.expr("date_add(day, lag_days)").alias("day"), "lag_days",
                F.col("n").alias("x"))
        .join(filled.select("day", F.col("n").alias("y")), "day")
    )
    sums = lagged.groupBy("lag_days").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    dxx = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    dxy = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    return sums.select(
        "lag_days",
        "n_pairs",
        F.when(
            (dxx > 0) & (dyy > 0),
            F.round(
                dxy.cast("double")
                / F.sqrt(dxx.cast("double") * dyy.cast("double")),
                6,
            )
            + 0.0,
        ).alias("autocorr"),
    ).orderBy("lag_days")


def seasonal_anomaly_days(events: DataFrame, k_sigma: int = 1) -> DataFrame:
    """Calendar-conditioned anomaly screen: each day's event count is
    judged against the mean/variance OF ITS OWN WEEKDAY (a quiet
    Sunday is normal; the same count on a Tuesday is an outage) — the
    seasonal complement of the trailing-window rolling z-score.
    ``k_sigma`` = 1 is the demo threshold for the near-uniform harness
    data; production uses 3.

    Decision is PURE INTEGER arithmetic — z > k ⇔
    (n_d·x − S1)² > k²·(n_d·S2 − S1²) over exact integer count sums —
    so boundary membership can never drift between engines (the
    important_stock threshold rule). The squared terms run in
    DECIMAL(38,0) (Spark) ≡ HUGEINT (DuckDB): BIGINT squares wrap past
    S1 ≈ 3·10⁹ summed events per weekday, far below the 100 TB
    envelope (the widened form is exact through S1 ≈ 10¹⁹). Weekday
    key is ISO (Monday = 1: Spark weekday()+1 ≡ DuckDB isodow — the
    engines' default dayofweek() numberings DISAGREE on Sunday).

    One day-grain count, one 7-row weekday-moment aggregate broadcast
    back, one map-only integer filter."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    dw = daily.withColumn("dow", (F.weekday("day") + 1).cast("int"))
    st = dw.groupBy("dow").agg(
        F.count("*").cast("long").alias("nd"),
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )
    k2 = k_sigma * k_sigma
    dev = F.col("nd").cast("decimal(38,0)") * F.col("n") - F.col("s1")
    var_n = (
        F.col("nd").cast("decimal(38,0)") * F.col("s2")
        - F.col("s1").cast("decimal(38,0)") * F.col("s1")
    )
    return (
        dw.join(st, "dow")
        .filter(dev * dev > k2 * var_n)
        .select(
            "day",
            "dow",
            F.col("n").alias("n_events"),
            F.col("nd").alias("n_days_same_dow"),
            (
                F.expr("(2 * s1 * 100 + nd) div (2 * nd)").cast("double") / 100.0
            ).alias("dow_mean"),
            F.when(F.col("nd") * F.col("n") > F.col("s1"), "high")
            .otherwise("low")
            .alias("direction"),
        )
        .orderBy("day")
    )


def slo_burn_table(events: DataFrame, budget_bps: int = 100) -> DataFrame:
    """SRE error-budget burn table: per day, the error share of all
    events in exact integer bps, the CUMULATIVE error share since the
    window start, and the budget-consumed ratio against an SLO budget
    (default 100 bps = 99% success target) — the error-budget policy
    table an on-call rotation reads (burn > 10000 bps of budget ⇒ the
    budget is spent).

    Everything is integer arithmetic over exact counts (daily and
    cumulative error/total sums; bps and budget ratios via integer
    division), so alert-boundary membership is engine-stable. The
    cumulative window runs over the bounded day axis (the calendar-
    spine exception); daily counts are one map-side-combined
    aggregate."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_errors"),
    )
    w_cum = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        daily.select(
            "day",
            "n_total",
            "n_errors",
            F.expr("(10000 * n_errors) div n_total").cast("long").alias("err_bps"),
            F.sum("n_errors").over(w_cum).cast("long").alias("cum_errors"),
            F.sum("n_total").over(w_cum).cast("long").alias("cum_total"),
        )
        .withColumn(
            "cum_err_bps",
            F.expr("(10000 * cum_errors) div cum_total").cast("long"),
        )
        .withColumn(
            # DECIMAL(38,0) product: 10⁸·cum_errors wraps BIGINT past
            # ~9·10¹⁰ cumulative errors — well inside a 100 TB window
            "budget_burn_bps",
            F.expr(
                "(10000 * 10000 * cast(cum_errors as decimal(38,0)))"
                f" div (cast(cum_total as decimal(38,0)) * {budget_bps})"
            ).cast("long"),
        )
        .orderBy("day")
    )


def latency_percentile_trend(events: DataFrame) -> DataFrame:
    """Daily p50/p95/p99 trend of the event value (read it as a latency
    or spend metric): the SRE/product latency dashboard series. Exact
    percentiles over 6dp-rounded inputs (the certified
    F.percentile ≡ quantile_cont convention — rounding the INPUT grid
    first makes the interpolation arithmetic identical on both
    engines), one day-grain aggregate."""
    rounded = events.select(
        F.to_date("ts").alias("day"), F.round("value", 6).alias("v")
    )
    return (
        rounded.groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.percentile(F.col("v"), F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile(F.col("v"), F.lit(0.95)), 6).alias("p95"),
            F.round(F.percentile(F.col("v"), F.lit(0.99)), 6).alias("p99"),
        )
        .orderBy("day")
    )


def user_burstiness(events: DataFrame, min_gaps: int = 2) -> DataFrame:
    """Per-user activity burstiness: the Goh–Barabási burstiness
    parameter B = (σ − μ)/(σ + μ) over the user's inter-arrival gaps
    (Goh & Barabási 2008, "Burstiness and memory in complex systems",
    EPL — public) plus the coefficient of variation — B → −1 for a
    metronome, ≈ 0 for Poisson arrivals, → 1 for extreme burst-silence
    alternation. The behavioral screen that separates organic users
    from schedulers/bots at a glance (complements the corpus-grain
    ``interarrival_profile`` at USER grain).

    Determinism: gaps are exact integer microseconds (lag over the
    per-user event order, event_id tiebreak); (n, Σg, Σg²) are exact
    DECIMAL(38,0) sums, the mean gap is an exact half-up integer, and
    σ/CV/B are one identical IEEE tree over the exact moments
    (sqrt-derived → 6dp-safe), +0.0 for signed zero on constant-gap
    users. Population (n divisor) variance, per the B definition.

    Scale shape: ONE user-partitioned window for the lag, one
    map-side-combined user-grain aggregate — the sessionizer's shuffle
    profile; no global window, no skew beyond user activity."""
    w = W.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = (
        events.select("user_id", (us - F.lag(us).over(w)).alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
    )
    gd = F.col("gap_us").cast("decimal(38,0)")
    g = gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.sum(gd).alias("s1"),
        F.sum(gd * gd).alias("s2"),
    ).filter(F.col("n_gaps") >= min_gaps)
    n = F.col("n_gaps").cast("double")
    mu = F.col("s1").cast("double") / n
    nd = F.col("n_gaps").cast("decimal(38,0)")
    # population variance from exact integer moments: (nΣg² − (Σg)²)/n²
    dvar = (nd * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
    sigma = F.sqrt(dvar) / n
    return g.select(
        "user_id",
        F.col("n_gaps").cast("long").alias("n_gaps"),
        F.expr("(2 * s1 + n_gaps) div (2 * n_gaps)")
        .cast("long")
        .alias("mean_gap_us"),
        # s1 = 0 means every gap is zero (all events share a timestamp):
        # μ = σ = 0 → 0/0; explicit NULL like the trend_regression guard
        F.when(F.col("s1") > 0, F.round(sigma / mu, 6) + F.lit(0.0)).alias("cv"),
        F.when(
            F.col("s1") > 0,
            F.round((sigma - mu) / (sigma + mu), 6) + F.lit(0.0),
        ).alias("burstiness"),
    ).orderBy("user_id")


def stl_decompose_daily(events: DataFrame) -> DataFrame:
    """Classical trend/seasonal/residual decomposition of the daily
    revenue series (the moving-average decomposition underlying STL —
    Cleveland et al. 1990; textbook form per Hyndman & Athanasopoulos,
    "Forecasting: Principles and Practice" — public): trend = centered
    7-day moving average over a zero-filled calendar spine, seasonal =
    per-weekday mean of the detrended series, residual = remainder.
    The decomposition every seasonal-anomaly rule reads before
    thresholding (complements ``seasonal_anomaly``'s screen with the
    full additive model).

    Exact-integer formulation (no float accumulation anywhere): with
    integer day-cents c and the 7-day window sum S₇, the detrended
    value is carried as the INTEGER 7·c − S₇; the weekday seasonal sum
    Σ(7c − S₇) and count n_w are exact, and every published component
    is ONE division of exact integers — trend = S₇/7, seasonal =
    Σd/(7n_w), residual = (7·n_w·c − n_w·S₇ − Σd)/(7·n_w) — identical
    correctly-rounded doubles on both engines, shipped UNROUNDED (the
    dim_profile mean_v rule). Weekday is the engine-portable
    ``datediff mod 7``, never locale dayofweek numbering.

    Scale shape: one day-grain aggregate of the fact table; the spine
    window is unpartitioned but CALENDAR-BOUNDED (the repo's
    spine exception — ~10³ rows at any SF); the weekday table is 7
    rows, broadcast back. Edge days without a full 7-day window carry
    NULL components (explicit contract)."""
    cents = (F.col("value").cast("decimal(18,6)") * 100).cast("long")
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.sum(cents).alias("c"))
    bounds = daily.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("day")
    )
    filled = spine.join(daily, "day", "left").select(
        "day", F.coalesce("c", F.lit(0)).alias("c")
    )
    w7 = W.orderBy("day").rowsBetween(-3, 3)
    t = filled.select(
        "day",
        "c",
        F.when(F.count("*").over(w7) == 7, F.sum("c").over(w7)).alias("s7"),
        # anchor far in the past (a Monday) so the mod-7 weekday is
        # nonnegative for any dataset — % is truncation-signed in Spark
        (F.datediff(F.col("day"), F.lit("1970-01-05").cast("date")) % 7).alias(
            "wd"
        ),
    )
    wk = (
        t.filter(F.col("s7").isNotNull())
        .groupBy("wd")
        .agg(
            F.sum(7 * F.col("c") - F.col("s7")).alias("s_wd"),
            F.count("*").alias("n_wd"),
        )
    )
    j = t.join(F.broadcast(wk), "wd", "left")
    den = 7 * F.col("n_wd")
    return j.select(
        "day",
        F.col("c").alias("revenue_cents"),
        (F.col("s7") / F.lit(7.0)).alias("trend_cents"),
        F.when(
            F.col("s7").isNotNull(), F.col("s_wd") / den.cast("double")
        ).alias("seasonal_cents"),
        F.when(
            F.col("s7").isNotNull(),
            (den * F.col("c") - F.col("n_wd") * F.col("s7") - F.col("s_wd"))
            / den.cast("double"),
        ).alias("residual_cents"),
    ).orderBy("day")


def hampel_outlier_days(events: DataFrame, k: int = 3) -> DataFrame:
    """Rolling Hampel filter over daily revenue (Hampel 1974; Pearson
    et al. 2016, "The Hampel identifier" — public): flag days whose
    revenue sits more than 3 MADs from the MEDIAN of their ±``k``-day
    neighborhood — the robust replacement for rolling-z-score outlier
    rules (one extreme neighbor corrupts a mean/σ window; the
    median/MAD window shrugs it off, ~50% breakdown).

    FULLY integer-exact: daily revenue is integer cents; the
    neighborhood median over an ODD window of integers is an ELEMENT
    (exact integer — windows are padded to odd by construction since
    the center day always belongs), deviations |x − med| are integers,
    their median (the MAD) likewise, and the flag compares
    2·|x − med| > 2·3·MAD in pure integers — the decision can never
    ride a float. Interior days only (edge days lack the full window —
    explicit contract like the STL edge rule).

    Scale shape: one day-grain aggregate, then a BANDED self-join
    (|Δday| ≤ k — fanout 2k+1, quadratic only in the bounded calendar,
    the mann_kendall discipline) and two exact-percentile passes at
    center-day grain. At 100 TB the fact scan dominates; the band
    stage is O(|days|·(2k+1))."""
    cents = (F.col("value").cast("decimal(18,6)") * 100).cast("long")
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.sum(cents).alias("c"))
    a, b = daily.alias("a"), daily.alias("b")
    band = (
        a.join(
            b,
            (F.datediff(F.col("b.day"), F.col("a.day")) >= -k)
            & (F.datediff(F.col("b.day"), F.col("a.day")) <= k),
        )
        .select(
            F.col("a.day").alias("day"),
            F.col("a.c").alias("c"),
            F.col("b.c").alias("neigh_c"),
        )
    )
    med = (
        band.groupBy("day", "c")
        .agg(
            F.count("*").alias("n_window"),
            F.percentile(F.col("neigh_c"), F.lit(0.5)).alias("med_d"),
        )
        # interior days only: a full, ODD window of 2k+1 neighbors —
        # the median of an odd integer window is an exact element
        .filter(F.col("n_window") == 2 * k + 1)
        .select("day", "c", F.col("med_d").cast("long").alias("med"))
    )
    dev = (
        band.join(med.select("day", "med"), "day")
        .groupBy("day", "med")
        .agg(
            F.percentile(
                F.abs(F.col("neigh_c") - F.col("med")), F.lit(0.5)
            ).cast("long").alias("mad")
        )
    )
    return (
        med.join(dev, ["day", "med"])
        .select(
            "day",
            F.col("c").alias("revenue_cents"),
            F.col("med").alias("window_median_cents"),
            F.col("mad").alias("window_mad_cents"),
            (
                2 * F.abs(F.col("c") - F.col("med")) > F.lit(6) * F.col("mad")
            ).alias("is_outlier"),
        )
        .orderBy("day")
    )


def little_law_reconciliation(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Little's law audit over gap-based sessions (Little 1961; the
    finite-horizon identity per Brumelle/Stidham — public): L = λ·W,
    with L (time-average open sessions) computed from the CONCURRENCY
    INTEGRAL by a day-partitioned sweep line and λ·W from the session
    table's count and duration sum — two INDEPENDENT physical plans
    whose exact-integer results must agree (∫concurrency dt ≡
    Σ durations, Fubini over the presence rectangle), emitted as a
    structural-zero violation column the driver hash-checks (the
    leakage-split discipline: the property itself is in the hash).

    Exactness: all times are integer microseconds; sessions CLIP to
    day boundaries (both the integral and the duration sum clip, so
    the identity survives partitioning); per-day sweep = +1/−1
    boundaries, one day-partitioned cumulative window, Σ open·Δt with
    Δt from lead() — the interval past a day's last boundary carries
    open = 0 and contributes nothing. λ, W, L publish as exact-integer
    ratios (one identical division) over the observation span.

    Scale shape: the sessionizer's one user-keyed shuffle, a bounded
    ×(days-per-session) clip explode, and a DAY-partitioned sweep
    window (never global); aggregates map-side combine."""
    from ..streaming.event_windows import sessionize_batch

    sessions = sessionize_batch(events, gap_minutes).select(
        F.unix_micros(F.col("session_start").cast("timestamp")).alias("s_us"),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias("e_us"),
    )
    day_us = 86_400_000_000
    clipped = (
        sessions.select(
            "s_us",
            "e_us",
            # FLOOR division for the day index (floor is identical in
            # both engines; integer `div` truncates toward zero and
            # would disagree with the oracle's `//` on pre-1970
            # timestamps — the signed-division class fixed repo-wide
            # in r12, ADVICE r12). Exact: |s_us| < 2^53 so the double
            # quotient is within 1 ulp (~3.6e-12 at ~2e4) while the
            # nearest non-multiple is ≥ 1/day_us ≈ 1.2e-11 away.
            F.explode(
                F.sequence(
                    F.floor(F.col("s_us") / F.lit(day_us)).cast("long"),
                    F.floor(F.col("e_us") / F.lit(day_us)).cast("long"),
                )
            ).alias("day_idx"),
        )
        .select(
            "day_idx",
            F.greatest(F.col("s_us"), F.col("day_idx") * day_us).alias("cs"),
            F.least(F.col("e_us"), (F.col("day_idx") + 1) * day_us).alias("ce"),
        )
        .filter(F.col("ce") > F.col("cs"))
    )
    total_dur = sessions.agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.col("e_us") - F.col("s_us")).alias("sum_dur_us"),
        F.min("s_us").alias("t0"),
        F.max("e_us").alias("t1"),
    )
    bounds = clipped.select(
        "day_idx", F.col("cs").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        clipped.select("day_idx", F.col("ce").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        W.partitionBy("day_idx")
        .orderBy("t", "delta")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_lead = W.partitionBy("day_idx").orderBy("t", "delta")
    running = bounds.select(
        "day_idx",
        "t",
        F.sum("delta").over(w).alias("open_now"),
        F.lead("t").over(w_lead).alias("next_t"),
    )
    integral = running.agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("next_t").isNotNull(),
                    F.col("open_now") * (F.col("next_t") - F.col("t")),
                )
            ),
            F.lit(0),
        ).alias("integral_us")
    )
    j = total_dur.crossJoin(F.broadcast(integral))
    span = F.col("t1") - F.col("t0")
    return j.select(
        F.col("n_sessions").cast("long").alias("n_sessions"),
        F.col("sum_dur_us").cast("long").alias("sum_dur_us"),
        F.col("integral_us").cast("long").alias("integral_us"),
        (F.col("integral_us") - F.col("sum_dur_us"))
        .cast("long")
        .alias("identity_violation_us"),
        F.expr("(2 * sum_dur_us + n_sessions) div (2 * n_sessions)")
        .cast("long")
        .alias("w_mean_us"),
        (F.col("integral_us").cast("double") / span.cast("double")).alias(
            "l_avg_sessions"
        ),
        (
            F.col("n_sessions").cast("double")
            / span.cast("double")
            * F.lit(3.6e9)
        ).alias("lambda_per_hour"),
    )


def calendar_heatmap(events: DataFrame) -> DataFrame:
    """ISO-weekday × hour activity heatmap — the capacity-planning and
    anomaly-baseline table every event pipeline publishes (when do
    users actually show up?): per (isodow 1=Mon..7=Sun, hour 0..23)
    cell, event count, distinct users, and the cell's share of all
    traffic in integer basis points.

    Exact: counts are integers; shares are integer div. The weekday is
    ISO (Spark ``weekday()+1`` ≡ DuckDB ``isodow()``) — Spark's
    ``dayofweek`` (1=Sunday) and DuckDB's ``dayofweek`` (0=Sunday)
    disagree, the engine-portability trap this column dodges.

    Scale shape: ONE map-side-combined aggregate to the bounded 7×24
    cell table (count-distinct shuffles user ids once); the total
    derives from the cell table broadcast-side."""
    cells = (
        events.groupBy(
            (F.weekday("ts") + 1).cast("int").alias("isodow"),
            F.hour("ts").cast("int").alias("hour"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .localCheckpoint()  # 7×24 rows; total re-consumes it
    )
    total = cells.agg(F.sum("n_events").alias("t"))
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            "isodow",
            "hour",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_users").cast("long").alias("n_users"),
            F.expr("(10000 * n_events) div t").cast("long").alias("share_bps"),
        )
        .orderBy("isodow", "hour")
    )


def kalman_level_filter(
    events: DataFrame, q: float = 0.01, r: float = 1.0
) -> DataFrame:
    """1-D Kalman filter on the LOCAL LEVEL state-space model (Kalman
    1960, "A New Approach to Linear Filtering and Prediction Problems"
    — public; the random-walk-plus-noise special case Harvey 1989 calls
    the workhorse of structural time series): per event_type, the
    hourly mean series is filtered through the predict/update cycle
    P⁻ = P + Q;  K = P⁻/(P⁻ + R);  x = x + K(z − x);  P = (1 − K)P⁻ —
    the OPTIMAL-gain counterpart of the fixed-gain exponential
    smoothers (EWMA is this filter's steady state; here the gain
    adapts from the diffuse start instead of being a constant), which
    closes the estimation family: SPC flags, smoothers forecast, the
    filter carries calibrated uncertainty (P) per step.

    Each row from t=2 on reports the innovation (z − x⁻, the filter's
    one-step surprise), the gain in effect, the filtered level, and
    the posterior variance. Init: x₁ = z₁, P₁ = 1.0 (a diffuse-ish
    prior; the gain sequence from any positive P₁ converges to the
    same steady state).

    Sequential two-state float recursion per series → the holt/cusum
    Arrow-kernel discipline, and the same bit-determinism toolbox:
    exact-integer hourly means, every constant a computed double
    (1 − K is column arithmetic, not a literal), identical
    parenthesization, values published UNROUNDED; the DuckDB oracle
    replays (x, P) with a recursive CTE computing P⁻ and K once in a
    nested derived table. Series shorter than 2 points emit nothing."""
    import numpy as np
    import pandas as pd

    hourly = _hourly_exact_mean(events)

    def kernel(key, pdf):
        pdf = pdf.sort_values("hour").reset_index(drop=True)
        z = pdf["mean_value"].to_numpy(dtype=np.float64)
        n = len(z)
        cols = [
            "event_type", "hour", "actual", "innovation", "gain",
            "filtered", "variance",
        ]
        if n < 2:
            return pd.DataFrame(columns=cols)
        x = z[0]
        p = 1.0
        rows = []
        for t in range(1, n):
            p_pred = p + q
            k = p_pred / (p_pred + r)
            innov = z[t] - x
            x = x + k * innov
            p = (1.0 - k) * p_pred
            rows.append(
                (key[0], pdf["hour"].iloc[t], float(z[t]), float(innov),
                 float(k), float(x), float(p))
            )
        return pd.DataFrame(rows, columns=cols)

    return hourly.groupBy("event_type").applyInPandas(
        kernel,
        "event_type string, hour timestamp, actual double, "
        "innovation double, gain double, filtered double, variance double",
    )


def user_behavior_entropy(events: DataFrame) -> DataFrame:
    """Hour-of-day behavioral entropy per user (Shannon 1948 — public;
    the bot-vs-human screen a training-data pipeline runs next to
    ``user_burstiness``): a human's activity concentrates in waking
    hours (low entropy over the 24 hour-of-day buckets), a scripted
    agent spreads uniformly (entropy near ln 24). One row per user:
    event count, active-hour count, Shannon entropy in NATS, and the
    uniformity ratio H / ln 24 a filter thresholds on.

    Determinism (the events_ewma fold discipline): bucket counts are
    exact integers; the entropy sum folds over the HOUR-ORDERED bucket
    list with an explicit 0.0 init on BOTH engines (a bare SUM() over
    float terms is partial-aggregation-order dependent; a canonical
    left fold is not), every literal cast to double, and ln (not log2
    — natural log is the cross-engine-proven kernel here; log2 is
    ln(x)/ln(2) on one engine and a distinct libm call on the other).
    Outputs unrounded.

    Scale shape: a (user, hour) map-side-combined count, then a
    user-grain aggregate carrying a ≤ 24-element list per user — the
    fold never sees more than 24 terms, and nothing exceeds user
    grain after the first aggregate."""
    hourly = events.groupBy(
        "user_id", F.hour("ts").cast("int").alias("hod")
    ).agg(F.count("*").cast("long").alias("cnt"))
    g = hourly.groupBy("user_id").agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_active_hours"),
        F.expr("array_sort(collect_list(struct(hod, cnt)))").alias("hs"),
    )
    ent = (
        "-aggregate(hs, CAST(0.0 AS DOUBLE), (a, x) -> a"
        " + (CAST(x.cnt AS DOUBLE) / CAST(n_events AS DOUBLE))"
        " * ln(CAST(x.cnt AS DOUBLE) / CAST(n_events AS DOUBLE)))"
    )
    return g.select(
        "user_id",
        "n_events",
        "n_active_hours",
        # 6dp like every log-kernel oracle in the registry: ln is NOT
        # bit-identical across libm implementations (1-ulp drift
        # observed vs DuckDB), and transcendental outputs essentially
        # never sit on the 6dp half grid
        (F.round(F.expr(ent), 6) + F.lit(0.0)).alias("entropy_nats"),
        (F.round(F.expr(f"({ent}) / ln(CAST(24.0 AS DOUBLE))"), 6) + F.lit(0.0)).alias(
            "uniformity"
        ),  # + 0.0 normalizes the single-bucket -0.0 (burstiness idiom)
    )


def max_drawdown(events: DataFrame) -> DataFrame:
    """Maximum drawdown per event-type series (the classic risk /
    degradation statistic: largest drop from a running peak — Magdon-
    Ismail & Atiya 2004 analyze it; the definition itself is
    textbook-public): treating each event type's ``value`` sequence in
    (ts, event_id) order as a path, report the deepest
    peak-to-trough fall, WHERE it bottomed, and the peak it fell from
    — the SLO/regression view next to the CUSUM/SPC shift detectors
    (those flag level changes; this measures the worst excursion).

    Determinism: the entire statistic is exact integer cents — the
    running peak is a MAX window over cents, the drawdown is an
    integer subtraction, and the reported row is the argmax with a
    total (dd DESC, ts, event_id) order — no float exists anywhere
    (the published ratio is one final integer-over-integer division,
    rounded 6 half-up on both engines).

    Scale shape: one type-partitioned running-max window (the natural
    event-time order), one ranking window at the same partitioning —
    both windows share a single (event_type)-keyed shuffle; output is
    one row per type."""
    # Spark's decimal->bigint CAST truncates toward zero (the DuckDB
    # oracle spells the same truncation as trunc(); a bare CAST rounds
    # there — the r16 cents-cast class)
    cents = "CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT)"
    w = (
        f"max({cents}) OVER (PARTITION BY event_type ORDER BY ts, event_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    scored = events.selectExpr(
        "event_type",
        "ts",
        "event_id",
        f"{cents} AS value_cents",
        f"{w} AS peak_cents",
        f"{w} - {cents} AS drawdown_cents",
    )
    ranked = scored.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY event_type"
        " ORDER BY drawdown_cents DESC, ts, event_id) AS rn",
    )
    return ranked.where(F.col("rn") == 1).selectExpr(
        "event_type",
        "ts AS trough_ts",
        "event_id AS trough_event_id",
        "peak_cents",
        "value_cents AS trough_cents",
        "drawdown_cents",
        # NULL ratio for the degenerate all-zero series (peak 0)
        "CASE WHEN peak_cents > 0 THEN round(CAST(drawdown_cents AS DOUBLE)"
        " / CAST(peak_cents AS DOUBLE), 6) END AS drawdown_ratio",
    )
