"""As-of (temporal) join — a capability Spark lacks natively.

For each order, find the latest event of that customer at-or-before the
order date. Implemented as equi-join on the key + max-filter aggregation:

    orders ⋈ events ON user_id = o_custkey AND ts <= o_orderdate
    → groupBy order → max(ts)

Scale design: the equi-part (user_id = custkey) drives the shuffle, so this
is a plain hash join at any scale; the temporal predicate is applied during
the probe. For dense per-key event streams (where join-then-aggregate
explodes), `asof_join_merge_asof` below runs `pd.merge_asof` per key group
via cogrouped applyInPandas — O(n log n) per group, each side shuffled
once. Both forms hash-match the same oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketized(events: DataFrame, window_minutes: int = 60) -> DataFrame:
    """Band/range join the 100 TB way: for every signup event, count the
    same user's events in the following hour.

    The naive form is a theta join (ts BETWEEN anchor AND anchor+1h) —
    nested-loop, quadratic. Here the time axis is bucketized to
    window-width buckets; each probe event maps to its bucket AND the
    previous one (any [t, t+w] window spans at most 2 buckets), turning the
    join into a pure EQUI-join on (user, bucket) with the precise range
    predicate applied during the probe. Hash shuffle, never nested-loop.
    """
    # microsecond-precision epoch: cast('long') would truncate to whole
    # seconds and diverge from the oracle's full-precision timestamp
    # comparison on sub-second data (DuckDB epoch() is exact DOUBLE).
    w_s = window_minutes * 60 * 1_000_000
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    anchors = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("anchor_id"),
        F.col("user_id").alias("anchor_user"),
        F.col("ts").alias("anchor_ts"),
        epoch.alias("anchor_epoch"),
        (epoch / w_s).cast("long").alias("bucket"),
    )
    probes = (
        events.select(
            F.col("user_id").alias("p_user"),
            epoch.alias("p_epoch"),
            F.col("event_id").alias("p_id"),
            F.explode(
                F.array(
                    (epoch / w_s).cast("long"),
                    (epoch / w_s).cast("long") - 1,
                )
            ).alias("bucket"),
        )
        .dropDuplicates(["p_id", "bucket"])
    )
    hits = (
        anchors.join(
            probes,
            (anchors.bucket == probes.bucket)
            & (F.col("anchor_user") == F.col("p_user"))
            & (F.col("p_epoch") > F.col("anchor_epoch"))
            & (F.col("p_epoch") <= F.col("anchor_epoch") + w_s),
        )
        .groupBy("anchor_id")
        .agg(F.count("*").alias("n_following"))
    )
    return (
        anchors.select("anchor_id", "anchor_user", "anchor_ts")
        .join(hits, "anchor_id", "left")
        .select(
            "anchor_id",
            "anchor_user",
            "anchor_ts",
            F.coalesce("n_following", F.lit(0)).alias("n_following"),
        )
    )


def asof_join_merge_asof(orders: DataFrame, events: DataFrame) -> DataFrame:
    """As-of join, grouped-pandas form: ``pd.merge_asof`` per entity-key
    group via cogrouped ``applyInPandas`` — the alternative documented in
    SCALE.md for DENSE per-key event streams, where the equi-join +
    max-filter form (asof_latest_event_before_order) would materialize
    |orders_per_key| × |events_per_key| probe pairs before aggregating.
    Here each group is merged in O(n log n) locally; the shuffle carries
    each side once, partitioned by the key.

    Same semantics as the join+agg form (latest event at-or-before the
    order date, null when none) — both hash-match the same oracle."""
    import pandas as pd

    def merge_group(key, odf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
        odf = odf.sort_values("o_orderdate", kind="stable")
        if len(edf) == 0:
            odf["asof_event_ts"] = pd.NaT
            return odf[["o_orderkey", "o_custkey", "o_orderdate", "asof_event_ts"]]
        edf = edf.sort_values("ts", kind="stable")
        merged = pd.merge_asof(
            odf, edf[["ts"]].assign(asof_event_ts=edf["ts"]),
            left_on="o_orderdate", right_on="ts", direction="backward",
        )
        return merged[["o_orderkey", "o_custkey", "o_orderdate", "asof_event_ts"]]

    o = orders.select("o_orderkey", "o_custkey", "o_orderdate")
    e = events.select("user_id", "ts")
    return (
        o.groupBy("o_custkey")
        .cogroup(e.groupBy("user_id"))
        .applyInPandas(
            merge_group,
            schema="o_orderkey long, o_custkey long, o_orderdate timestamp, asof_event_ts timestamp",
        )
    )


def asof_latest_event_before_order(orders: DataFrame, events: DataFrame) -> DataFrame:
    ev = events.select(F.col("user_id").alias("ev_user"), F.col("ts").alias("ev_ts"))
    return (
        orders.join(
            ev,
            (orders.o_custkey == ev.ev_user) & (ev.ev_ts <= orders.o_orderdate),
            "left",
        )
        .groupBy("o_orderkey", "o_custkey", "o_orderdate")
        .agg(F.max("ev_ts").alias("asof_event_ts"))
    )


def asof_nearest_join(events: DataFrame, tolerance_min: int = 30) -> DataFrame:
    """NEAREST as-of join — the bidirectional completion of the as-of
    family (backward = ``asof_latest_event_before_order``, cogrouped =
    ``asof_join_merge_asof``): each click matches the temporally
    CLOSEST purchase by the same user within ± ``tolerance_min``,
    whichever direction, ties to the earlier side — pandas
    ``merge_asof(direction='nearest')`` semantics, expressed without a
    range join.

    The union-scan formulation (one shuffle, no pair blowup): tag both
    streams, sort per user by time, and recover for every click the
    latest preceding purchase (running ``last(..., ignorenulls)``) and
    the earliest following purchase (``first`` over the forward
    frame) — each click then compares at most TWO candidates however
    dense the purchase stream is, where a band join would fan out to
    every purchase in the window. Tie-break and sort order are pinned
    (ts, kind, event_id) so equal-timestamp rows are deterministic.

    Determinism: deltas are exact integer microseconds; the
    nearer-side pick compares integers; output carries ids + signed
    delta only — no float surface.

    Scale shape: ONE user-keyed shuffle shared by both window passes
    (Catalyst plans one sort); state per row is two scalars. The
    standard streaming analog is the stream-stream interval join —
    this is the batch form a backfill uses."""
    from pyspark.sql import Window as W

    tol_us = tolerance_min * 60 * 1_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.lit(0).alias("kind"), F.col("event_id"), us.alias("t_us")
    )
    purch = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.lit(1).alias("kind"), F.col("event_id"), us.alias("t_us")
    )
    tagged = clicks.unionAll(purch)
    order = [F.col("t_us"), F.col("kind"), F.col("event_id")]
    w_back = (
        W.partitionBy("user_id").orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy("user_id").orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    p_ts = F.when(F.col("kind") == 1, F.col("t_us"))
    p_id = F.when(F.col("kind") == 1, F.col("event_id"))
    annotated = tagged.select(
        "user_id",
        "kind",
        "event_id",
        "t_us",
        F.last(p_ts, ignorenulls=True).over(w_back).alias("prev_ts"),
        F.last(p_id, ignorenulls=True).over(w_back).alias("prev_id"),
        F.first(p_ts, ignorenulls=True).over(w_fwd).alias("next_ts"),
        F.first(p_id, ignorenulls=True).over(w_fwd).alias("next_id"),
    ).filter(F.col("kind") == 0)
    d_prev = F.col("t_us") - F.col("prev_ts")  # ≥ 0 when present
    d_next = F.col("next_ts") - F.col("t_us")
    prev_ok = F.col("prev_ts").isNotNull() & (d_prev <= tol_us)
    next_ok = F.col("next_ts").isNotNull() & (d_next <= tol_us)
    # nearer side wins; exact ties go to the PRECEDING purchase
    use_prev = prev_ok & (~next_ok | (d_prev <= d_next))
    use_next = next_ok & ~use_prev
    return annotated.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.when(use_prev, F.col("prev_id"))
        .when(use_next, F.col("next_id"))
        .alias("purchase_id"),
        F.when(use_prev, -d_prev).when(use_next, d_next).alias("delta_us"),
        F.when(use_prev, "backward").when(use_next, "forward").alias("direction"),
    ).orderBy("click_id")
