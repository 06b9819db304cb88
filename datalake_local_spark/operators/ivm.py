"""Incremental view maintenance (IVM) for the rollup family.

The reference precomputes its month-grain gold materialization
(``gold.stock_markets_monthly``, StockMarketsMonthly.js:1-2) by FULL
recompute on every refresh. This module maintains the same rollup as a
SELF-MAINTAINABLE materialized view (Gupta & Mumick 1995, "Maintenance
of Materialized Views: Problems, Techniques, and Applications", IEEE
Data Eng. Bulletin — public): a base-table change feed (inserts,
deletes, and updates as delete-pre-image + insert-post-image pairs)
refreshes the view in O(delta), never O(base).

Algebra per aggregate class:

- **COUNT / SUM** are fully self-maintainable under both inserts and
  deletes: ``new = old + sum(inserts) − sum(deletes)``. Exactness rides
  on an AUXILIARY integer-cents column stored in the internal view
  schema (``sum_cents``) — float sums are not associatively exact, so
  the maintained total would drift from the recomputed one; integer
  cents make merge order irrelevant. AVG derives from (sum_cents, n)
  with the repo's exact half-up integer mean.
- **MIN / MAX** are self-maintainable under INSERTS only
  (``least/greatest(old, delta)``); a delete can remove the extremum,
  so delete-affected groups recompute min/max from the new base state
  — but ONLY those groups (partition-pruned at scale: the view grain
  leads with the base table's month partition key, so the recompute
  scan touches exactly the partitions the delta touched).

Scale shape at 100 TB: the delta aggregate is one map-side-combined
groupBy at view grain (delta-sized input); the merge is a full-outer
join of two view-grain relations (the view is ~|months × statuses|
rows — tiny); the min/max recompute is an inner join of the base with
the delete-affected grain keys (semi-join pushdown + dynamic partition
pruning make it an O(affected partitions) scan). No driver state, no
window, no skew surface beyond the base table's own month skew.

The materialized path (:func:`refresh_rollup_table`) publishes through
``maintenance.overwrite_changed_partitions`` — dynamic partition
overwrite keyed on the view's month column — so untouched partitions
keep their files byte-identical (asserted in tests), the lakehouse
contract a format MERGE would give.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_GRAIN = ["order_month", "orderstatus"]


def _cents(col: str = "o_totalprice"):
    # exact integer cents, the repo-wide decimal-cast discipline
    return (F.col(col).cast("decimal(18,6)") * 100).cast("long")


def grain_rollup_internal(
    orders: DataFrame, unit: str = "month", period_col: str = "order_month"
) -> DataFrame:
    """The ``unit`` × status rollup in its INTERNAL (maintainable)
    schema: grain + n_orders + exact ``sum_cents`` + min/max price.
    The public view (:func:`publish_rollup`) derives sum/avg from
    these — the auxiliary-column pattern Gupta & Mumick require for
    AVG (and that float SUM needs for exact maintainability)."""
    return orders.groupBy(
        F.date_trunc(unit, F.col("o_orderdate")).alias(period_col),
        F.col("o_orderstatus").alias("orderstatus"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(_cents()).alias("sum_cents"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


def monthly_rollup_internal(orders: DataFrame) -> DataFrame:
    """Month-grain instance of :func:`grain_rollup_internal` (the r12
    view; kept as the named API the materialized path and tests use)."""
    return grain_rollup_internal(orders, "month", "order_month")


def publish_rollup(internal: DataFrame) -> DataFrame:
    """Internal → public view schema, matching ``agg.monthly_rollup``
    column-for-column: sum/avg are derived from the exact cents so the
    published numbers are identical whether the view was maintained
    incrementally or recomputed (the property the oracle hash-checks).
    ``round(cents/100, 2)`` lands on the same nearest-double-of-grid
    value as the recompute's ``round(sum(double), 2)`` because the true
    sum is on the 2-decimal grid and the double sum's error is orders
    of magnitude below the 0.005 rounding radius."""
    return internal.select(
        "order_month",
        "orderstatus",
        "n_orders",
        F.round(F.col("sum_cents") / 100.0, 2).alias("sum_price"),
        (
            F.expr("(2 * sum_cents * 100 + n_orders) div (2 * n_orders)").cast(
                "double"
            )
            / F.lit(10000.0)
        ).alias("avg_price"),
        "min_price",
        "max_price",
    )


def grain_delta_merge(
    old_internal: DataFrame,
    delta_plus: DataFrame,
    delta_minus: DataFrame,
    new_base: DataFrame,
    unit: str = "month",
    period_col: str = "order_month",
) -> DataFrame:
    """Apply a base-table change feed to the internal ``unit``-grain
    rollup view in O(delta): ``delta_plus`` carries inserted rows and
    update post-images, ``delta_minus`` deleted rows and update
    pre-images (both at base grain with
    o_orderdate/o_orderstatus/o_totalprice). ``new_base`` is the
    post-change base table, read ONLY for the min/max recompute of
    delete-affected groups (partition-pruned).

    Groups whose maintained count reaches zero leave the view; groups
    born by inserts enter it. The count invariant (maintained n ≥ 0,
    and > 0 wherever the group survives) holds by construction when
    the feed is a consistent changelog."""
    _grain = [period_col, "orderstatus"]
    month = F.date_trunc(unit, F.col("o_orderdate")).alias(period_col)
    status = F.col("o_orderstatus").alias("orderstatus")
    # ONE tagged delta aggregate (r20 optimization): both change
    # directions ride a single map-side-combined groupBy — the insert
    # and delete sides used to be two separate aggregates merged by two
    # consecutive full-outer joins (two delta shuffles + an extra
    # view-grain join per refresh). Conditional aggregation over the
    # sign-tagged union yields the identical columns: a group with no
    # plus rows gets n_plus = 0 / NULL min_plus exactly where the
    # full-outer join produced NULLs the downstream coalesce()/least()
    # already absorb. Exact-integer sums and rounded min/max are
    # order-insensitive, so the merged values are bit-identical.
    sgn = F.col("sgn")
    tagged = delta_plus.withColumn("sgn", F.lit(1)).unionByName(
        delta_minus.withColumn("sgn", F.lit(-1))
    )
    delta_g = tagged.groupBy(month, status).agg(
        F.sum(F.when(sgn > 0, 1).otherwise(0)).alias("n_plus"),
        F.sum(F.when(sgn > 0, _cents()).otherwise(0)).alias("c_plus"),
        F.round(F.min(F.when(sgn > 0, F.col("o_totalprice"))), 2).alias("min_plus"),
        F.round(F.max(F.when(sgn > 0, F.col("o_totalprice"))), 2).alias("max_plus"),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).alias("n_minus"),
        F.sum(F.when(sgn < 0, _cents()).otherwise(0)).alias("c_minus"),
    )
    merged = (
        old_internal.join(delta_g, _grain, "full_outer")
        .select(
            *_grain,
            (
                F.coalesce("n_orders", F.lit(0))
                + F.coalesce("n_plus", F.lit(0))
                - F.coalesce("n_minus", F.lit(0))
            ).alias("n_orders"),
            (
                F.coalesce("sum_cents", F.lit(0))
                + F.coalesce("c_plus", F.lit(0))
                - F.coalesce("c_minus", F.lit(0))
            ).alias("sum_cents"),
            # insert-only min/max merge; overridden below for
            # delete-affected groups (least/greatest skip NULLs, so a
            # group new in the delta or absent from it both work)
            F.least("min_price", "min_plus").alias("min_merge"),
            F.greatest("max_price", "max_plus").alias("max_merge"),
            (F.coalesce("n_minus", F.lit(0)) > 0).alias("has_delete"),
        )
        .filter(F.col("n_orders") > 0)
    )
    # Delete-affected key set straight from the changelog (r20
    # optimization): has_delete ⟺ the group has ≥1 delta_minus row, so
    # the distinct minus keys are a superset of merged's surviving
    # delete-affected groups that differs only by groups whose count
    # reached zero — and a vanished group has no new_base rows to
    # aggregate and is dropped by the LEFT merge join below anyway, so
    # the published rows are identical. Deriving the probe side from
    # delta_minus instead of from ``merged`` removes the second
    # consumption of the merge subtree, which the executed plan used to
    # REPLAY in full for the probe (delta aggregates + full-outer join
    # twice; 10 finalized base scans → 6 in the r20 plan capture).
    affected = (
        delta_minus.select(
            F.date_trunc(unit, F.col("o_orderdate")).alias(period_col),
            F.col("o_orderstatus").alias("orderstatus"),
        )
        .distinct()
    )
    recomputed = (
        new_base.select(
            F.date_trunc(unit, F.col("o_orderdate")).alias(period_col),
            F.col("o_orderstatus").alias("orderstatus"),
            "o_totalprice",
        )
        # inner join against the (tiny, view-grain) affected-key set:
        # at scale this is a broadcast + partition-pruned base scan
        .join(F.broadcast(affected), _grain)
        .groupBy(*_grain)
        .agg(
            F.round(F.min("o_totalprice"), 2).alias("min_re"),
            F.round(F.max("o_totalprice"), 2).alias("max_re"),
        )
    )
    return merged.join(recomputed, _grain, "left").select(
        *_grain,
        "n_orders",
        "sum_cents",
        F.when(F.col("has_delete"), F.col("min_re"))
        .otherwise(F.col("min_merge"))
        .alias("min_price"),
        F.when(F.col("has_delete"), F.col("max_re"))
        .otherwise(F.col("max_merge"))
        .alias("max_price"),
    )

def rollup_delta_merge(
    old_internal: DataFrame,
    delta_plus: DataFrame,
    delta_minus: DataFrame,
    new_base: DataFrame,
) -> DataFrame:
    """Month-grain instance of :func:`grain_delta_merge` (the r12 API
    the materialized-table path and tests call)."""
    return grain_delta_merge(
        old_internal, delta_plus, delta_minus, new_base, "month", "order_month"
    )


def derive_cdc_states(orders: DataFrame, cols=None):
    """Deterministic OLD → NEW change derivation over the static
    testdata (the ``corpus_snapshot_diff`` fixture discipline), shared
    by the registered query, the oracle, and the tests:

    - DELETE rows with ``o_orderkey % 97 == 0``;
    - UPDATE rows with ``o_orderkey % 53 == 0`` (surviving deletion):
      price + 100.00 — emitted as pre-image delete + post-image insert;
    - INSERT a clone of rows with ``o_orderkey % 101 == 0`` at
      price + 55.25 (key identity is irrelevant at view grain).

    ``cols`` widens the projected base columns (default: the three
    the price rollups need); the change classes are identical for
    any projection.

    Returns (delta_plus, delta_minus, new_base).

    Single-scan forms (r20 optimization): each returned relation used
    to be a unionAll of two filtered base scans, so every consumer paid
    two fact passes per delta reference. Delete and update pre-images
    carry UNCHANGED prices, so ``delta_minus`` is one disjunctive
    filter; ``delta_plus`` and ``new_base`` need per-row VARIANTS (an
    update post-image and an insert clone can both fire for one row —
    lcm(53,101) keys), emitted via array_compact + explode over one
    scan instead of a second scan per class. Row multisets are
    identical to the two-scan forms (only physical row order differs,
    which no consumer observes — the deltas feed aggregates/joins)."""
    k = F.col("o_orderkey")
    is_del = k % 97 == 0
    is_upd = (k % 53 == 0) & ~is_del
    is_ins = k % 101 == 0
    cols = cols or ["o_orderdate", "o_orderstatus", "o_totalprice"]
    price = F.col("o_totalprice")

    def _variant(price_expr):
        return F.struct(
            *[
                (price_expr if c == "o_totalprice" else F.col(c)).alias(c)
                for c in cols
            ]
        )

    def _explode_variants(filtered, *variants):
        return (
            filtered.select(
                F.explode(F.array_compact(F.array(*variants))).alias("_v")
            ).select("_v.*")
        )

    delta_minus = orders.filter(is_del | is_upd).select(*cols)
    delta_plus = _explode_variants(
        orders.filter(is_upd | is_ins),
        F.when(is_upd, _variant(price + 100.0)),
        F.when(is_ins, _variant(price + 55.25)),
    )
    new_base = _explode_variants(
        orders.filter(~is_del | is_ins),
        F.when(~is_del, _variant(F.when(is_upd, price + 100.0).otherwise(price))),
        F.when(is_ins, _variant(price + 55.25)),
    )
    return delta_plus, delta_minus, new_base


def ivm_join_refresh(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Incremental maintenance of a JOIN view — the delta-join rule
    (Blakeley/Larson/Tompa 1986, "Efficiently Updating Materialized
    Views", SIGMOD — public): when only ONE side of a join changes,
    the view delta is the CHANGE joined to the other side,
    ΔV = ΔO ⋈ C — never a re-join of the full fact table. The
    maintained view here is revenue by (market segment × month) over
    orders ⋈ customer, driven through the shared deterministic change
    feed (:func:`derive_cdc_states`), and the registered query
    publishes the REFRESHED view; the oracle recomputes the same view
    from scratch over the post-change base join — a hash match
    certifies refreshed ≡ recomputed, the IVM correctness property
    extended from single-table rollups (``ivm_rollup_refresh``) to
    joins.

    Count and sum are self-maintainable, so unlike the min/max rollup
    there is NO delete-recompute path at all: the complete refresh
    work is ONE sign-tagged delta-grain join (Δ⁺O ∪ Δ⁻O) ⋈ C, one
    conditional view-grain aggregate, and one full-outer merge at view
    grain (r20: previously two separate delta joins and two
    consecutive full-outer merges — same values by exact-integer
    conditional aggregation).
    Scale shape: the deltas are tiny by construction (changelog), the
    dim side broadcasts, and the post-change fact table is NEVER
    rescanned — at 100 TB the refresh cost is O(|ΔO|), which is the
    entire point of maintaining the view."""
    cols = ["o_custkey", "o_orderdate", "o_totalprice"]
    delta_plus, delta_minus, new_base = derive_cdc_states(orders, cols=cols)
    cdim = customer.select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    grain = ["segment", "order_month"]
    month = F.date_trunc("month", F.col("o_orderdate")).alias("order_month")

    def view_agg(base: DataFrame, n_name: str, c_name: str) -> DataFrame:
        return (
            base.join(cdim, base["o_custkey"] == cdim["c_custkey"])
            .groupBy(F.col("segment"), month)
            .agg(
                F.count("*").alias(n_name),
                F.sum(_cents()).alias(c_name),
            )
        )

    # the pre-change view is materialized so the refresh plan genuinely
    # starts from a stored view, not a Catalyst-collapsed recompute
    old_internal = view_agg(orders, "n_orders", "sum_cents").localCheckpoint()
    # ONE tagged delta pass (r20 optimization, the grain_delta_merge
    # shape): both change directions ride a single dim join and a
    # single conditional view-grain aggregate — previously two
    # delta joins + two consecutive full-outer merges. A group with
    # changes in only one direction gets 0 for the other side exactly
    # where the second full-outer join produced the NULLs coalesce()
    # absorbs; exact-integer sums make the merged values identical.
    sgn = F.col("sgn")
    tagged = delta_plus.withColumn("sgn", F.lit(1)).unionByName(
        delta_minus.withColumn("sgn", F.lit(-1))
    )
    delta_g = (
        tagged.join(cdim, tagged["o_custkey"] == cdim["c_custkey"])
        .groupBy(F.col("segment"), month)
        .agg(
            F.sum(F.when(sgn > 0, 1).otherwise(0)).alias("n_plus"),
            F.sum(F.when(sgn > 0, _cents()).otherwise(0)).alias("c_plus"),
            F.sum(F.when(sgn < 0, 1).otherwise(0)).alias("n_minus"),
            F.sum(F.when(sgn < 0, _cents()).otherwise(0)).alias("c_minus"),
        )
    )
    merged = (
        old_internal.join(delta_g, grain, "full_outer")
        .select(
            *grain,
            (
                F.coalesce("n_orders", F.lit(0))
                + F.coalesce("n_plus", F.lit(0))
                - F.coalesce("n_minus", F.lit(0))
            ).cast("long").alias("n_orders"),
            (
                F.coalesce("sum_cents", F.lit(0))
                + F.coalesce("c_plus", F.lit(0))
                - F.coalesce("c_minus", F.lit(0))
            ).alias("sum_cents"),
        )
        .filter(F.col("n_orders") > 0)
    )
    return merged.select(
        "segment",
        "order_month",
        "n_orders",
        F.round(F.col("sum_cents") / 100.0, 2).alias("sum_price"),
    ).orderBy("segment", "order_month")


def ivm_rollup_refresh(orders: DataFrame) -> DataFrame:
    """Registered query: maintain the monthly rollup through the
    deterministic change feed and PUBLISH the refreshed view. The
    oracle recomputes the same rollup from scratch over the post-change
    base state — a hash match certifies refreshed ≡ recomputed, the
    IVM correctness property itself.

    The pre-change view is materialized (``localCheckpoint``) before
    the merge so the plan genuinely starts from a stored view, not a
    Catalyst-collapsed recompute."""
    delta_plus, delta_minus, new_base = derive_cdc_states(orders)
    old_internal = monthly_rollup_internal(orders).localCheckpoint()
    refreshed = rollup_delta_merge(old_internal, delta_plus, delta_minus, new_base)
    return publish_rollup(refreshed).orderBy("order_month", "orderstatus")


def materialize_rollup_table(
    spark: SparkSession,
    table: str,
    orders: DataFrame,
    unit: str = "month",
    period_col: str = "order_month",
) -> None:
    """Write the pre-change internal ``unit``-grain view as a
    month-partitioned catalog table — the stored materialization
    :func:`refresh_rollup_table` maintains. The partition key is the
    view's MONTH (``yyyy-MM``) at every grain — for the day-grain
    lattice state too — so an incremental refresh maps to
    partition-grain file replacement and the delete-repair scan stays
    partition-pruned."""
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    internal = grain_rollup_internal(orders, unit, period_col).withColumn(
        "month_key", F.date_format(period_col, "yyyy-MM")
    )
    internal.write.partitionBy("month_key").saveAsTable(table)


def refresh_rollup_table(
    spark: SparkSession,
    table: str,
    orders: DataFrame,
    unit: str = "month",
    period_col: str = "order_month",
) -> dict:
    """Materialized IVM refresh of a table written by
    :func:`materialize_rollup_table`: apply the change feed and INSERT
    OVERWRITE only the partitions the delta touched (dynamic partition
    overwrite via ``maintenance.overwrite_changed_partitions``);
    months that end up with zero groups are dropped explicitly (a
    dynamic overwrite never rewrites a partition absent from the
    written data, so a fully-deleted month would otherwise leave stale
    files). Untouched partitions keep their files byte-identical — the
    test pins this. Returns refresh stats for the caller's audit
    log."""
    import shutil

    from ..maintenance import overwrite_changed_partitions

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    delta_plus, delta_minus, new_base = derive_cdc_states(orders)
    old_internal = spark.table(table).drop("month_key")
    refreshed = grain_delta_merge(
        old_internal, delta_plus, delta_minus, new_base, unit, period_col
    ).withColumn("month_key", F.date_format(period_col, "yyyy-MM"))

    touched = (
        delta_plus.select("o_orderdate")
        .unionAll(delta_minus.select("o_orderdate"))
        .select(
            F.date_format(
                F.date_trunc("month", "o_orderdate"), "yyyy-MM"
            ).alias("month_key")
        )
        .distinct()
    )
    touched_keys = {r["month_key"] for r in touched.collect()}  # bounded: months
    # materialize BEFORE the overwrite: the refreshed plan reads the
    # same table the write targets, and Spark (rightly) refuses to
    # overwrite a path that is also being read from
    updates = (
        refreshed.join(F.broadcast(touched), "month_key")
        .select(*spark.table(table).columns)
        .localCheckpoint()
    )
    n_overwritten = overwrite_changed_partitions(
        spark, table, updates, "month_key"
    )
    surviving = {
        r["month_key"]
        for r in updates.select("month_key").distinct().collect()  # bounded
    }
    emptied = sorted(touched_keys - surviving)
    for key in emptied:
        spark.sql(f"ALTER TABLE {table} DROP IF EXISTS PARTITION (month_key='{key}')")
        shutil.rmtree(f"{warehouse}/{table}/month_key={key}", ignore_errors=True)
    return {
        "partitions_overwritten": n_overwritten,
        "partitions_dropped": len(emptied),
        "touched_months": sorted(touched_keys),
    }


def column_diff_profile(orders: DataFrame) -> DataFrame:
    """Column-level CDC diff report — the "what actually changed"
    audit a data-diff tool prints before a MERGE is trusted (the
    snapshot-changelog question of ``pipeline.corpus_snapshot_diff``
    asked at COLUMN grain): rows added/removed/matched, then per
    column how many matched rows carry a different value, with shares
    in exact integer basis points.

    The change derivation extends :func:`derive_cdc_states`' fixture
    discipline with a second update class so more than one column
    moves: keys %97 deleted, %53 price +100.00, %61 priority
    re-flagged, %101 cloned with negated keys (inserts). The oracle
    recomputes the same diff from scratch in ANSI SQL.

    Scale shape: ONE full-outer join co-partitioned on the key, then a
    single conditional aggregate — no per-column scans; the report
    unpivots from the 1-row aggregate (stack), never replaying the
    join. Null-safe equality (<=>) so NULL→value transitions count as
    changes."""
    k = F.col("o_orderkey")
    is_del = k % 97 == 0
    is_upd_price = (k % 53 == 0) & ~is_del
    is_upd_prio = (k % 61 == 0) & ~is_del
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    old = orders.select(*cols)
    new = (
        orders.filter(~is_del)
        .withColumn(
            "o_totalprice",
            F.when(is_upd_price, F.col("o_totalprice") + 100.0).otherwise(
                F.col("o_totalprice")
            ),
        )
        .withColumn(
            "o_orderpriority",
            F.when(
                is_upd_prio, F.concat(F.lit("9-"), F.col("o_orderpriority"))
            ).otherwise(F.col("o_orderpriority")),
        )
        .select(*cols)
        .unionAll(
            orders.filter(k % 101 == 0)
            .withColumn("o_orderkey", -F.col("o_orderkey"))
            .select(*cols)
        )
    )
    a = old.alias("a")
    b = new.alias("b")
    joined = a.join(
        b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    matched = F.col("a.o_orderkey").isNotNull() & F.col("b.o_orderkey").isNotNull()

    def changed(c):
        return F.sum(
            F.when(matched & ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")), 1).otherwise(0)
        )

    agg = joined.agg(
        F.sum(F.when(F.col("a.o_orderkey").isNull(), 1).otherwise(0)).alias("added"),
        F.sum(F.when(F.col("b.o_orderkey").isNull(), 1).otherwise(0)).alias("removed"),
        F.sum(F.when(matched, 1).otherwise(0)).alias("matched"),
        *[changed(c).alias(f"chg_{c}") for c in cols[1:]],
    )
    return agg.select(
        F.expr(
            "stack(8, "
            "'rows_added', added, "
            "'rows_removed', removed, "
            "'rows_matched', matched, "
            + ", ".join(
                f"'{c}', chg_{c}" for c in cols[1:]
            )
            + ") AS (metric, n)"
        ),
        F.col("matched").alias("m"),
    ).select(
        "metric",
        F.col("n").cast("long").alias("n"),
        F.expr("(10000 * n) div m").cast("long").alias("share_bps"),
    ).orderBy("metric")


def ivm_multigrain_refresh(orders: DataFrame) -> DataFrame:
    """Incrementally maintained ROLLUP grain lattice (the r12 verdict
    #3 order; Gupta & Mumick §4: a lattice whose finest grain carries
    per-group counts is self-maintainable as a unit). The engine
    maintains ONLY the finest grain — day × status — through the
    change feed (:func:`grain_delta_merge`, O(delta) + partition-
    pruned min/max repair), then DERIVES the coarser lattice levels
    from the maintained state:

    - month × status, year × status: n/sum_cents are additive; min/max
      compose exactly because ``round`` is monotone non-decreasing, so
      min(round(x)) ≡ round(min(x)) and delete-affected day groups
      were already repaired at the finest grain;
    - year (status rolled away) and the grand total, same argument.

    The oracle recomputes every lattice level DIRECTLY from the
    post-change base state — a hash match certifies the derived
    lattice ≡ the recomputed lattice at all five grains, which is the
    Gupta–Mumick lattice-maintenance property itself (reference
    analog: the Cube layer's pre-aggregation hierarchy,
    StockMarketsMonthly.js:1-2, recomputed per refresh there).

    Scale shape at 100 TB: one O(delta) merge at day grain (the view
    is ~|days × statuses| rows), then four view-grain aggregates of
    the CHECKPOINTED maintained state — no second base scan anywhere
    but the delete-repair join, which is partition-pruned."""
    delta_plus, delta_minus, new_base = derive_cdc_states(orders)
    old = grain_rollup_internal(orders, "day", "period_start").localCheckpoint()
    day_state = grain_delta_merge(
        old, delta_plus, delta_minus, new_base, "day", "period_start"
    ).localCheckpoint()  # bounded: |days × statuses|; 5 lattice
    # consumers would replay the merge otherwise (census discipline)

    def _publish(df, grain: str):
        return df.select(
            F.lit(grain).alias("grain"),
            F.col("period_start").cast("timestamp").alias("period_start"),
            "orderstatus",
            F.col("n_orders").cast("long").alias("n_orders"),
            F.round(F.col("sum_cents") / 100.0, 2).alias("sum_price"),
            (
                F.expr(
                    "(2 * sum_cents * 100 + n_orders) div (2 * n_orders)"
                ).cast("double")
                / F.lit(10000.0)
            ).alias("avg_price"),
            "min_price",
            "max_price",
        )

    def _lift(period_expr, status_expr):
        return day_state.groupBy(
            period_expr.alias("period_start"), status_expr.alias("orderstatus")
        ).agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_price").alias("min_price"),
            F.max("max_price").alias("max_price"),
        )

    day = _publish(day_state, "day")
    month = _publish(
        _lift(F.date_trunc("month", "period_start"), F.col("orderstatus")),
        "month",
    )
    year = _publish(
        _lift(F.date_trunc("year", "period_start"), F.col("orderstatus")),
        "year",
    )
    year_all = _publish(
        _lift(F.date_trunc("year", "period_start"), F.lit("ALL")), "year_all"
    )
    total = _publish(
        _lift(F.lit(None).cast("timestamp"), F.lit("ALL")), "total"
    )
    return (
        day.unionAll(month)
        .unionAll(year)
        .unionAll(year_all)
        .unionAll(total)
        .orderBy("grain", "period_start", "orderstatus")
    )


def ivm_bitmap_distinct(orders: DataFrame) -> DataFrame:
    """Incrementally maintained DISTINCT-count view (the r12 verdict
    #3 order, second view class). COUNT(DISTINCT) is NOT
    self-maintainable from the count alone — a delete may or may not
    remove the last supporting row — so the maintained state is the
    Gupta–Mumick counted-support auxiliary: (month, custkey) → number
    of supporting base rows, maintained additively (plus inserts,
    minus deletes; groups at zero leave the support set). The
    published view derives each month's exact distinct-customer count
    from the surviving support set via the BITMAP discipline of
    ``agg_bitmap_distinct``: custkeys bucket into 64-bit words
    (``custkey div 64``), a ``bit_or`` builds each word's mask, and
    ``sum(bit_count(mask))`` is the distinct count — no
    count(DISTINCT) shuffle on the publish path.

    The oracle recomputes count(DISTINCT)/counts directly from the
    post-change base — hash match certifies maintained ≡ recomputed.

    Scale shape at 100 TB: the auxiliary is (month, custkey)-grain —
    large but partitioned by month and maintained with ONE O(delta)
    merge join; publish is two map-side-combinable aggregates
    (word grain, then month grain). No global shuffle beyond the
    month × word key."""
    cols = ["o_orderdate", "o_orderstatus", "o_totalprice", "o_custkey"]
    delta_plus, delta_minus, new_base = derive_cdc_states(orders, cols)
    month = F.date_trunc("month", F.col("o_orderdate")).alias("order_month")
    grain = ["order_month", "o_custkey"]
    aux_old = (
        orders.groupBy(month, "o_custkey")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint()  # the maintained state; bounded at test SFs
    )
    plus_g = delta_plus.groupBy(month, "o_custkey").agg(
        F.count("*").alias("n_plus")
    )
    minus_g = delta_minus.groupBy(month, "o_custkey").agg(
        F.count("*").alias("n_minus")
    )
    aux_new = (
        aux_old.join(plus_g, grain, "full_outer")
        .join(minus_g, grain, "full_outer")
        .select(
            *grain,
            (
                F.coalesce("cnt", F.lit(0))
                + F.coalesce("n_plus", F.lit(0))
                - F.coalesce("n_minus", F.lit(0))
            ).alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    words = aux_new.groupBy(
        "order_month", F.expr("o_custkey div 64").alias("word")
    ).agg(
        F.expr("bit_or(shiftleft(1L, CAST(o_custkey % 64 AS INT)))").alias(
            "mask"
        ),
        F.sum("cnt").alias("n_rows"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("n_repeat"),
    )
    return (
        words.groupBy("order_month")
        .agg(
            F.sum(F.bit_count("mask")).cast("long").alias("n_distinct_cust"),
            F.sum("n_rows").cast("long").alias("n_orders"),
            F.sum("n_repeat").cast("long").alias("n_repeat_cust"),
        )
        .orderBy("order_month")
    )
