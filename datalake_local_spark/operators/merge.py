"""Table-maintenance operators: MERGE (upsert), SCD2, and skew-safe
two-phase aggregation.

The north star names Delta/Iceberg table ops as the likely approach; no
table-format jars ship in this runtime, so MERGE INTO is provided as the
standard emulation — anti-join + union — which is exactly what a format's
MERGE compiles to without deletion vectors. The functions are pure
DataFrame → DataFrame so they drop in unchanged over Delta/Iceberg later
(swap the final write for ``MERGE INTO``).

Scale notes: merge shuffles both sides on the key once; SCD2 adds a window
over the business key. Salted aggregation splits one hot key over
``salt_buckets`` partial groups, then re-aggregates — the standard fix when
one key would otherwise serialize into a single reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE semantics: rows matched on `keys` are replaced by source
    (WHEN MATCHED THEN UPDATE SET *), unmatched source rows are inserted
    (WHEN NOT MATCHED THEN INSERT *), unmatched target rows survive."""
    kept = target.join(source.select(*keys), keys, "left_anti")
    return kept.unionByName(source)


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current versions whose
    tracked attributes changed and append the new version rows; history is
    derivable by ordering on the effective column (window over the business
    key). Returns the merged history table."""
    joined = updates.alias("u").join(
        current.alias("c"), F.col(f"u.{key}") == F.col(f"c.{key}"), "left"
    )
    changed = joined.filter(
        F.coalesce(
            ~F.struct(*[F.col(f"u.{t}") for t in tracked]).eqNullSafe(
                F.struct(*[F.col(f"c.{t}") for t in tracked])
            ),
            F.lit(True),
        )
    ).select("u.*")
    history = current.unionByName(changed)
    w = W.partitionBy(key).orderBy(F.col(effective_col))
    return history.withColumn(
        "valid_to", F.lead(effective_col, 1).over(w)
    ).withColumn("is_current", F.col("valid_to").isNull())


def salted_two_phase_agg(
    events: DataFrame, salt_buckets: int = 8
) -> DataFrame:
    """Skew-safe aggregation: phase 1 groups by (key, salt) — a hot key
    spreads over `salt_buckets` reducers — phase 2 merges partials by key.
    Result is identical to a direct groupBy (oracle-checked); the salt is
    a deterministic function of another column, not a random number, so
    the query stays reproducible."""
    salted = events.withColumn("salt", (F.col("event_id") % salt_buckets))
    phase1 = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"), F.sum("value").alias("pv")
    )
    return phase1.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.round(F.sum("pv"), 2).alias("sum_value"),
    )


def scd2_snapshot_at(history: DataFrame, effective_col: str, asof: str) -> DataFrame:
    """Point-in-time reconstruction of an SCD2 history: the version rows
    valid AS OF ``asof`` (effective ≤ asof < valid_to, open-ended
    current rows included) — the query that makes type-2 history
    useful: 'what did the dimension look like last quarter?'.

    Map-only filter over the history table; on a date-partitioned lake
    both predicates prune partitions. Composes with scd2_apply's
    output schema (valid_to / is_current)."""
    a = F.lit(asof).cast("date")
    return history.filter(
        (F.col(effective_col) <= a)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > a))
    )
