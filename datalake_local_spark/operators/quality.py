"""Relational data-quality validation — declarative constraint checks
(NOT NULL, key uniqueness, referential integrity, range) evaluated as
one report: rule name → violation count.

The reference stack has no validation layer (string-spliced INSERTs,
assets.py:105-115, fail silently on bad data); a warehouse ingest needs
the checks where the data lands. Every rule is a DataFrame aggregate —
null/range rules fold into ONE pass over the fact table (conditional
sums); uniqueness is one groupBy on the key; referential integrity is
one anti join against the (broadcastable when bounded) parent keys. No
rule ever collects rows to the driver — violation SAMPLES would be a
`.filter(...).limit(k)` follow-up on the same predicates."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def integrity_report(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Constraint report for the orders fact: one row per rule.

    Rules: key columns non-null, o_orderkey unique, o_custkey references
    customer.c_custkey, o_totalprice positive, o_orderstatus in its
    domain."""
    one_pass = orders.agg(
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("null_orderkey"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_custkey"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("nonpositive_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).alias("bad_status"),
    )
    dup_keys = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("duplicate_orderkeys"))
    )
    orphans = (
        orders.join(
            customer.select("c_custkey"),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        ).agg(F.count("*").alias("orphan_custkeys"))
    )
    wide = one_pass.crossJoin(F.broadcast(dup_keys)).crossJoin(F.broadcast(orphans))
    return wide.select(
        F.expr(
            "stack(6, "
            "'null_orderkey', null_orderkey, "
            "'null_custkey', null_custkey, "
            "'nonpositive_price', nonpositive_price, "
            "'bad_status', bad_status, "
            "'duplicate_orderkeys', duplicate_orderkeys, "
            "'orphan_custkeys', orphan_custkeys)"
        ).alias("rule", "n_violations")
    ).withColumn("passed", F.col("n_violations") == 0)
