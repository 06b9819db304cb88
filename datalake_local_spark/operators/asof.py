"""As-of (temporal) join — a capability Spark lacks natively.

For each order, find the latest event of that customer at-or-before the
order date. Implemented as equi-join on the key + max-filter aggregation:

    orders ⋈ events ON user_id = o_custkey AND ts <= o_orderdate
    → groupBy order → max(ts)

Scale design: the equi-part (user_id = custkey) drives the shuffle, so this
is a plain hash join at any scale; the temporal predicate is applied during
the probe. For dense per-key event streams (where join-then-aggregate
explodes), the alternative is `applyInPandas` with `pd.merge_asof` per key
bucket — kept in streaming/event_windows.py's sessionizer family as the
pattern reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
