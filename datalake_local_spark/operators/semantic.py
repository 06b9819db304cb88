"""Semantic-layer façade — the reference's Cube schema contract as a
library function (SURVEY.md §1.1 'semantic cube', §2.4; conf/cube/schema/
StockMarkets.js:12-127, StockMarketsPrediction.js:2-56).

A Cube definition is (sql table, measures, dimensions, time grain); a
request materializes to ``GROUP BY dimensions`` + aggregated measures —
here one declarative helper so a StockMarkets-style request is one call.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: measure name → aggregate builder (the Cube `type:` vocabulary,
#: StockMarkets.js:13-88)
MEASURE_TYPES = {
    "count": lambda c: F.count("*"),
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
}


def cube_query(
    table: DataFrame,
    measures: dict[str, tuple[str, str]],
    dimensions: dict[str, Column | str],
    round_to: int = 4,
) -> DataFrame:
    """Evaluate a semantic-cube request.

    measures: out_name → (measure_type, source_column)
    dimensions: out_name → column/expression (e.g. date_trunc for grains)
    """
    dims = [
        (F.col(expr) if isinstance(expr, str) else expr).alias(name)
        for name, expr in dimensions.items()
    ]
    aggs = []
    for name, (mtype, col) in measures.items():
        agg = MEASURE_TYPES[mtype](col)
        if mtype in ("sum", "avg", "min", "max"):
            agg = F.round(agg, round_to)
        aggs.append(agg.alias(name))
    return table.groupBy(*dims).agg(*aggs)


def ohlcv_daily(events: DataFrame) -> DataFrame:
    """The reference's whole analytical purpose — OHLCV aggregation by
    symbol × time grain (StockMarkets.js measures/dimensions) — over the
    events table (event_type ≙ symbol, value ≙ price, day grain)."""
    return cube_query(
        events,
        measures={
            "n": ("count", "*"),
            "value_sum": ("sum", "value"),
            "value_avg": ("avg", "value"),
            "value_min": ("min", "value"),
            "value_max": ("max", "value"),
        },
        dimensions={
            "day": F.date_trunc("day", F.col("ts")),
            "symbol": "event_type",
        },
    )


def prediction_vs_actual(events: DataFrame) -> DataFrame:
    """A9/J1: the StockMarketsPrediction shape — actuals LEFT JOIN a
    prediction table on the composite (time grain, symbol) key, aggregating
    both sides' measures (StockMarketsPrediction.js:2-56).

    The 'prediction' here is the previous day's daily average (a naive
    persistence forecast) so the query is self-contained on testdata.
    """
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("event_type").alias("symbol"),
    ).agg(F.avg("value").alias("value_avg"))
    pred = daily.select(
        F.date_add(F.col("day").cast("date"), 1).cast("timestamp").alias("day"),
        "symbol",
        F.col("value_avg").alias("value_predicted"),
    )
    return (
        daily.join(pred, ["day", "symbol"], "left")
        .select(
            "day",
            "symbol",
            F.round("value_avg", 4).alias("value_avg"),
            F.round("value_predicted", 4).alias("value_predicted"),
            F.round(F.col("value_avg") - F.col("value_predicted"), 4).alias("prediction_error"),
        )
    )
