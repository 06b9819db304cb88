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


def _cents(col: Column) -> Column:
    """2-decimal money value → exact integer cents (value is generated
    with 2 decimals; round() clears the float representation noise)."""
    return F.round(col * 100).cast("long")


#: round-half-up of (sum_cents / n) to 4 decimals, entirely in BIGINT
#: arithmetic: float averaging ties at the 4th decimal (e.g. 307.03/8 =
#: 38.37875 exactly) and Spark (shortest-repr HALF_UP) vs DuckDB (binary
#: value) then disagree by one ulp-of-rounding. Integer fixed-point is
#: engine-independent by construction — FOR NONNEGATIVE sum_cents only:
#: Spark `div` truncates toward zero while DuckDB `//` floors, so a
#: negative sum would diverge by 1 at e4 between the engines. The events
#: generator produces prices > 0 (value ∈ (0, 1000)), so the assumption
#: holds for every registered query; a signed-money caller would need
#: sign-safe half-up ((2*s + sign(s)*n) div (2*n) with floor-div
#: semantics pinned on both engines) before reusing this expression.
_AVG_E4 = "(sum_cents * 200 + n) div (2 * n)"


def ohlcv_daily(events: DataFrame) -> DataFrame:
    """The reference's whole analytical purpose — OHLCV aggregation by
    symbol × time grain (StockMarkets.js measures/dimensions) — over the
    events table (event_type ≙ symbol, value ≙ price, day grain).

    The average is computed in exact cents fixed-point (see _AVG_E4):
    money averages are the one measure where binary-float rounding
    diverges between engines at decimal tie points."""
    agg = (
        events.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("event_type").alias("symbol"),
            "value",
            _cents(F.col("value")).alias("cents"),
        )
        .groupBy("day", "symbol")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("value_sum"),
            F.sum("cents").alias("sum_cents"),
            F.round(F.min("value"), 4).alias("value_min"),
            F.round(F.max("value"), 4).alias("value_max"),
        )
    )
    return agg.select(
        "day",
        "symbol",
        "n",
        "value_sum",
        (F.expr(_AVG_E4) / 10000.0).alias("value_avg"),
        "value_min",
        "value_max",
    )


def prediction_vs_actual(events: DataFrame) -> DataFrame:
    """A9/J1: the StockMarketsPrediction shape — actuals LEFT JOIN a
    prediction table on the composite (time grain, symbol) key, aggregating
    both sides' measures (StockMarketsPrediction.js:2-56).

    The 'prediction' here is the previous day's daily average (a naive
    persistence forecast) so the query is self-contained on testdata.
    """
    daily = (
        events.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("event_type").alias("symbol"),
            _cents(F.col("value")).alias("cents"),
        )
        .groupBy("day", "symbol")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("sum_cents"))
        .select("day", "symbol", F.expr(_AVG_E4).alias("avg_e4"))
    )
    pred = daily.select(
        F.date_add(F.col("day").cast("date"), 1).cast("timestamp").alias("day"),
        "symbol",
        F.col("avg_e4").alias("pred_e4"),
    )
    return (
        daily.join(pred, ["day", "symbol"], "left")
        .select(
            "day",
            "symbol",
            (F.col("avg_e4") / 10000.0).alias("value_avg"),
            (F.col("pred_e4") / 10000.0).alias("value_predicted"),
            ((F.col("avg_e4") - F.col("pred_e4")) / 10000.0).alias("prediction_error"),
        )
    )
