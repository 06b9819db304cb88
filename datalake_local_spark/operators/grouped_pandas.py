"""Pandas-UDF operator surfaces (SURVEY §2.7) — the *sanctioned* Python
escape hatches, shown once each so the pattern is pinned:

- grouped-map ``applyInPandas``: per-group kernel taking/returning a pandas
  DataFrame (here: within-group z-scores, ddof=1 to match SQL stddev_samp);
- scalar ``@pandas_udf``: Arrow-vectorized column kernel (here: logistic
  scoring), used only when no builtin expression exists.

Both are Arrow-batched; neither is row-at-a-time. Everything that CAN be a
builtin expression elsewhere in this engine IS one — these exist for
genuinely procedural kernels (numpy/scipy math, model inference).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_chars_within_lang(documents: DataFrame) -> DataFrame:
    """Per-language z-score of document length via grouped-map
    applyInPandas. Equivalent to window avg/stddev_samp (the oracle) —
    implemented as a grouped kernel to pin the §2.7 surface; state per
    group is one pandas frame, so groups must fit an executor (true for
    any bounded group key; use the window form for unbounded groups)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        z = (pdf["n_chars"] - mu) / sd if sd and sd == sd else pd.Series([None] * len(pdf))
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "z_chars": z.round(4)}
        )

    return documents.select("doc_id", "lang", "n_chars").groupBy("lang").applyInPandas(
        kernel, schema="doc_id bigint, lang string, z_chars double"
    )


def _logistic_udf():
    """Arrow-vectorized scalar kernel: logistic(x) = 1/(1+e^-x).
    Built lazily — pandas_udf resolves its return type against the active
    session, so the decorator can't run at import time."""

    @F.pandas_udf("double")
    def logistic(x: pd.Series) -> pd.Series:
        import numpy as np

        return 1.0 / (1.0 + np.exp(-x))

    return logistic


def logistic_quality_score(documents: DataFrame) -> DataFrame:
    """Composite quality score squashed through the scalar pandas UDF:
    score = logistic((n_chars - 250) / 100). The linear part is a builtin
    expression; only the vectorized transcendental goes through Arrow."""
    raw = (F.col("n_chars") - F.lit(250.0)) / F.lit(100.0)
    return documents.select(
        "doc_id",
        F.round(_logistic_udf()(raw), 6).alias("quality_sigmoid"),
    )


def geometric_mean_udaf(orders: DataFrame) -> DataFrame:
    """GROUPED_AGG pandas UDF — the UDAF surface (§2.7): a custom
    aggregate Spark lacks natively (geometric mean), Arrow-batched per
    group. Partial aggregation does NOT apply to grouped-agg pandas UDFs
    (each group's values ship to one executor), so this surface is for
    bounded groups; unbounded keys should decompose into algebraic pieces
    (here: exp(avg(ln x)) — the oracle's formulation) instead."""
    import numpy as np

    @F.pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    return (
        orders.groupBy("o_orderpriority")
        .agg(F.round(geo_mean("o_totalprice"), 4).alias("geo_mean_price"))
    )


def top_tokens_udtf(documents: DataFrame, max_doc_id: int = 50, k: int = 3) -> DataFrame:
    """Python UDTF (Spark 4) — the table-function surface (§2.7): one
    document row in → its top-k (token, count) rows out, consumed via
    ``lateralJoin`` (the reference's semi-structured 'Key: N' extraction,
    assets.py:187, is the same one-to-many shape). Row-at-a-time Python
    by nature → demonstrates the API on a bounded slice; the hot-path
    equivalent is split + explode + window (which the oracle uses)."""
    from collections import Counter

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string, n bigint, rank int")
    class TopTokens:
        def eval(self, doc_id, text):
            counts = Counter((text or "").lower().split())
            ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            for i, (tok, n) in enumerate(ranked[:k], start=1):
                yield doc_id, tok, n, i

    docs = documents.filter(F.col("doc_id") < max_doc_id).select(
        F.col("doc_id").alias("in_doc_id"), "text"
    )
    return docs.lateralJoin(
        TopTokens(F.col("in_doc_id").outer(), F.col("text").outer())
    ).select("doc_id", "token", "n", "rank")


def ewma_per_user(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Exponentially weighted moving average of `value` per user over
    event time — the sequential time-series smoother (y_t = (1-a)y_{t-1}
    + a·x_t) that has no efficient closed-form column expression, so it
    runs as a per-key applyInPandas kernel: one shuffle on user_id, one
    ordered pass per group.

    Oracle-checked (r15, converted from rows-only): pandas
    ``ewm(adjust=False)`` evaluates exactly ``(1-a)*acc + a*x`` in
    doubles per step (verified bit-identical to the naive recursion),
    and DuckDB ``list_reduce(vals[1:rn], (acc, x) -> 0.7*acc + 0.3*x)``
    performs the same correctly-rounded double ops — so both engines
    emit BIT-IDENTICAL doubles and the value is published UNROUNDED.
    Rounding here would break parity, not help it: EWMA of 2dp inputs
    is a denominator-10^t rational whose shortest double repr lands on
    exact 7th-digit halves from t>=5 on, where Spark's HALF_UP and
    DuckDB's rint diverge (the r9 means-of-2dp hazard class)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="stable")
        pdf["ewma"] = pdf["value"].ewm(alpha=alpha, adjust=False).mean()
        return pdf[["event_id", "user_id", "ts", "value", "ewma"]]

    return events.select("event_id", "user_id", "ts", "value").groupBy("user_id").applyInPandas(
        kernel, schema="event_id long, user_id long, ts timestamp, value double, ewma double"
    )


def arrow_byte_profile(documents: DataFrame) -> DataFrame:
    """§2.7 surface: ``mapInArrow`` — the zero-copy sibling of
    ``mapInPandas`` (the kernel receives ``pyarrow.RecordBatch``es
    directly, skipping the Arrow→pandas conversion both ways). The
    right tier when the kernel is itself Arrow-native: here pure
    ``pyarrow.compute`` calls — utf8 byte length, codepoint length,
    and the ASCII-purity flag — with no per-row Python and no pandas
    materialization.

    Map-only, one scan, no shuffle; certified by an ANSI oracle
    (octet_length / length are engine-portable), which makes this the
    hash-checked proof the Arrow path returns byte-identical data."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        for batch in batches:
            t = batch.column(batch.schema.get_field_index("text"))
            n_bytes = pc.binary_length(pc.cast(t, pa.binary()))
            n_chars = pc.utf8_length(t)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    pc.cast(n_bytes, pa.int64()),
                    pc.cast(n_chars, pa.int64()),
                    pc.equal(n_bytes, n_chars),
                ],
                ["doc_id", "n_bytes", "n_chars", "is_ascii"],
            )

    return documents.select("doc_id", "text").mapInArrow(
        kernel, "doc_id long, n_bytes long, n_chars long, is_ascii boolean"
    )
