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
