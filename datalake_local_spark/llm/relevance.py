"""Relevance scoring over ``documents`` — the retrieval half of a
training-data pipeline (quality-weighted sampling, dedup tie-breaking,
eval-set mining all rank documents against terms or queries):

* TF-IDF top terms per document;
* BM25 scores for a fixed query (Robertson/Sparck Jones k1-b form).

Both are pure Catalyst column expressions with exact ANSI-SQL oracles.
Shuffle profile at 100 TB follows the unigram lessons from llm/text.py:
token-grain aggregates are map-side combined; the document-frequency
table joins back WITHOUT a broadcast hint (a web corpus vocabulary is
10^8+ terms — AQE may still broadcast when it is actually small);
per-doc top-k windows partition by doc_id (never a global window).

Reference parity: the reference exposes no retrieval scoring — this is
part of the §2.9 beyond-inventory LLM-pipeline surface (SURVEY.md §2.9),
built on the same documents table as the text-analysis operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_local_spark.llm.text import _norm_text


def _doc_tokens(documents: DataFrame) -> DataFrame:
    """(doc_id, token, tf, dl): term frequency per doc + doc length,
    from ONE tokenize+explode (the groupBy carries doc+token grain with
    map-side combine; dl is recovered as sum(tf) over the doc — no
    second corpus scan)."""
    tf = (
        documents.select(
            "doc_id", F.explode(F.split(_norm_text(F.col("text")), " ")).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    w_dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return tf.join(w_dl, "doc_id")


def tfidf_top_terms(documents: DataFrame, k: int = 5) -> DataFrame:
    """Top-k terms per document by TF-IDF.

    tf = term count / doc length; idf = log10(N / df). The df table is
    token-grain (distinct doc per token counted in the same aggregate);
    N is a tree-reduced scalar broadcast back. Ranking windows partition
    by doc_id, so no single-partition window anywhere.
    """
    from pyspark.sql import Window as W

    toks = _doc_tokens(documents)
    df_tbl = toks.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = documents.agg(F.count("*").alias("n_docs"))
    scored = (
        toks.join(df_tbl, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                (F.col("tf") / F.col("dl")) * F.log10(F.col("n_docs") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "token", "tfidf")
    )


def bm25_scores(
    documents: DataFrame,
    query_terms: tuple = ("data", "learning", "model"),
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """Top-k documents for ``query_terms`` by BM25.

    idf = log10(1 + (N - df + 0.5)/(df + 0.5)); score = Σ_terms
    idf·tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)). The exploded token
    stream is filtered to the query terms BEFORE any shuffle (the filter
    reaches the scan side), so the aggregate carries only
    matching-term rows — a 3-term query over 100 TB shuffles 3·|matching
    docs| rows, not the corpus. avgdl and N are scalar aggregates
    broadcast back; df for the query terms is a tiny (≤ |terms|) table.
    """
    terms = [t.lower() for t in query_terms]
    toks = _doc_tokens(documents).filter(F.col("token").isin(terms))
    df_tbl = toks.groupBy("token").agg(F.count("*").alias("df"))
    scalars = documents.select(
        F.size(F.split(_norm_text(F.col("text")), " ")).alias("_dl")
    ).agg(F.count("*").alias("n_docs"), F.avg("_dl").alias("avgdl"))
    idf = F.log10(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_term = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        toks.join(F.broadcast(df_tbl), "token")
        .crossJoin(F.broadcast(scalars))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(idf * tf_term), 6).alias("bm25"),
            F.count("*").alias("n_matched_terms"),
        )
    )
    return scored.orderBy(F.col("bm25").desc(), "doc_id").limit(k)
