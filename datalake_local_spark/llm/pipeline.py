"""End-to-end training-corpus preparation — the composition the
individual LLM operators exist for, as one callable stage chain:

    raw documents → quality gate → exact dedup → sequence packing

Each stage is the already-tested operator; the composition proves the
operators chain without materialization barriers (one logical plan end
to end, so Catalyst pushes the quality-gate predicates into the scan
that feeds dedup). The SQL-expressible stages make the whole pipeline
oracle-checkable; the near-dup (MinHash) stage is OFF by default
because its seeded-hash semantics have no ANSI oracle — pass
``near_dedup=True`` to slot it between exact dedup and packing (LSH
candidates → connected components → keep each component's canonical
doc), which is the production 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_local_spark.llm.text import _norm_text, quality_gate, pack_sequences


def prepare_corpus(
    documents: DataFrame,
    target_tokens: int = 512,
    near_dedup: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """Run the corpus-prep chain; returns per-bin packing stats of the
    SURVIVING corpus.

    1. quality gate: drop documents failing any rule;
    2. exact dedup: keep the lowest doc_id per normalized-text group;
    3. (``near_dedup=True``) near-dup removal: MinHash-LSH candidate
       pairs → connected components (star, O(log d) rounds) → keep only
       each component's canonical (min doc_id) member. Runs AFTER exact
       dedup so the LSH stage shingles each distinct text once;
    4. pack survivors into ``target_tokens`` context windows.

    ``stats`` (with ``near_dedup``) receives the component loop's
    ``rounds`` / ``n_edges`` / ``num_partitions``.
    """
    kept_ids = quality_gate(documents).filter(F.col("keep")).select("doc_id")
    gated = documents.join(kept_ids, "doc_id", "left_semi")
    canonical = (
        gated.select(F.md5(_norm_text(F.col("text"))).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = documents.join(canonical, "doc_id", "left_semi")
    if near_dedup:
        from datalake_local_spark.llm import dedup

        components = dedup.duplicate_components(
            survivors,
            pairs=dedup.minhash_lsh_candidates(survivors),
            algorithm="star",
            stats=stats,
        )
        survivors = survivors.join(
            components.filter(F.col("is_canonical")).select("doc_id"), "doc_id", "left_semi"
        )
    return pack_sequences(survivors, target_tokens)


def weighted_source_sample(
    documents: DataFrame, weights: dict[str, float] | None = None, default_rate: float = 0.5
) -> DataFrame:
    """Deterministic corpus mixing — keep each document with its source's
    target rate (the "data mixture" step of LLM pre-training: up-weight
    books/wiki, down-sample web). The keep/drop decision is a pure
    function of (doc_id, source) via md5, so the sample is reproducible
    run-to-run and engine-to-engine with NO RNG state: a doc is kept iff
    the first 8 hex chars of md5(doc_id || ':' || source) sort below the
    rate's hex threshold (lexicographic lowercase-hex compare ==
    numeric compare — exactly portable to the ANSI oracle).

    Returns the per-source audit the pipeline operator owes its caller:
    (source, rate, n_docs, n_kept, realized_rate). Scan-speed: one pass,
    token-free, aggregate at source grain; at 100 TB the decision column
    is codegen'd into the scan. The CASE chain suits the usual handful
    of named mixtures; with thousands of sources, broadcast-join a
    (source, rate, threshold) dim table instead — same decision
    expression, rate column from the join.
    """
    weights = weights if weights is not None else {"src0": 1.0, "src1": 0.25, "src2": 0.0}

    def thr(rate: float) -> str:
        n = max(0, min(int(rate * (1 << 32)), 1 << 32) - 1)
        return format(n, "08x") if rate > 0 else ""

    rate_col = F.lit(default_rate)
    thr_col = F.lit(thr(default_rate))
    for src, rate in sorted(weights.items()):
        rate_col = F.when(F.col("source") == src, F.lit(rate)).otherwise(rate_col)
        thr_col = F.when(F.col("source") == src, F.lit(thr(rate))).otherwise(thr_col)
    decided = documents.select(
        "source",
        rate_col.alias("rate"),
        (
            F.substring(F.md5(F.concat_ws(":", F.col("doc_id"), F.col("source"))), 1, 8)
            <= thr_col
        ).alias("kept"),
    )
    return (
        decided.groupBy("source", "rate")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("kept").cast("int")).alias("n_kept"),
            F.round(F.avg(F.col("kept").cast("double")), 6).alias("realized_rate"),
        )
        .orderBy("source")
    )
