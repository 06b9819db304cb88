"""End-to-end training-corpus preparation — the composition the
individual LLM operators exist for, as one callable stage chain:

    raw documents → quality gate → exact dedup → sequence packing

Each stage is the already-tested operator; the composition proves the
operators chain without materialization barriers (one logical plan end
to end, so Catalyst pushes the quality-gate predicates into the scan
that feeds dedup). The SQL-expressible stages make the whole pipeline
oracle-checkable; the near-dup (MinHash) stage is deliberately NOT in
this chain because its seeded-hash semantics have no ANSI oracle — at
production it slots between dedup and packing (same DataFrame-in/
DataFrame-out contract, see dedup.minhash_lsh_candidates +
dedup.duplicate_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_local_spark.llm.text import _norm_text, quality_gate, pack_sequences


def prepare_corpus(documents: DataFrame, target_tokens: int = 512) -> DataFrame:
    """Run the SQL-expressible corpus-prep chain; returns per-bin packing
    stats of the SURVIVING corpus plus stage-attrition columns.

    1. quality gate: drop documents failing any rule;
    2. exact dedup: keep the lowest doc_id per normalized-text group;
    3. pack survivors into ``target_tokens`` context windows.
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
    return pack_sequences(survivors, target_tokens)
