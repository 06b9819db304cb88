"""Regenerate PLANS.md: captured physical plans for the headline queries
with the plan property each one exists to demonstrate. Run from the repo
root: ``python tools/dump_plans.py`` (~1 min, local session).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from datalake_local_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

#: query -> the property the plan must show (rendered as commentary)
SHOWCASE = {
    "flagship_revenue_month_region": (
        "Bounded dims (nation, region) broadcast; fact-side joins hash on the "
        "SF-scaled keys; one partial-aggregated shuffle for the (month, region) "
        "grain. No cartesian products, no global sorts."
    ),
    "tpch_forecast_revenue": (
        "Pure pushdown scan-agg: every predicate (shipdate range, discount band, "
        "quantity bound) reaches the parquet source as PushedFilters; ReadSchema "
        "carries only the projected columns."
    ),
    "join_broadcast": (
        "part is explicitly broadcast: BroadcastHashJoin, no shuffle of the "
        "lineitem side beyond the final aggregation."
    ),
    "join_range_bucketized": (
        "The time-range theta predicate rides an equi-join on (user, bucket): "
        "the plan is a hash/sort-merge join, never BroadcastNestedLoopJoin."
    ),
    "window_topk_per_group": (
        "Window + rank filter: one shuffle on the partition key; no global sort "
        "of the full table."
    ),
    "dedup_exact": (
        "Dedup groups on md5(normalized text): the shuffle key is the 16-byte "
        "fingerprint, never the document text."
    ),
    "sim_cosine_topk": (
        "Query vectors broadcast; corpus scanned once; per-query top-k via "
        "window over the scored pairs."
    ),
    "tpch_promo_revenue": (
        "NO explicit broadcast hint on the SF-scaled part side (round 3): the "
        "join strategy is AQE's runtime call — broadcast while part fits, "
        "sort-merge at scale. The logical plan carries no ResolvedHint "
        "(asserted in test_no_broadcast_hint_on_sf_scaled_relations)."
    ),
    "dedup_embedding_cosine": (
        "Blocked exact all-pairs (round 3): rows replicate to block-pair "
        "tasks via equi-joins on block ids and a FlatMapGroupsInPandas GEMM "
        "scores each block pair — no CartesianProduct / "
        "BroadcastNestedLoopJoin anywhere; shuffle carries O(n·B) rows, "
        "never O(n²) pairs."
    ),
    "text_pmi_pairs": (
        "Single-pass PMI (round 5): ONE tokenize+explode shuffle feeds both "
        "the unigram and pair grains (ReusedExchange in the executed plan); "
        "the marginal broadcasts are semi-join-PRUNED to tokens surviving "
        "min_pair_count — the full vocab is never hinted. Top-k via "
        "TakeOrderedAndProject, never a global window."
    ),
    "text_tfidf_top_terms": (
        "TF-IDF (rewritten round 6): documents is scanned exactly ONCE — "
        "scoring branch, doc-length, token-grain df and the N scalar all "
        "hang off the same (doc, token, tf) aggregate via ReusedExchange "
        "(r5 paid four corpus tokenizations). The df join back carries no "
        "broadcast hint (web-scale vocab — AQE decides); ranking window "
        "partitions by doc_id, never global."
    ),
    "text_bm25_search": (
        "BM25 (rewritten round 6): documents is scanned exactly TWICE — "
        "the full (doc, token, tf) aggregate (needed for dl and avgdl, "
        "computed once and ReusedExchange'd between its two consumers) "
        "and the query-term-filtered branch (isin pushed below the partial "
        "aggregate, its exchange likewise reused between the scoring join "
        "and the df table). r5 paid a third corpus re-tokenization for "
        "avgdl. Global top-k via TakeOrderedAndProject."
    ),
    "pipeline_mixture_build": (
        "Pretraining mixture (round 6): sampling decision, exact-dedup "
        "canonical flag (min-over-fingerprint window), per-source token "
        "budget and packing bins are COLUMNS on one ledger pass — ONE "
        "documents scan total (the broadcast shard-offset aggregate rides "
        "the same fingerprint exchange via ReusedExchange) vs 12 scans for "
        "a filter-per-stage + join-the-audits shape. Budget prefix sums "
        "are per-(source, shard) windows + a broadcast offset table; no "
        "global window, no per-stage semi-joins."
    ),
    "text_pii_scrub": (
        "PII scrub (round 6): injection, three regexp_counts, chained "
        "regexp_replace masking and the redacted md5 are ONE map-only "
        "projection over the scan — no shuffle anywhere in the plan."
    ),
    "text_dup_ngrams": (
        "Duplicate n-gram profile (round 5): grams are xxhash64-hashed "
        "BEFORE anything shuffles — the df aggregate and the df→pairs join "
        "both move fixed-width longs, never ~50-byte gram strings; no "
        "broadcast hint on the gram-grain table."
    ),
    "dedup_incremental": (
        "Incremental-crawl dedup (round 5): both sides reduce to md5 "
        "fingerprint grain before the join; the existing-corpus side is "
        "fingerprint-DISTINCT (index-sized) and carries no hint — AQE "
        "broadcasts when it fits. No corpus×batch blowup."
    ),
    "tpch_rfm_segments": (
        "RFM segmentation (round 5): quartile thresholds are exact "
        "percentile SCALAR aggregates broadcast back; no global ntile() "
        "window, so the customer table never single-partitions."
    ),
    "tpch_top_supplier": (
        "Q15 global max (round 7): the 'WHERE total = (SELECT max(...))' "
        "form is agg(max) + BroadcastExchange cross-join — no "
        "unpartitioned window, so the SF-scaled supplier-grain aggregate "
        "never funnels through one task just to find a scalar."
    ),
    "text_repetition_signals": (
        "Gopher repetition gate (round 7): ONE documents scan; the "
        "1/2/5-gram families ride a single tagged explode, and every "
        "aggregate is keyed by doc_id — hot boilerplate grams cannot "
        "concentrate because no corpus-grain gram key exists in the plan."
    ),
    "sim_quantize_dim_minmax": (
        "Corpus-calibrated quantization (round 7): the per-dimension "
        "min/max calibration is a 64-row partial-aggregated shuffle "
        "broadcast back onto the (vec, dim) grain; the error profile "
        "re-aggregates on vec_id. No driver collect, no UDF."
    ),
    "text_segment_dedup": (
        "C4 segment dedup (round 7, second wave): segments built map-side "
        "(slice over sequence, ONE explode), keyed by md5(segment); the "
        "keeper relation is (count, min) — both partial-aggregating — and "
        "at bench SF AQE broadcasts it (the 100 TB regime instead reuses "
        "the identical hash(seg_h) exchange: one scan). Final agg is "
        "doc-local."
    ),
    "text_span_coverage": (
        "ExactSubstr span coverage (round 7, second wave): gram starts "
        "shuffle as 8-byte xxhash64 keys; the duplicated-gram flag comes "
        "back as a LEFT SEMI join (no row widening); the interval union is "
        "one per-doc window — task state bounded by a single doc."
    ),
    "pipeline_global_shuffle": (
        "Global training order (round 7, second wave): two-level rank — "
        "per-shard row_number plus broadcast cumulative offsets — with NO "
        "unpartitioned window over the corpus anywhere in the plan; the "
        "only global window runs on the 256-row offset relation."
    ),
    "dedup_bloom_incremental": (
        "Bloom-prefiltered incremental dedup (round 7, second wave): the "
        "existing-index bitmap arrives as a broadcast variable (built by "
        "per-partition OR-reduce), membership is a map-side Arrow lookup, "
        "and only maybe-duplicates reach the confirmation join — the "
        "definite-clean majority is filtered before any exchange."
    ),
    "dedup_kmv_overlap": (
        "KMV cross-source overlap (round 7, second wave): one documents "
        "scan to k-row-per-source sketches (two-level min-k — no "
        "whole-source sort in one task); every pair merge and estimate "
        "runs at sketch grain. The doc-grain pair join of the exact "
        "contamination matrix never appears."
    ),
    "dq_join_estimate": (
        "Pre-flight join sizing (round 7, second wave): two key-grain "
        "partial-aggregated counts, one key-grain join, a single-row "
        "reduce and TakeOrderedAndProject — the exact join cardinality "
        "without executing the data-grain join."
    ),
    "text_span_corruption": (
        "T5 span-corruption plan (round 7, late wave): masking decisions "
        "are md5 arithmetic in the scan projection; the only shuffle is "
        "the per-doc interval-union window plus the doc-grain aggregate. "
        "No RNG state, no corpus-grain key."
    ),
    "text_feature_hashing": (
        "Hashing-trick featurizer (round 7, late wave): explode to token "
        "grain, md5-bucket map-side, ONE (doc, bucket) combine — no "
        "vocabulary relation, no join, no driver state."
    ),
    "sim_knn_label_transfer": (
        "kNN label transfer (round 7, late wave): bounded query panel "
        "broadcast into one labeled-corpus pass; neighbor and vote "
        "windows partition by query_id — never unpartitioned."
    ),
    "events_cross_correlation": (
        "Pairwise Pearson (round 16): ONE hourly pre-aggregate feeds "
        "both join sides; the self-join keys on the calendar-bounded "
        "hour spine (pair fanout = types^2, never data-sized) and the "
        "five exact-integer sums partial-aggregate map-side before the "
        "(type_a, type_b) shuffle. No unpartitioned window, no float "
        "aggregation anywhere."
    ),
    "lake_compaction_plan": (
        "OPTIMIZE planner (round 16): file-grain METADATA only — the "
        "documents scan collapses to the (source, bucket) manifest "
        "before the per-partition FFD kernel; Arrow batches carry "
        "KB-scale manifests, never data bytes. The single shuffle is "
        "the manifest groupBy."
    ),
    "lake_hilbert_skipping": (
        "Curve A/B (round 18): ONE events scan materializes the narrow "
        "(e, u) checkpoint; the Hilbert index is 3 chained row-local "
        "projection levels (truncated by the prefix property — no "
        "shuffle, no UDF); everything downstream is file-grain "
        "envelopes (<= 2*n_files rows) joined against an 8-row "
        "broadcast predicate grid."
    ),
    "text_pack_bpe": (
        "Tokenizer-aware packing (round 18): the BPE encode runs at "
        "VOCAB grain (distinct words through one Arrow kernel, merge "
        "table broadcast); per-doc counts re-join the token stream; "
        "both packing prefix-sums are windows PARTITIONED by shard "
        "(doc_id % 8) — never a global orderBy window."
    ),
    "dedup_exact_substring": (
        "ExactSubstr spans (round 20 shape): the ONLY corpus-wide "
        "shuffle is one gram-keyed exchange feeding a min-struct "
        "window over a single pass of the occurrences (O(corpus "
        "chars) rows, never all-pairs; replaced the r19 "
        "owner-aggregate + self-join pair, which scanned the explode "
        "twice — 4.4x wall at the 10x corpus); the span merge is a "
        "lag-gap window PARTITIONED by doc_id (bounded by document "
        "length) and the per-doc rollup comes back BROADCAST into the "
        "don't-vanish left join. Two scans total, zero unpartitioned "
        "windows."
    ),
    "dedup_substring_probe": (
        "Incremental ExactSubstr probe (round 19): incoming grams hit "
        "the existing corpus's distinct-gram index through one LEFT "
        "SEMI join (index-pruned; broadcast here, bucketed-by-hash "
        "co-partition at 100 TB); same doc-partitioned island merge. "
        "The incoming side is never self-joined."
    ),
}

SKEW_EPILOGUE = """
## Skew handling evidence (round 3)

Two complementary mechanisms, both verified:

**1. Deterministic salting** (`merge.salted_two_phase_agg`, oracle-checked as
`events_salted_agg`; balance asserted in
`test_relational.py::test_salting_balances_skewed_shuffle`): with 95% of
40k rows on one key, shuffling on the bare key put 38,000 rows in one
reduce partition; shuffling on (key, salt=64) bounded every partition at
≤ 2× the mean. Phase 1 aggregates on (key, salt), phase 2 merges partials
— identical results to the direct groupBy.

**2. AQE runtime skew-join splitting** (no code changes — config only).
Captured from a 400k-row join where 90% of the fact side shares one key
(`spark.sql.adaptive.skewJoin.enabled=true`, thresholds shrunk to local
data sizes; at production scale the 256 MB defaults apply):

```
AdaptiveSparkPlan isFinalPlan=true
...
*(5) SortMergeJoin(skew=true) [k#1L], [k#4L], Inner
:- AQEShuffleRead coalesced and skewed     <- hot partition split into
:  +- ShuffleQueryStage                        advisory-sized slices
+- AQEShuffleRead coalesced
   +- ShuffleQueryStage
```

`skew=true` on the SMJ node and `coalesced and skewed` on the fact-side
shuffle read show AQE splitting the oversized partition at runtime and
replicating the matching dim rows — the no-op-code path that handles
residual skew wherever an explicit salt isn't wired. Rule of thumb used
across the library: known-hot aggregation keys get deterministic salts
(reproducible plans, works with partial aggs); join skew is left to AQE.
"""


def main() -> None:
    spark = get_spark(app_name="plan-dump", cpus="8")
    qs = entrymod.queries()
    out = [
        "# PLANS — captured physical plans (generated by tools/dump_plans.py)",
        "",
        f"Source data: `{SF_DIR}`. Regenerate after plan-affecting changes.",
        "Each section states the property the plan exists to demonstrate, then",
        "the `explain('formatted')` output. Plan-shape regressions are enforced",
        "by tests/test_relational.py; this file is the human-readable evidence.",
        "",
    ]
    for name, why in SHOWCASE.items():
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"## {name}")
        out.append("")
        out.append(why)
        out.append("")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```")
        out.append("")
    out.append(SKEW_EPILOGUE.strip())
    out.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md with {len(SHOWCASE)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
