"""Regenerate CATALOG.md: the full queries() registry grouped by family,
with oracle status — the switch-over checklist for a reference user.
Run from the repo root: ``python tools/gen_catalog.py`` (no Spark
session needed; introspects the registries only)."""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

FAMILIES = [
    ("flagship", "Flagship"),
    ("join", "Joins"),
    ("agg", "Aggregations"),
    ("window", "Window functions"),
    ("setop", "Set operations"),
    ("sort", "Sort / limit"),
    ("scalar", "Scalar function families"),
    ("calendar", "Calendar"),
    ("null", "Null semantics"),
    ("pivot", "Pivot / unpivot"),
    ("unpivot", "Pivot / unpivot"),
    ("sample", "Sampling"),
    ("sql", "SQL surfaces"),
    ("tpch", "TPC-H-shaped depth"),
    ("semantic", "Semantic cube"),
    ("events", "Event analytics / time series"),
    ("streaming", "Structured Streaming"),
    ("merge", "MERGE / SCD"),
    ("scd2", "MERGE / SCD"),
    ("profile", "Profiling"),
    ("dq", "Data quality / ops"),
    ("fmt", "Formats / lakehouse"),
    ("lake", "Formats / lakehouse"),
    ("graph", "Graph analytics"),
    ("dedup", "Deduplication"),
    ("sim", "Similarity / ANN / embeddings"),
    ("text", "Text analysis / LLM data prep"),
    ("pipeline", "Corpus pipelines"),
    ("mm", "Multimodal"),
    ("pandas", "UDF surfaces"),
    ("udtf", "UDF surfaces"),
]


def family(name: str) -> str:
    for prefix, title in FAMILIES:
        if name == prefix or name.startswith(prefix + "_"):
            return title
    return "Other"


# Why each rows-only query has no sound ANSI oracle (r14 verdict #3:
# one line per name). Generation FAILS if a rows-only name is missing
# here — adding a rows-only query forces writing down its reason.
ROWS_ONLY_REASONS = {
    "dedup_band_incremental": "seeded persisted MinHash band index; correctness IS the in-row probe≡rebuild zero certificate",
    "dedup_band_index_probe": "probes the seeded persisted band index (engine-side state); probe≡rebuild parity tested",
    "dedup_components_chain": "its pair feed is SEEDED MinHash-LSH (xxhash64, no DuckDB twin) — the chain-stress variant deliberately exercises the at-scale feed; replay parity + round bound asserted",
    "dedup_minhash_calibration": "seeded MinHash permutations have no ANSI twin; sweep monotonicity + planted-pair recall tested",
    "dedup_minhash_lsh": "seeded MinHash signatures (xxhash64 permutations) have no ANSI twin; planted near-dup recall tested",
    "dedup_semantic": "seeded iterative KMeans state (SemDeDup); centroid determinism + planted-cluster behavior tested",
    "dedup_simhash": "fingerprints built on Spark-internal xxhash64; recall pigeonhole bound + planted pairs tested",
    "mm_audio_features": "WAV byte-layout decode inside Arrow kernels; no ANSI binary decode — golden-file parity tested",
    "pipeline_corpus_prep_neardup": "embeds the seeded MinHash near-dup stage; stage-wise funnel counts tested",
    "pipeline_mixture_neardup": "embeds the seeded MinHash near-dup stage; mixture weights + budget invariants tested",
    "sim_ann_recall_report": "builds three seeded indexes and reports recall vs exact truth — the recall numbers ARE the check (in-row, tested)",
    "sim_cosine_topk_ivf": "seeded KMeans coarse quantizer; recall vs exact brute force asserted instead of value replay",
    "sim_ivf_partitioned_probe": "seeded KMeans lists + partitioned disk layout (engine-side state); probe≡full-scan parity tested",
    "sim_pca_project": "driver-side LAPACK eigendecomposition; sign/order conventions are not ANSI-expressible — reconstruction error tested",
    "sim_pq_topk": "driver-trained seeded PQ codebooks; ADC recall vs exact brute force tested",
    "text_bpe_encode": "encodes with iteratively learned merges (driver loop); round-trip decode identity tested",
    "text_bpe_merges": "iterative merge-learning driver loop; r16 re-audit vs the list-state toolbox: per-round pair-count argmax needs aggregates over the recursive ref, and a list-state replay is O(pairs^2) lambda work per round at vocab scale — infeasible; merge determinism tested",
    "text_chunk_rolling_hash": "content-defined boundaries from a per-byte rolling-hash fold (mapInPandas kernel); reassembly identity + boundary-shift tested",
    "text_compression_ratio": "zlib has no ANSI twin; monotonicity on planted redundancy tested",
}


def main() -> None:
    qs = entrymod.queries()
    oracles = set(entrymod.oracle_sql())
    groups: dict[str, list[str]] = defaultdict(list)
    for name in qs:
        groups[family(name)].append(name)
    lines = [
        "# CATALOG — every registered query, by family",
        "",
        f"{len(qs)} queries; {len(oracles)} DuckDB-oracle-certified "
        f"(hash-compared), {len(qs) - len(oracles)} rows-only by design "
        "(seeded/iterative/streaming-tail semantics — each with invariant "
        "tests instead).",
        "",
        "Generated by tools/gen_catalog.py — do not edit by hand.",
        "",
    ]
    order = []
    for _, title in FAMILIES:
        if title not in order:
            order.append(title)
    order.append("Other")
    for title in order:
        names = groups.get(title)
        if not names:
            continue
        lines.append(f"## {title} ({len(names)})")
        lines.append("")
        for n in sorted(names):
            if n in oracles:
                lines.append(f"- `{n}` — oracle")
            else:
                reason = ROWS_ONLY_REASONS.get(n)
                if reason is None:
                    raise SystemExit(
                        f"rows-only query {n!r} has no entry in "
                        "ROWS_ONLY_REASONS — document why no sound "
                        "ANSI oracle exists before regenerating"
                    )
                lines.append(f"- `{n}` — rows-only: {reason}")
        lines.append("")
    stale = sorted(set(ROWS_ONLY_REASONS) - (set(qs) - oracles))
    if stale:
        raise SystemExit(
            f"ROWS_ONLY_REASONS has stale entries (converted or "
            f"removed): {stale}"
        )
    with open("CATALOG.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote CATALOG.md with {len(qs)} queries in {len(order)} families")


if __name__ == "__main__":
    main()
