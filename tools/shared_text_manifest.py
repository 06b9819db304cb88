"""Shared-text oracle audit, codified (r17 verdict #3).

The r16 Wilson bug proved the structural blind spot: when the Spark
side and the DuckDB oracle share an expression string, CTE text, seeded
repr() literal, or model constant, the driver's hash gate certifies
ENGINE PARITY but not the FORMULA — both engines parse the same wrong
text. The r17 audit enumerated the class by hand (SCALE.md "shared-text
oracle audit") and set the protocol: any NEW shared-text oracle member
must land with an independently-derived test.

This module makes the protocol MECHANICAL. ``discover()`` re-runs the
audit's own discovery over ``__spark_entry__.py`` with ast: every
module-level constant or ``datalake_local_spark`` symbol referenced
inside oracle-side scopes (functions named ``*oracle*``/``*_sql`` that
are not ``_q_*`` query builders), plus those generator functions
themselves. ``MANIFEST`` is the committed class table: one row per
member with its mechanism and the independently-derived tests that
certify the formula. ``tests/test_audit_manifest.py`` asserts
discover() == MANIFEST.keys() and that every named test exists — so a
future query that interpolates new shared text without a manifest row
(or names a test that doesn't exist) reds CI.

Mechanisms (the SCALE.md r17 taxonomy):
- ``A`` verbatim — ONE ANSI string executed by both spark.sql() and
  DuckDB.
- ``B`` fragment — both sides embed the same expression fragment,
  constants, or seeded repr literals.
- ``C`` kernel-replay — the oracle CTE transcribes the Spark kernel's
  op order/constants.
- ``independent`` — the symbol feeds oracle SQL but shares NO text or
  constants with the Spark side (an independent re-expression of the
  same public semantics); the cross-engine hash gate itself is the
  certification, so no test row is required, only a note.
"""

from __future__ import annotations

import ast
import os

ENTRY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__spark_entry__.py")


def discover(entry_path: str = ENTRY) -> set[str]:
    """The audit's discovery grep, codified: symbols referenced inside
    oracle-side scopes of ``__spark_entry__.py``."""
    tree = ast.parse(open(entry_path).read())

    mod_consts: set[str] = set()
    mod_str_consts: set[str] = set()
    funcs: dict[str, ast.FunctionDef] = {}
    pkg_imports: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, ast.Assign):
            has_str = any(
                isinstance(n, ast.Constant) and isinstance(n.value, str)
                for n in ast.walk(node.value)
            )
            for t in node.targets:
                if isinstance(t, ast.Name):
                    mod_consts.add(t.id)
                    if has_str:
                        mod_str_consts.add(t.id)
        elif isinstance(node, ast.FunctionDef):
            funcs[node.name] = node
        elif (
            isinstance(node, ast.ImportFrom)
            and node.module
            and node.module.startswith("datalake_local_spark")
        ):
            for a in node.names:
                pkg_imports[a.asname or a.name] = node.module

    oracle_scope = {
        n: f
        for n, f in funcs.items()
        if ("oracle" in n or n.endswith("_sql")) and not n.startswith("_q_")
    }

    symbols: set[str] = set()
    # the generator functions are members themselves (seeded repr
    # matrices, rendered div/mod term sums live in their bodies)
    symbols.update(n for n in oracle_scope if n not in ("oracle_sql", "_oracle_sql"))

    for f in oracle_scope.values():
        local_pkg = dict(pkg_imports)
        for n in ast.walk(f):
            if (
                isinstance(n, ast.ImportFrom)
                and n.module
                and n.module.startswith("datalake_local_spark")
            ):
                for a in n.names:
                    local_pkg[a.asname or a.name] = n.module
        attr_bases: set[str] = set()
        for n in ast.walk(f):
            if (
                isinstance(n, ast.Attribute)
                and isinstance(n.value, ast.Name)
                and n.value.id in local_pkg
            ):
                symbols.add(f"{n.value.id}.{n.attr}")
                attr_bases.add(n.value.id)
        for n in ast.walk(f):
            if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load):
                if n.id in mod_consts and (
                    n.id == n.id.upper() or n.id in mod_str_consts
                ):
                    # _UPPER module constants, plus ANY-case module
                    # constants carrying string text (r18 advice: a
                    # future lowercase string constant interpolated
                    # into oracle SQL must not escape the gate)
                    symbols.add(n.id)
                elif (
                    n.id in local_pkg
                    and n.id not in attr_bases
                    and n.id not in funcs
                ):
                    symbols.add(n.id)  # package imports used directly
    return symbols


#: member -> {mech, queries, tests, note}. ``tests`` must be non-empty
#: for mech A/B/C and every named test must exist in tests/*.py
#: (asserted by tests/test_audit_manifest.py).
MANIFEST: dict[str, dict] = {
    # ---- mech A: verbatim ANSI, one string both engines ----
    "_INTERACTIVE_SQL": dict(
        mech="A", queries=["sql_interactive"],
        tests=["test_sql_interactive_hand_computed"],
        note="3-table fixture, hand-summed totals"),
    "_GROUPBY_ALL_SQL": dict(
        mech="A", queries=["sql_groupby_all"],
        tests=["test_sql_groupby_all_matches_dataframe"],
        note="independent DataFrame groupBy re-expression"),
    "_CORRELATED_SQL": dict(
        mech="A", queries=["sql_correlated_exists"],
        tests=["test_sql_correlated_exists_hand_computed"],
        note="fixture avg=400 -> thr=720, single qualifying customer"),
    "_NAMED_WINDOW_SQL": dict(
        mech="A", queries=["sql_named_window"],
        tests=["test_sql_named_window_hand_computed"],
        note="pure-python sort + cents cumsum"),
    "_LATERAL_SQL": dict(
        mech="A", queries=["sql_lateral_topn"],
        tests=["test_sql_lateral_topn_hand_computed"],
        note="hand-derived top-1 per customer"),
    # ---- mech B: shared fragments / constants / seeded literals ----
    "tpch._WILSON_SQL": dict(
        mech="B", queries=["tpch_return_rate_ci"],
        tests=["test_return_rate_wilson_ci_properties"],
        note="hand-derived 7dp bounds + second independent spelling"),
    "tpch.CROSTON_ALPHA": dict(
        mech="B", queries=["tpch_croston_demand"],
        tests=["test_croston_demand_matches_recurrence",
               "test_croston_random_fixture_matches_recurrence"],
        note="pure-python recurrence, seeded-random fixture"),
    "tpch.NEWSVENDOR_CR": dict(
        mech="B", queries=["tpch_newsvendor_stock"],
        tests=["test_newsvendor_stock_hand_computed"],
        note="hand-computed order statistic"),
    "tpch.EOQ_HOLDING_COST": dict(
        mech="B", queries=["tpch_eoq"],
        tests=["test_eoq_hand_computed"],
        note="hand-computed Harris formula"),
    "tpch.EOQ_ORDER_COST": dict(
        mech="B", queries=["tpch_eoq"],
        tests=["test_eoq_hand_computed"],
        note="hand-computed Harris formula"),
    "llm_pipeline.DSIR_N_BUCKETS": dict(
        mech="B", queries=["pipeline_dsir_weights"],
        tests=["test_dsir_weights_match_pure_python"],
        note="pure-python hashed-bigram importance replay (r18: oracle "
             "interpolates the Spark defaults, the r17 ADVICE fix)"),
    "llm_pipeline.DSIR_TARGET_LANG": dict(
        mech="B", queries=["pipeline_dsir_weights"],
        tests=["test_dsir_weights_match_pure_python"],
        note="see DSIR_N_BUCKETS"),
    "llm_pipeline.DSIR_TOP_K": dict(
        mech="B", queries=["pipeline_dsir_weights"],
        tests=["test_dsir_weights_match_pure_python"],
        note="see DSIR_N_BUCKETS"),
    "_EXACT_SUBSTR_SPANS_ORACLE": dict(
        mech="C", queries=["dedup_exact_substring", "dedup_substring_hashed"],
        tests=["test_exact_substring_spans_hand_computed",
               "test_exact_substring_randomized_against_bruteforce",
               "test_exact_substring_hashed_matches_string_kernel"],
        note="one replay CTE certifies both the string-keyed kernel "
             "and the value-identical xxhash64-screen variant (r19 "
             "verdict #3); hand-computed + seeded brute-force + "
             "cross-kernel equality certify the formula"),
    "dedup.SUBSTR_K": dict(
        mech="B", queries=["dedup_exact_substring", "dedup_substring_probe",
                           "dedup_substring_clean", "dedup_substring_hashed"],
        tests=["test_exact_substring_spans_hand_computed",
               "test_exact_substring_randomized_against_bruteforce"],
        note="gram width + span-merge gap rendered into the three "
             "ExactSubstr oracles from the kernel-default constant "
             "(r19 advice #1); hand-computed + seeded definitional "
             "brute-force replays certify the formula at k=30 and "
             "small k"),
    "dedup.SUBSTR_SPLIT_DOC_ID": dict(
        mech="B", queries=["dedup_substring_probe"],
        tests=["test_exact_substring_probe_hand_computed"],
        note="existing/incoming doc_id split shared by probe kernel "
             "default and oracle (r19 advice #1); verbatim-twins "
             "fixture proves incoming never probes incoming"),
    "_LEVENE_CRIT_SQL": dict(
        mech="B", queries=["dq_levene"],
        tests=["test_levene_matches_bruteforce_and_flags_unequal",
               "test_levene_cutoff_table_and_k3_decision"],
        note="CASE chain rendered from quality._F95 (both engines read "
             "the one table; r19 advice #2); cutoffs independently "
             "pinned against published chi2(0.95, d)/d values and a "
             "k=3 fixture exercises a non-default dof on both engines"),
    "text._KN_P_SQL": dict(
        mech="B", queries=["text_kn_bigram_logprob"],
        tests=["test_kn_bigram_logprob_matches_pure_python",
               "test_kn_bigram_random_fixture_matches_reference"],
        note="pure-python Kneser-Ney 1995 interpolated bigram reference"),
    "normalize_sql": dict(
        mech="B", queries=["lake_zorder_layout", "lake_zorder_skipping"],
        tests=["test_zvalue_interleave_hand_computed",
               "test_zorder_skipping_matches_python_replay",
               "test_zorder_skipping_pre1970_epochs_match_replay"],
        note="same generated affine div/mod text both engines; replay "
             "normalizes with its own int arithmetic"),
    "zvalue_sql": dict(
        mech="B", queries=["lake_zorder_layout", "lake_zorder_skipping"],
        tests=["test_zvalue_interleave_hand_computed",
               "test_zorder_skipping_matches_python_replay"],
        note="same generated Morton term sum both engines; replay "
             "interleaves with its own bit loop"),
    "_rp_matrix_sql": dict(
        mech="B", queries=["sim_random_projection"],
        tests=["test_random_projection_distortion_bounded"],
        note="seeded repr matrix literal shared; J-L distortion bound "
             "is independent of matrix values"),
    "_lsh_bucket_sql": dict(
        mech="B", queries=["sim_cosine_topk_lsh", "sim_lsh_multiprobe"],
        tests=["test_lsh_topk_subset_of_bruteforce_universe",
               "test_multiprobe_recall_at_least_single_probe",
               "test_band_index_probe_matches_inplan_lsh"],
        note="seeded repr plane literals shared; every returned score "
             "must equal exhaustive scoring"),
    "_zorder_oracle_sql": dict(
        mech="B", queries=["lake_zorder_layout"],
        tests=["test_zvalue_interleave_hand_computed",
               "test_zorder_buckets_are_locally_tight"],
        note="renders the shared zvalue term sum with //"),
    "hilbert_chain": dict(
        mech="B", queries=["lake_hilbert_skipping"],
        tests=["test_hilbert_index_matches_pure_python_xy2d",
               "test_hilbert_truncated_levels_match_full_prefix",
               "test_hilbert_skipping_matches_python_replay"],
        note="same generated rotate/reflect projection chain both "
             "engines; reference transcribes public xy2d with its own "
             "bit ops and asserts bijectivity + unit-step adjacency"),
    "_hilbert_skipping_oracle_sql": dict(
        mech="B", queries=["lake_hilbert_skipping"],
        tests=["test_hilbert_skipping_matches_python_replay"],
        note="renders the shared hilbert/zvalue/normalize text with //; "
             "replay re-derives file ids, envelopes, hits in pure python"),
    "_zorder_skipping_oracle_sql": dict(
        mech="B", queries=["lake_zorder_skipping"],
        tests=["test_zorder_skipping_matches_python_replay",
               "test_zorder_skipping_pre1970_epochs_match_replay"],
        note="renders the shared Morton/normalize text with //; replay "
             "re-derives envelopes, hits, skip rates in pure python"),
    # ---- mech C: kernel-replay CTE text ----
    "_NORM": dict(
        mech="C", queries=["(every documents-table oracle)"],
        tests=["test_jaccard_prefix_filter_equals_naive",
               "test_chunking_reassembles_and_is_content_defined"],
        note="whitespace normalization transcribed into every oracle; "
             "fixtures exercise planted whitespace/case"),
    "_PAIR_FEED_CTES": dict(
        mech="C", queries=["graph_*", "dedup_* oracle feed"],
        tests=["test_jaccard_prefix_filter_equals_naive",
               "test_jaccard_prefix_lossless_for_odd_thresholds"],
        note="hand-planted J in {1, 4/6, 5/6, 7/10} fixtures"),
    "_PAGERANK_CTES": dict(
        mech="C", queries=["graph_pagerank", "dedup_keep_policy"],
        tests=["test_pagerank_matches_pure_python_reference",
               "test_keep_policy_prefers_hub_over_min_id"],
        note="pure-python power iteration"),
    "_bpe_replay_oracle_ctes": dict(
        mech="C", queries=["text_bpe_merges", "text_bpe_encode", "text_pack_bpe"],
        tests=["test_bpe_train_matches_reference",
               "test_bpe_encode_matches_reference",
               "test_pack_sequences_bpe_matches_reference"],
        note="transcribes the Spark trainer's counting/tie-break "
             "semantics but replays the greedy merge RELATIONALLY "
             "(run-parity picks, not a fold); pure-python Sennrich "
             "references certify the formula"),
    "_BPE_PERDOC_CTES": dict(
        mech="C", queries=["text_bpe_encode", "text_pack_bpe"],
        tests=["test_bpe_encode_matches_reference",
               "test_pack_sequences_bpe_matches_reference"],
        note="per-doc subword counts over the replay's wordlen; "
             "python reference recomputes from raw text"),
    "_holt_winters_oracle_sql": dict(
        mech="C", queries=["events_holt_winters", "events_hw_residual_diag"],
        tests=["test_holt_winters_matches_recurrence",
               "test_hw_residual_ljung_box_matches_fold_reference"],
        note="pure-python three-state recurrence + LB folds"),
    "_leakage_split_oracle_sql": dict(
        mech="C", queries=["pipeline_leakage_split"],
        tests=["test_leakage_safe_split_keeps_clusters_whole",
               "test_split_boundaries_partition_hex_space"],
        note="cluster-wholeness + hypothesis partition property"),
    "_shingle_sweep_oracle_sql": dict(
        mech="C", queries=["dedup_shingle_sweep"],
        tests=["test_shingle_width_sweep_order_sensitivity"],
        note="anagram fixture: hand-derived pair counts per width"),
    # ---- independent: oracle-only SQL sharing NO text/constants with
    # the Spark side — the cross-engine hash gate is the certification
    "_TUMBLING_ORACLE": dict(
        mech="independent", queries=["events_tumbling"], tests=[],
        note="date_trunc arithmetic vs Spark window(); no shared text"),
    "_SLIDING_ORACLE": dict(
        mech="independent", queries=["events_sliding"], tests=[],
        note="explicit 2-slide unnest vs Spark sliding window(); no "
             "shared text"),
    "_ASOF_ORACLE": dict(
        mech="independent", queries=["join_asof"], tests=[],
        note="max-under-bound groupBy vs Spark window/last; no shared "
             "text"),
    "_COSINE_TOPK_ORACLE": dict(
        mech="independent", queries=["sim_cosine_topk"], tests=[],
        note="DuckDB list_transform cosine vs Spark aggregate() fold / "
             "pandas UDF; different expression languages"),
    "_LSH_COSINE": dict(
        mech="independent", queries=["sim_cosine_topk_lsh"], tests=[],
        note="DuckDB-only rescoring expression (the shared part of LSH "
             "is the plane literals — see _lsh_bucket_sql)"),
}
