"""Text-analysis operators over ``documents(doc_id, text, lang, source,
n_chars)``: language-ID heuristic, quality scoring/gating, token
counting, fingerprinting, unigram-LM scoring, vocab/OOV, PMI
collocations, contamination checks, sequence packing.

The default is pure Catalyst column expressions (regexp/length/split/
md5) — no executor Python, parquet-scan speed, exact ANSI-SQL oracles.
The two exceptions are inherently sequential per-unit algorithms that
go through Arrow-batched ``mapInPandas``: content-defined chunking
(per-character rolling hash) and the Misra-Gries frequent-items sketch
(bounded counter state per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _norm_text(col):
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def _md5_bucket(col, modulus: int):
    """First-8-hex-chars of md5 as a non-negative integer mod
    ``modulus`` — THE engine-portable hash-bucket idiom (DuckDB twin:
    ``CAST('0x' || substring(md5(x), 1, 8) AS BIGINT) % m``). One
    definition so every user (feature hashing, span corruption) stays
    oracle-consistent; widen the hex window here and in the SQL twins
    together or not at all."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % modulus
    )


def token_stats(documents: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (word-pieces and punctuation as separate tokens) + distinct ratio."""
    ws_tokens = F.split(_norm_text(F.col("text")), " ")
    bpe_ish = F.expr(r"regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]', 0)")
    return documents.select(
        "doc_id",
        F.size(ws_tokens).alias("n_tokens"),
        F.size(bpe_ish).alias("n_bpe_tokens"),
        F.size(F.array_distinct(ws_tokens)).alias("n_distinct_tokens"),
        F.round(F.size(F.array_distinct(ws_tokens)) / F.size(ws_tokens), 6).alias("distinct_ratio"),
    )


_QUALITY_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is"]


def _quality_counts() -> dict:
    """Integer-grain quality primitives over the ``text`` column —
    the ONE home of the stopword list and count expressions, consumed
    by the ratio view (_quality_exprs) and the integer-band view
    (quality_by_source)."""
    norm = _norm_text(F.col("text"))
    tokens = F.split(norm, " ")
    return {
        "n_chars": F.length(norm),
        "n_tokens": F.size(tokens),
        "n_stop": F.size(
            F.filter(tokens, lambda t: t.isin(_QUALITY_STOPWORDS))
        ),
        "n_alpha": F.length(F.regexp_replace(norm, r"[^a-z]", "")),
    }


def _quality_exprs() -> dict:
    """Ordered name → Column dict of the quality heuristics over the
    ``text`` column — shared by ``quality_scores`` and the fused
    ``corpus_qa_report`` projection."""
    c = _quality_counts()
    n_chars, n_tokens = c["n_chars"], c["n_tokens"]
    return {
        "n_chars_norm": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.round((n_chars - n_tokens + 1) / n_tokens, 6),
        "stopword_ratio": F.round(c["n_stop"] / n_tokens, 6),
        # r19 guard: an empty/whitespace-only text normalizes to 0
        # chars — 0/0 RAISED under ANSI where the oracle NULLs
        "alpha_ratio": F.when(
            n_chars > 0, F.round(c["n_alpha"] / n_chars, 6)
        ),
    }


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality scoring: length, mean token length, stopword
    ratio, alpha ratio — the standard cheap pre-filters of a training-data
    pipeline."""
    exprs = _quality_exprs()
    return documents.select(
        "doc_id", *[c.alias(n) for n, c in exprs.items()]
    )


def _langid_exprs():
    """(lang_guess Column, vote_score Column) of the stopword-vote
    heuristic — shared by ``language_id`` and the fused
    ``corpus_qa_report`` projection."""
    padded = F.concat(F.lit(" "), _norm_text(F.col("text")), F.lit(" "))

    def votes(words):
        score = F.lit(0)
        for w in words:
            score = score + F.when(padded.contains(f" {w} "), 1).otherwise(0)
        return score

    en = votes(["the", "and", "of", "is"])
    es = votes(["el", "la", "de", "que"])
    de = votes(["der", "die", "und", "ist"])
    fr = votes(["le", "les", "des", "est"])
    best = F.greatest(en, es, de, fr)
    guess = (
        F.when(best == 0, "und")
        .when(en == best, "en")
        .when(es == best, "es")
        .when(de == best, "de")
        .otherwise("fr")
    )
    return guess, best


def language_id(documents: DataFrame) -> DataFrame:
    """Deterministic stopword-vote language heuristic. Real pipelines use a
    trained classifier (fastText et al., not in this container); the
    operator contract — text in, (lang_guess, confidence-score) out, pure
    projection — is what matters at scale."""
    guess, best = _langid_exprs()
    return documents.select(
        "doc_id", "lang", guess.alias("lang_guess"), best.alias("vote_score")
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Document fingerprinting: md5 of normalized text (content identity —
    oracle-checkable) plus a cheap sortable prefix key for range-based
    sharding of a 100 TB dedup table."""
    norm = _norm_text(F.col("text"))
    md5 = F.md5(norm)
    return documents.select(
        "doc_id",
        md5.alias("fingerprint"),
        F.substring(md5, 1, 4).alias("shard_key"),
        F.length(norm).alias("n_chars_norm"),
    )


def top_bigrams_per_lang(documents: DataFrame, k: int = 5) -> DataFrame:
    """Corpus n-gram frequency profile: top-k word bigrams per language.
    Bigrams built positionally (sequence + slice — no UDF), counted with
    map-side partial agg, top-k per group via window (never a global sort).
    The vocabulary-profile query every corpus QA pipeline runs."""
    from pyspark.sql import Window as W

    tokens = F.split(_norm_text(F.col("text")), " ")
    n_pairs = F.size(tokens) - 1
    # guard: sequence(1, 0) in Spark is descending [1, 0], not empty
    bigrams = F.when(n_pairs >= 1, F.transform(
        F.sequence(F.lit(1), F.greatest(n_pairs, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, 2)),
    )).otherwise(F.array().cast("array<string>"))
    counts = (
        documents.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lang", "bigram", "n", F.col("rank").cast("int").alias("rank"))
    )


def source_lang_profile(documents: DataFrame) -> DataFrame:
    """Corpus profiling rollup: per (source, lang) doc counts and length
    stats — the monitoring query a pipeline runs after every stage."""
    return (
        documents.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("schars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            # exact integer 4dp mean (round(avg(int),4) hazard class)
            (
                F.expr("(2 * schars * 10000 + n_docs) div (2 * n_docs)").cast("double")
                / F.lit(10000.0)
            ).alias("avg_chars"),
            "min_chars",
            "max_chars",
        )
    )


def chunk_documents_rolling_hash(
    documents: DataFrame, window: int = 16, mask_bits: int = 6, min_chunk: int = 32, max_chunk: int = 512
) -> DataFrame:
    """Content-defined chunking (Rabin-Karp style rolling hash): split each
    document at positions where the rolling hash of the trailing `window`
    bytes has `mask_bits` low zero bits — boundaries depend on CONTENT,
    not offsets, so an insertion early in a document shifts at most one
    chunk (the property that makes chunk-level dedup robust, vs fixed-size
    chunking where one edit invalidates every later chunk).

    Sequential per-document scan → Arrow-batched mapInPandas kernel (the
    sanctioned Python path; a per-character fold is not expressible as an
    efficient column expression). Deterministic; chunks reassemble to the
    exact document (asserted in tests). ORACLE-backed (r16): the rolling
    hash at step i covers exactly the trailing min(i+1, window) bytes mod
    2^61-1, so it has a closed form the DuckDB twin evaluates exactly in
    HUGEINT; only boundary selection is sequential, replayed at chunk
    grain by a recursive CTE (see __spark_entry__ oracle comment).

    At 100 TB: this is the map side of chunk-level dedup — chunks flow
    into exact_dedup on chunk_hash; only boundaries + hashes shuffle.
    """
    BASE, MOD = 257, (1 << 61) - 1
    mask = (1 << mask_bits) - 1
    pow_w = pow(BASE, window - 1, MOD)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            doc_ids, idxs, texts, hashes = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = (text or "").encode("utf-8")
                h, start, idx = 0, 0, 0
                boundaries = []
                for i, b in enumerate(data):
                    h = (h * BASE + b) % MOD
                    if i >= window:
                        h = (h - data[i - window] * pow_w * BASE) % MOD
                    length = i + 1 - start
                    if (length >= min_chunk and (h & mask) == 0) or length >= max_chunk:
                        boundaries.append(i + 1)
                        start = i + 1
                if start < len(data):
                    boundaries.append(len(data))
                start = 0
                for end in boundaries:
                    chunk = data[start:end].decode("utf-8", errors="surrogateescape")
                    doc_ids.append(doc_id)
                    idxs.append(idx)
                    texts.append(chunk)
                    import hashlib

                    hashes.append(hashlib.md5(data[start:end]).hexdigest())
                    idx += 1
                    start = end
            yield pd.DataFrame(
                {"doc_id": doc_ids, "chunk_idx": idxs, "chunk_text": texts, "chunk_hash": hashes}
            )

    return documents.select("doc_id", "text").mapInPandas(
        kernel, schema="doc_id long, chunk_idx long, chunk_text string, chunk_hash string"
    )


def unigram_logprob(documents: DataFrame, carry_cols: tuple = ()) -> DataFrame:
    """Corpus unigram language-model score per document — the cheap
    perplexity proxy a training-data pipeline uses to rank/filter text
    (the real thing swaps the unigram table for a KenLM binary; the data
    flow is identical).

    Two passes, both shuffle-lean at 100 TB:
    1. token → corpus frequency (explode + groupBy token; map-side
       combine keeps the shuffle at vocab grain, not token occurrences);
    2. re-join each doc's tokens to the frequency table and aggregate
       mean/min log10 p(token) per doc. The join carries NO broadcast
       hint: a web-scale vocabulary (URLs, typos, numerals) is 10^8-10^9
       distinct tokens — tens of GB, not broadcastable — so the
       scale-safe default is a plain shuffle join on `token`; AQE
       converts it to a broadcast join at runtime when the freq table
       really is small (as at bench SF), without forcing an OOM-or-die
       build at corpus scale.

    ``carry_cols`` rides doc-constant columns (e.g. lang) through the
    token stream and the per-doc aggregate, sparing callers a third
    documents scan just to join them back.
    """
    carry = list(carry_cols or ())
    toks = documents.select(
        "doc_id", *carry,
        F.explode(F.split(_norm_text(F.col("text")), " ")).alias("token"),
    )
    freqs = toks.groupBy("token").agg(F.count("*").alias("n_tok"))
    # corpus total via a tree-reduced scalar aggregate broadcast back —
    # never a partitionBy() window (that moves the whole freq table to
    # one partition) and never a second corpus scan or driver action
    totals = freqs.agg(F.sum("n_tok").alias("total"))
    freqs = freqs.crossJoin(F.broadcast(totals))
    scored = toks.join(freqs, "token").select(
        "doc_id", *carry, F.log10(F.col("n_tok") / F.col("total")).alias("logp")
    )
    return scored.groupBy("doc_id", *carry).agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("logp"), 6).alias("mean_logp"),
        F.round(F.min("logp"), 6).alias("min_logp"),
    )


def benchmark_contamination(documents: DataFrame, benchmark_ids: tuple = (0, 1, 2, 3, 4), n: int = 8) -> DataFrame:
    """Benchmark-contamination detection: flag documents sharing any
    word n-gram with a benchmark set (the decontamination step every
    training corpus runs against eval suites; n=13 in the GPT-3 paper,
    n=8 here to suit the short synthetic docs).

    The benchmark n-gram set is tiny (eval suites are ~10⁵ grams) →
    broadcast; each corpus doc explodes to distinct n-grams, semi-joins
    the broadcast set, and aggregates hit counts — one scan of the
    corpus, no doc×doc comparison. The token array is materialized ONCE
    per row (a projection step) before gram assembly — split+normalize
    is the expensive part of the expression and Catalyst CSE across a
    lambda body is not guaranteed."""

    def grams(df: DataFrame) -> DataFrame:
        toked = df.select(
            "doc_id", F.split(_norm_text(F.col("text")), " ").alias("toks")
        )
        t = F.col("toks")
        return toked.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.when(
                        F.size(t) >= n,
                        F.transform(
                            F.sequence(
                                F.lit(1),
                                F.greatest(F.size(t) - (n - 1), F.lit(1)),
                            ),
                            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
                        ),
                    ).otherwise(F.array().cast("array<string>"))
                )
            ).alias("gram"),
        )
    bench_grams = (
        grams(documents.filter(F.col("doc_id").isin(list(benchmark_ids))))
        .select("gram")
        .distinct()
    )
    doc_grams = grams(documents)
    hits = doc_grams.join(F.broadcast(bench_grams), "gram").groupBy("doc_id").agg(
        F.count("*").alias("n_contaminated_grams")
    )
    return (
        documents.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_contaminated_grams", F.lit(0)).alias("n_contaminated_grams"),
            (F.coalesce("n_contaminated_grams", F.lit(0)) > 0).alias("is_contaminated"),
            F.col("doc_id").isin(list(benchmark_ids)).alias("is_benchmark"),
        )
    )


def assign_pack_bins(
    documents: DataFrame, target_tokens: int = 512, n_shards: int = 8
) -> DataFrame:
    """Doc-grain packing assignment (doc_id, shard_id, n_tokens,
    bin_id) — the shared core of ``pack_sequences`` (which aggregates
    it to bin stats) and ``pipeline.write_corpus_shards`` (which
    materializes the docs partitioned by shard)."""
    from pyspark.sql import Window as W

    toks = documents.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(n_shards)).alias("shard_id"),
        F.size(F.split(_norm_text(F.col("text")), " ")).alias("n_tokens"),
    )
    w = W.partitionBy("shard_id").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    return toks.select(
        "doc_id",
        "shard_id",
        "n_tokens",
        (F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / target_tokens)).alias("bin_id"),
    )


def pack_sequences(
    documents: DataFrame, target_tokens: int = 512, n_shards: int = 8
) -> DataFrame:
    """Greedy sequence packing: assign documents (in doc_id order within
    a shard) to fixed-budget context windows by running token count —
    the "concatenate-then-split" batching step of LLM pre-training data
    prep. bin = floor(cumsum_before_doc / target), cumsum SHARDED by
    doc_id % n_shards so the prefix-sum window is partitioned (a global
    orderBy window would single-partition the corpus); packing quality
    is unaffected — every shard's bins fill to the same budget, and a
    training run consumes bins, not a global order."""
    binned = assign_pack_bins(documents, target_tokens, n_shards)
    return binned.groupBy("shard_id", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def pack_sequences_bpe(
    documents: DataFrame,
    target_tokens: int = 512,
    n_shards: int = 8,
    n_merges: int = 20,
) -> DataFrame:
    """Tokenizer-aware sequence packing (r18, r17 verdict #7b):
    :func:`pack_sequences` fills context windows by WHITESPACE token
    count, but a training run's budget is measured in TOKENIZER tokens
    — so this packs by the per-doc subword counts of the corpus-trained
    BPE tokenizer (:func:`bpe_encode_corpus`, Sennrich et al. 2016) and
    reports, per window, how the whitespace-budget packing would have
    disagreed (``n_moved_vs_ws`` = docs whose window assignment changes
    when the budget counts real tokens). Ties the BPE family to the
    packing query with one certified number.

    Same sharded prefix-sum shape as the whitespace sibling (the
    cumsum window is partitioned by doc_id % n_shards — never a global
    orderBy); the only added cost over pack_sequences is the
    vocab-grain BPE encode, whose kernel work is bounded by vocabulary
    size, not corpus size."""
    from pyspark.sql import Window as W

    enc = bpe_encode_corpus(documents, n_merges)
    ws = assign_pack_bins(documents, target_tokens, n_shards).select(
        "doc_id", F.col("bin_id").alias("ws_bin_id")
    )
    toks = enc.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(n_shards)).alias("shard_id"),
        F.col("n_subword_tokens").alias("n_tokens"),
        F.col("n_words"),
    )
    w = W.partitionBy("shard_id").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    binned = toks.select(
        "doc_id",
        "shard_id",
        "n_tokens",
        "n_words",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / target_tokens
        ).alias("bin_id"),
    ).join(ws, "doc_id")
    return binned.groupBy("shard_id", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_bpe_tokens"),
        F.sum("n_words").cast("long").alias("total_ws_words"),
        F.sum((F.col("bin_id") != F.col("ws_bin_id")).cast("int"))
        .cast("long")
        .alias("n_moved_vs_ws"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def quality_rule_exprs():
    """(ordered rule-name → boolean Column dict, conjunction Column)
    over the ``text`` column — the gate's single source of truth,
    shared by ``quality_gate`` (audit frame) and the fused pipeline
    ledgers (``pipeline.prepare_corpus``) so both apply byte-identical
    predicates."""
    norm = _norm_text(F.col("text"))
    tokens = F.split(norm, " ")
    n_tokens = F.size(tokens)
    mean_len = (F.length(norm) - n_tokens + 1) / n_tokens
    stopwords = ["the", "a", "and", "of", "to", "in", "is"]
    stop_ratio = F.size(F.filter(tokens, lambda t: t.isin(stopwords))) / n_tokens
    distinct_ratio = F.size(F.array_distinct(tokens)) / n_tokens
    rules = {
        "ok_n_tokens": (n_tokens >= 5) & (n_tokens <= 100000),
        "ok_mean_token_len": (mean_len >= 2.0) & (mean_len <= 12.0),
        "ok_stopwords": stop_ratio >= 0.0005,
        "ok_repetition": distinct_ratio >= 0.1,
    }
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else (keep & expr)
    return rules, keep


def quality_gate(documents: DataFrame) -> DataFrame:
    """Rule-based keep/drop gate (Gopher-style): each rule is a boolean
    column so downstream can audit WHY a doc dropped; `keep` is the
    conjunction. Pure expressions → scan-speed at 100 TB."""
    rules, keep = quality_rule_exprs()
    cols = [F.col("doc_id")]
    for name, expr in rules.items():
        cols.append(expr.alias(name))
    cols.append(keep.alias("keep"))
    return documents.select(*cols)


def vocab_oov_profile(documents: DataFrame, vocab_size: int = 100) -> DataFrame:
    """Tokenizer-vocabulary induction + out-of-vocabulary profiling: the
    top ``vocab_size`` corpus tokens by frequency (deterministic
    tie-break on token) form the vocab; each document reports its OOV
    token count/ratio — the coverage check run before committing to a
    tokenizer. Frequency table is vocab-grain → broadcast for the
    membership probe; corpus scanned twice (freq pass + probe pass), no
    all-pairs anything. The top-``vocab_size`` selection is
    ``orderBy(...).limit(...)`` — Spark plans it as
    TakeOrderedAndProject (per-partition heap + driver merge), NOT a
    global ``row_number`` window, which would single-partition the
    whole vocabulary table at corpus scale."""
    toks = documents.select(
        "doc_id", F.explode(F.split(_norm_text(F.col("text")), " ")).alias("token")
    )
    freqs = toks.groupBy("token").agg(F.count("*").alias("n_tok"))
    vocab = (
        freqs.orderBy(F.col("n_tok").desc(), F.col("token"))
        .limit(vocab_size)
        .select("token")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "token", "left"
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)) / F.count("*"), 6
        ).alias("oov_ratio"),
    )


def token_pmi_pairs(documents: DataFrame, k: int = 20, min_pair_count: int = 10) -> DataFrame:
    """Corpus collocation mining: top-k ADJACENT token pairs by PMI
    (pointwise mutual information) — the statistical phrase detector
    (word2vec-style phrase merging, quality auditing) over a corpus.

    PMI(a,b) = log10( p(a,b) / (p(a)·p(b)) ) with p from corpus counts.
    Shuffle profile at 100 TB: the corpus is tokenized and exploded
    ONCE — each token occurrence becomes a struct (tok_a = tokens[i],
    tok_b = tokens[i+1], NULL at doc end), so a single map-side-combined
    groupBy(tok_a, tok_b) yields BOTH grains: pair counts are the
    non-NULL-tok_b rows and unigram counts are sum(n) grouped by tok_a
    (every occurrence appears exactly once as tok_a, doc-end marker
    included). The shared pair-count aggregate is ``localCheckpoint``
    MATERIALIZED: its many consumers (unigram marginals + their total,
    pair totals, the surviving-token semi-join, the scoring join) have
    canonically DIFFERENT subtrees after the crossJoins/distinct, so
    ReuseExchange never fires and the un-checkpointed plan re-ran the
    corpus scan+tokenize 14× (r12 plan audit; 1.9 → ~0.6 s at sf0.1).
    The materialization is one shuffle's worth of (pair, n) rows — the
    table the query keeps anyway — so at 100 TB it trades 13 corpus
    scans for one spill-backed write of the adjacent-pair vocabulary.
    The unigram marginals are semi-join-PRUNED to tokens
    that survive ``min_pair_count`` BEFORE the broadcast hint: the full
    vocab of a web corpus is 10^8-10^9 rows (not broadcastable), but the
    surviving-pair token set is bounded by the pair table the query
    already keeps, so the pruned broadcast is genuinely small. No
    doc×doc or token×token blowup — pairs are ADJACENT only, so the
    pair table is ≤ token count."""
    from pyspark.sql import Window as W

    # materialize the token array in its own projection so the lambda
    # below indexes a bound column — referencing the split() expression
    # from inside transform() would re-tokenize the document once per
    # element (O(len^2) per doc)
    toked = documents.select(F.split(_norm_text(F.col("text")), " ").alias("toks"))
    t = F.col("toks")
    # F.get is 0-based and yields NULL past the array end (no ANSI
    # error), so the doc-end marker falls out of the same expression.
    occ = F.transform(
        F.sequence(F.lit(0), F.size(t) - 1),
        lambda i: F.struct(
            F.get(t, i).alias("tok_a"),
            F.get(t, i + 1).alias("tok_b"),
        ),
    )
    counts = (
        toked.select(F.explode(occ).alias("p"))
        .select("p.tok_a", "p.tok_b")
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    # totals via tree-reduced scalar aggregates broadcast back — a
    # partitionBy() window would single-partition the vocab-/pair-grain
    # tables, which at corpus scale are large
    uni = counts.groupBy(F.col("tok_a").alias("token")).agg(F.sum("n").alias("n_uni"))
    uni = uni.crossJoin(F.broadcast(uni.agg(F.sum("n_uni").alias("total_uni"))))
    raw_pairs = counts.filter(F.col("tok_b").isNotNull()).select(
        "tok_a", "tok_b", F.col("n").alias("n_pair")
    )
    pair_counts = raw_pairs.crossJoin(
        F.broadcast(raw_pairs.agg(F.sum("n_pair").alias("total_pair")))
    ).filter(F.col("n_pair") >= min_pair_count)
    surviving = (
        pair_counts.select(F.col("tok_a").alias("token"))
        .union(pair_counts.select(F.col("tok_b").alias("token")))
        .distinct()
    )
    pruned = uni.join(surviving, "token", "left_semi")
    a_side = pruned.select(
        F.col("token").alias("tok_a"),
        F.col("n_uni").alias("n_a"),
        F.col("total_uni").alias("tot_u"),
    )
    b_side = pruned.select(F.col("token").alias("tok_b"), F.col("n_uni").alias("n_b"))
    scored = (
        pair_counts.join(F.broadcast(a_side), "tok_a")
        .join(F.broadcast(b_side), "tok_b")
        .select(
            "tok_a",
            "tok_b",
            "n_pair",
            F.round(
                F.log10(
                    (F.col("n_pair") / F.col("total_pair"))
                    / ((F.col("n_a") / F.col("tot_u")) * (F.col("n_b") / F.col("tot_u")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    # global top-k via orderBy().limit() → TakeOrderedAndProject (each
    # partition contributes its local top-k; no single-partition window
    # over the full pair table); the rank window then runs over k rows
    topk = scored.orderBy(F.col("pmi").desc(), "tok_a", "tok_b").limit(k)
    w = W.orderBy(F.col("pmi").desc(), "tok_a", "tok_b")
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def frequent_tokens_sketch(documents: DataFrame, k: int = 32, capacity: int = 256) -> DataFrame:
    """Heavy hitters via Misra-Gries mergeable summaries — the bounded-
    memory alternative to an exact token groupBy when the vocabulary
    itself is too large to shuffle (URL/token/entity frequency over a
    100 TB corpus).

    Each task runs an MG summary of ``capacity`` counters over ITS
    partition (streamed Arrow batches, state carried across batches in
    the generator — memory is O(capacity), never O(vocab)); summaries
    merge by summing estimates per token (the standard mergeable-
    summaries result: estimates only undercount, total undercount
    ≤ n/(capacity+1) across all partitions, so every token with true
    frequency > n/(capacity+1) survives). Output: top-k by merged
    estimate. Sketch estimates are layout-dependent, so this raw form
    is NOT registered as a query — the registered surface is
    ``frequent_tokens_heavy_hitters`` (oracle-checked verified panel);
    the undercount bound and heavy-hitter completeness stay
    pytest-asserted against exact counts here.

    NOT run-reproducible: estimates (hence est/rank, and possibly the
    row set at the k boundary) depend on partition layout and
    intra-partition row order — a different partitioning of the same
    data may legally return different est values. Only the sketch
    invariants (row count ≤ k, undercount ≤ n/(capacity+1), every
    token with true freq > n/(capacity+1) present) are stable across
    layouts, and those are exactly what the tests assert."""
    from pyspark.sql import Window as W

    merged = _mg_merged_summary(documents, capacity)
    topk = merged.orderBy(F.col("est").desc(), "token").limit(k)
    w = W.orderBy(F.col("est").desc(), "token")
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def _mg_merged_summary(documents: DataFrame, capacity: int) -> DataFrame:
    """Merged Misra-Gries summary over the whitespace-token stream:
    per-task MG of ``capacity`` counters, merged by summing estimates
    per token. Every token with true frequency > n/(capacity+1) has a
    positive merged estimate (mergeable-summaries undercount bound), so
    the merged summary is a COMPLETE candidate set for true heavy
    hitters — the guarantee both the top-k sketch and the verified
    heavy-hitter panel build on."""
    toks = documents.select(
        F.explode(F.split(_norm_text(F.col("text")), " ")).alias("token")
    )

    def mg_partition(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            # vectorized: exact per-batch counts via value_counts (C
            # path), merged into the running summary per DISTINCT batch
            # token — Python cost is O(batch vocab), not O(batch rows)
            for tok, cnt in pdf["token"].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(cnt)
            if len(counters) > capacity:
                # mergeable-summaries shrink (Agarwal et al., PODS'12):
                # subtract the (capacity+1)-th largest count from every
                # counter, drop non-positives. Each shrink removes
                # >= (capacity+1)*m total mass, so per-token undercount
                # stays <= n_partition/(capacity+1) — the same bound as
                # the token-at-a-time decrement loop it replaces.
                m = sorted(counters.values(), reverse=True)[capacity]
                counters = {t: c - m for t, c in counters.items() if c > m}
        yield pd.DataFrame(
            {"token": list(counters), "est": list(counters.values())}
        )

    summaries = toks.mapInPandas(mg_partition, schema="token string, est long")
    return summaries.groupBy("token").agg(F.sum("est").alias("est"))


def frequent_tokens_heavy_hitters(
    documents: DataFrame, capacity: int = 256
) -> DataFrame:
    """Verified heavy hitters: the Misra-Gries sketch as the candidate
    pruner, exact counts as the published values (r15 rows-only ->
    oracle conversion, r14 verdict #3).

    ``frequent_tokens_sketch`` publishes MG *estimates*, which legally
    vary with partition layout — unoracleable by design. This panel
    publishes only what is DETERMINISTIC: the exact set of true heavy
    hitters (tokens with ``cnt*(capacity+1) > n_total``, an integer
    compare on exact counts — no float threshold) with their exact
    counts. The MG merged summary prunes the exact count to a bounded
    candidate set: every true heavy hitter survives the merge
    (mergeable-summaries undercount bound, Agarwal et al. PODS'12), so
    a sketch defect would DROP a row the ANSI oracle has — the oracle
    certifies the sketch's completeness guarantee, not just the
    arithmetic.

    100 TB shape: scan 1 streams MG summaries (O(capacity) state per
    task); the candidate set is <= tasks*capacity rows of short
    strings, shuffled (no broadcast hint — at extreme task counts it
    outgrows a broadcast; the gram-side semi join hashes fixed-width
    tokens); scan 2 exact-counts only candidate tokens. Both scans are
    map-side-combined aggregates; no global window (rank runs over the
    <= capacity-row verified panel)."""
    from pyspark.sql import Window as W

    toks = documents.select(
        F.explode(F.split(_norm_text(F.col("text")), " ")).alias("token")
    )
    # the FULL merged summary (not the top-k cut): completeness of the
    # candidate set is what makes the verified panel deterministic
    candidates = _mg_merged_summary(documents, capacity).select("token")
    exact = (
        toks.join(candidates, "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    n_total = toks.select(F.count(F.lit(1)).alias("n_total"))
    verified = (
        exact.crossJoin(F.broadcast(n_total))
        .where(F.col("exact_cnt") * (capacity + 1) > F.col("n_total"))
    )
    w = W.orderBy(F.col("exact_cnt").desc(), "token")
    return verified.select(
        "token",
        "exact_cnt",
        "n_total",
        F.row_number().over(w).cast("int").alias("rank"),
    )


def duplicate_ngram_profile(documents: DataFrame, n: int = 8) -> DataFrame:
    """Corpus-internal duplication profile: for each document, the
    fraction of its distinct word n-grams that also occur in ANOTHER
    document — the memorization-risk / boilerplate signal (CCNet's
    duplicated-content filters, Lee et al.'s "Deduplicating Training
    Data" substring-dup measure at n-gram granularity).

    Shuffle profile at 100 TB: distinct grams per doc (doc-local, no
    shuffle), HASHED to 8-byte xxhash64 keys before anything shuffles —
    the standard shingle-hashing trick: the ~50-byte gram strings never
    leave the scan task, the df aggregate and the df→pairs join both
    move fixed-width longs (a 2⁻⁶⁴-per-pair collision risk, far below
    any corpus-scale concern). The join carries NO broadcast hint: the
    gram table of a web corpus is larger than its vocabulary. The plan
    deliberately scans documents twice (df-aggregate branch + join
    branch): the single-scan alternative — a count window partitioned
    by gram_h — would funnel every occurrence of a hot boilerplate
    gram through ONE task, and AQE can split skewed JOINS but not
    skewed windows; two cheap scans buy a skew-robust join. Output is
    doc-grain. Documents shorter than ``n`` tokens have no grams and are
    absent from the output (their dup fraction is undefined, not
    zero)."""
    from datalake_local_spark.session import fan_out

    # pre-expansion fan-out: the token/element generator below
    # multiplies rows; a one-row-group input would otherwise run
    # the whole expansion single-task (see session.fan_out)
    documents = fan_out(documents, "doc_id")
    toked = documents.select(
        "doc_id", F.split(_norm_text(F.col("text")), " ").alias("toks")
    )
    t = F.col("toks")
    grams = toked.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.when(
                    F.size(t) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1))),
                        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(t, i, n))),
                    ),
                ).otherwise(F.array().cast("array<bigint>"))
            )
        ).alias("gram_h"),
    )
    df_tbl = grams.groupBy("gram_h").agg(F.count("*").alias("df"))
    return (
        grams.join(df_tbl, "gram_h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_dup_grams"),
            F.round(
                F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)) / F.count("*"), 6
            ).alias("dup_fraction"),
        )
    )


def zipf_profile(documents: DataFrame, k: int = 100) -> DataFrame:
    """Zipf's-law fit over the corpus unigram distribution: regress
    log10(freq) on log10(rank) for the top-k tokens and report
    slope/intercept/R² (natural corpora sit near slope -1; a corpus
    whose slope drifts is a red flag for template spam or synthetic
    text — the distributional QA check next to the quality gate).

    Shuffle profile: one vocab-grain count (map-side combined), top-k
    via orderBy+limit (TakeOrderedAndProject), the rank window over k
    rows, and a scalar regr_* aggregate — nothing global-windowed at
    corpus grain."""
    from pyspark.sql import Window as W

    freqs = (
        documents.select(F.explode(F.split(_norm_text(F.col("text")), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(k)
    )
    ranked = freqs.withColumn(
        "rank", F.row_number().over(W.orderBy(F.col("n").desc(), "token"))
    )
    lx = F.log10(F.col("rank").cast("double"))
    ly = F.log10(F.col("n").cast("double"))
    return ranked.agg(
        F.count("*").alias("n_ranks"),
        F.round(F.regr_slope(ly, lx), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(ly, lx), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(ly, lx), 6).alias("zipf_r2"),
    )


def langid_confusion(documents: DataFrame) -> DataFrame:
    """Language-ID evaluation: confusion matrix of labeled ``lang`` vs
    the heuristic's ``lang_guess`` plus per-cell share of the true
    label's row — the accuracy audit any classifier-backed pipeline
    stage owes its operators (fastText in production, same contract).
    Label-grain aggregate; the share window runs over |langs|² rows."""
    from pyspark.sql import Window as W

    preds = language_id(documents)
    cells = preds.groupBy("lang", "lang_guess").agg(F.count("*").alias("n_docs"))
    w = W.partitionBy("lang")
    return cells.select(
        "lang",
        "lang_guess",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias("share_of_lang"),
        (F.col("lang") == F.col("lang_guess")).alias("is_correct"),
    )


#: PII detection patterns — portable between Java regex (Spark) and RE2
#: (DuckDB): no backreferences, no lookaround.
PII_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def synthesize_pii_text(documents: DataFrame) -> DataFrame:
    """(doc_id, text) with deterministic synthetic PII appended — the
    same fixture pattern as ``multimodal.synthesize_pcm_audio``: the
    testdata corpus carries no real PII, so the scrub operator gets a
    deterministic, oracle-reproducible workload instead of a vacuous
    all-zeros run. Every 7th doc gains an email, every 11th a phone
    number, every 13th an IPv4 — pure string expressions, engine-
    portable."""
    t = F.col("text")
    t = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(t, F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com today")),
    ).otherwise(t)
    t = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(
            t, F.lit(" call +1-555-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
        ),
    ).otherwise(t)
    t = F.when(
        F.col("doc_id") % 13 == 0,
        F.concat(
            t,
            F.lit(" host 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
            F.lit(" logged"),
        ),
    ).otherwise(t)
    return documents.select("doc_id", t.alias("text"))


def pii_scrub(documents: DataFrame) -> DataFrame:
    """PII detection + masking over the corpus — the redaction pass a
    training-data pipeline runs before anything ships to a trainer:
    count emails / phone numbers / IPv4s per document, mask each class
    with a typed placeholder, and emit the masked-text fingerprint so
    downstream dedup runs on the REDACTED text (two docs differing only
    in PII collapse together).

    All detection and masking is JVM-side regexp (regexp_count +
    chained regexp_replace in one projection — scan-speed, no UDF, no
    shuffle until the optional aggregate); at 100 TB this is a map-only
    column transform. Patterns are RE2-safe so the DuckDB oracle runs
    the very same expressions. In production the pattern set widens
    (names/NER need a model pass — that stage would be a mapInPandas
    kernel like the multimodal decoders); the plumbing here is the
    contract."""
    injected = synthesize_pii_text(documents)
    masked = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE,
            "<PHONE>",
        ),
        PII_IP_RE,
        "<IP>",
    )
    return injected.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(PII_PHONE_RE)).alias("n_phones"),
        F.regexp_count(F.col("text"), F.lit(PII_IP_RE)).alias("n_ips"),
        F.md5(masked).alias("masked_fp"),
    ).withColumn(
        "pii_total", (F.col("n_emails") + F.col("n_phones") + F.col("n_ips"))
    )


def corpus_qa_report(documents: DataFrame) -> DataFrame:
    """The per-document corpus-QA report a data curator actually reads:
    quality heuristics + language-ID agreement + corpus-internal
    duplication + unigram-LM score, one row per doc — four already-
    oracle-checked operators composed into ONE logical plan (each part
    is doc-grain, so every join is a doc_id equi-join Catalyst plans as
    a shared-shuffle merge; no operator-boundary materialization).
    ``dup_fraction`` is NULL for docs too short to carry an 8-gram —
    preserved as NULL (undefined, not zero).

    The quality and language-ID parts are PURE projections, so they
    fuse into one select (one scan, no doc_id self-join shuffle —
    joining two map-only frames of the same table would shuffle both
    for nothing); only the duplication and LM parts, which need
    corpus-grain aggregates joined back, are separate branches."""
    qex = _quality_exprs()
    guess, _best = _langid_exprs()
    q = documents.select(
        "doc_id",
        qex["n_tokens"].alias("n_tokens"),
        qex["mean_token_len"].alias("mean_token_len"),
        qex["stopword_ratio"].alias("stopword_ratio"),
        qex["alpha_ratio"].alias("alpha_ratio"),
        "lang",
        (F.col("lang") == guess).alias("langid_agrees"),
    )
    dup = duplicate_ngram_profile(documents).select("doc_id", "dup_fraction")
    lm = unigram_logprob(documents).select("doc_id", "mean_logp")
    return (
        q.join(dup, "doc_id", "left")
        .join(lm, "doc_id")
    )


def repetition_signals(documents: DataFrame) -> DataFrame:
    """Gopher-style within-document repetition filters (Rae et al. 2021,
    "Scaling Language Models: Methods, Analysis & Insights from Training
    Gopher", App. A1 — public arXiv paper), the standard pretraining
    quality gate against loops, boilerplate and keyword stuffing, adapted
    to token granularity:

    * ``dup_token_frac``    1 − types/tokens (type-token repetition);
    * ``top_2gram_frac``    occurrences of the doc's most frequent
      2-gram over all its 2-grams (Gopher's "fraction in most frequent
      n-gram", n=2);
    * ``dup_5gram_frac``    fraction of 5-gram positions whose gram
      repeats within the doc (Gopher's "fraction in duplicate n-grams",
      n=5);
    * ``is_repetitive``     any threshold tripped (0.5 / 0.2 / 0.15 —
      Gopher's 2-gram and dup-n-gram cutoffs, token-level; the 2-gram
      rule also requires the top bigram to occur ≥ 2 times, since a
      short non-repeating doc trivially has fraction 1/#bigrams).

    Docs too short for an n-gram family score 0 for it (nothing can
    repeat), not NULL — the gate must not pass short docs by accident.

    Scale shape: every signal is DOC-LOCAL. One documents scan, one
    explode of a tagged (n, gram-hash) union (1/2/5-grams built in the
    same projection), aggregates keyed on (doc_id, n, gram_h) then
    (doc_id) — the doc_id prefix makes hot boilerplate grams irrelevant
    (no corpus-grain gram key anywhere, unlike duplicate_ngram_profile
    which is the cross-doc complement). Grams are hashed to xxhash64 of
    the token SLICE before anything shuffles (same trick as
    duplicate_ngram_profile: ~8 bytes per key instead of the gram
    string; within-doc counts are collision-exact up to 2⁻⁶⁴, far below
    any corpus-scale concern — and array hashing sidesteps the
    concat-boundary ambiguity entirely). Thresholds compare the ROUNDED
    fractions so the flag is bit-identical to the ANSI oracle."""
    from datalake_local_spark.session import fan_out

    # pre-expansion fan-out: the token/element generator below
    # multiplies rows; a one-row-group input would otherwise run
    # the whole expansion single-task (see session.fan_out)
    documents = fan_out(documents, "doc_id")
    t = F.col("t")

    def _gram_hashes(col, n: int):
        k = F.size(col) - (n - 1)
        return F.when(
            k >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
                lambda i: F.xxhash64(F.slice(col, i, n)),
            ),
        ).otherwise(F.array().cast("array<bigint>"))

    # single-arg lambda factory: a two-parameter lambda would make
    # F.transform pass the ARRAY INDEX as the second argument, silently
    # shadowing the captured n
    def _tag(n: int):
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = (
        documents.select(
            "doc_id", F.split(_norm_text(F.col("text")), " ").alias("t")
        )
        .select(
            "doc_id",
            F.explode(
                F.concat(
                    *[F.transform(_gram_hashes(t, n), _tag(n)) for n in (1, 2, 5)]
                )
            ).alias("g"),
        )
        .select("doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    )
    counts = tagged.groupBy("doc_id", "n", "gram").agg(F.count("*").alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum(F.when(F.col("n") == 1, F.col("c"))).alias("n_tokens"),
        F.count_distinct(F.when(F.col("n") == 1, F.col("gram"))).alias("n_types"),
        F.max(F.when(F.col("n") == 2, F.col("c"))).alias("top2"),
        F.sum(F.when(F.col("n") == 2, F.col("c"))).alias("tot2"),
        F.sum(F.when((F.col("n") == 5) & (F.col("c") >= 2), F.col("c"))).alias("dup5"),
        F.sum(F.when(F.col("n") == 5, F.col("c"))).alias("tot5"),
    )
    sig = per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.lit(1.0) - F.col("n_types") / F.col("n_tokens"), 6).alias(
            "dup_token_frac"
        ),
        F.round(
            F.coalesce(F.col("top2") / F.col("tot2"), F.lit(0.0)), 6
        ).alias("top_2gram_frac"),
        F.round(
            F.coalesce(F.col("dup5") / F.col("tot5"), F.lit(0.0)), 6
        ).alias("dup_5gram_frac"),
        F.coalesce(F.col("top2"), F.lit(0)).alias("_top2"),
    )
    # the 2-gram rule additionally requires the top bigram to actually
    # REPEAT: for a doc with t bigrams and no repetition the fraction is
    # trivially 1/t, which exceeds any threshold on short docs
    return sig.withColumn(
        "is_repetitive",
        (F.col("dup_token_frac") > 0.5)
        | ((F.col("_top2") >= 2) & (F.col("top_2gram_frac") > 0.2))
        | (F.col("dup_5gram_frac") > 0.15),
    ).drop("_top2")


def synthesize_encoding_noise(documents: DataFrame) -> DataFrame:
    """(doc_id, text) with deterministic encoding junk appended — the
    fixture pattern of ``synthesize_pii_text``: the synthetic corpus is
    clean UTF-8, so the encoding-quality gate gets a reproducible
    workload. Every 6th doc gains a latin-1-mangled token ('caf\u00c3\u00a9' —
    UTF-8 read as latin-1), every 9th 1 + doc_id % 3 replacement
    characters (U+FFFD), every 15th a BEL + ESC control pair. Pure
    string expressions, engine-portable."""
    t = F.col("text")
    t = F.when(
        F.col("doc_id") % 6 == 0, F.concat(t, F.lit(" caf\u00c3\u00a9 d\u00c3\u00a9j\u00c3\u00a0"))
    ).otherwise(t)
    t = F.when(
        F.col("doc_id") % 9 == 0,
        F.concat(
            t, F.lit(" "), F.expr("repeat('\ufffd', CAST(doc_id % 3 + 1 AS INT))")
        ),
    ).otherwise(t)
    t = F.when(
        F.col("doc_id") % 15 == 0, F.concat(t, F.lit(" log\x07\x1bend"))
    ).otherwise(t)
    return documents.select("doc_id", t.alias("text"))


def encoding_quality(documents: DataFrame) -> DataFrame:
    """Encoding-quality gate (the CCNet-style 'is this bytes-clean text'
    signal): per doc, counts of U+FFFD replacement characters (a decoder
    already gave up), C0 control characters (tab/newline/CR excluded),
    and '\u00c3'-prefixed mojibake signatures (UTF-8 multibyte lead read as
    latin-1), plus a suspect flag. Runs over the deterministic noise
    fixture so the check is non-vacuous; map-only single scan, no
    shuffle at all. Counts use length-difference and regexp_count —
    both exactly portable to the ANSI oracle."""
    noisy = synthesize_encoding_noise(documents)
    t = F.col("text")
    n_repl = F.length(t) - F.length(F.replace(t, F.lit("\ufffd"), F.lit("")))
    n_moji = F.length(t) - F.length(F.replace(t, F.lit("\u00c3"), F.lit("")))
    n_ctrl = F.expr(
        "regexp_count(text, '[\\\\x00-\\\\x08\\\\x0B\\\\x0C\\\\x0E-\\\\x1F]')"
    )
    out = noisy.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        n_repl.cast("int").alias("n_replacement"),
        n_ctrl.cast("int").alias("n_control"),
        n_moji.cast("int").alias("n_mojibake"),
    )
    return out.withColumn(
        "is_suspect",
        (F.col("n_replacement") > 0)
        | (F.col("n_control") > 0)
        | (F.col("n_mojibake") / F.greatest(F.col("n_chars"), F.lit(1)) > 0.002),
    )


def segment_dedup(documents: DataFrame, seg_tokens: int = 8) -> DataFrame:
    """C4-style corpus-wide segment dedup (Raffel et al. 2020, "Exploring
    the Limits of Transfer Learning with a Unified Text-to-Text
    Transformer", §2.2 — public arXiv paper: C4 discards all but one
    occurrence of any repeated three-sentence span). The synthetic corpus
    has no sentence boundaries, so the unit is a fixed window of
    ``seg_tokens`` consecutive tokens (non-overlapping; the short tail
    window is a segment too — C4 dedups every line, not just full ones).

    Any segment string occurring MORE THAN ONCE corpus-wide (across or
    within docs) keeps exactly its first occurrence — the minimum
    (doc_id, seg_id), encoded as ``doc_id * 1_000_000_000 + seg_id`` so
    the arg-min is a plain partially-aggregating ``min`` in both engines
    (the 1e9 stride caps docs at 10⁹ segments ≈ 8·10⁹ tokens — far past
    any real document — and doc_ids at ~9·10⁹ before bigint overflow) —
    and every other occurrence is removed. Output is the per-doc audit:
    segment/token counts before and after, and an md5 fingerprint of the
    ordered kept-segment sequence (NULL when nothing survives) — the
    identity of the text a rewrite stage would emit.

    Scale shape: segments are built map-side with slice() over a
    sequence (no posexplode row blow-up before the shuffle). The
    corpus-wide "occurs more than once / who is first" test is ONE
    seg_h-partitioned window (count + min(occ_key) over the gram
    partition) — the r20 `duplicate_span_coverage` lesson applied to
    the segment grain (r21): the former groupBy-screen + join re-ran
    the whole tokenize/md5 EXPANSION once per consumer above the
    reused fan-out exchange (2 Generate in the captured before-plan)
    and paid a second (narrow) exchange + join; the window form
    expands once and exchanges once (measured: executed-plan
    exchanges 5→3, exact-equal output, ~4% local wall at sf0.1 —
    the structural win is the single expansion, which is the per-row
    CPU term at corpus scale, and one fewer shuffle in the 100 TB
    SMJ regime where the segment relation is NOT broadcastable).
    Hot boilerplate keys cost a skewed window partition instead of a
    skew-split join — bounded by the same occurrence count either
    way. The final re-aggregation is doc-local (collect_list of a
    single doc's kept segments — bounded by doc size, never
    corpus-grain)."""
    from pyspark.sql import Window as W
    from datalake_local_spark.session import fan_out

    # pre-expansion fan-out: the token/element generator below
    # multiplies rows; a one-row-group input would otherwise run
    # the whole expansion single-task (see session.fan_out)
    documents = fan_out(documents, "doc_id")
    t = F.split(_norm_text(F.col("text")), " ")
    n_seg = F.ceil(F.size(t) / F.lit(seg_tokens)).cast("int")
    segs = documents.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_seg - 1),
                lambda i: F.struct(
                    i.alias("seg_id"),
                    F.concat_ws(" ", F.slice(t, i * seg_tokens + 1, seg_tokens)).alias(
                        "seg"
                    ),
                ),
            )
        ).alias("s"),
    ).select(
        "doc_id",
        F.col("s.seg_id").alias("seg_id"),
        # 8-byte shuffle/join key (xxhash64); the md5 string is kept ONLY
        # for the fingerprint concat — group equivalence is identical
        F.xxhash64(F.col("s.seg")).alias("seg_h"),
        F.md5(F.col("s.seg")).alias("seg_md5"),
        F.size(F.split(F.col("s.seg"), " ")).alias("seg_n_tokens"),
        (F.col("doc_id") * 1000000000 + F.col("s.seg_id")).alias("occ_key"),
    )
    w = W.partitionBy("seg_h")
    flagged = segs.select(
        "*",
        F.count(F.lit(1)).over(w).alias("n_occ"),
        F.min("occ_key").over(w).alias("keeper_key"),
    ).withColumn(
        "removed", (F.col("n_occ") >= 2) & (F.col("occ_key") != F.col("keeper_key"))
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.when(F.col("removed"), 1).otherwise(0)).cast("int").alias("n_removed"),
        F.sum("seg_n_tokens").cast("long").alias("n_tokens"),
        F.sum(F.when(~F.col("removed"), F.col("seg_n_tokens")).otherwise(0))
        .cast("long")
        .alias("n_tokens_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("removed"),
                            F.struct(F.col("seg_id"), F.col("seg_md5")),
                        )
                    )
                ),
                lambda s: s["seg_md5"],
            ),
        ).alias("_kept_cat"),
    )
    # fingerprint over the ORDERED kept segment hashes; NULL (not
    # md5('')) when the whole doc was removed, matching the SQL oracle's
    # string_agg-over-empty NULL semantics
    return per_doc.select(
        "doc_id",
        F.col("n_segments").cast("int").alias("n_segments"),
        "n_removed",
        "n_tokens",
        "n_tokens_kept",
        F.when(
            F.col("n_tokens_kept") > 0, F.md5(F.col("_kept_cat"))
        ).alias("kept_fingerprint"),
    )


def duplicate_span_coverage(documents: DataFrame, k: int = 8) -> DataFrame:
    """Exact-substring duplication coverage (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — public
    arXiv paper: ExactSubstr removes every ≥50-token span shared between
    documents). Suffix arrays don't distribute, so the standard scalable
    approximation is used: a token position is DUPLICATED if some
    ``k``-token window starting at it also occurs in ANOTHER document,
    and the per-doc audit reports the interval-union of those windows —
    exactly the characters an ExactSubstr rewrite would cut, as

    * ``n_dup_grams``     duplicated window STARTS in the doc;
    * ``covered_tokens``  tokens under the union of [s, s+k-1] windows
      (adjacent/overlapping spans merged by a lead() difference capped
      at k — interval union as one per-doc window function);
    * ``dup_frac``        covered_tokens / n_tokens.

    Cross-doc only (count(DISTINCT doc) >= 2): within-doc loops are
    ``repetition_signals``'s job, and distinct-gram overlap fractions
    are ``duplicate_ngram_profile``'s — this operator is the
    position-level complement that says how much TEXT a span rewrite
    would actually remove.

    Scale shape: gram starts are built map-side (transform over a
    sequence, ONE explode — no posexplode token blow-up) and shuffle as
    8-byte xxhash64 keys of the token slice, never gram strings. The
    corpus-grain aggregate is count(DISTINCT doc_id) — two-phase
    partial-distinct, hot boilerplate grams combine map-side. The join
    of starts to the duplicated-gram set is LEFT SEMI (the flag relation
    never widens rows) and is the skew point at 100 TB — AQE skew-join
    splits hot grams, same reasoning as duplicate_ngram_profile. The
    interval-union window partitions by doc_id: per-task state is one
    doc's dup starts, bounded by doc length.

    r20 opt: ``fan_out`` before the gram explode (single-row-group
    inputs ran the transform+xxhash64 expansion on one task), and the
    cross-doc screen is now ONE gram-partitioned window —
    ``min(doc_id) ≠ max(doc_id)`` over the gram partition is exactly
    ``count(DISTINCT doc_id) >= 2`` — replacing the grouped
    count-distinct + LEFT SEMI join pair that shuffled the gram rows
    twice (the _non_canonical_positions lesson from the ExactSubstr
    family). Values bit-identical; one corpus-wide exchange instead
    of two."""
    from pyspark.sql import Window as W

    from datalake_local_spark.session import fan_out

    t = F.split(_norm_text(F.col("text")), " ")
    base = fan_out(documents, "doc_id").select(
        "doc_id", t.alias("t"), F.size(t).alias("n_tokens")
    )
    empty = "array<struct<i:int,g:bigint>>"
    grams = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.col("n_tokens") >= k,
                F.transform(
                    F.sequence(F.lit(1), F.col("n_tokens") - (k - 1)),
                    lambda i: F.struct(
                        i.cast("int").alias("i"),
                        F.xxhash64(F.slice(F.col("t"), i, k)).alias("g"),
                    ),
                ),
            ).otherwise(F.expr(f"cast(array() as {empty})"))
        ).alias("s"),
    ).select("doc_id", F.col("s.i").alias("i"), F.col("s.g").alias("g"))
    wg = W.partitionBy("g")
    w = W.partitionBy("doc_id").orderBy("i")
    starts = (
        grams.select(
            "doc_id",
            "i",
            F.min("doc_id").over(wg).alias("dmin"),
            F.max("doc_id").over(wg).alias("dmax"),
        )
        .filter(F.col("dmin") != F.col("dmax"))
        .select("doc_id", "i")
        .withColumn(
            "cov",
            F.least(
                F.coalesce(F.lead("i").over(w) - F.col("i"), F.lit(k)), F.lit(k)
            ),
        )
    )
    per_doc = starts.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_dup_grams"),
        F.sum("cov").cast("long").alias("covered_tokens"),
    )
    return (
        base.select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.greatest(F.col("n_tokens") - (k - 1), F.lit(0))
            .cast("int")
            .alias("n_grams"),
        )
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_grams",
            F.coalesce(F.col("n_dup_grams"), F.lit(0)).alias("n_dup_grams"),
            F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("long").alias(
                "covered_tokens"
            ),
            F.round(
                F.coalesce(F.col("covered_tokens"), F.lit(0)) / F.col("n_tokens"), 6
            ).alias("dup_frac"),
        )
    )


def lang_quality_buckets(documents: DataFrame) -> DataFrame:
    """CCNet-style per-language quality bucketing (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data" — public arXiv paper: documents are split into head/middle/
    tail by per-language perplexity terciles, so every language is
    ranked against ITS OWN distribution, not a global bar that poor-
    resource languages always fail). The perplexity proxy is the corpus
    unigram LM score (``unigram_logprob``; a production pipeline swaps
    in KenLM — same data flow): HIGHER mean log-prob = more typical
    text = head.

    Terciles are exact interpolated percentiles of the ROUNDED score
    (both engines interpolate over the identical 6-dp grid, and the
    thresholds are re-rounded to 6 dp, so bucket comparisons are
    engine-portable), computed per language and broadcast back — never
    an ntile window, which would funnel each language's every doc
    through one task (#langs partitions regardless of cluster size).
    At 100 TB the exact percentile aggregate is the one memory-heavy
    piece (it holds a language's score multiset per task); the scale
    swap is ``approx_percentile`` with an accuracy knob — same plan
    shape, sketch-sized tasks — at the cost of the exactness this
    oracle certifies.

    Output is doc-grain: (doc_id, lang, lm_score, bucket)."""
    docs = unigram_logprob(documents, carry_cols=("lang",)).select(
        "doc_id", "lang", "mean_logp"
    )
    th = docs.groupBy("lang").agg(
        F.round(F.percentile("mean_logp", 1.0 / 3), 6).alias("t1"),
        F.round(F.percentile("mean_logp", 2.0 / 3), 6).alias("t2"),
    )
    return docs.join(F.broadcast(th), "lang").select(
        "doc_id",
        "lang",
        F.col("mean_logp").alias("lm_score"),
        F.when(F.col("mean_logp") > F.col("t2"), "head")
        .when(F.col("mean_logp") > F.col("t1"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


#: Learned BPE merge tables keyed on (source file signatures, n_merges):
#: plain python rows, no session affinity, bounded FIFO. PER-KEY locks
#: held across the training build (same discipline as the IVF
#: registry): two threads asking for the same table run it once; the
#: meta-lock only guards the lock table and the FIFO dict itself.
import threading as _threading

_BPE_MERGE_CACHE: dict = {}
_BPE_META_LOCK = _threading.Lock()
_BPE_KEY_LOCKS: dict = {}


def _bpe_key_lock(key):
    with _BPE_META_LOCK:
        return _BPE_KEY_LOCKS.setdefault(key, _threading.Lock())


def bpe_train(documents: DataFrame, n_merges: int = 20) -> DataFrame:
    """Byte-pair-encoding vocabulary induction (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units" —
    public arXiv paper): starting from characters, repeatedly merge the
    most frequent adjacent symbol pair, producing the ordered merge
    table that defines a subword tokenizer. Returns one row per learned
    merge: (rank, left, right, merged, pair_count).

    Classic BPE is a driver-side dict loop; the distributed form works
    on the WORD-GRAIN relation (distinct word → corpus count — vocab-
    sized, millions-to-billions of rows at 100 TB, never the corpus
    itself, and pair counts are weighted sums over it):

    * pair counting per round = one explode + groupBy(pair) with
      map-side partial agg; the best pair is ``orderBy().limit(1)``
      (TakeOrderedAndProject) — exactly ONE row crosses to the driver
      per round, which is what makes the loop's driver state bounded;
    * ties break (count desc, left, right) — fully deterministic;
    * the merge application is a pure Catalyst ``aggregate`` fold over
      each word's symbol array (greedy left-to-right, the BPE standard;
      non-overlap falls out because the merged symbol no longer equals
      ``left``) — no Python in the per-word hot path;
    * each round ``localCheckpoint``s its symbol table and eagerly
      releases the last (dedup's ``_release_checkpoint`` discipline):
      without plan truncation every round stacks another higher-order
      fold onto the lineage and Catalyst analysis goes OOM around round
      ~15 — same failure mode as the label-propagation loop, same fix.

    20 rounds = 20 small jobs over a vocab-grain table; the corpus is
    scanned ONCE (building word counts). The learned table is memoized
    per (source files, n_merges) — plain python tuples, session-free —
    so ``bpe_encode_corpus`` and repeat calls replay the result without
    re-running the loop (the build-once registry discipline of the IVF
    and band indexes)."""
    from datalake_local_spark.llm.dedup import source_signature

    spark = documents.sparkSession
    src = source_signature(documents)
    ck = (src, n_merges)
    if src:
        lock = _bpe_key_lock(ck)
        lock.acquire()  # held across the build: same-key callers reuse
    else:
        lock = None
    try:
        hit = _BPE_MERGE_CACHE.get(ck) if src else None
        if hit is not None:
            return spark.createDataFrame(
                hit,
                schema="rank int, left string, right string, merged string, pair_count long",
            )
        return _bpe_train_build(documents, n_merges, spark, src, ck)
    finally:
        if lock is not None:
            lock.release()


def _bpe_train_build(documents, n_merges, spark, src, ck):
    words = (
        documents.select(
            F.explode(F.split(_norm_text(F.col("text")), " ")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    # substr(w, i, 1) per position — sequence+transform keeps it JVM-side
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    from datalake_local_spark.llm.dedup import _release_checkpoint

    cur = words.select("n", chars.alias("s")).coalesce(4).localCheckpoint()
    merges = []
    try:
        for rank in range(1, n_merges + 1):
            pairs = cur.select(
                "n",
                F.explode(
                    F.when(
                        F.size("s") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("s") - 1),
                            lambda i: F.struct(
                                F.element_at(F.col("s"), i).alias("a"),
                                F.element_at(F.col("s"), i + 1).alias("b"),
                            ),
                        ),
                    ).otherwise(F.expr("cast(array() as array<struct<a:string,b:string>>)"))
                ).alias("p"),
            )
            best = (
                pairs.groupBy("p")
                .agg(F.sum("n").alias("c"))
                .orderBy(F.col("c").desc(), F.col("p.a"), F.col("p.b"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b, c = best[0]["p"]["a"], best[0]["p"]["b"], int(best[0]["c"])
            merged = a + b
            merges.append((rank, a, b, merged, c))
            la, lb, lm = F.lit(a), F.lit(b), F.lit(merged)
            folded = F.aggregate(
                F.col("s"),
                F.expr("cast(array() as array<string>)"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == la)
                    & (x == lb),
                    F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(lm)),
                ).otherwise(F.concat(acc, F.array(x))),
            )
            nxt = cur.select("n", folded.alias("s")).localCheckpoint()
            _release_checkpoint(cur)
            cur = nxt
    finally:
        _release_checkpoint(cur)
    if src:
        with _BPE_META_LOCK:
            while len(_BPE_MERGE_CACHE) >= 8:
                _BPE_MERGE_CACHE.pop(next(iter(_BPE_MERGE_CACHE)))
            _BPE_MERGE_CACHE[ck] = list(merges)
    return spark.createDataFrame(
        merges, schema="rank int, left string, right string, merged string, pair_count long"
    )


def compression_ratio_signal(documents: DataFrame) -> DataFrame:
    """Compressibility quality signal: per-doc zlib ratio
    (compressed/raw bytes) plus the repetitive/gibberish flags derived
    from it — the filter web-corpus pipelines (RefinedWeb, Dolma —
    public papers) run because compressibility catches what token
    statistics miss: highly repetitive text compresses far below
    normal prose, random/encrypted junk refuses to compress at all.

    zlib is not expressible as a column function, so this is an
    Arrow-batched ``mapInPandas`` kernel (stdlib zlib, level 6 pinned —
    deterministic bytes-in/bytes-out, no model state). Map-only: one
    documents scan, no shuffle, the text never leaves its scan task.
    Rows-only correctness (no ANSI zlib); planted-corpus thresholds and
    determinism are asserted in tests.

    Flags: ``too_repetitive`` (ratio < 0.35 — loops/boilerplate),
    ``incompressible`` (ratio > 0.8 — near the ~0.84 ceiling of
    max-entropy printable ASCII: random/base64 junk). Ordinary prose
    sits between — but ONLY above a length floor: zlib's fixed header
    dominates short docs (a 100-byte sentence scores ~0.84), so
    production gates apply the flag above ~200 bytes, as the tests
    pin."""
    import pandas as pd
    import zlib

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw = [(t or "").encode("utf-8") for t in pdf["text"]]
            comp = [len(zlib.compress(b, 6)) for b in raw]
            n = [max(len(b), 1) for b in raw]
            ratio = [round(c / m, 6) for c, m in zip(comp, n)]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in raw],
                    "n_compressed": comp,
                    "compression_ratio": ratio,
                }
            )

    out = documents.select("doc_id", "text").mapInPandas(
        kernel,
        "doc_id long, n_bytes long, n_compressed long, compression_ratio double",
    )
    return out.select(
        "doc_id",
        "n_bytes",
        "n_compressed",
        "compression_ratio",
        (F.col("compression_ratio") < 0.35).alias("too_repetitive"),
        ((F.col("compression_ratio") > 0.8) & (F.col("n_bytes") >= 200)).alias(
            "incompressible"
        ),
    )


def bpe_encode_corpus(
    documents: DataFrame, n_merges: int = 20, merges: list | None = None
) -> DataFrame:
    """Apply a trained BPE merge table to the corpus — the second half
    of the tokenizer arc (``bpe_train`` learns, this encodes), and the
    number every tokenizer decision is judged by: how many subword
    tokens the corpus becomes.

    Encoding is the standard sequential merge loop per word, so it runs
    at WORD grain: the distinct-word relation (vocab-sized — millions,
    not the corpus) goes through an Arrow kernel with the merge list
    broadcast in rank order; per-doc token counts then come from
    joining each doc's words back to the encoded vocabulary — one
    corpus scan for word counts, one for the re-join, kernel work
    bounded by vocabulary size. Per-doc output: whitespace words,
    subword tokens, chars, and the tokens-per-word expansion the
    tokenizer literature reports.

    Deterministic: merges apply greedily left-to-right in rank order —
    matches the pure-python reference in tests exactly. Pass ``merges``
    (rank-ordered (left, right) pairs) to reuse an already-trained
    table instead of paying the training loop again; docs whose
    normalized text is empty still get an audit row (all-zero counts,
    NULL tokens_per_word) like every sibling per-doc operator."""
    import pandas as pd

    if merges is None:
        merges = [
            (r["left"], r["right"])
            for r in bpe_train(documents, n_merges).orderBy("rank").collect()
        ]
    spark = documents.sparkSession
    bc = spark.sparkContext.broadcast(merges)

    toks = documents.select(
        "doc_id", F.explode(F.split(_norm_text(F.col("text")), " ")).alias("w")
    ).filter(F.length("w") > 0)
    vocab = toks.groupBy("w").agg(F.count("*").alias("n_occ"))

    def encode(batches):
        ms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_sub = []
            for w in pdf["w"]:
                syms = list(w)
                for a, b in ms:
                    out = []
                    for x in syms:
                        if out and out[-1] == a and x == b:
                            out[-1] = a + b
                        else:
                            out.append(x)
                    syms = out
                n_sub.append(len(syms))
            yield pd.DataFrame({"w": pdf["w"], "n_subtokens": n_sub})

    encoded = vocab.select("w").mapInPandas(encode, "w string, n_subtokens int")
    per_doc = (
        toks.join(encoded, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_words"),
            F.sum("n_subtokens").cast("long").alias("n_subword_tokens"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
        )
    )
    return (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_words"), F.lit(0)).alias("n_words"),
            F.coalesce(F.col("n_subword_tokens"), F.lit(0)).cast("long").alias(
                "n_subword_tokens"
            ),
            F.coalesce(F.col("n_chars"), F.lit(0)).cast("long").alias("n_chars"),
            F.when(
                F.col("n_words") > 0,
                F.round(F.col("n_subword_tokens") / F.col("n_words"), 6),
            ).alias("tokens_per_word"),
        )
    )


def span_corruption_plan(
    documents: DataFrame, mask_rate: float = 0.15, mean_span: int = 3
) -> DataFrame:
    """T5-style span-corruption data prep (Raffel et al. 2020 §3.1.4,
    the same public paper as C4: mask ~15% of tokens in contiguous
    spans, mean length 3) — but DETERMINISTIC: every masking decision
    derives from md5 of (doc_id, position), not an RNG, so the same
    corpus always yields the same corruption plan (reproducible
    pretraining batches, resumable without RNG-state checkpoints, and
    an exact ANSI oracle).

    Construction: positions where md5(doc:pos) mod 1000 <
    1000·mask_rate/mean_span become SPAN STARTS; each span extends
    ``mean_span`` tokens (clipped at the doc end; overlapping spans
    merge — the interval-union window of ``duplicate_span_coverage``).
    Expected masked fraction ≈ mask_rate for documents long relative
    to mean_span. Output is the per-doc audit a data loader consumes:
    token count, span count (post-merge), masked-token count and
    fraction, and the sentinel-sequence fingerprint (md5 over the
    ordered kept/masked structure).

    Scale shape: map-side position explode (transform over sequence,
    one explode), per-doc interval-union window (task state = one
    doc's span starts), doc-grain aggregate — no corpus-grain key
    anywhere, trivially parallel at 100 TB."""
    from pyspark.sql import Window as W

    t = F.split(_norm_text(F.col("text")), " ")
    threshold = int(1000 * mask_rate / mean_span)
    base = documents.select("doc_id", F.size(t).alias("n_tokens"))
    pos = documents.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.explode(F.sequence(F.lit(1), F.greatest(F.size(t), F.lit(1)))).alias("p"),
    ).filter(
        _md5_bucket(F.concat_ws(":", F.col("doc_id"), F.col("p")), 1000) < threshold
    )
    w = W.partitionBy("doc_id").orderBy("p")
    spans = pos.withColumn(
        "cov",
        F.least(
            F.coalesce(F.lead("p").over(w) - F.col("p"), F.lit(mean_span)),
            F.lit(mean_span),
        ),
    ).withColumn(
        "cov", F.least(F.col("cov"), F.col("n_tokens") - F.col("p") + 1)
    ).withColumn(
        "new_span",
        F.coalesce(
            (F.col("p") - F.lag("p").over(w)) > F.lag("cov").over(w), F.lit(True)
        ).cast("int"),
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("new_span").cast("int").alias("n_spans"),
        F.sum("cov").cast("long").alias("n_masked"),
        # collect_list order is not guaranteed after a window — sort the
        # (p, cov) structs before fingerprinting so the hash is stable
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("p"), F.col("cov")))
                    ),
                    lambda s: F.concat_ws(":", s["p"], s["cov"]),
                ),
            )
        ).alias("plan_fingerprint"),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"),
            F.coalesce(F.col("n_masked"), F.lit(0)).cast("long").alias("n_masked"),
            F.round(
                F.coalesce(F.col("n_masked"), F.lit(0)) / F.col("n_tokens"), 6
            ).alias("masked_frac"),
            "plan_fingerprint",
        )
    )


def feature_hashing(documents: DataFrame, n_buckets: int = 4096) -> DataFrame:
    """Hashing-trick featurizer (Weinberger et al. 2009, "Feature
    Hashing for Large Scale Multitask Learning", ICML — public paper):
    token counts folded into a fixed ``n_buckets``-dimensional sparse
    space by hashing, the standard way to featurize unbounded
    vocabularies without a fitted dictionary (no vocab build pass, no
    OOV problem, bounded model width at 100 TB).

    Bucket = first-8-hex-chars of md5(token) mod n_buckets — identical
    arithmetic in both engines, so unlike production xxhash variants
    this featurizer is EXACTLY oracle-certified. Output is the exploded
    sparse form (doc_id, bucket, weight) — value-hash-friendly and the
    shape a downstream trainer consumes; collisions (several tokens
    sharing a bucket) sum, which is the hashing trick's documented
    bias-variance trade.

    Scale shape: explode to token grain, hash map-side, ONE
    (doc, bucket) aggregate with map-side combine; no vocabulary
    relation, no join, no driver state."""
    toks = documents.select(
        "doc_id", F.explode(F.split(_norm_text(F.col("text")), " ")).alias("token")
    ).filter(F.length("token") > 0)
    bucket = _md5_bucket(F.col("token"), n_buckets)
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("long").alias("weight"))
    )


def bigram_logprob(documents: DataFrame) -> DataFrame:
    """Per-document add-one-smoothed bigram LM score — one rung above
    ``unigram_logprob`` on the CCNet/KenLM quality ladder (Wenzek et
    al. 2020 filter on LM perplexity; this is the self-trained bigram
    version with Laplace smoothing, Jurafsky & Martin ch. 3 — public):
    mean log10 P(w_i | w_{i-1}) with P = (c(w1,w2)+1) / (c(w1)+V).
    Low scores mean token sequences the corpus has never seen —
    gibberish, OCR damage, wrong-language fragments — even when every
    individual token is common (the case a unigram score cannot see).

    Scale shape: bigrams come from lead() over posexploded tokens (the
    engine-portable formulation: no array zip dialects), so the token
    stream is materialized once; bigram and unigram count tables are
    vocab-grain groupBys (map-side combined); V is a 1-row broadcast.
    The doc-grain rescoring join carries no broadcast hint — a
    web-scale bigram table is not broadcastable; AQE broadcasts it at
    bench SF. Docs with < 2 tokens surface with n_bigrams = 0 and NULL
    score (explicit contract, same as TF-IDF's null-text rule)."""
    from pyspark.sql import Window as W

    toks = documents.select(
        "doc_id",
        F.posexplode(F.split(_norm_text(F.col("text")), " ")).alias("pos", "w1"),
    ).localCheckpoint()  # the token stream: reused by the bigram
    # window AND the unigram counts — materialized once (the LM build
    # step), not re-tokenized per consumer (r12 plan census)
    w = W.partitionBy("doc_id").orderBy("pos")
    big = toks.select(
        "doc_id", "w1", F.lead("w1").over(w).alias("w2")
    ).filter(F.col("w2").isNotNull()).localCheckpoint()
    bi_freq = big.groupBy("w1", "w2").agg(F.count("*").alias("c_bi"))
    uni_freq = toks.groupBy("w1").agg(F.count("*").alias("c_uni"))
    vocab = uni_freq.agg(F.count("*").alias("v"))
    scored = (
        big.join(bi_freq, ["w1", "w2"])
        .join(uni_freq, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log10((F.col("c_bi") + 1) / (F.col("c_uni") + F.col("v"))).alias("lp"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("mean_log10_p"),
            F.round(F.min("lp"), 6).alias("min_log10_p"),
        )
    )
    return (
        documents.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            "mean_log10_p",
            "min_log10_p",
        )
    )


def cm_heavy_hitters(
    documents: DataFrame, n_seeds: int = 4, width: int = 256, top_n: int = 20
) -> DataFrame:
    """Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005):
    the bounded-memory token-frequency sketch — d×w counters instead of
    a vocabulary-sized table — with its defining guarantee surfaced:
    estimate = min over d seed-rows of counter[seed][h_seed(token)],
    NEVER below the true count (collisions only ADD). The report joins
    the exact top-``top_n`` tokens with their CM estimates and the
    overestimate, the calibration a pipeline runs before trusting the
    sketch at vocab scales where exact counting is the thing being
    avoided.

    Scale shape: the sketch is a groupBy over (seed, bucket) — d·w
    result rows total regardless of corpus size, map-side combined; the
    token stream is materialized once and feeds both the exact counts
    (vocab-grain groupBy, the expensive path the sketch replaces —
    retained here as the verifier) and the d-seed explode (d rows per
    token BEFORE the partial agg collapses them). The estimate join
    probes d·top_n rows against the d·w sketch — both broadcastable at
    any corpus size. Bucket hash is the engine-portable md5 idiom
    (_md5_bucket), identical in the oracle."""
    from datalake_local_spark.session import fan_out

    # pre-expansion fan-out: the token/element generator below
    # multiplies rows; a one-row-group input would otherwise run
    # the whole expansion single-task (see session.fan_out)
    documents = fan_out(documents, "doc_id")
    toks = documents.select(
        F.explode(F.split(_norm_text(F.col("text")), " ")).alias("token")
    ).filter(F.length("token") > 0)
    seeds = F.array(*[F.lit(i) for i in range(n_seeds)])
    sketch = (
        toks.select(
            "token", F.explode(seeds).alias("seed")
        )
        .select(
            "seed",
            _md5_bucket(
                F.concat_ws(":", F.col("seed").cast("string"), F.col("token")), width
            ).alias("bucket"),
        )
        .groupBy("seed", "bucket")
        .agg(F.count("*").cast("long").alias("counter"))
    )
    exact = toks.groupBy("token").agg(F.count("*").cast("long").alias("exact_count"))
    from pyspark.sql import Window as W

    top = (
        exact.withColumn(
            "rn",
            F.row_number().over(
                W.orderBy(F.col("exact_count").desc(), F.col("token"))
            ),
        )
        .filter(F.col("rn") <= top_n)
        .drop("rn")
    )
    probes = top.select(
        "token", "exact_count", F.explode(seeds).alias("seed")
    ).select(
        "token",
        "exact_count",
        "seed",
        _md5_bucket(
            F.concat_ws(":", F.col("seed").cast("string"), F.col("token")), width
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("counter").alias("cm_estimate"))
        .select(
            "token",
            "exact_count",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy(F.col("exact_count").desc(), "token")
    )


_RAKE_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def rake_keywords(documents: DataFrame, top_n: int = 25) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free token runs; word score = deg/freq where deg
    sums the lengths of every phrase containing the word (co-occurrence
    degree) and freq counts occurrences; a phrase scores the sum of its
    words. The corpus-level report returns the ``top_n`` phrases — the
    zero-model keyword/metadata enrichment pass a corpus catalog runs.

    Phrase segmentation is deliberately RELATIONAL, not regex: tokens
    posexploded once, stopwords flagged, and phrases recovered with the
    row_number-difference gaps-and-islands idiom (the activity_streaks
    discipline) — engine-portable by construction where a stopword
    regex split would lean on dialect-specific \\b semantics. Phrase
    text reassembles with an order-pinned aggregation (sorted structs
    here, string_agg ORDER BY in the oracle).

    Scale shape: one token materialization; islands from ONE doc-grain
    window; word stats are vocab-grain groupBys (map-side combined);
    the phrase-score join is phrase-word-grain. Top-N via one ungrouped
    window over the phrase-grain aggregate — phrase cardinality is
    corpus-bounded but the top-N window input is ALREADY the aggregated
    phrase table, not token grain."""
    from pyspark.sql import Window as W

    toks = documents.select(
        "doc_id",
        F.posexplode(F.split(_norm_text(F.col("text")), " ")).alias("pos", "token"),
    ).filter(F.length("token") > 0)
    marked = toks.withColumn(
        "is_stop", F.col("token").isin(*_RAKE_STOPWORDS)
    )
    wdoc = W.partitionBy("doc_id").orderBy("pos")
    islands = (
        marked.withColumn("rn", F.row_number().over(wdoc))
        .filter(~F.col("is_stop"))
        .withColumn("rn2", F.row_number().over(wdoc))
        .withColumn("island", F.col("rn") - F.col("rn2"))
    )
    phrases = islands.groupBy("doc_id", "island").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda s: s["token"],
            ),
            " ",
        ).alias("phrase"),
        F.count("*").alias("phrase_len"),
    )
    phrase_words = phrases.select(
        "phrase", "phrase_len", F.explode(F.split("phrase", " ")).alias("word")
    )
    word_stats = phrase_words.groupBy("word").agg(
        F.count("*").alias("freq"), F.sum("phrase_len").alias("deg")
    )
    scored = (
        phrase_words.join(word_stats, "word")
        .groupBy("phrase")
        .agg(F.sum(F.col("deg") / F.col("freq")).alias("raw_score"))
    )
    counts = phrases.groupBy("phrase").agg(
        F.count("*").cast("long").alias("n_occurrences")
    )
    # one phrase can occur in many docs: score counts each occurrence's
    # words, so normalize by occurrences for the per-phrase RAKE score
    out = (
        scored.join(counts, "phrase")
        .select(
            "phrase",
            "n_occurrences",
            F.round(F.col("raw_score") / F.col("n_occurrences"), 4).alias("rake_score"),
        )
    )
    w = W.orderBy(F.col("rake_score").desc(), F.col("phrase"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("rank", "phrase", "n_occurrences", "rake_score")
    )


def phrase_search(
    documents: DataFrame,
    phrases: tuple[str, ...] = ("hash join", "table scan", "batch batch batch"),
    top_k: int = 10,
) -> DataFrame:
    """Positional-inverted-index phrase search: exact consecutive-token
    phrase matching via self-joins on (doc, position) postings — the IR
    primitive BM25 bag-of-words retrieval cannot express (Manning,
    Raghavan & Schütze, IIR §2.4 "Positional postings and phrase
    queries"). For each query phrase, the top-``top_k`` documents by
    exact occurrence count, with OVERLAPPING occurrences counted the
    way a positional index does ("a a a" matches "a a" twice — a
    substring-replace count would see one).

    Plan shape: tokenize once with ``posexplode`` → postings
    (token, doc_id, pos); for an n-token phrase, the first term's
    postings are joined n−1 times on (doc_id, pos+i) with each
    successive term's postings — equi-joins Catalyst hash-partitions
    on doc_id, and because every join key includes doc_id the
    shuffle is one exchange reused across all n−1 joins. At 100 TB
    the postings relation is the only table-sized input; phrase terms
    are filtered BEFORE the join (token pushdown — only postings of
    the query's terms survive the scan), so join input is corpus
    frequency of the query terms, not the corpus.

    Determinism: counts are exact integers; ties broken by doc_id via
    the rank window. Oracle: DuckDB rebuilds the same postings with
    generate_series list indexing."""
    toks = documents.select(
        "doc_id",
        F.posexplode(F.split(_norm_text(F.col("text")), " ")).alias("pos", "token"),
    ).filter(F.length("token") > 0).localCheckpoint()
    # ^ the postings relation IS the positional index — materialized
    # once like a real IR system builds it; without the checkpoint each
    # phrase term's filter replayed the corpus tokenize (7 scans, r12
    # census). At production scale this is the persisted index table.
    out = None
    for phrase in phrases:
        terms = phrase.split(" ")
        # token pushdown: keep only postings of this phrase's terms
        p0 = (
            toks.filter(F.col("token") == terms[0])
            .select("doc_id", F.col("pos").alias("p0"))
        )
        matched = p0
        for i, t in enumerate(terms[1:], start=1):
            pi = (
                toks.filter(F.col("token") == t)
                .select(F.col("doc_id").alias("d_i"), F.col("pos").alias(f"p{i}"))
            )
            matched = matched.join(
                pi,
                (F.col("doc_id") == F.col("d_i"))
                & (F.col(f"p{i}") == F.col("p0") + i),
            ).select("doc_id", "p0")
        hits = (
            matched.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_occurrences"))
            .select(F.lit(phrase).alias("phrase"), "doc_id", "n_occurrences")
        )
        out = hits if out is None else out.unionAll(hits)
    from pyspark.sql import Window as W

    w = W.partitionBy("phrase").orderBy(
        F.col("n_occurrences").desc(), F.col("doc_id")
    )
    return (
        out.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .drop("rnk")
        .orderBy("phrase", F.col("n_occurrences").desc(), "doc_id")
    )


def quality_by_source(documents: DataFrame) -> DataFrame:
    """Source × quality-band heatmap: every doc lands in a stopword-
    density band computed in PURE INTEGERS ((10·n_stop) div n_tokens,
    0–10 — fixed arithmetic bands, never data-derived quantile edges),
    crossed with its source — the table that tells a mixture builder
    WHICH source contributes the low-quality tail it is about to
    up-sample. Per cell: doc count, token mass, and the exact
    alpha-character share in integer bps.

    One scan, one (source, band)-grain map-side-combined aggregate;
    the count expressions come from the shared ``_quality_counts``
    primitives (one home for the stopword list), at integer grain
    rather than the rounded ratios."""
    c = _quality_counts()
    graded = documents.select(
        "source",
        c["n_tokens"].alias("n_tokens_c"),
        c["n_stop"].alias("n_stop_c"),
        c["n_alpha"].alias("n_alpha_c"),
        c["n_chars"].alias("n_chars_c"),
    ).select(
        "source",
        F.expr("(10 * n_stop_c) div n_tokens_c").cast("int").alias("stop_band"),
        "n_tokens_c",
        "n_alpha_c",
        "n_chars_c",
    )
    return (
        graded.groupBy("source", "stop_band")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens_c").cast("long").alias("total_tokens"),
            F.expr("(10000 * sum(n_alpha_c)) div sum(n_chars_c)")
            .cast("long")
            .alias("alpha_bps"),
        )
        .orderBy("source", "stop_band")
    )


def quality_threshold_sweep(
    documents: DataFrame, cutoffs_bps: tuple[int, ...] = (500, 1000, 1500, 2000, 3000)
) -> DataFrame:
    """Gate-threshold ablation table: for each candidate MINIMUM
    stopword-share cutoff (too few stopwords = gibberish/OCR noise,
    the Gopher C4-style dial), how many documents and tokens survive —
    the data-volume-vs-strictness curve a pipeline owner reads before
    committing a gate threshold (the ``cosine_threshold_sweep``
    discipline applied to the quality gate instead of the dedup
    threshold).

    Determinism: the per-doc stopword share is EXACT integer basis
    points ``(10000·n_stop) div n_tokens`` compared against integer
    cutoffs — never a float ratio, so boundary docs cannot flip between
    engines; retained shares are integer bps of exact totals.

    Scale shape: ONE scan computes (stop_bps, n_tokens) per doc, a
    broadcast |cutoffs|-row grid fans each doc into its conditional
    counts, and a cutoff-grain map-side-combined aggregate emits the
    table — never one scan per cutoff. Corpus totals are recomputed
    identically inside every cutoff group (count(*)/sum over the
    fanned rows) — redundant arithmetic on a |cutoffs|-row aggregate,
    zero extra scans."""
    c = _quality_counts()
    graded = documents.select(
        (F.lit(10000) * c["n_stop"]).cast("long").alias("stop_e4"),
        c["n_tokens"].cast("long").alias("n_tokens"),
    ).select(
        F.expr("stop_e4 div n_tokens").alias("stop_bps"), "n_tokens"
    )
    grid = documents.sparkSession.createDataFrame(
        [(int(cb),) for cb in sorted(cutoffs_bps)], "cutoff_bps long"
    )
    swept = graded.crossJoin(F.broadcast(grid)).groupBy("cutoff_bps").agg(
        F.count("*").alias("total_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.when(F.col("stop_bps") >= F.col("cutoff_bps"), 1).otherwise(0))
        .alias("docs_kept"),
        F.coalesce(
            F.sum(
                F.when(F.col("stop_bps") >= F.col("cutoff_bps"), F.col("n_tokens"))
            ),
            F.lit(0),
        ).alias("tokens_kept"),
    )
    return swept.select(
        "cutoff_bps",
        F.col("docs_kept").cast("long").alias("docs_kept"),
        F.expr("(10000 * docs_kept) div total_docs").alias("docs_share_bps"),
        F.col("tokens_kept").cast("long").alias("tokens_kept"),
        F.expr("(10000 * tokens_kept) div total_tokens").alias("tokens_share_bps"),
    ).orderBy("cutoff_bps")


def source_js_divergence(documents: DataFrame) -> DataFrame:
    """Pairwise Jensen–Shannon divergence between the sources' unigram
    token distributions (Lin 1991, "Divergence measures based on the
    Shannon entropy" — public): the symmetric, bounded [0, ln 2]
    vocabulary-drift score a mixture owner reads next to
    ``cross_source_contamination`` — contamination finds SHARED
    documents, JS finds shared (or divergent) LANGUAGE even with zero
    overlapping docs.

    Decomposition that avoids a full-outer token join: over tokens
    PRESENT IN BOTH sources the contribution is
    0.5·(pₐ·ln(2pₐ/(pₐ+p_b)) + p_b·ln(2p_b/(pₐ+p_b))); tokens unique
    to one side contribute 0.5·p·ln 2, and their total mass is
    recoverable from the shared join itself (1 − Σ_shared p), so ONE
    inner token-grain self-join per source pair suffices.

    Determinism (the psi_drift/logprob discipline): token counts and
    totals are exact integers; each shared-token term is one identical
    IEEE tree over exact-rational doubles, QUANTIZED to 12dp DECIMAL
    before the order-invariant sum; the unique-mass terms use a
    LITERAL ln 2 (never libm log(2)); the final score rounds at 6dp —
    log-derived, off every rational grid.

    Scale shape: one tokenize+count scan (source × token grain,
    map-side combined), a token-keyed self-join with src_a < src_b
    (|pairs| bounded by |sources|²), a pair-grain DECIMAL sum. The
    count table is checkpointed once for its three consumers."""
    LN2 = 0.6931471805599453
    toks = documents.select(
        "source",
        F.explode(F.split(_norm_text(F.col("text")), " ")).alias("token"),
    ).filter(F.length("token") > 0)
    counts = (
        toks.groupBy("source", "token")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    totals = counts.groupBy("source").agg(F.sum("c").alias("n"))
    ca = counts.select(
        F.col("source").alias("src_a"), "token", F.col("c").alias("c_a")
    )
    cb = counts.select(
        F.col("source").alias("src_b"), "token", F.col("c").alias("c_b")
    )
    na = totals.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    nb = totals.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    shared = (
        ca.join(cb, "token")
        .filter(F.col("src_a") < F.col("src_b"))
        .join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
    )
    pa = F.col("c_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("c_b").cast("double") / F.col("n_b").cast("double")
    term = 0.5 * (
        pa * F.log(2.0 * pa / (pa + pb)) + pb * F.log(2.0 * pb / (pa + pb))
    )
    shared_agg = shared.groupBy("src_a", "src_b").agg(
        F.sum(F.round(term, 12).cast("decimal(28,12)")).alias("shared_sum"),
        F.sum("c_a").alias("shared_ca"),
        F.sum("c_b").alias("shared_cb"),
        F.count("*").cast("long").alias("n_shared_tokens"),
    )
    # the pair UNIVERSE comes from the source list, not the shared
    # join: fully-DISJOINT pairs share no token row and would silently
    # vanish — exactly the maximal-divergence pairs the report exists
    # to surface (JS = ln 2)
    universe = (
        na.crossJoin(nb)
        .filter(F.col("src_a") < F.col("src_b"))
    )
    per_pair = universe.join(shared_agg, ["src_a", "src_b"], "left").select(
        "src_a",
        "src_b",
        F.coalesce("shared_sum", F.lit(0).cast("decimal(28,12)")).alias(
            "shared_sum"
        ),
        F.coalesce("shared_ca", F.lit(0)).alias("shared_ca"),
        F.coalesce("shared_cb", F.lit(0)).alias("shared_cb"),
        F.coalesce("n_shared_tokens", F.lit(0)).cast("long").alias(
            "n_shared_tokens"
        ),
        "n_a",
        "n_b",
    )
    uniq_a = (
        F.col("n_a") - F.col("shared_ca")
    ).cast("double") / F.col("n_a").cast("double")
    uniq_b = (
        F.col("n_b") - F.col("shared_cb")
    ).cast("double") / F.col("n_b").cast("double")
    js = (
        F.col("shared_sum").cast("double")
        + 0.5 * uniq_a * F.lit(LN2)
        + 0.5 * uniq_b * F.lit(LN2)
    )
    return per_pair.select(
        "src_a",
        "src_b",
        "n_shared_tokens",
        (F.round(js, 6) + F.lit(0.0)).alias("js_nats"),
        (F.round(js / F.lit(LN2), 6) + F.lit(0.0)).alias("js_normalized"),
    ).orderBy("src_a", "src_b")


def heaps_vocabulary_curve(
    documents: DataFrame, checkpoints: tuple[int, ...] = (50, 100, 200, 350, 500)
) -> DataFrame:
    """Heaps'-law vocabulary growth curve (Heaps 1978; Herdan — public):
    distinct-token count after the first N documents, for a grid of N —
    the table that prices tokenizer-vocabulary and dedup-memory
    budgets ("how fast does OUR corpus mint new types?"), with the
    empirical local exponent β between consecutive checkpoints
    (V ∝ n^β, β ≈ 0.4-0.6 for natural text; β → 1 flags boilerplate
    IDs or noise minting unbounded types).

    The one-scan trick: V(N) = |{tokens whose FIRST document id < N}|,
    so ONE token-grain min(doc_id) aggregate answers every checkpoint —
    never a scan per N (the quality_threshold_sweep grid discipline).
    Exact: counts are integers; token mass at N comes from a doc-grain
    conditional sum; β = ln(V₂/V₁)/ln(n₂/n₁) is a log-ratio double
    over exact integers (identical tree both engines, 6dp — the
    log-derived safety rule).

    Scale shape: one tokenize scan → token-grain min() (map-side
    combined) + a doc-grain token count, each crossed with the
    broadcast checkpoint grid; β via a 1-step lag window over the
    |checkpoints|-row result."""
    from pyspark.sql import Window as W

    first_seen = (
        documents.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(_norm_text(F.col("text")), " "))
            ).alias("token"),
        )
        .groupBy("token")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    doc_tokens = documents.select(
        "doc_id", F.size(F.split(_norm_text(F.col("text")), " ")).alias("n_tok")
    )
    grid = documents.sparkSession.createDataFrame(
        [(int(n),) for n in sorted(checkpoints)], "n_docs long"
    )
    vocab = (
        first_seen.crossJoin(F.broadcast(grid))
        .groupBy("n_docs")
        .agg(
            F.sum(
                F.when(F.col("first_doc") < F.col("n_docs"), 1).otherwise(0)
            ).alias("vocab_size")
        )
    )
    mass = (
        doc_tokens.crossJoin(F.broadcast(grid))
        .groupBy("n_docs")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("doc_id") < F.col("n_docs"), F.col("n_tok"))),
                F.lit(0),
            ).alias("token_mass")
        )
    )
    curve = vocab.join(mass, "n_docs")
    w = W.orderBy("n_docs")
    prev_v = F.lag("vocab_size").over(w)
    prev_m = F.lag("token_mass").over(w)
    beta = F.log(
        F.col("vocab_size").cast("double") / prev_v.cast("double")
    ) / F.log(F.col("token_mass").cast("double") / prev_m.cast("double"))
    return curve.select(
        "n_docs",
        F.col("vocab_size").cast("long").alias("vocab_size"),
        F.col("token_mass").cast("long").alias("token_mass"),
        F.when(
            prev_v.isNotNull() & (prev_v > 0) & (prev_m > 0)
            & (F.col("token_mass") > prev_m),
            F.round(beta, 6) + F.lit(0.0),
        ).alias("local_beta"),
    ).orderBy("n_docs")


def simpson_diversity(documents: DataFrame) -> DataFrame:
    """Per-source lexical diversity via the Simpson index (Simpson
    1949 — public): λ = Σ nᵢ(nᵢ−1) / (N(N−1)), the probability two
    tokens drawn without replacement are the same type, and its
    Gini–Simpson complement 1−λ — the concentration companion to the
    Heaps vocabulary curve: a source whose λ spikes is template spam
    (few types dominate) long before its vocabulary growth flattens.

    Determinism: per-(source, type) counts are exact integers; the
    numerator Σ nᵢ(nᵢ−1) and denominator N(N−1) are exact BIGINT
    aggregates, published as ONE double division each (unrounded
    exact-integer ratios are hash-safe; rounding them would sit on
    representable halves). Scale shape: explode to token grain, ONE
    (source, token) aggregate (map-side combined), then a bounded
    source-grain re-aggregate — never a scan per source."""
    toks = documents.select(
        "source",
        F.explode(F.split(_norm_text(F.col("text")), " ")).alias("token"),
    )
    per_type = toks.groupBy("source", "token").agg(F.count("*").alias("n_i"))
    return (
        per_type.groupBy("source")
        .agg(
            F.sum("n_i").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.col("n_i") * (F.col("n_i") - 1)).alias("num"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            (
                F.col("num").cast("double")
                / (F.col("n_tokens") * (F.col("n_tokens") - 1)).cast("double")
            ).alias("simpson_lambda"),
            (
                F.lit(1.0)
                - F.col("num").cast("double")
                / (F.col("n_tokens") * (F.col("n_tokens") - 1)).cast("double")
            ).alias("gini_simpson"),
        )
        .orderBy("source")
    )


def ngram_novelty(documents: DataFrame, n: int = 3, max_doc_id: int = 200) -> DataFrame:
    """Per-document n-gram NOVELTY in corpus order: the fraction of a
    document's distinct word n-grams whose FIRST corpus occurrence
    (min doc_id over the whole corpus) is this document — the
    curation signal behind novelty-ordered training curricula and
    crawl-dedup monitoring (a batch whose novelty collapses is
    re-crawling what the corpus already holds). Reported for the
    bounded doc_id < ``max_doc_id`` panel; the first-occurrence
    aggregate runs over ALL documents.

    Scale shape: the Heaps-curve discipline — ONE gram-grain
    min(doc_id) aggregate (grams hashed to fixed-width xxhash64 before
    the shuffle, the duplicate_ngram_profile trick), joined back to
    the bounded panel's gram rows. Exact integers + basis points."""
    toked = documents.select(
        "doc_id", F.split(_norm_text(F.col("text")), " ").alias("toks")
    )
    t = F.col("toks")
    gram_expr = F.explode(
        F.array_distinct(
            F.when(
                F.size(t) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1))),
                    lambda i: F.xxhash64(F.concat_ws(" ", F.slice(t, i, n))),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        )
    ).alias("gram_h")
    grams = toked.select("doc_id", gram_expr)
    first_occ = grams.groupBy("gram_h").agg(F.min("doc_id").alias("first_doc"))
    panel = grams.filter(F.col("doc_id") < max_doc_id)
    return (
        panel.join(first_occ, "gram_h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr("(10000 * n_novel) div n_grams").cast("long").alias(
                "novelty_bps"
            ),
        )
        .orderBy("doc_id")
    )


#: The interpolated Kneser-Ney probability as ONE SQL expression shared
#: verbatim with the DuckDB oracle (the _WILSON_SQL pattern — identical
#: op order on both engines; formula correctness carried by the
#: independent pure-python test, per the r17 shared-text audit
#: protocol). Column contract: c_bi = bigram count, cstart = bigram
#: tokens starting with w1, n1p_fw = distinct continuations of w1,
#: n1p_bw = distinct histories of w2, t = distinct bigram types.
#: Discount d = 0.75 (Chen & Goodman 1998's fixed-discount baseline) —
#: exactly representable in binary, so (c - 0.75) is exact.
_KN_P_SQL = (
    "greatest(CAST(c_bi AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))"
    " / CAST(cstart AS DOUBLE)"
    " + (CAST(0.75 AS DOUBLE) * CAST(n1p_fw AS DOUBLE) / CAST(cstart AS DOUBLE))"
    " * (CAST(n1p_bw AS DOUBLE) / CAST(t AS DOUBLE))"
)


def good_turing_counts(documents: DataFrame) -> DataFrame:
    """Good–Turing frequency-of-frequencies table (Good 1953,
    "The population frequencies of species and the estimation of
    population parameters", Biometrika — public): the classic smoother
    beside Kneser–Ney's absolute discounting
    (:func:`kn_bigram_logprob`). One row per observed unigram count r:
    N_r (how many vocabulary types occur exactly r times), N_{r+1},
    the GT-adjusted count r* = (r+1)·N_{r+1}/N_r, and the share of
    corpus mass sitting at r. The r = 1 row's mass share IS the
    Good–Turing missing-mass estimate P₀ = N₁/N — the probability the
    next token is unseen, the number a vocabulary-coverage decision
    reads first.

    Determinism: token and type counts are exact integers end-to-end;
    r* and mass_share are one division each (6dp) — no sums of floats
    anywhere. r* is NULL where N_{r+1} = 0 (the raw GT estimate is
    undefined there; the literature switches to a fitted tail —
    Gale/Sampson simple GT — which would need a regression, so the
    published table keeps the exact part and leaves the tail NULL).

    Scale shape: token stream → vocab-grain counts (map-side combined)
    → count-of-counts grain (≤ max r rows, tiny); the corpus is
    scanned once."""
    toks = documents.select(
        F.explode(F.split(_norm_text(F.col("text")), " ")).alias("w")
    ).filter(F.length("w") > 0)
    vocab = toks.groupBy("w").agg(F.count("*").alias("r"))
    nr = vocab.groupBy("r").agg(F.count("*").cast("long").alias("n_r"))
    total = toks.agg(F.count("*").cast("long").alias("n_total"))
    nr1 = nr.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_plus1"))
    return (
        nr.join(nr1, "r", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("r").cast("long").alias("r"),
            "n_r",
            F.coalesce("n_r_plus1", F.lit(0)).cast("long").alias("n_r_plus1"),
            F.when(
                F.col("n_r_plus1").isNotNull(),
                F.round(
                    (F.col("r") + 1) * F.col("n_r_plus1") / F.col("n_r"), 6
                ),
            ).alias("r_star"),
            F.round((F.col("r") * F.col("n_r")) / F.col("n_total"), 6).alias(
                "mass_share"
            ),
        )
        .orderBy("r")
    )


def kn_bigram_logprob(documents: DataFrame) -> DataFrame:
    """Per-document INTERPOLATED KNESER-NEY bigram LM score (Kneser &
    Ney 1995; the fixed-discount formulation of Chen & Goodman 1998,
    "An empirical study of smoothing techniques for language modeling"
    — public; THE standard n-gram smoother, what KenLM implements) —
    the top rung of the repo's count-based quality ladder above
    ``unigram_logprob`` (no context) and ``bigram_logprob`` (Laplace):

        P_KN(w2|w1) = max(c(w1 w2) − d, 0) / c(w1 ·)
                      + (d · N1+(w1 ·) / c(w1 ·)) · N1+(· w2) / T

    with d = 0.75, c(w1 ·) = bigram tokens starting with w1, N1+ the
    distinct-continuation / distinct-history counts and T the distinct
    bigram types. The continuation term is what Laplace lacks: a token
    that appears often but only ever in ONE context ("Francisco")
    scores LOW as a novel continuation — the signal that separates
    formulaic/boilerplate text from genuinely fluent text at equal
    unigram frequency.

    Determinism: every input to the probability is an exact integer
    count; the probability itself is ONE shared expression
    (:data:`_KN_P_SQL`) evaluated in the same op order by both engines
    (d exactly representable, divisions/multiply/add correctly
    rounded); mean/min publish at 6dp like ``bigram_logprob`` (the
    established avg-absorption discipline). Docs with < 2 tokens emit
    n_bigrams = 0 with NULL scores (the bigram_logprob contract).

    Scale shape: the token stream materializes ONCE (localCheckpoint)
    and feeds the bigram window; all model tables are vocab-grain
    groupBys (map-side combined): bi_freq (bigram types), ctx (w1
    grain: Σc + distinct-continuation count in one pass), cont (w2
    grain), T (1-row broadcast). The rescoring join carries no
    broadcast hint — a web-scale bigram table is not broadcastable;
    AQE broadcasts at bench SF (the unigram_logprob argument)."""
    from pyspark.sql import Window as W

    toks = documents.select(
        "doc_id",
        F.posexplode(F.split(_norm_text(F.col("text")), " ")).alias("pos", "w1"),
    ).localCheckpoint()
    w = W.partitionBy("doc_id").orderBy("pos")
    big = toks.select(
        "doc_id", "w1", F.lead("w1").over(w).alias("w2")
    ).filter(F.col("w2").isNotNull()).localCheckpoint()
    bi_freq = big.groupBy("w1", "w2").agg(F.count("*").alias("c_bi")).localCheckpoint()
    # w1 grain: c(w1 ·) = sum of its bigram counts; N1+(w1 ·) = its
    # distinct continuations = its row count in the TYPE table
    ctx = bi_freq.groupBy("w1").agg(
        F.sum("c_bi").cast("long").alias("cstart"),
        F.count("*").cast("long").alias("n1p_fw"),
    )
    cont = bi_freq.groupBy("w2").agg(F.count("*").cast("long").alias("n1p_bw"))
    types = bi_freq.agg(F.count("*").cast("long").alias("t"))
    scored = (
        big.join(bi_freq, ["w1", "w2"])
        .join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .select("doc_id", F.expr(f"log10({_KN_P_SQL})").alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("mean_log10_p"),
            F.round(F.min("lp"), 6).alias("min_log10_p"),
        )
    )
    return (
        documents.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            "mean_log10_p",
            "min_log10_p",
        )
    )
