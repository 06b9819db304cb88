"""Invariant tests for the LLM-pipeline operators: recall of the LSH paths
against their exact counterparts, fingerprint determinism, plumbing shapes."""

from pyspark.sql import functions as F

from datalake_local_spark.llm import dedup, multimodal, similarity, text


def test_exact_dedup_covers_all_docs(tables):
    out = dedup.exact_dedup(tables["documents"])
    assert out.agg(F.sum("n_copies")).collect()[0][0] == tables["documents"].count()


def _exact_shingle_jaccard_pairs(documents, max_doc_id=100):
    """Brute-force exact shingle-Jaccard over a bounded window (test
    oracle for the LSH path — all-pairs is fine on 100 docs)."""
    sh = documents.filter(F.col("doc_id") < max_doc_id).select(
        "doc_id", dedup._shingles(F.col("text")).alias("sh")
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect("a.sh", "b.sh"))
    union = F.size("a.sh") + F.size("b.sh") - inter
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(inter / union, 6).alias("jaccard"),
        )
    )


def test_minhash_lsh_candidates_precise_and_high_recall(tables):
    """LSH output must be exact-verified (every reported jaccard equals the
    brute-force shingle jaccard) and must catch every near-identical pair
    (j ≥ 0.9) in the probe window — deterministic seeds make both hard
    assertions on this dataset."""
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _exact_shingle_jaccard_pairs(tables["documents"]).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_candidates(tables["documents"], jaccard_threshold=0.5)
        .filter((F.col("doc_a") < 100) & (F.col("doc_b") < 100))
        .collect()
    }
    for pair, j in lsh.items():
        assert exact[pair] == j and j >= 0.5  # precision: verified values
    near_identical = {p for p, j in exact.items() if j >= 0.9}
    assert near_identical <= set(lsh)  # recall at high similarity


def test_simhash_deterministic(tables):
    a = {(r["doc_id"], r["simhash"]) for r in dedup.simhash_fingerprints(tables["documents"].limit(50)).collect()}
    b = {(r["doc_id"], r["simhash"]) for r in dedup.simhash_fingerprints(tables["documents"].limit(50)).collect()}
    assert a == b


def test_lsh_topk_subset_of_bruteforce_universe(tables):
    """LSH results must be genuine cosine scores: every (query, corpus,
    cosine) LSH returns must appear with the same score in the exhaustive
    scoring (recall may be <1; precision of scores must be exact)."""
    brute = similarity.cosine_topk_bruteforce(tables["embeddings"], k=10**9)
    brute_scores = {
        (r["query_id"], r["corpus_id"]): r["cosine"] for r in brute.collect()
    }
    for r in similarity.cosine_topk_lsh(tables["embeddings"], k=5).collect():
        assert brute_scores[(r["query_id"], r["corpus_id"])] == r["cosine"]


def test_vectorized_cosine_equals_sql_fold(tables):
    a = sorted(tuple(r) for r in similarity.cosine_topk_bruteforce(tables["embeddings"]).collect())
    b = sorted(tuple(r) for r in similarity.cosine_topk_vectorized(tables["embeddings"]).collect())
    assert a == b


def test_multiprobe_recall_at_least_single_probe(tables):
    """Multi-probe must (a) return only exact scores and (b) recall at
    least as many true top-5 neighbors as single-probe, per query."""
    brute = similarity.cosine_topk_bruteforce(tables["embeddings"], k=5)
    truth: dict = {}
    for r in brute.collect():
        truth.setdefault(r["query_id"], set()).add(r["corpus_id"])

    def recall(df):
        got: dict = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["corpus_id"])
        return {q: len(truth[q] & got.get(q, set())) for q in truth}

    single = recall(similarity.cosine_topk_lsh(tables["embeddings"], k=5))
    multi = recall(similarity.cosine_topk_lsh_multiprobe(tables["embeddings"], k=5))
    for q in truth:
        assert multi[q] >= single[q]


def test_centroid_output_shape(tables):
    rows = similarity.embedding_centroids_by_label(tables["embeddings"]).collect()
    assert all(r["dim"] == 64 for r in rows)
    assert sum(r["n_vectors"] for r in rows) == tables["embeddings"].count()


def test_quality_ratios_bounded(tables):
    rows = text.quality_scores(tables["documents"]).collect()
    for r in rows:
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0.0 <= r["alpha_ratio"] <= 1.0


def test_fingerprint_is_content_hash(tables, spark):
    out1 = {r["doc_id"]: r["fingerprint"] for r in text.fingerprints(tables["documents"]).collect()}
    # same text → same fingerprint regardless of doc identity
    dup = spark.createDataFrame(
        [(999999, "Hello  World "), (999998, "hello world")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in text.fingerprints(dup).collect()}
    assert fps[999999] == fps[999998]
    assert len(out1) == tables["documents"].count()


def test_multimodal_decode_matches_payload_len(tables):
    decoded = multimodal.decode_image_metadata(tables["documents"].limit(20)).collect()
    texts = {r["doc_id"]: r["text"] for r in tables["documents"].limit(20).collect()}
    for r in decoded:
        blen = len(texts[r["doc_id"]].encode("utf-8"))
        assert r["byte_len"] == blen
        assert r["width"] == blen % 640 + 16
        assert r["channels"] in (1, 2, 3)


def test_multimodal_real_decoder_is_gated(tables):
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.decode_image_real(tables["documents"])
