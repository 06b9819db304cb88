"""Property-based checks (hypothesis) for the pure compat functions and
the ingestion round-trip — the reference has no tests (SURVEY §5), so the
inference/sanitization semantics are pinned by properties instead of
golden files alone."""

from hypothesis import given, settings
from hypothesis import strategies as st

from datalake_local_spark.functions.sanitize import (
    NULLISH,
    fix_string,
    identify_string_type,
    infer_column_types,
    sanitize_db_name,
)

ident_ok = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x2FF),
    min_size=0,
    max_size=80,
)


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_fix_string_idempotent_and_safe(s):
    out = fix_string(s)
    assert fix_string(out) == out  # idempotent
    assert out  # never empty
    assert all(c.isascii() and (c.isalnum() or c == "_") for c in out)


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_sanitize_db_name_bounded_ascii(s):
    out = sanitize_db_name(s)
    assert len(out) <= 63
    assert all(c.isascii() and (c.isalnum() or c == "_") for c in out)
    assert sanitize_db_name(out) == out


@given(st.integers(min_value=-(10**17), max_value=10**17))
@settings(max_examples=100, deadline=None)
def test_integers_classify_bigint(n):
    assert identify_string_type(str(n)) == "bigint"


@given(
    st.datetimes(
        min_value=__import__("datetime").datetime(1900, 1, 1),
        max_value=__import__("datetime").datetime(2100, 1, 1),
    )
)
@settings(max_examples=100, deadline=None)
def test_datetimes_classify_timestamp_or_date(dt):
    s = dt.strftime("%Y-%m-%d %H:%M:%S")
    assert identify_string_type(s) == "timestamp"
    assert identify_string_type(dt.strftime("%Y-%m-%d")) == "date"


@given(
    st.lists(
        st.lists(
            st.one_of(
                st.sampled_from(sorted(NULLISH)),
                st.integers(-1000, 1000).map(str),
                st.text(alphabet="abc xyz", min_size=1, max_size=10),
            ),
            min_size=2,
            max_size=2,
        ),
        min_size=0,
        max_size=10,
    )
)
@settings(max_examples=100, deadline=None)
def test_inference_follows_first_non_null(rows):
    schema = infer_column_types(rows, ["c0", "c1"])
    for j, field in enumerate(schema.fields):
        first = next((r[j] for r in rows if r[j] not in NULLISH), None)
        if first is None:
            assert field.dataType.typeName() == "string"
        else:
            expected = {"bigint": "long", "varchar": "string", "date": "date",
                        "timestamp": "timestamp"}[identify_string_type(first)]
            assert field.dataType.typeName() == expected


@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_mixture_threshold_hex_monotone_and_bounded(rate):
    """Hex keep-thresholds must be 8 lowercase hex chars (or empty for
    rate 0) and monotone in the rate — the lexicographic-compare
    contract both the Spark expression and the DuckDB oracle rely on."""
    from datalake_local_spark.llm.pipeline import mixture_threshold_hex

    t = mixture_threshold_hex(rate)
    if rate == 0.0:
        assert t == ""
    else:
        assert len(t) == 8 and t == t.lower() and int(t, 16) < (1 << 32)
    # monotone: a higher rate never sorts below a lower one
    for other in (rate / 2, rate):
        assert mixture_threshold_hex(other) <= t


@given(
    st.lists(
        st.tuples(st.text(st.characters(min_codepoint=97, max_codepoint=122),
                          min_size=1, max_size=8),
                  st.floats(min_value=0.0, max_value=1.0, allow_nan=False)),
        min_size=1, max_size=6, unique_by=lambda kv: kv[0],
    )
)
@settings(max_examples=100, deadline=None)
def test_split_boundaries_partition_hex_space(fracs):
    """split_assign_expr's cumulative boundaries must be non-decreasing
    8-hex-char strings within the 32-bit grid regardless of the
    fraction dict (clamped at the top) — every md5 prefix lands in
    exactly one interval, so assignment is total and unambiguous."""
    fractions = dict(fracs)
    bounds = []
    cum = 0.0
    for name in list(fractions)[:-1]:
        cum += fractions[name]
        bounds.append(format(min(int(cum * (1 << 32)), (1 << 32) - 1), "08x"))
    assert all(len(b) == 8 for b in bounds)
    assert bounds == sorted(bounds)  # lexicographic == numeric on the grid


# ---------------------------------------------------------------------------
# round-12 property tests
# ---------------------------------------------------------------------------


def test_ivm_delta_merge_equals_recompute_property(spark):
    """Property: for randomized delete/update/insert feeds over a small
    base table, the incrementally-maintained internal rollup equals a
    from-scratch recompute of the post-change state — every column,
    every seed (the Gupta-Mumick correctness property beyond the one
    deterministic harness derivation)."""
    import datetime
    import random

    from datalake_local_spark.operators import ivm

    for seed in (7, 41, 1999):
        rng = random.Random(seed)
        base_rows = [
            (
                datetime.date(2024, rng.randint(1, 4), 1),
                rng.choice(["O", "F"]),
                round(rng.uniform(1, 500), 2),
            )
            for _ in range(60)
        ]
        schema = "o_orderdate date, o_orderstatus string, o_totalprice double"
        base = spark.createDataFrame(base_rows, schema)
        # partition by INDEX, not value membership: duplicate random
        # rows would otherwise vanish from survivors while the delete
        # feed carries only the sampled copy (multiset semantics)
        del_idx = {i for i in range(len(base_rows)) if rng.random() < 0.3}
        deleted = [base_rows[i] for i in sorted(del_idx)]
        surv_idx = [i for i in range(len(base_rows)) if i not in del_idx]
        upd_idx = {i for i in surv_idx if rng.random() < 0.3}
        upd_pre = [base_rows[i] for i in sorted(upd_idx)]
        upd_post = [(d, s, round(p + 10.0, 2)) for d, s, p in upd_pre]
        inserts = [
            (datetime.date(2024, rng.randint(1, 5), 1), "P",
             round(rng.uniform(1, 500), 2))
            for _ in range(8)
        ]
        new_rows = (
            [base_rows[i] for i in surv_idx if i not in upd_idx]
            + upd_post
            + inserts
        )
        old_internal = ivm.monthly_rollup_internal(base)
        merged = ivm.rollup_delta_merge(
            old_internal,
            spark.createDataFrame(upd_post + inserts, schema),
            spark.createDataFrame(deleted + upd_pre, schema),
            spark.createDataFrame(new_rows, schema),
        )
        got = {
            (r["order_month"], r["orderstatus"]): (
                r["n_orders"], r["sum_cents"], r["min_price"], r["max_price"])
            for r in merged.collect()
        }
        want = {
            (r["order_month"], r["orderstatus"]): (
                r["n_orders"], r["sum_cents"], r["min_price"], r["max_price"])
            for r in ivm.monthly_rollup_internal(
                spark.createDataFrame(new_rows, schema)
            ).collect()
        }
        assert got == want, f"seed {seed}: merged != recomputed"


def test_jaccard_prefix_lossless_for_odd_thresholds(spark):
    """Property (the r11 ADVICE boundary class): at thresholds whose
    float products round badly (0.7, 0.6, 0.75), the prefix-filtered
    join returns EXACTLY the all-pairs verifier's result — boundary
    pairs with J == t included."""
    import random

    from datalake_local_spark.llm import dedup
    from pyspark.sql import functions as F

    rng = random.Random(13)
    vocab = [f"tok{i}" for i in range(40)]
    docs = []
    for i in range(30):
        body = rng.sample(vocab, rng.randint(8, 20))
        docs.append((i, " ".join(body)))
    # plant exact-boundary pairs: J(100,101) = 1.0 and
    # J(100,102) = 7/10 = 0.7 EXACTLY — the J == t inclusion case at
    # the 0.7 threshold that float-ceil prefix bounds used to drop
    docs.append((100, " ".join(vocab[:10])))
    docs.append((101, " ".join(vocab[:10])))
    docs.append((102, " ".join(vocab[:7])))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in (0.6, 0.7, 0.75):
        fast = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in dedup.jaccard_prefix_filter_pairs(df, 1000, t).collect()
        }
        slow = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in dedup.ngram_token_jaccard_pairs(df, 1000, t).collect()
        }
        assert fast == slow, f"threshold {t}: prefix filter lost pairs"
        if t == 0.7:
            assert any(a == 100 and b == 102 for a, b, _ in fast), (
                "planted J == t boundary pair missing at t = 0.7")
