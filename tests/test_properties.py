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
