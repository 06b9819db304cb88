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
