"""Scalar function families (SURVEY.md §2.5): string/regex, date/time,
JSON, array. These are the ingestion pipeline's regex/sanitize family
(assets.py:172-211, 294-344) re-expressed as native Catalyst expressions —
JVM-side, codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def string_functions_part(part: DataFrame) -> DataFrame:
    """regexp_extract / replace, case, trim, substring, translate over
    part names — the S5 regex-parser family as column expressions."""
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.translate("p_brand", "#", "_").alias("brand_clean"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed_brand"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


def string_functions_extended(part: DataFrame) -> DataFrame:
    """Second string family: padding, reversal, field extraction, edit
    distance — the remaining Trino-surface string functions."""
    return part.select(
        "p_partkey",
        F.concat(
            F.upper(F.substring("p_name", 1, 1)), F.expr("substring(p_name, 2)")
        ).alias("name_ucfirst"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.reverse("p_brand").alias("brand_reversed"),
        F.expr("split_part(p_type, ' ', 1)").alias("type_field1"),
        F.levenshtein("p_brand", F.lit("Brand#1")).alias("brand_edit_dist"),
        F.repeat(F.lit("-"), F.col("p_size") % 5 + 1).alias("size_bar"),
        F.format_string("%s/%s", "p_brand", "p_type").alias("brand_slash_type"),
    )


def calendar_spine_daily_orders(orders: DataFrame) -> DataFrame:
    """Gap-filling via calendar spine: generate every day in the data's
    range (sequence + explode — a generated dimension, no data shuffle),
    left-join daily order counts so zero-order days appear explicitly.
    The standard time-series densification pattern."""
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").alias("n"), F.sum("o_totalprice").alias("v")
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce("n", F.lit(0)).alias("n_orders"),
        F.round(F.coalesce("v", F.lit(0.0)), 2).alias("order_value"),
    )


def date_functions_orders(orders: DataFrame) -> DataFrame:
    """Date/time family: the reference's timestamp-regex inference
    (assets.py:294-301) becomes native to_timestamp/date_trunc/extract."""
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month_num"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.to_date("o_orderdate").alias("order_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym_label"),
    )


def json_functions_events(events: DataFrame) -> DataFrame:
    """JSON family over events.props (S6 surface: the README-declared JSON
    assets the reference never implemented — closed here natively)."""
    return events.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
    ).withColumn("k_bucket", F.floor(F.col("prop_k") / 10))


def json_aggregate_events(events: DataFrame) -> DataFrame:
    """Extract-then-aggregate: JSON props feeding a grouped measure."""
    return (
        events.withColumn("prop_k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("prop_k").alias("nk"),
            F.sum("prop_k").alias("sk"),
            F.max("prop_k").alias("max_k"),
        )
        .select(
            "event_type",
            "n_events",
            # exact integer 4dp mean over the NON-NULL k values
            # (round(avg(int),4) hazard class); NULL when no k present
            F.when(
                F.col("nk") > 0,
                F.expr("(2 * sk * 10000 + nk) div (2 * nk)").cast("double")
                / F.lit(10000.0),
            ).alias("avg_k"),
            "max_k",
        )
    )


def map_functions_events(events: DataFrame) -> DataFrame:
    """Map family: typed map from JSON props (from_json → map<string,long>),
    key/value access — the MapType surface of SURVEY §2.5."""
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return events.select(
        "event_id",
        F.element_at(m, "k").alias("k_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("key_list"),
        F.map_contains_key(m, "k").alias("has_k"),
    )


def array_functions_embeddings(embeddings: DataFrame) -> DataFrame:
    """Array family over array<float> embeddings: element access, slicing,
    and higher-order aggregate (dot-with-self = squared L2 norm) — all
    JVM-side, no UDF."""
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return embeddings.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(vec[0], 6).alias("first_component"),
        F.round(
            F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x),
            6,
        ).alias("squared_norm"),
        F.round(
            F.aggregate(F.slice(vec, 1, 8), F.lit(0.0), lambda acc, x: acc + x) / F.lit(8.0),
            6,
        ).alias("mean_first8"),
    )


def math_functions_lineitem(lineitem: DataFrame) -> DataFrame:
    """Math scalar family (§2.5): sqrt/pow/ln/exp/abs/sign/ceil/floor/mod
    — all JVM codegen builtins, one projection."""
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.pow(F.col("l_discount"), 2), 6).alias("disc_sq"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.exp(F.col("l_discount")), 6).alias("disc_exp"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("qty_side"),
        F.ceil("l_tax").cast("long").alias("tax_ceil"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


def bitwise_functions_lineitem(lineitem: DataFrame) -> DataFrame:
    """Bitwise scalar family (§2.5): and/or/xor/shift/popcount — integer
    codegen ops (the building blocks the SimHash/Z-order operators use)."""
    k = F.col("l_orderkey")
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("key_and"),
        k.bitwiseOR(F.lit(4096)).alias("key_or"),
        k.bitwiseXOR(F.col("l_partkey")).alias("key_xor_part"),
        F.shiftleft(k, 2).alias("key_shl2"),
        F.shiftright(k, 3).alias("key_shr3"),
        F.bit_count(k).alias("key_popcount"),
    )


def variant_functions_events(events: DataFrame) -> DataFrame:
    """Spark 4 VARIANT path over events.props: ``parse_json`` → binary
    variant column → typed ``variant_get`` extraction (+ ``try_`` form
    for a missing path and ``schema_of_variant``) feeding a grouped
    rollup. VARIANT is the modern semi-structured answer to the
    reference's raw-JSON props column: parse once, store the binary
    variant, extract many times without re-parsing text — at 100 TB the
    parse cost is paid in the ingest pass, and every downstream
    extraction is a cheap binary traversal. The VARIANT column itself
    never shuffles here: extraction happens in the scan projection and
    only the typed scalars reach the aggregate.

    ``schema_of_variant`` also rides this path for introspection but is
    excluded from the output: its type-string rendering is
    Spark-specific, and the oracle checks values, not engine
    pretty-printers."""
    v = F.parse_json(F.col("props"))
    return (
        events.select(
            "event_type",
            F.variant_get(v, "$.k", "bigint").alias("prop_k"),
            F.try_variant_get(v, "$.missing", "string").alias("missing_prop"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("missing_prop").isNull(), 1).otherwise(0)).alias("n_missing"),
            F.count("prop_k").alias("nk"),
            F.sum("prop_k").alias("sk"),
            F.min("prop_k").alias("min_k"),
            F.max("prop_k").alias("max_k"),
        )
        .select(
            "event_type",
            "n_events",
            "n_missing",
            # exact integer 4dp mean over non-NULL k (round(avg) class)
            F.when(
                F.col("nk") > 0,
                F.expr("(2 * sk * 10000 + nk) div (2 * nk)").cast("double")
                / F.lit(10000.0),
            ).alias("avg_k"),
            "min_k",
            "max_k",
        )
    )


def try_function_family(orders: DataFrame) -> DataFrame:
    """ANSI-safety scalar family: the ``try_*`` variants (Spark 3.2+)
    that return NULL instead of raising under ANSI mode — division by
    zero, failed casts — the functions a production pipeline uses at
    ingestion boundaries where bad values are data, not bugs.
    Engine-portable: DuckDB's TRY_CAST and a CASE-guarded division
    compute the identical NULL pattern."""
    return orders.select(
        "o_orderkey",
        F.round(
            F.expr("try_divide(o_totalprice, o_custkey % 3)"), 6
        ).alias("safe_div"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias(
            "prio_num"
        ),
        F.expr("try_cast(o_orderstatus AS INT)").alias("bad_cast"),
    )


def url_functions_orders(orders: DataFrame) -> DataFrame:
    """URL scalar family: synthesize a deterministic order-page URL per
    row, then parse and canonicalize it with REGEXP — scheme, host,
    path, each query parameter, and the tracking-stripped canonical
    form (the dedup-key normalization every web-crawl pipeline runs
    before exact URL dedup; reference analog: the string-function
    surface its Trino endpoint exposes).

    Extraction uses regexp_extract on BOTH engines — not Spark's
    parse_url — because the oracle must run the byte-identical
    semantics in DuckDB (parse_url has no DuckDB twin; regexes are the
    engine-portable spelling). All expressions are map-only Catalyst;
    no UDF, no shuffle."""
    url = F.concat(
        F.lit("https://shop.example.com/orders/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?priority="),
        F.substring("o_orderpriority", 1, 1),
        F.lit("&status="),
        F.lower("o_orderstatus"),
        F.lit("&utm_source=mail"),
    )
    u = F.col("url")
    return orders.select(
        "o_orderkey",
        url.alias("url"),
    ).select(
        "o_orderkey",
        "url",
        F.regexp_extract(u, r"^([a-z]+)://", 1).alias("scheme"),
        F.regexp_extract(u, r"^[a-z]+://([^/?#]+)", 1).alias("host"),
        F.regexp_extract(u, r"^[a-z]+://[^/?#]+(/[^?#]*)", 1).alias("path"),
        F.regexp_extract(u, r"[?&]priority=([^&#]*)", 1).alias("q_priority"),
        F.regexp_extract(u, r"[?&]status=([^&#]*)", 1).alias("q_status"),
        F.regexp_replace(
            F.regexp_replace(u, r"[?&]utm_[a-z]+=[^&#]*", ""), r"\?$", ""
        ).alias("canonical_url"),
    )


def ip_functions_events(events: DataFrame) -> DataFrame:
    """IPv4 scalar family over a synthesized client address per event —
    the web-log enrichment kit: octet parse (string → ints), 32-bit
    integer form (range joins/sorting), /16 CIDR prefix (the
    coarse-geo/abuse aggregation key), RFC-1918 private flag, and the
    reverse-DNS PTR name. The address is DETERMINISTIC arithmetic over
    (event_id, user_id) so both engines synthesize byte-identical
    inputs, then everything downstream parses the STRING back — the
    actual function surface under test.

    Scale shape: map-only projection, zero shuffles, whole-stage
    codegen end to end; split()+cast is the engine-portable spelling
    (DuckDB string_split is 1-indexed — the oracle indexes [1..4])."""
    ip = F.concat_ws(
        ".",
        (F.col("event_id") % 224).cast("string"),
        (F.col("user_id") % 256).cast("string"),
        ((F.col("event_id") * 7) % 256).cast("string"),
        ((F.col("user_id") * 13 + F.col("event_id")) % 256).cast("string"),
    )
    parts = F.split(F.col("ip"), r"\.")
    o = [parts.getItem(i).cast("long") for i in range(4)]
    return events.select("event_id", ip.alias("ip")).select(
        "event_id",
        "ip",
        o[0].alias("octet1"),
        (o[0] * 16777216 + o[1] * 65536 + o[2] * 256 + o[3]).alias("ip_int"),
        F.concat_ws(".", *[c.cast("string") for c in o[:2]]).alias("prefix16"),
        (
            (o[0] == 10)
            | ((o[0] == 172) & (o[1] >= 16) & (o[1] <= 31))
            | ((o[0] == 192) & (o[1] == 168))
        ).alias("is_private"),
        F.concat_ws(
            ".", *[c.cast("string") for c in reversed(o)]
        ).alias("ptr_octets"),
    )


def canonicalize_url(u):  # noqa: ANN001 - Column in, Column out
    """Full URL canonicalization — the normalization a web-crawl dedup
    runs BEFORE exact URL dedup (beyond the utm-strip of
    url_functions_orders): drop the fragment, case-fold scheme and
    host, strip DEFAULT ports scheme-aware (:80 only under http, :443
    only under https — http://host:443/x is a DISTINCT resource from
    http://host/x and must not collapse), strip trailing path slashes,
    drop utm_* tracking params, and SORT the surviving query params so
    permuted querystrings collapse. Pure Catalyst (regexp + split +
    array_sort + higher-order filter + CASE on the scheme), portable
    verbatim to the DuckDB oracle — no parse_url (no DuckDB twin), no
    UDF."""
    u1 = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u1, r"^([A-Za-z]+)://", 1))
    host_raw = F.lower(F.regexp_extract(u1, r"^[A-Za-z]+://([^/?#]+)", 1))
    host = (
        F.when(scheme == F.lit("http"), F.regexp_replace(host_raw, r":80$", ""))
        .when(scheme == F.lit("https"), F.regexp_replace(host_raw, r":443$", ""))
        .otherwise(host_raw)
    )
    path = F.regexp_replace(
        F.regexp_extract(u1, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1), r"/+$", ""
    )
    query = F.regexp_extract(u1, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda x: (x != F.lit("")) & (F.substring(x, 1, 4) != F.lit("utm_")),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def url_canonical_dedup(orders: DataFrame) -> DataFrame:
    """Canonical-URL dedup verification: three deliberately-messy
    variants per order (mixed-case scheme/host, explicit :443, trailing
    slash, fragment, permuted params, utm_* noise) must ALL collapse to
    one canonical URL — reported as a group-size histogram (every group
    size 3 ⇒ the canonicalizer is a congruence on the variant set;
    any 1s or 2s pinpoint a normalization it missed).

    Map-only variant synthesis + one canonical-grain aggregate + a
    ≤3-row histogram; at 100 TB the canonical key is codegen'd in the
    scan and the dedup is the usual exact hash-groupBy."""
    k = F.col("o_orderkey").cast("string")
    p = F.substring("o_orderpriority", 1, 1)
    s = F.lower("o_orderstatus")
    v0 = F.concat(
        F.lit("HTTPS://Shop.Example.COM:443/orders/"), k,
        F.lit("/?utm_source=mail&status="), s, F.lit("&priority="), p,
        F.lit("#ref"),
    )
    v1 = F.concat(
        F.lit("https://shop.example.com/orders/"), k,
        F.lit("?priority="), p, F.lit("&status="), s,
    )
    v2 = F.concat(
        F.lit("https://shop.example.com:443/orders/"), k,
        F.lit("/?status="), s, F.lit("&priority="), p, F.lit("&utm_campaign=x"),
    )
    variants = orders.select(F.explode(F.array(v0, v1, v2)).alias("url"))
    groups = variants.groupBy(canonicalize_url(F.col("url")).alias("canonical")).agg(
        F.count("*").cast("long").alias("group_size")
    )
    return (
        groups.groupBy("group_size")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.min("canonical").alias("first_url"),
            F.max("canonical").alias("last_url"),
        )
        .orderBy("group_size")
    )


def edit_distance_pairs(nation: DataFrame, threshold: int = 3) -> DataFrame:
    """Levenshtein edit-distance scalar family over all nation-name
    pairs (25×24/2 = 300 rows — a catalog-bounded self theta-join, the
    fuzzy-matching primitive behind entity resolution's verification
    stage; the blocked production path is dedup.fuzzy_entity_pairs,
    llm/dedup.py): raw distance, a similarity in integer basis points
    (10000·(maxlen − d) / maxlen), and the banded form (distance if
    ≤ threshold else −1 — Spark's 3-arg levenshtein early-exit,
    emulated portably here so the oracle matches verbatim).

    Exact: Levenshtein is integer-valued and identically defined in
    both engines; everything else is BIGINT arithmetic."""
    a = nation.select(F.col("n_name").alias("name_a"))
    b = nation.select(F.col("n_name").alias("name_b"))
    # ONE definition of distance and max-length, composed by name below
    # (duplicating the expressions per output column invites drift)
    staged = a.join(b, F.col("name_a") < F.col("name_b")).select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("edit_distance"),
        F.length("name_a").cast("long").alias("len_a"),
        F.length("name_b").cast("long").alias("len_b"),
        F.greatest(F.length("name_a"), F.length("name_b"))
        .cast("long")
        .alias("max_len"),
    )
    return (
        staged.select(
            "name_a",
            "name_b",
            "edit_distance",
            "len_a",
            "len_b",
            F.expr("(10000 * (max_len - edit_distance)) div max_len")
            .cast("long")
            .alias("similarity_bps"),
            F.when(
                F.col("edit_distance") <= threshold, F.col("edit_distance")
            )
            .otherwise(F.lit(-1).cast("long"))
            .alias("banded_distance"),
        )
        .orderBy("name_a", "name_b")
    )
