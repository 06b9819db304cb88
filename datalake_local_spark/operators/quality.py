"""Relational data-quality validation — declarative constraint checks
(NOT NULL, key uniqueness, referential integrity, range) evaluated as
one report: rule name → violation count.

The reference stack has no validation layer (string-spliced INSERTs,
assets.py:105-115, fail silently on bad data); a warehouse ingest needs
the checks where the data lands. Every rule is a DataFrame aggregate —
null/range rules fold into ONE pass over the fact table (conditional
sums); uniqueness is one groupBy on the key; referential integrity is
one anti join against the (broadcastable when bounded) parent keys. No
rule ever collects rows to the driver — violation SAMPLES would be a
`.filter(...).limit(k)` follow-up on the same predicates."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def integrity_report(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Constraint report for the orders fact: one row per rule.

    Rules: key columns non-null, o_orderkey unique, o_custkey references
    customer.c_custkey, o_totalprice positive, o_orderstatus in its
    domain."""
    one_pass = orders.agg(
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("null_orderkey"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_custkey"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("nonpositive_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).alias("bad_status"),
    )
    dup_keys = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("duplicate_orderkeys"))
    )
    orphans = (
        orders.join(
            customer.select("c_custkey"),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        ).agg(F.count("*").alias("orphan_custkeys"))
    )
    wide = one_pass.crossJoin(F.broadcast(dup_keys)).crossJoin(F.broadcast(orphans))
    return wide.select(
        F.expr(
            "stack(6, "
            "'null_orderkey', null_orderkey, "
            "'null_custkey', null_custkey, "
            "'nonpositive_price', nonpositive_price, "
            "'bad_status', bad_status, "
            "'duplicate_orderkeys', duplicate_orderkeys, "
            "'orphan_custkeys', orphan_custkeys)"
        ).alias("rule", "n_violations")
    ).withColumn("passed", F.col("n_violations") == 0)


def batch_drift_report(documents: DataFrame, split: int = 250) -> DataFrame:
    """Batch-over-batch drift report — the data-ops gate a pipeline runs
    before admitting a new crawl batch into the corpus: compare the
    incoming batch (doc_id >= split, the same convention as
    dedup.incremental_dedup) against the existing corpus on volume,
    nulls, length and language mix, and emit one row per metric so the
    report is alert-rule-friendly (threshold per metric name).

    Metrics: row_count, null_text_rate, mean_n_chars, mean_n_tokens
    (old/new/delta each), and lang_l1_distance — the L1 distance between
    the two language distributions (0 = identical mix, 2 = disjoint),
    with old/new carrying each side's distinct language count.

    Plan shape: ONE pass over documents — every measure is first
    aggregated at ``lang`` grain (conditional sums per side, map-side
    combined), and the corpus-level scalars RE-aggregate that tiny
    lang-grain table, so the two consumers (scalar metric rows and the
    language-distance row) share the same exchange instead of
    re-scanning the corpus per branch (the round-6 ReuseExchange
    discipline applied at aggregation altitude: re-aggregate the
    aggregate, don't re-read the base). Nothing is keyed hotter than
    ``lang``. Deterministic → exact ANSI oracle."""
    toks = F.size(F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "))
    base = documents.select(
        (F.col("doc_id") >= split).alias("is_new"),
        F.col("text").isNull().cast("int").alias("null_text"),
        F.coalesce(F.col("n_chars"), F.lit(0)).alias("n_chars"),
        F.coalesce(toks, F.lit(0)).alias("n_tokens"),
        "lang",
    )

    def _side(cond, col):
        return F.sum(F.when(cond, col).otherwise(F.lit(0)))

    old, new = ~F.col("is_new"), F.col("is_new")
    langs = base.groupBy("lang").agg(
        _side(old, F.lit(1)).alias("o"),
        _side(new, F.lit(1)).alias("n"),
        _side(old, F.col("null_text")).alias("o_nulls"),
        _side(new, F.col("null_text")).alias("n_nulls"),
        _side(old, F.col("n_chars")).alias("o_chars"),
        _side(new, F.col("n_chars")).alias("n_chars"),
        _side(old, F.col("n_tokens")).alias("o_toks"),
        _side(new, F.col("n_tokens")).alias("n_toks"),
    )
    # corpus scalars re-aggregate the lang-grain table (|langs| rows)
    scal = langs.agg(
        F.sum("o").alias("old_n"),
        F.sum("n").alias("new_n"),
        F.sum("o_nulls").alias("old_nulls"),
        F.sum("n_nulls").alias("new_nulls"),
        F.sum("o_chars").alias("old_chars"),
        F.sum("n_chars").alias("new_chars"),
        F.sum("o_toks").alias("old_toks"),
        F.sum("n_toks").alias("new_toks"),
    )
    # r19 guard: an empty split side has a 0 (not NULL) count via the
    # otherwise(0) side sums — under ANSI the share division CRASHED;
    # NULL d (skipped by the L1 sum) matches the oracle's x/0 -> NULL
    lang_frac = langs.crossJoin(F.broadcast(scal.select("old_n", "new_n"))).select(
        "o",
        "n",
        F.when(
            (F.col("old_n") > 0) & (F.col("new_n") > 0),
            F.abs(
                F.col("o") / F.col("old_n") - F.col("n") / F.col("new_n")
            ),
        ).alias("d"),
    )
    lang_row = lang_frac.agg(
        F.lit("lang_l1_distance").alias("metric"),
        F.sum(F.when(F.col("o") > 0, 1).otherwise(0)).cast("double").alias("old_value"),
        F.sum(F.when(F.col("n") > 0, 1).otherwise(0)).cast("double").alias("new_value"),
        F.round(F.sum("d"), 6).alias("delta"),
    )
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    # the four scalar metrics unpivot from the ONE aggregate row via
    # stack() — a union of per-metric selects would replay the aggregate
    # subtree once per metric
    go = F.col("old_n") > 0  # r19: empty-side guards (ANSI div-by-zero)
    gn = F.col("new_n") > 0
    derived = scal.select(
        F.col("old_n").cast("double").alias("rc_o"),
        F.col("new_n").cast("double").alias("rc_n"),
        F.when(go, r6(F.col("old_nulls") / F.col("old_n"))).alias("nr_o"),
        F.when(gn, r6(F.col("new_nulls") / F.col("new_n"))).alias("nr_n"),
        F.when(go, r6(F.col("old_chars") / F.col("old_n"))).alias("mc_o"),
        F.when(gn, r6(F.col("new_chars") / F.col("new_n"))).alias("mc_n"),
        F.when(go, r6(F.col("old_toks") / F.col("old_n"))).alias("mt_o"),
        F.when(gn, r6(F.col("new_toks") / F.col("new_n"))).alias("mt_n"),
    )
    scal_rows = derived.select(
        F.expr(
            "stack(4, "
            "'row_count', rc_o, rc_n, "
            "'null_text_rate', nr_o, nr_n, "
            "'mean_n_chars', mc_o, mc_n, "
            "'mean_n_tokens', mt_o, mt_n) AS (metric, old_value, new_value)"
        )
    ).withColumn("delta", r6(F.col("new_value") - F.col("old_value")))
    return scal_rows.unionByName(lang_row)


def key_skew_profile(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """Key-skew diagnosis for a prospective shuffle key — the report to
    read BEFORE joining or aggregating a 100 TB fact on ``key_col``:
    every groupBy/join hashes rows to ``spark.sql.shuffle.partitions``
    buckets by this key, so a key holding 10% of rows caps the stage at
    ~10% parallelism however many executors exist (the motivation for
    AQE skew-join, salting — see ``events_salted_agg`` — and broadcast).

    Tall (metric, key, value) table:

    * ``top_key_rows`` / ``top_key_share``  per top-``k`` key (ties
      broken by key string — deterministic);
    * ``n_keys``, ``n_rows``                cardinality and volume;
    * ``max_share``                         heaviest key's row fraction;
    * ``topk_share``                        mass in the top ``k`` keys;
    * ``skew_ratio_max_avg``                max key count over the mean
      count — the direct "how unbalanced is the heaviest shuffle
      bucket" multiplier (1.0 = uniform);
    * ``entropy_nats``                      Shannon entropy of the key
      distribution, ``ln(N) - Σ c·ln(c) / N`` (ln(n_keys) = uniform).

    Scale shape: ONE pass to key grain (map-side partial agg — the
    profile never shuffles raw rows, only (key, count) pairs), a
    single-row reduce for the scalars, and TakeOrderedAndProject (orderBy
    + limit, never a global sort) for the top-k; the k-row and 1-row
    relations are driver-size by construction. Key rendered as string so
    the profile is type-generic."""
    key = F.col(key_col).cast("string").alias("key")
    counts = df.select(key).groupBy("key").agg(F.count("*").alias("c"))
    stats = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_c"),
        F.sum(F.col("c") * F.log(F.col("c"))).alias("clogc"),
    )
    top = counts.orderBy(F.col("c").desc(), F.col("key")).limit(k)
    topk_share = top.agg(F.sum("c").alias("topk_c"))
    per_key = top.crossJoin(F.broadcast(stats)).select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("top_key_rows").alias("metric"),
                    F.col("key"),
                    F.col("c").cast("double").alias("value"),
                ),
                F.struct(
                    F.lit("top_key_share").alias("metric"),
                    F.col("key"),
                    F.round(F.col("c") / F.col("n_rows"), 6).alias("value"),
                ),
            )
        ).alias("m")
    ).select("m.metric", "m.key", "m.value")
    nul = F.lit(None).cast("string").alias("key")
    summary = (
        stats.crossJoin(F.broadcast(topk_share))
        .select(
            F.explode(
                F.array(
                    F.struct(F.lit("n_keys").alias("metric"), nul, F.col("n_keys").cast("double").alias("value")),
                    F.struct(F.lit("n_rows").alias("metric"), nul, F.col("n_rows").cast("double").alias("value")),
                    F.struct(F.lit("max_share").alias("metric"), nul, F.round(F.col("max_c") / F.col("n_rows"), 6).alias("value")),
                    F.struct(F.lit("topk_share").alias("metric"), nul, F.round(F.col("topk_c") / F.col("n_rows"), 6).alias("value")),
                    F.struct(F.lit("skew_ratio_max_avg").alias("metric"), nul, F.round(F.col("max_c") * F.col("n_keys") / F.col("n_rows"), 6).alias("value")),
                    F.struct(F.lit("entropy_nats").alias("metric"), nul, F.round(F.log(F.col("n_rows")) - F.col("clogc") / F.col("n_rows"), 6).alias("value")),
                )
            ).alias("m")
        )
        .select("m.metric", "m.key", "m.value")
    )
    return per_key.unionByName(summary)


def join_cardinality_estimate(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str, k: int = 5
) -> DataFrame:
    """Pre-flight join-size estimator: |L ⋈ R| on an equi-key is EXACTLY
    Σ_key cL(key)·cR(key), computable from the two key-grain count
    relations — each a map-side-combined aggregate orders of magnitude
    smaller than its table. The answer a planner (or an engineer about
    to launch a 100 TB join) needs BEFORE paying for the real thing:
    the exact output size, which keys dominate it, and whether a skewed
    key makes the join explode (the companion diagnosis to
    ``key_skew_profile``, which looks at one side in isolation).

    Tall (metric, key, value) report:

    * ``join_rows``            exact output row count of the equi-join;
    * ``n_matching_keys``      keys present on both sides;
    * ``left_rows`` / ``right_rows``  input sizes for context;
    * ``top_key_rows`` / ``top_key_share``  per top-``k`` contributing
      key: its cL·cR product and share of the join output (ties broken
      by key string).

    Scale shape: two key-grain aggregates (map-side combine), one
    key-grain join (≪ data-grain), a single-row reduce, and
    TakeOrderedAndProject for the top contributors. The estimate is
    exact, not a sketch — key-grain relations are what they are; a
    sketch variant would swap the count relations for KMV/CM sketches
    when even key grain is too large."""
    lc = left.select(F.col(left_key).cast("string").alias("key")).groupBy("key").agg(
        F.count("*").alias("cl")
    )
    rc = right.select(F.col(right_key).cast("string").alias("key")).groupBy("key").agg(
        F.count("*").alias("cr")
    )
    prod = lc.join(rc, "key").select(
        "key", (F.col("cl") * F.col("cr")).alias("contrib")
    ).localCheckpoint()  # key histogram reused by totals + top-k
    totals = prod.agg(
        F.sum("contrib").alias("join_rows"), F.count("*").alias("n_keys")
    )
    sizes = left.agg(F.count("*").alias("l_rows")).crossJoin(
        right.agg(F.count("*").alias("r_rows"))
    )
    top = prod.orderBy(F.col("contrib").desc(), F.col("key")).limit(k)
    nul = F.lit(None).cast("string").alias("key")
    summary = totals.crossJoin(F.broadcast(sizes)).select(
        F.explode(
            F.array(
                F.struct(F.lit("join_rows").alias("metric"), nul, F.col("join_rows").cast("double").alias("value")),
                F.struct(F.lit("n_matching_keys").alias("metric"), nul, F.col("n_keys").cast("double").alias("value")),
                F.struct(F.lit("left_rows").alias("metric"), nul, F.col("l_rows").cast("double").alias("value")),
                F.struct(F.lit("right_rows").alias("metric"), nul, F.col("r_rows").cast("double").alias("value")),
            )
        ).alias("m")
    ).select("m.metric", "m.key", "m.value")
    per_key = top.crossJoin(F.broadcast(totals)).select(
        F.explode(
            F.array(
                F.struct(F.lit("top_key_rows").alias("metric"), F.col("key"), F.col("contrib").cast("double").alias("value")),
                F.struct(F.lit("top_key_share").alias("metric"), F.col("key"), F.round(F.col("contrib") / F.col("join_rows"), 6).alias("value")),
            )
        ).alias("m")
    ).select("m.metric", "m.key", "m.value")
    return per_key.unionByName(summary)


def benford_profile(orders: DataFrame) -> DataFrame:
    """Benford's-law leading-digit screen over order totals — the
    classic fraud/synthetic-data tripwire (Benford 1938; Nigrini's
    audit usage — public): naturally-occurring multi-scale amounts
    follow P(d) = log10(1 + 1/d); flat or spiky first-digit histograms
    flag fabricated or truncated feeds before they poison downstream
    stats. Part of the DQ admission suite next to batch_drift_report.

    The leading digit is extracted ARITHMETICALLY —
    floor(x / 10^floor(log10(x))) — not by string formatting, so both
    engines evaluate the identical double-precision expression.
    Scale shape: map-side digit projection + one 9-row groupBy; the
    expected-share comparison is a literal expression, no second scan."""
    d = F.floor(
        F.col("o_totalprice") / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("int")
    counts = (
        orders.filter(F.col("o_totalprice") > 0)
        .select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    # total via broadcast of the digit histogram's own 9-row re-agg —
    # ONE scan, no driver action (the crossJoin-broadcast-totals pattern)
    total = counts.agg(F.sum("n").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("n_total"), 6).alias("share"),
            F.round(F.log10(1 + 1 / F.col("digit")), 6).alias("benford_share"),
            F.round(
                F.col("n") / F.col("n_total") - F.log10(1 + 1 / F.col("digit")), 6
            ).alias("deviation"),
        )
        .orderBy("digit")
    )


def ab_welch_ttest(events: DataFrame) -> DataFrame:
    """Welch's unequal-variance t-test of each event type's value
    against ALL OTHER events — the A/B screening report (Welch 1947;
    the BH/experimentation staple): per type, group stats plus the
    t-statistic and Welch–Satterthwaite degrees of freedom vs the
    complement. Everything is closed-form arithmetic over one grouped
    aggregate's (n, Σx, Σx²) and the 1-row global totals — the
    complement group's moments are global-minus-group, so NO second
    scan and no per-pair shuffle (the group×complement design sidesteps
    the quadratic pairwise-test blowup).

    Scale shape: one grouped aggregate (map-side partials) + a
    broadcast 1-row total + map-only arithmetic. Rounding at 4dp on
    t/df (dimensionless), 2dp on means.

    Determinism (the r9 driver-hash lesson): the group moments are
    summed over DECIMAL(18,6) casts of value (2dp data — lossless), so
    (n, Σx, Σx²) are EXACT in both engines regardless of partial-agg
    accumulation order; raw-double sums drifted ~1e-7 between scan
    orders and flipped t/df at 4dp boundaries. The exact sums are then
    cast to double and the t/df chain is the identical IEEE expression
    tree on both engines → bit-identical before rounding (sqrt-derived
    values never sit on a 4dp grid point). The 2dp means are rounded
    with EXACT integer-cents arithmetic — (2·Σcents + n) div (2n),
    half-up, values are positive — because a double mean of 2dp values
    can land on an odd-thousandth whose shortest repr rounds
    differently under Spark's BigDecimal HALF_UP vs DuckDB's
    multiply-rint."""
    dec = F.col("value").cast("decimal(18,6)")
    g = events.groupBy("event_type").agg(
        F.count("*").alias("n1i"),
        F.sum(dec).alias("s1d"),
        F.sum(dec * dec).alias("q1d"),
    )
    tot = g.agg(
        F.sum("n1i").alias("nti"),
        F.sum("s1d").alias("std_"),
        F.sum("q1d").alias("qtd"),
    )
    j = g.crossJoin(F.broadcast(tot)).select(
        "event_type",
        F.col("n1i").cast("long").alias("n1l"),
        (F.col("nti") - F.col("n1i")).cast("long").alias("n2l"),
        # DECIMAL(38,0), not long (mirrors HUGEINT in the oracle): past
        # ~9.2e16 cents a non-ANSI Spark long cast would silently NULL
        # while DuckDB's BIGINT cast raises — decimal keeps both exact
        # through ~1e38 cents (far past any reachable SF)
        (F.col("s1d") * 100).cast("decimal(38,0)").alias("s1c"),
        ((F.col("std_") - F.col("s1d")) * 100).cast("decimal(38,0)").alias("s2c"),
        F.col("s1d").cast("double").alias("s1"),
        (F.col("std_") - F.col("s1d")).cast("double").alias("s2"),
        F.col("q1d").cast("double").alias("q1"),
        (F.col("qtd") - F.col("q1d")).cast("double").alias("q2"),
    )
    n1 = F.col("n1l").cast("double")
    n2 = F.col("n2l").cast("double")
    s1, q1, s2, q2 = F.col("s1"), F.col("q1"), F.col("s2"), F.col("q2")
    m1, m2 = s1 / n1, s2 / n2
    v1 = (q1 - n1 * m1 * m1) / (n1 - 1)
    v2 = (q2 - n2 * m2 * m2) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / F.sqrt(se2)
    df = (se2 * se2) / (
        (v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1)
    )
    m1c = F.expr("(2 * s1c + n1l) div (2 * n1l)")
    m2c = F.expr("(2 * s2c + n2l) div (2 * n2l)")
    # Degenerate-input guards (r19, the mann_whitney/runs_test class):
    # a single event type makes the complement empty (n2l = 0), and a
    # 1-row group zeroes a variance denominator — under Spark 4's
    # default ANSI mode those divisions RAISE (this query previously
    # CRASHED on such input; DuckDB NULLs), and two constant sides
    # zero se2. All must publish NULL t/df/sig (and NULL mean_rest on
    # an empty complement) identically in both engines. The guards
    # NEST: the size check must pass before se2's own divisions are
    # evaluated (CASE WHEN branches are lazy in codegen — evaluating
    # se2 > 0 inside one flat conjunction still divided by zero).
    nvalid = (F.col("n1l") >= 2) & (F.col("n2l") >= 2)
    tg = F.when(nvalid, F.when(se2 > 0, t))
    return j.select(
        "event_type",
        F.col("n1l").alias("n_group"),
        (m1c.cast("double") / F.lit(100.0)).alias("mean_group"),
        F.when(F.col("n2l") > 0, m2c.cast("double") / F.lit(100.0)).alias(
            "mean_rest"
        ),
        # + 0.0 normalizes IEEE signed zero: a means-tie makes t a tiny
        # negative, DuckDB's multiply-rint round keeps -0.0 while
        # Spark's BigDecimal round emits +0.0 — invisible to float ==,
        # fatal to a string/bit value hash (the r9/r10 red-row cause)
        (F.round(tg, 4) + F.lit(0.0)).alias("t_stat"),
        F.when(nvalid, F.when(se2 > 0, F.round(df, 4))).alias("welch_df"),
        (F.abs(F.round(tg, 4)) >= 1.96).alias("nominal_sig"),
    ).orderBy("event_type")


def chi_squared_screen(events: DataFrame) -> DataFrame:
    """χ² independence screen: is event-type mix independent of time of
    day? Contingency table of event_type × 6-hour day-quarter with
    observed counts, expected counts under independence (row·col/N),
    and per-cell χ² contributions plus the table-wide statistic — the
    categorical drift test next to the numeric screens (ab_ttest,
    benford, batch_drift).

    Scale shape: ONE grouped aggregate builds the cell counts (cell
    cardinality = |types|·4, bounded); row/column marginals and the
    grand total derive from the cell table (broadcast joins of
    catalog-sized aggregates). Nothing rescans events.

    Determinism: observed counts and marginals are exact integers;
    expected and each cell contribution are identical double
    expressions over them, ROUNDED TO 6dp AND SUMMED AS DECIMAL for
    the table statistic — a raw double Σ over cells would depend on
    accumulation order (the audited class)."""
    # integer div, not a double-divide-then-cast: Spark's double→int
    # cast truncates while DuckDB's rounds — `div` / `//` are the same
    # floor on both engines
    cells = (
        events.select(
            "event_type",
            F.expr("hour(ts) div 6").cast("int").alias("day_quarter"),
        )
        .groupBy("event_type", "day_quarter")
        .agg(F.count("*").alias("observed"))
        # materialized: the cell table (types × 4 rows) feeds four
        # consumers whose subtrees are canonically different — without
        # the checkpoint each replays the fact-table scan (r12 census)
        .localCheckpoint()
    )
    row_m = cells.groupBy("event_type").agg(F.sum("observed").alias("row_total"))
    col_m = cells.groupBy("day_quarter").agg(F.sum("observed").alias("col_total"))
    grand = cells.agg(F.sum("observed").alias("n_total"))
    expected = (
        F.col("row_total").cast("double")
        * F.col("col_total").cast("double")
        / F.col("n_total").cast("double")
    )
    contrib = F.round(
        (F.col("observed") - expected) * (F.col("observed") - expected) / expected, 6
    )
    with_cells = (
        cells.join(F.broadcast(row_m), "event_type")
        .join(F.broadcast(col_m), "day_quarter")
        .crossJoin(F.broadcast(grand))
        .select(
            "event_type",
            "day_quarter",
            "observed",
            F.round(expected, 6).alias("expected"),
            contrib.alias("chi2_contrib"),
            contrib.cast("decimal(18,6)").alias("c_dec"),
        )
    )
    with_cells = with_cells.localCheckpoint()  # cell-grain, reused 2x
    total = with_cells.agg(F.sum("c_dec").cast("double").alias("chi2_stat"))
    return (
        with_cells.crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "day_quarter",
            "observed",
            "expected",
            "chi2_contrib",
            "chi2_stat",
        )
        .orderBy("event_type", "day_quarter")
    )


def completeness_profile(orders: DataFrame) -> DataFrame:
    """Per-column completeness/cardinality profile — the first query of
    any data-quality pass: for every column, row count, non-null count,
    exact distinct count, and null share. (The reference's ingestion
    path silently coerces blank Excel cells to NULL — assets.py's
    null-cell pruning — so completeness is the audit that catches a
    sheet gone half-empty.)

    Scale shape: ONE aggregate pass computes every per-column count
    (Spark plans multi-distinct aggregates via expand — the scan is
    read once, exchanged ×columns); the wide 1-row result unpivots via
    stack() into the column-grain report, which is columns-bounded.
    At 100 TB prefer approx_count_distinct per column — exact is kept
    here because the oracle compares exact values.

    Determinism: pure integer counts and one ratio-of-ints — no float
    accumulation anywhere."""
    cols = orders.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"f_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"d_{c}"))
    wide = orders.agg(*aggs)
    stack_args = ", ".join(f"'{c}', f_{c}, d_{c}" for c in cols)
    long = wide.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {stack_args})"
        ).alias("column_name", "n_filled", "n_distinct"),
    )
    return long.select(
        "column_name",
        "n_rows",
        "n_filled",
        "n_distinct",
        F.round(
            (F.col("n_rows") - F.col("n_filled")) / F.col("n_rows").cast("double"), 6
        ).alias("null_share"),
    ).orderBy("column_name")


def bootstrap_mean_ci(orders: DataFrame, n_replicates: int = 50) -> DataFrame:
    """Poisson-bootstrap confidence interval for mean order value per
    priority — THE distributed bootstrap (Chamandy et al. 2012,
    "Estimating uncertainty for massive data streams", Google TR;
    Kleiner et al. 2014 BLB is the subsample variant): instead of
    resampling n rows with replacement (which needs global coordination),
    each row enters replicate r with an independent Poisson(1) weight —
    at corpus scale the multinomial and Poisson bootstraps coincide, and
    the weight needs nothing but the row itself.

    Fully deterministic and integer-exact: the Poisson(1) draw inverts
    the CDF on 16 md5 bits of (orderkey, replicate-block) against
    PRECOMPUTED integer thresholds floor(F(k)·2¹⁶) (k capped at 4,
    99.63% of mass below; both engines compare the same integers, so
    every weight is identical by construction). One md5 digest carries
    EIGHT replicates (its 128 bits are eight independent u16 draws —
    ×8 less hash work than digest-per-replicate; the suite's profiler
    showed the md5 column dominating this plan, and the r11 verdict
    ordered the 4→8 packing). The u16 grid quantizes each CDF class by
    at most 2⁻¹⁶ ≈ 1.5e-5 probability — noise relative to the
    bootstrap's own Monte-Carlo error at R = 50, and still EXACTLY
    deterministic. Replicate means use the exact (2S+n) div 2n
    integer-cent rounding; the CI bounds are exact percentiles over
    the ≤n_replicates integer means (the certified F.percentile ≡
    quantile_cont pair), rounded once.

    100 TB shape: the explode is a bounded ×R row multiplier feeding ONE
    map-side-combined (priority, replicate) aggregate — shuffle carries
    |groups|·R rows; the percentile runs per priority over R values.
    No driver state, no RNG service, reruns bit-identical.

    Fan-out before the multiplier: the scan sizes partitions by INPUT
    bytes, but this stage's cost is ×(R·7/8) the input rows — a small
    orders file lands in one partition and the whole 50-replicate
    pipeline runs single-task (measured 3.2 s → 0.72 s at sf0.1 on 32
    cores after the fix), and AQE cannot split over-density that
    appears mid-stage, after partition bounds are fixed. An EXPLICIT
    repartition (explicit N — AQE's small-partition coalescing would
    otherwise merge the tiny pre-explode bytes right back) spreads the
    expansion, applied only when the input is under-partitioned so an
    already-parallel 100 TB scan is never shrunk."""
    # floor(CDF_Poisson(1)(k) * 2^16) for k = 0..3; u >= t3 → weight 4
    from datalake_local_spark.session import fan_out

    t0, t1, t2, t3 = 24109, 48218, 60273, 64291
    n_blocks = (n_replicates + 7) // 8
    orders = fan_out(orders, "o_orderkey")
    weighted = (
        orders.select(
            "o_orderpriority",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("decimal(38,0)")
            .alias("cents"),
            F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("rb"),
            F.col("o_orderkey"),
        )
        .withColumn(
            "hx", F.md5(F.concat_ws(":", F.col("o_orderkey"), F.col("rb")))
        )
        .select(
            "o_orderpriority",
            "cents",
            "rb",
            "hx",
            F.explode(F.array([F.lit(j) for j in range(8)])).alias("j"),
        )
        .withColumn("r", F.col("rb") * 8 + F.col("j"))
        .filter(F.col("r") < n_replicates)
        .withColumn(
            "u",
            F.conv(F.expr("substring(hx, j * 4 + 1, 4)"), 16, 10).cast("long"),
        )
    ).withColumn(
        "w",
        F.when(F.col("u") < t0, 0)
        .when(F.col("u") < t1, 1)
        .when(F.col("u") < t2, 2)
        .when(F.col("u") < t3, 3)
        .otherwise(4)
        .cast("long"),
    )
    rep_means = (
        weighted.groupBy("o_orderpriority", "r")
        .agg(
            F.sum(F.col("w") * F.col("cents")).cast("long").alias("s"),
            F.sum("w").cast("long").alias("n"),
        )
        .filter(F.col("n") > 0)
        .select(
            "o_orderpriority",
            F.expr("(2 * s + n) div (2 * n)").alias("rep_mean_cents"),
        )
    )
    point = orders.groupBy("o_orderpriority").agg(
        F.expr(
            "(2 * sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as decimal(38,0)))"
            " + count(*)) div (2 * count(*))"
        )
        .cast("long")
        .alias("mean_cents"),
        F.count("*").cast("long").alias("n_orders"),
    )
    ci = rep_means.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_replicates"),
        F.round(F.percentile(F.col("rep_mean_cents"), F.lit(0.025)), 6).alias(
            "ci_lo_cents"
        ),
        F.round(F.percentile(F.col("rep_mean_cents"), F.lit(0.975)), 6).alias(
            "ci_hi_cents"
        ),
    )
    return (
        point.join(ci, "o_orderpriority")
        .select(
            "o_orderpriority", "n_orders", "mean_cents",
            "n_replicates", "ci_lo_cents", "ci_hi_cents",
        )
        .orderBy("o_orderpriority")
    )


def psi_drift(orders: DataFrame) -> DataFrame:
    """Population Stability Index between the FIRST and LAST order year
    over fixed $50k price bands — the standard ML-monitoring drift
    score (PSI = Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ); < 0.1 stable, > 0.25 shifted)
    a feature pipeline runs before trusting a new data window.

    Determinism: bucket membership is pure integer arithmetic
    (cents div 5 000 000, capped at band 9 — fixed bands, never
    data-derived quantile edges whose float boundaries can flip);
    add-one smoothing keeps every band nonzero; each band's
    contribution is ln of an exact small-rational double, quantized to
    12dp DECIMAL before the order-invariant total sum (the certified
    logprob/KM discipline).

    Plan: one scan filtered to the two years (partition-prunable on a
    date-partitioned lake), one 10-band × 2-side aggregate, a 10-row
    window total — nothing scales past the band count after the first
    aggregate."""
    from pyspark.sql import Window as W

    yr = F.year("o_orderdate")
    years = orders.agg(
        F.min(yr).alias("y0"), F.max(yr).alias("y1")
    )
    # membership as two INDEPENDENT flags (not a single side column):
    # a one-year table has y0 = y1, every row lands on BOTH sides, and
    # PSI is exactly 0 — never the spurious max-drift a baseline-only
    # classification would report
    sided = (
        orders.crossJoin(F.broadcast(years))
        .filter((yr == F.col("y0")) | (yr == F.col("y1")))
        .select(
            (yr == F.col("y0")).alias("is_base"),
            (yr == F.col("y1")).alias("is_cur"),
            F.least(
                F.expr(
                    "cast(cast(o_totalprice as decimal(18,2)) * 100 as decimal(38,0))"
                    " div 5000000"
                ).cast("int"),
                F.lit(9),
            ).alias("band"),
        )
    )
    counts = sided.groupBy("band").agg(
        F.sum(F.when(F.col("is_base"), 1).otherwise(0))
        .cast("long")
        .alias("baseline_n"),
        F.sum(F.when(F.col("is_cur"), 1).otherwise(0))
        .cast("long")
        .alias("current_n"),
    )
    tot = counts.agg(
        F.sum("baseline_n").alias("bt"), F.sum("current_n").alias("ct"),
        F.count("*").alias("nb"),
    )
    scored = counts.crossJoin(F.broadcast(tot)).select(
        "band",
        "baseline_n",
        "current_n",
        (
            (F.col("baseline_n") + 1) / (F.col("bt") + F.col("nb"))
        ).alias("p"),
        (
            (F.col("current_n") + 1) / (F.col("ct") + F.col("nb"))
        ).alias("q"),
    ).select(
        "band",
        "baseline_n",
        "current_n",
        F.round("p", 6).alias("p_baseline"),
        F.round("q", 6).alias("q_current"),
        F.round((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")), 12)
        .cast("decimal(18,12)")
        .alias("psi_contrib"),
    )
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        scored.withColumn(
            "psi_total",
            F.round(F.sum("psi_contrib").over(w_all).cast("double"), 6),
        )
        .withColumn("psi_contrib", F.col("psi_contrib").cast("double"))
        .orderBy("band")
    )


def cuped_adjustment(events: DataFrame) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng, Xu, Kohavi &
    Walker 2013, "Improving the Sensitivity of Online Controlled
    Experiments by Utilizing Pre-Experiment Data", WSDM — public): the
    adjusted metric Ŷ = Y − θ·(X − E[X]) with θ = cov(X, Y)/var(X)
    removes the variance Y shares with a pre-experiment covariate X,
    shrinking confidence intervals without biasing the treatment
    effect — THE standard readout upgrade on every large
    experimentation platform, sitting next to ``ab_welch_ttest`` on
    the quality shelf.

    Harness derivation (deterministic, engine-portable): the timeline
    splits at the midpoint of the event-time range (exact integer
    micros, floor-div); per user, X = pre-period spend and Y =
    post-period spend in exact integer cents; arms assigned by md5
    parity of the user id (the repo's deterministic-bucket discipline,
    never engine hash).

    Determinism: all second moments (Σx, Σy, Σxy, Σxx, Σyy per arm
    and pooled) are DECIMAL(38,0)/HUGEINT sums of integer cents —
    exact regardless of partial-agg order — then θ, the adjusted
    means, and the per-arm variance of Ŷ (var Y − 2θ cov + θ² var X)
    are one identical IEEE expression tree per column, rounded at 6dp
    with +0.0 signed-zero normalization; 0/0 guarded to NULL when
    var(X) = 0.

    Scale shape: one user-grain groupBy of the fact table (map-side
    combined), a 1-row broadcast for the time midpoint and the pooled
    moments, then a 2-row arm aggregate — no window, no skew surface
    beyond user activity itself."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = events.agg(
        ((F.min(us) + F.max(us)) - (F.min(us) + F.max(us)) % 2).alias("mid2")
    ).select((F.col("mid2") / 2).cast("long").alias("mid_us"))
    cents = (F.col("value").cast("decimal(18,6)") * 100).cast("long")
    per_user = (
        events.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(us < F.col("mid_us"), cents)), F.lit(0)
            ).alias("x_c"),
            F.coalesce(
                F.sum(F.when(us >= F.col("mid_us"), cents)), F.lit(0)
            ).alias("y_c"),
        )
        .select(
            F.when(
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                       16, 10).cast("long") % 2 == 0,
                "A",
            ).otherwise("B").alias("arm"),
            "x_c",
            "y_c",
        )
    )
    xd = F.col("x_c").cast("decimal(38,0)")
    yd = F.col("y_c").cast("decimal(38,0)")
    arm_g = per_user.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    pooled = arm_g.agg(
        F.sum("n").alias("np"),
        F.sum("sx").alias("sxp"),
        F.sum("sy").alias("syp"),
        F.sum("sxy").alias("sxyp"),
        F.sum("sxx").alias("sxxp"),
    )
    j = arm_g.crossJoin(F.broadcast(pooled))
    npd = F.col("np").cast("decimal(38,0)")
    dxx_p = (npd * F.col("sxxp") - F.col("sxp") * F.col("sxp")).cast("double")
    dxy_p = (npd * F.col("sxyp") - F.col("sxp") * F.col("syp")).cast("double")
    theta = dxy_p / dxx_p  # pooled θ, one value repeated per arm row
    nd = F.col("n").cast("decimal(38,0)")
    n_f = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / n_f / 100.0
    my = F.col("sy").cast("double") / n_f / 100.0
    mx_pool = F.col("sxp").cast("double") / F.col("np").cast("double") / 100.0
    # per-arm centered second moments (exact integer deltas → double)
    dyy = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    dxx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dxy = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    var_y = dyy / (n_f * (n_f - 1)) / 10000.0
    var_adj = (
        dyy - 2 * theta * dxy + theta * theta * dxx
    ) / (n_f * (n_f - 1)) / 10000.0
    # mean_post and var_post are PURE RATIONALS of integer moments —
    # the exact-6dp-half class the r11 sweep caught in monthly_rollup —
    # so both round via exact integer half-up arithmetic; every
    # θ-bearing output is irrational-product-valued (safe at 6dp, the
    # sqrt/log rule)
    mean_e6 = F.expr("(2 * sy * 10000 + n) div (2 * n)")
    var_e6 = F.expr("(2 * dyy_d * 100 + n * (n - 1)) div (2 * n * (n - 1))")
    guard = dxx_p > 0
    # r19: 1-user arms zero the per-arm variance denominator n(n-1) —
    # the unguarded var_post integer div and the var_y evaluation
    # inside the var_reduction CONDITION both CRASHED under ANSI. The
    # n >= 2 check nests OUTSIDE (CASE branches are lazy; a flat
    # conjunction still evaluates the division — the welch lesson).
    n2 = F.col("n") >= 2
    j = j.withColumn("dyy_d", (nd * F.col("syy") - F.col("sy") * F.col("sy")))
    return j.select(
        "arm",
        F.col("n").cast("long").alias("n_users"),
        (mean_e6.cast("double") / F.lit(1e6)).alias("mean_post"),
        F.when(
            guard, F.round(my - theta * (mx - mx_pool), 6) + F.lit(0.0)
        ).alias("mean_cuped"),
        F.when(guard, F.round(theta, 6) + F.lit(0.0)).alias("theta"),
        F.when(n2, var_e6.cast("double") / F.lit(1e6)).alias("var_post"),
        F.when(
            n2, F.when(guard, F.round(var_adj, 6) + F.lit(0.0))
        ).alias("var_cuped"),
        F.when(
            n2,
            F.when(
                guard & (var_y > 0),
                F.round(1.0 - var_adj / var_y, 6) + F.lit(0.0),
            ),
        ).alias("var_reduction"),
    ).orderBy("arm")


def _daily_status_cents(orders: DataFrame) -> DataFrame:
    """(status, day, c): daily revenue in exact integer cents per order
    status — the shared pair-stage input of ``mann_kendall_trend`` and
    ``theil_sen_slope`` (one definition so the two companions can never
    desynchronize on quantization or grain)."""
    cents = (F.col("o_totalprice").cast("decimal(18,6)") * 100).cast("long")
    return orders.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(F.sum(cents).alias("c"))


def mann_kendall_trend(orders: DataFrame) -> DataFrame:
    """Mann–Kendall nonparametric trend test (Mann 1945, Kendall 1975 —
    public) on the daily-revenue series, per order status: S =
    Σ_{i<j} sign(xⱼ − xᵢ) over day pairs, tie-corrected variance
    Var(S) = [n(n−1)(2n+5) − Σₜ t(t−1)(2t+5)]/18, and the
    continuity-corrected z — the distribution-free "is this metric
    actually trending" screen that, unlike ``trend_regression``'s
    least-squares slope, is immune to outliers and monotone
    transforms.

    Determinism: daily revenue is exact integer cents, so every
    pairwise sign is exact; S and the variance NUMERATOR (kept ×18 as
    an integer) are integer sums; z is one identical IEEE tree over
    them (sqrt-derived → safe at 4dp), +0.0 for the signed zero a
    tieless flat series yields.

    Scale shape: the day-pair self-join is quadratic in DAYS (a
    bounded calendar dimension, ~2.5k days here, never table-sized)
    and co-partitioned on status; daily revenue and tie counts are
    map-side-combined aggregates of the fact table. At 100 TB the
    fact scan dominates; the pair stage stays O(|days|²·|statuses|).

    Materialized once: daily feeds BOTH self-join sides, n_days and the
    tie counts — four canonically different consumer subtrees, so
    without the checkpoint each replayed the fact scan + day aggregate
    (4 orders scans in the r20 plan capture; ``pettitt_changepoint``
    already applies the same discipline). The table is day×status
    grain — calendar-bounded, never fact-sized (guide §2.4)."""
    daily = _daily_status_cents(orders).localCheckpoint()
    a, b = daily.alias("a"), daily.alias("b")
    s_stat = (
        a.join(
            b,
            (F.col("a.status") == F.col("b.status"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.status").alias("status"))
        .agg(
            F.sum(
                F.when(F.col("b.c") > F.col("a.c"), 1)
                .when(F.col("b.c") < F.col("a.c"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    n_days = daily.groupBy("status").agg(F.count("*").alias("n"))
    ties = (
        daily.groupBy("status", "c")
        .agg(F.count("*").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("status")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    j = (
        # LEFT join + coalesce: a status with a single day has no day
        # pairs, so s_stat has no row for it — it must still appear as
        # an S=0 / no_trend row (var18 is 0 for n=1, z stays NULL), not
        # silently vanish from the report (ADVICE r12).
        n_days.join(s_stat, "status", "left")
        .join(ties, "status", "left")
        .select(
            "status",
            "n",
            F.coalesce("s", F.lit(0)).alias("s"),
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce("tie_term", F.lit(0))
            ).alias("var18"),
        )
    )
    sd = F.col("s").cast("double")
    z = F.when(
        F.col("var18") > 0,
        F.when(F.col("s") > 0, (sd - 1) / F.sqrt(F.col("var18").cast("double") / 18.0))
        .when(F.col("s") < 0, (sd + 1) / F.sqrt(F.col("var18").cast("double") / 18.0))
        .otherwise(F.lit(0.0)),
    )
    zr = F.round(z, 4) + F.lit(0.0)
    return j.select(
        "status",
        F.col("n").cast("long").alias("n_days"),
        F.col("s").cast("long").alias("s_stat"),
        F.col("var18").cast("long").alias("var_s_x18"),
        zr.alias("z"),
        F.when(zr >= 1.96, "increasing")
        .when(zr <= -1.96, "decreasing")
        .otherwise("no_trend")
        .alias("trend"),
    ).orderBy("status")


def mann_whitney_u(
    orders: DataFrame,
    group_a: str = "1-URGENT",
    group_b: str = "5-LOW",
    n_buckets: int = 1024,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) two-sample test (Mann &
    Whitney 1947 — public) on order prices between two priority
    classes: the distribution-free "did the level shift between
    groups" screen that ``ab_welch_ttest`` answers parametrically.
    Midranks are kept ×2 so ties stay EXACT integers (midrank of a
    value with ``lt`` smaller observations and ``t`` ties is
    lt + (t+1)/2, so 2·midrank = 2·lt + t + 1 — always integral);
    2·R₁, 2·U₁ and the tie-corrected variance NUMERATOR are integer
    sums end-to-end, and z is one identical IEEE tree over them
    (sqrt-derived → safe at 4dp; no continuity correction, stated).
    Tie-corrected Var(U) = n₁n₂/12 · [(n+1) − Σ(t³−t)/(n(n−1))]: the
    BRACKET numerator (n+1)n(n−1) − Σ(t³−t) is published as an exact
    integer (≤ ~n³ — BIGINT-safe to n ≈ 2M; the overflow audit the
    verify recipe prescribes), while the n₁n₂ factor multiplies in
    DOUBLES — n₁n₂·n³ would overflow BIGINT right past test scale
    (~2e23 at sf0.1), the silent-wrap seam the r17 Morton fix chased.

    Scale shape — the distributed exact-rank pattern: the pooled
    sample collapses to DISTINCT-VALUE grain (map-side combined), and
    the below-count for every value comes from a TWO-LEVEL cumulative
    sum — per-bucket totals (``n_buckets`` equal-width integer-cents
    buckets) prefix-summed at bucket grain (broadcast), plus a
    within-bucket running sum windowed BY BUCKET — so no global
    single-partition window ever materializes (the anti-pattern a
    naive rank() would plan). One row out."""
    from pyspark.sql import Window as W

    cents = (F.col("o_totalprice").cast("decimal(18,6)") * 100).cast("long")
    pooled = orders.filter(
        F.col("o_orderpriority").isin([group_a, group_b])
    ).select(
        cents.alias("c"),
        (F.col("o_orderpriority") == group_a).cast("long").alias("ia"),
    )
    vals = pooled.groupBy("c").agg(
        F.sum("ia").alias("na"),
        (F.count("*") - F.sum("ia")).alias("nb"),
    )
    b = vals.agg(F.min("c").alias("cmin"), F.max("c").alias("cmax"))
    keyed = vals.crossJoin(F.broadcast(b)).select(
        "c",
        "na",
        "nb",
        (F.col("na") + F.col("nb")).alias("t"),
        F.expr(
            f"least({n_buckets - 1}, (c - cmin) * {n_buckets}"
            " div (cmax - cmin + 1))"
        ).alias("bkt"),
    )
    bucket_tot = keyed.groupBy("bkt").agg(F.sum("t").alias("bn"))
    woff = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    offsets = bucket_tot.select(  # bucket grain: <= n_buckets rows
        "bkt", F.coalesce(F.sum("bn").over(woff), F.lit(0)).alias("off")
    )
    win = W.partitionBy("bkt").orderBy("c").rowsBetween(W.unboundedPreceding, -1)
    ranked = keyed.join(F.broadcast(offsets), "bkt").select(
        "c",
        "na",
        "nb",
        "t",
        (
            F.col("off") + F.coalesce(F.sum("t").over(win), F.lit(0))
        ).alias("lt"),
    )
    agg = ranked.agg(
        F.sum("na").cast("long").alias("n1"),
        F.sum("nb").cast("long").alias("n2"),
        F.sum(F.col("na") * (2 * F.col("lt") + F.col("t") + 1))
        .cast("long")
        .alias("r1_x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_cubes"),
    )
    n = F.col("n1") + F.col("n2")
    u1_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    bracket = (n + 1) * n * (n - 1) - F.col("tie_cubes")
    var_u = (
        (F.col("n1") * F.col("n2")).cast("double")
        * bracket.cast("double")
        / (12.0 * (n * (n - 1)).cast("double"))
    )
    # Degenerate-input guard (r18 advice): when every pooled value is
    # identical the tie bracket is 0 and var_u vanishes; both engines
    # must publish NULL z (Spark would NULL via Divide, DuckDB would
    # produce inf/NaN — a cross-engine seam). Same for an empty group.
    z = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (bracket > 0),
        (u1_x2 - F.col("n1") * F.col("n2")).cast("double")
        / (2.0 * F.sqrt(var_u)),
    )
    zr = F.round(z, 4) + F.lit(0.0)
    return agg.select(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        "n1",
        "n2",
        u1_x2.cast("long").alias("u1_x2"),
        (2 * F.col("n1") * F.col("n2") - u1_x2).cast("long").alias("u2_x2"),
        bracket.cast("long").alias("var_bracket"),
        zr.alias("z"),
        F.when(F.abs(zr) >= 1.96, "shift").otherwise("no_shift").alias("verdict"),
    )


def pettitt_changepoint(orders: DataFrame) -> DataFrame:
    """Pettitt nonparametric changepoint test (Pettitt 1979, "A
    Non-parametric Approach to the Change-point Problem", JRSS-C —
    public) on the daily-revenue series, per order status: the
    rank-based statistic U_t = Σ_{i≤t} Σ_{j>t} sgn(x_j − x_i), with
    K = max_t |U_t| over t = 1..n−1 and the changepoint at the argmax
    (earliest day on ties) — the distribution-free "did the level
    SHIFT, and when" companion to ``mann_kendall_trend``'s monotone
    direction test (same exact-cents spine, same sign kernel).

    Computed in O(n log n) rather than the definitional O(n²) pair
    sum via the standard recursion U_t = U_{t−1} + W_t,
    W_t = Σ_{j=1..n} sgn(x_j − x_t) = (n − #{x ≤ x_t}) − #{x < x_t}:
    one value-grain cumulative count per status gives every W_t, one
    day-ordered cumulative sum gives every U_t — all exact integers
    (cents in, signs out). The published means before/after the
    changepoint are the only divisions (2dp, exact-integer-cents
    numerators). A status with a single day has no admissible t; it
    still reports a row (K = 0, NULL changepoint — the r12
    don't-vanish lesson).

    Scale shape: both windows are DAY-grain partitioned by status (a
    bounded calendar dimension, never table-sized); the fact scan
    that builds the spine dominates at 100 TB, as with the other
    spine tests."""
    from pyspark.sql import Window as W

    daily = _daily_status_cents(orders).localCheckpoint()
    n_days = daily.groupBy("status").agg(F.count("*").alias("n"))
    vals = daily.groupBy("status", "c").agg(F.count("*").alias("cnt"))
    wv = W.partitionBy("status").orderBy("c").rowsBetween(W.unboundedPreceding, 0)
    cle = vals.select(
        "status",
        "c",
        F.sum("cnt").over(wv).alias("cle"),
        (F.sum("cnt").over(wv) - F.col("cnt")).alias("clt"),
    )
    wt = (
        daily.join(cle, ["status", "c"])
        .join(n_days, "status")
        .select(
            "status",
            "day",
            "c",
            "n",
            ((F.col("n") - F.col("cle")) - F.col("clt")).alias("w"),
        )
    )
    wd = W.partitionBy("status").orderBy("day")
    ut = wt.select(
        "status",
        "day",
        "c",
        "n",
        F.sum("w").over(wd.rowsBetween(W.unboundedPreceding, 0)).alias("u"),
        F.row_number().over(wd).alias("t"),
    ).filter(F.col("t") < F.col("n"))  # U_n = 0 by construction; t <= n-1
    best = (
        ut.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("status").orderBy(F.abs("u").desc(), F.col("day"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select(
            "status",
            F.abs("u").cast("long").alias("k_stat"),
            F.col("u").cast("long").alias("u_at_cp"),
            F.col("day").alias("changepoint_day"),
        )
    )
    seg = (
        daily.join(best.select("status", "changepoint_day"), "status")
        .groupBy("status")
        .agg(
            F.sum(F.when(F.col("day") <= F.col("changepoint_day"), 1).otherwise(0))
            .cast("long")
            .alias("n_before"),
            F.sum(
                F.when(F.col("day") <= F.col("changepoint_day"), F.col("c")).otherwise(0)
            ).alias("c_before"),
            F.sum(F.when(F.col("day") > F.col("changepoint_day"), 1).otherwise(0))
            .cast("long")
            .alias("n_after"),
            F.sum(
                F.when(F.col("day") > F.col("changepoint_day"), F.col("c")).otherwise(0)
            ).alias("c_after"),
        )
    )
    return (
        n_days.join(best, "status", "left")
        .join(seg, "status", "left")
        .select(
            "status",
            F.col("n").cast("long").alias("n_days"),
            F.coalesce("k_stat", F.lit(0)).cast("long").alias("k_stat"),
            F.col("u_at_cp"),
            "changepoint_day",
            "n_before",
            "n_after",
            # exact-integer HALF_UP mean in cents, then one /100.0 —
            # the avg_price idiom: a float mean's 2dp rounding flips
            # with accumulation order, an integer one cannot
            (
                F.expr("(2 * c_before + n_before) div (2 * n_before)")
                .cast("double")
                / 100.0
            ).alias("mean_before"),
            (
                F.expr("(2 * c_after + n_after) div (2 * n_after)")
                .cast("double")
                / 100.0
            ).alias("mean_after"),
        )
        .orderBy("status")
    )


def runs_test(orders: DataFrame) -> DataFrame:
    """Wald–Wolfowitz runs test (Wald & Wolfowitz 1940 — public) on the
    daily-revenue series, per order status: is the sequence of
    above/below-median days RANDOM, or does it cluster (fewer runs —
    regimes, autocorrelation) or alternate (more runs — overdispersion,
    day-of-week seesaw)? The randomness screen that complements
    ``mann_kendall_trend`` (monotone drift) and
    ``pettitt_changepoint`` (single level shift) on the same
    exact-cents spine.

    Exactness: the median is the exact order statistic kept ×2 as an
    integer (sum of the two middle values for even n), so every
    above/below sign is an integer comparison; median-equal days drop
    (the standard treatment); the run count R and the n₁/n₂ sides are
    exact integers, and z = (R − μ)/σ with μ = 2n₁n₂/n + 1,
    σ² = 2n₁n₂(2n₁n₂ − n)/(n²(n−1)) is one shared IEEE tree (4dp,
    sqrt-safe; 2n₁n₂ ≤ n²/2 keeps every integer term ≤ ~n⁴/4 —
    BIGINT-safe to n ≈ 10⁴ days, i.e. any calendar). A status whose
    kept sequence has n₁ = 0 or n₂ = 0 (all-identical days) reports
    R with a NULL z rather than vanishing.

    Scale shape: day-grain windows partitioned by status, like every
    spine test — the fact scan dominates at any SF."""
    from pyspark.sql import Window as W

    daily = _daily_status_cents(orders).localCheckpoint()
    wd = W.partitionBy("status").orderBy("c")
    nd = daily.groupBy("status").agg(F.count("*").alias("n_days"))
    ordered = daily.select(
        "status", "c", F.row_number().over(wd).alias("rk")
    ).join(nd, "status")
    # median x2 as an exact integer: the middle order statistic doubled
    # (odd n — the two rank predicates coincide, one row) or the sum of
    # the two middle ones (even n)
    med2 = (
        ordered.filter(
            (F.col("rk") == F.floor((F.col("n_days") + 1) / 2))
            | (F.col("rk") == F.floor(F.col("n_days") / 2) + 1)
        )
        .groupBy("status")
        .agg(F.sum("c").alias("msum"), F.count("*").alias("mcnt"))
        .select(
            "status",
            F.when(F.col("mcnt") == 1, 2 * F.col("msum"))
            .otherwise(F.col("msum"))
            .alias("m2"),
        )
    )
    signed = (
        daily.join(med2, "status")
        .select(
            "status",
            "day",
            F.when(2 * F.col("c") > F.col("m2"), 1)
            .when(2 * F.col("c") < F.col("m2"), -1)
            .otherwise(0)
            .alias("s"),
        )
        .filter(F.col("s") != 0)
    )
    wt = W.partitionBy("status").orderBy("day")
    runs = (
        signed.select(
            "status",
            "s",
            F.lag("s").over(wt).alias("prev"),
        )
        .groupBy("status")
        .agg(
            F.sum((F.col("s") == 1).cast("long")).alias("n1"),
            F.sum((F.col("s") == -1).cast("long")).alias("n2"),
            (
                1
                + F.sum(
                    (F.col("prev").isNotNull() & (F.col("s") != F.col("prev")))
                    .cast("long")
                )
            ).cast("long").alias("r_runs"),
        )
    )
    # LEFT join from the status universe: a status whose every day sits
    # exactly on the median keeps a row (all-zero counts, NULL z) —
    # the family's don't-vanish rule
    full = nd.select("status").join(runs, "status", "left").select(
        "status",
        F.coalesce("n1", F.lit(0)).cast("long").alias("n1"),
        F.coalesce("n2", F.lit(0)).cast("long").alias("n2"),
        F.coalesce("r_runs", F.lit(0)).cast("long").alias("r_runs"),
    )
    n = F.col("n1") + F.col("n2")
    two = 2 * F.col("n1") * F.col("n2")
    mu = two.cast("double") / n.cast("double") + 1.0
    var = (
        two.cast("double")
        * (two - n).cast("double")
        / (n * n).cast("double")
        / (n - 1).cast("double")
    )
    # Guard also requires 2*n1*n2 > n1+n2 (r18 advice): when
    # 2*n1*n2 == n (e.g. n1 = n2 = 1) the variance is 0 and z would
    # divide by zero — NULL on Spark, inf on DuckDB. Both sides now
    # publish NULL z on zero variance.
    z = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (n > 1) & (two > n),
        (F.col("r_runs").cast("double") - mu) / F.sqrt(var),
    )
    zr = F.round(z, 4) + F.lit(0.0)
    return full.select(
        "status",
        "n1",
        "n2",
        "r_runs",
        zr.alias("z"),
        F.when(zr <= -1.96, "clustered")
        .when(zr >= 1.96, "alternating")
        .when(zr.isNotNull(), "random")
        .alias("verdict"),
    ).orderBy("status")


def theil_sen_slope(orders: DataFrame) -> DataFrame:
    """Theil–Sen robust slope estimator over the daily-revenue series,
    per order status (Theil 1950; Sen 1968 — public): the MEDIAN of
    all pairwise slopes (xⱼ − xᵢ)/(dayⱼ − dayᵢ) — up to ~29% outlier
    breakdown where least squares has zero, and the standard
    magnitude companion to ``mann_kendall_trend``'s direction test
    (same day-pair join; a production run shares the pair stage).

    Determinism: every pairwise slope is an integer-cents /
    integer-days double division — bit-identical cross-engine — then
    FLOOR-quantized to centi-cents/day (floor has no half-way case
    and, unlike an integer ``div``, floors identically on NEGATIVE
    slopes in both engines — Spark's div truncates toward zero where
    DuckDB's // floors). The quantiles run over those exact integers
    with the certified F.percentile ≡ quantile_cont pair; results are
    exact multiples of 0.25 grid units and ship UNROUNDED (one
    identical division tree — a final round() would sit on the
    rational grid's own halves).

    Scale shape: identical to mann_kendall_trend — quadratic only in
    the bounded calendar dimension, co-partitioned on status; the
    fact-table scan is one map-side-combined daily aggregate."""
    daily = _daily_status_cents(orders)
    a, b = daily.alias("a"), daily.alias("b")
    slope_c2 = F.floor(
        (F.col("b.c") - F.col("a.c")).cast("double")
        / F.datediff(F.col("b.day"), F.col("a.day")).cast("double")
        * F.lit(100.0)
    ).cast("long")
    # /10000.0: centi-cents/day → dollars/day, one identical division
    return (
        a.join(
            b,
            (F.col("a.status") == F.col("b.status"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .select(F.col("a.status").alias("status"), slope_c2.alias("s_c2"))
        .groupBy("status")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            (F.percentile(F.col("s_c2"), F.lit(0.5)) / F.lit(10000.0)).alias(
                "sen_slope_per_day"
            ),
            (F.percentile(F.col("s_c2"), F.lit(0.25)) / F.lit(10000.0)).alias(
                "slope_q1"
            ),
            (F.percentile(F.col("s_c2"), F.lit(0.75)) / F.lit(10000.0)).alias(
                "slope_q3"
            ),
        )
        .orderBy("status")
    )


def ks_two_sample(orders: DataFrame, n_buckets: int = 1024) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift test between the FIRST
    and LAST order year (Kolmogorov 1933, Smirnov 1939 — public): the
    supremum ECDF distance D, the scaled statistic
    λ = D·√(n₁n₂/(n₁+n₂)), and the α = 0.05 decision (λ > 1.358) — the
    distribution-level companion to ``psi_drift``'s banded score: PSI
    sees mass shifts between fixed bands, KS sees ANY distributional
    change at full resolution.

    Exactness end-to-end: D is computed over integer cents as
    D_int = max |cum₁·n₂ − cum₂·n₁| (cross-multiplied exact integers —
    never a float ECDF), then D = D_int/(n₁·n₂) is one identical
    division and λ multiplies it by a CORRECTLY-ROUNDED sqrt of exact
    integers — bit-identical cross-engine, so even the boolean
    decision cannot flip. No exp()-based p-value on purpose: libm exp
    differs across engines in the last ulp; the fixed-critical-value
    decision is the deterministic contract.

    Scale shape (r19 — the mann_whitney distributed exact-rank
    pattern, closing the last data-scaled unpartitioned WindowExec):
    two conditional counts per distinct cents value (one map-side-
    combined aggregate of the two partition-prunable years), then the
    cumulative ECDF counts come from a TWO-LEVEL cumulative sum —
    per-bucket totals (``n_buckets`` equal-width integer-cents
    buckets) prefix-summed at BUCKET grain (≤ n_buckets rows,
    broadcast), plus a within-bucket running sum windowed BY BUCKET —
    so no single-partition window over the value domain ever
    materializes. The exact cross-multiplied D statistic is unchanged
    (prefix sums are associative). Output is a single row."""
    from pyspark.sql import Window as W

    cents = (F.col("o_totalprice").cast("decimal(18,6)") * 100).cast("long")
    yr = F.year("o_orderdate")
    bounds = orders.agg(
        F.min(yr).alias("y0"), F.max(yr).alias("y1")
    )
    tagged = (
        orders.crossJoin(F.broadcast(bounds))
        .filter((yr == F.col("y0")) | (yr == F.col("y1")))
        .select(
            cents.alias("c"),
            F.when(yr == F.col("y0"), 1).otherwise(0).alias("in1"),
            F.when(yr == F.col("y1"), 1).otherwise(0).alias("in2"),
        )
    )
    per_value = tagged.groupBy("c").agg(
        F.sum("in1").alias("c1"), F.sum("in2").alias("c2")
    )
    totals = per_value.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    vb = per_value.agg(F.min("c").alias("cmin"), F.max("c").alias("cmax"))
    keyed = per_value.crossJoin(F.broadcast(vb)).select(
        "c",
        "c1",
        "c2",
        F.expr(
            f"least({n_buckets - 1}, (c - cmin) * {n_buckets}"
            " div (cmax - cmin + 1))"
        ).alias("bkt"),
    )
    bucket_tot = keyed.groupBy("bkt").agg(
        F.sum("c1").alias("b1"), F.sum("c2").alias("b2")
    )
    woff = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    offsets = bucket_tot.select(  # bucket grain: <= n_buckets rows
        "bkt",
        F.coalesce(F.sum("b1").over(woff), F.lit(0)).alias("off1"),
        F.coalesce(F.sum("b2").over(woff), F.lit(0)).alias("off2"),
    )
    win = (
        W.partitionBy("bkt").orderBy("c").rowsBetween(W.unboundedPreceding, 0)
    )
    cum = (
        keyed.join(F.broadcast(offsets), "bkt")
        .select(
            (F.col("off1") + F.sum("c1").over(win)).alias("cum1"),
            (F.col("off2") + F.sum("c2").over(win)).alias("cum2"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            F.abs(
                F.col("cum1").cast("decimal(38,0)") * F.col("n2")
                - F.col("cum2").cast("decimal(38,0)") * F.col("n1")
            ).alias("d_num"),
            "n1",
            "n2",
        )
    )
    agg = cum.groupBy("n1", "n2").agg(F.max("d_num").alias("d_int"))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    d = F.col("d_int").cast("double") / (n1d * n2d)
    lam = d * F.sqrt(n1d * n2d / (n1d + n2d))
    return agg.select(
        F.col("n1").cast("long").alias("n_first_year"),
        F.col("n2").cast("long").alias("n_last_year"),
        d.alias("d_stat"),
        (F.round(lam, 6) + F.lit(0.0)).alias("ks_lambda"),
        (lam > 1.358).alias("reject_at_05"),
    )


def _daily_cents(orders: DataFrame) -> DataFrame:
    """(day, x): daily total revenue in exact integer cents,
    localCheckpoint-materialized — the ONE shared input of the r13
    sequential screens (page_hinkley_drift, control_chart_monthly,
    ljung_box_test), factored so their quantization can never drift
    apart (the _daily_status_cents precedent, status axis dropped)."""
    return (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,6)") * 100).cast(
                    "long"
                )
            ).alias("x")
        )
        .localCheckpoint()
    )


def cramers_v_screen(orders: DataFrame) -> DataFrame:
    """Cramér's V association strength (Cramér 1946 — public) for two
    categorical attribute pairs of the orders fact: priority × status
    and priority × order-year. The χ² statistic alone scales with N
    and the table size; V = sqrt(χ² / (N·min(r−1, c−1))) normalizes to
    [0, 1], the screen that answers "are these dimensions redundant?"
    before a cube or a stratified sampler treats them as independent
    (companion to ``chi_squared_screen``'s yes/no independence test).

    Determinism: observed counts and marginals are exact integers;
    per-cell χ² contributions are identical double expressions over
    them, rounded 6dp and SUMMED AS DECIMAL (the chi_squared_screen
    discipline — a raw double Σ over cells is accumulation-order
    dependent); V is one sqrt over the exact decimal sum (sqrt is
    IEEE-correctly-rounded, so identical cross-engine).

    Scale shape: per pair, ONE grouped aggregate builds the bounded
    cell table (≤ |prio|·|status| and |prio|·|years|); marginals and
    the total derive from it broadcast-side. Nothing rescans orders
    beyond the two cell aggregates."""

    def _pair(df, a_expr, a_name, b_expr, b_name):
        cells = (
            df.select(a_expr.alias("a"), b_expr.alias("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("observed"))
            .localCheckpoint()  # bounded cell table, 4 consumers
        )
        row_m = cells.groupBy("a").agg(F.sum("observed").alias("row_total"))
        col_m = cells.groupBy("b").agg(F.sum("observed").alias("col_total"))
        grand = cells.agg(
            F.sum("observed").alias("n_total"),
            F.countDistinct("a").alias("r"),
            F.countDistinct("b").alias("c"),
        )
        expected = (
            F.col("row_total").cast("double")
            * F.col("col_total").cast("double")
            / F.col("n_total").cast("double")
        )
        contrib = F.round(
            (F.col("observed") - expected) * (F.col("observed") - expected)
            / expected,
            6,
        )
        per_cell = (
            cells.join(F.broadcast(row_m), "a")
            .join(F.broadcast(col_m), "b")
            .crossJoin(F.broadcast(grand))
            .select(
                contrib.cast("decimal(18,6)").alias("c_dec"),
                "n_total",
                "r",
                "c",
            )
        )
        return per_cell.groupBy("n_total", "r", "c").agg(
            F.sum("c_dec").cast("double").alias("chi2")
        ).select(
            F.lit(f"{a_name}_x_{b_name}").alias("pair"),
            F.col("n_total").cast("long").alias("n"),
            F.col("r").cast("long").alias("r"),
            F.col("c").cast("long").alias("c"),
            ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
            F.round("chi2", 6).alias("chi2"),
            # r19 guard: a single-level dimension makes min(r-1, c-1)
            # zero — chi2 is exactly 0 there but 0/0 is NaN on Spark
            # and NULL on DuckDB; both engines publish NULL V instead
            F.when(
                F.least(F.col("r") - 1, F.col("c") - 1) > 0,
                F.round(
                    F.sqrt(
                        F.col("chi2")
                        / (
                            F.col("n_total")
                            * F.least(F.col("r") - 1, F.col("c") - 1)
                        ).cast("double")
                    ),
                    6,
                ),
            ).alias("cramers_v"),
        )

    p1 = _pair(
        orders,
        F.col("o_orderpriority"),
        "priority",
        F.col("o_orderstatus"),
        "status",
    )
    p2 = _pair(
        orders,
        F.col("o_orderpriority"),
        "priority",
        F.year("o_orderdate").cast("int"),
        "year",
    )
    return p1.unionAll(p2).orderBy("pair")


def page_hinkley_drift(orders: DataFrame) -> DataFrame:
    """Page–Hinkley sequential drift detector (Page 1954, Hinkley 1971
    — public) on the daily total-revenue series, monthly report: the
    two-pass variant with the global mean μ as reference, m_T =
    Σ_{i≤T}(x_i − μ), PH⁺ = m_T − min_{i≤T} m_i (upward drift), PH⁻ =
    max_{i≤T} m_i − m_T (downward), alarm when the excursion exceeds
    λ = 30 mean-days of revenue — the sequential companion to the
    batch drift screens (psi_drift, ks_test): it localizes WHEN the
    level shifted, not just that two windows differ.

    Determinism — the whole recursion in exact integers: with daily
    cents x_i, C = Σx, N = days, the scaled statistic m_T·N =
    S_T·N − T·C is pure BIGINT (S_T the cumulative cents sum, T the
    day index); cumulative min/max of integers are exact; the alarm
    compare PH·N > λ·N reduces to integers (λ·N = 30·C). Published
    ph values are single exact-integer divisions (hash-safe).
    Magnitudes: S_T·N ≲ 5e16 at sf1-scale daily cents — inside int64;
    the oracle mirrors with HUGEINT headroom.

    Scale shape: one map-side daily aggregate, then cumulative windows
    over the DAY series — calendar-bounded (~2.4k rows), never
    SF-scaled, so the unpartitioned window is safe at any corpus size;
    the monthly rollup is a bounded second aggregate."""
    from pyspark.sql import Window as W

    daily = _daily_cents(orders)
    tot = daily.agg(
        F.sum("x").alias("c_total"), F.count("*").alias("n_days")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "x",
        "c_total",
        "n_days",
        F.sum("x").over(w).alias("s_cum"),
        F.row_number().over(W.orderBy("day")).alias("t"),
    )
    m = (F.col("s_cum") * F.col("n_days") - F.col("t") * F.col("c_total")).alias(
        "m_scaled"
    )
    with_m = cum.select("day", "c_total", "n_days", m)
    with_ph = with_m.select(
        "day",
        "c_total",
        "n_days",
        (F.col("m_scaled") - F.min("m_scaled").over(w)).alias("ph_inc_scaled"),
        (F.max("m_scaled").over(w) - F.col("m_scaled")).alias("ph_dec_scaled"),
    )
    lam = 30 * F.col("c_total")  # λ·N: 30 mean-days, exactly scaled
    return (
        with_ph.groupBy(
            F.date_trunc("month", "day").cast("date").alias("month")
        )
        .agg(
            F.count("*").cast("long").alias("n_days"),
            (
                F.max("ph_inc_scaled").cast("double")
                / F.first("n_days").cast("double")
            ).alias("ph_inc_max"),
            (
                F.max("ph_dec_scaled").cast("double")
                / F.first("n_days").cast("double")
            ).alias("ph_dec_max"),
            F.sum(F.when(F.col("ph_inc_scaled") > lam, 1).otherwise(0))
            .cast("long")
            .alias("n_alarm_inc"),
            F.sum(F.when(F.col("ph_dec_scaled") > lam, 1).otherwise(0))
            .cast("long")
            .alias("n_alarm_dec"),
        )
        .orderBy("month")
    )


def ewma_control_chart(
    events: DataFrame, lam: float = 0.2, l_sigma: float = 3.0
) -> DataFrame:
    """EWMA control chart (Roberts 1959, "Control Chart Tests Based on
    Geometric Moving Averages", Technometrics — public): per
    event_type, the hourly mean-value series is smoothed with
    z_t = (1-λ)z_{t-1} + λx_t starting at the burn-in target μ₀, and
    flagged where z crosses the TIME-VARYING limits
    μ₀ ± L·σ·sqrt(λ/(2-λ)·(1-(1-λ)^{2t})) — the small-sustained-shift
    monitor that complements the Shewhart XmR chart (big isolated
    spikes, control_chart_monthly) and CUSUM (cusum_changepoints):
    the classical trio of SPC monitors over a 100 TB metrics rollup.

    Sequential recursion per series → the cusum_changepoints Arrow
    kernel discipline: the input is the (type, hour) pre-aggregate so
    only series-grain state enters the task. Bit-deterministic
    cross-engine end-to-end (the events_cusum toolbox): exact-cents
    hourly mean (one division of exact integers), explicit left-fold
    burn-in μ₀/σ, the z recursion as identical correctly-rounded ops,
    (1-λ)^{2t} as a REPEATED-MULTIPLICATION fold (never libm pow,
    which differs in the last ulp across engines), sqrt correctly
    rounded, violations by strict compares, values published
    UNROUNDED — the DuckDB oracle replays z and the limit per row via
    prefix list_reduce, hash-exact."""
    import numpy as np
    import pandas as pd

    from datalake_local_spark.operators.windows import _hourly_exact_mean

    hourly = _hourly_exact_mean(events)
    one_m = 1.0 - lam
    w_step = one_m * one_m

    def kernel(key, pdf):
        pdf = pdf.sort_values("hour").reset_index(drop=True)
        x = pdf["mean_value"].to_numpy(dtype=np.float64)
        burn = x[: min(24, len(x))]
        s = 0.0
        for v in burn:
            s = s + v
        mu = s / len(burn)
        ss = 0.0
        for v in burn:
            d = v - mu
            ss = ss + d * d
        sd = max(float(np.sqrt(ss / len(burn))), 1e-12)
        z = mu
        w = 1.0
        rows = []
        for i, v in enumerate(x):
            z = one_m * z + lam * v
            w = w * w_step
            hw = (l_sigma * sd) * np.sqrt((lam / (2.0 - lam)) * (1.0 - w))
            if z > mu + hw or z < mu - hw:
                rows.append(
                    (
                        key[0],
                        pdf["hour"].iloc[i],
                        float(z),
                        "high" if z > mu + hw else "low",
                        float(mu + hw) if z > mu + hw else float(mu - hw),
                    )
                )
        return pd.DataFrame(
            rows,
            columns=[
                "event_type",
                "hour",
                "ewma_z",
                "side",
                "violated_limit",
            ],
        )

    return hourly.groupBy("event_type").applyInPandas(
        kernel,
        "event_type string, hour timestamp, ewma_z double, "
        "side string, violated_limit double",
    )


def control_chart_monthly(orders: DataFrame) -> DataFrame:
    """Shewhart individuals/moving-range control chart (Shewhart 1931;
    the XmR chart, public) on daily total revenue, reported monthly:
    center line x̄ = C/N, average moving range M̄R, control limits
    x̄ ± 2.66·M̄R (the d₂-derived XmR constant), and per month how many
    days broke each limit — the process-stability view that separates
    common-cause variation from assignable shifts before anyone chases
    a "spike" that is in-control noise.

    Determinism: daily cents are exact integers; MR_i = |x_i − x_{i−1}|
    is exact; the limit test avoids ALL float arithmetic by cross
    multiplication — x_i > x̄ + 2.66·M̄R ⟺
    (x_i·N − C)·100·N_mr > 266·MR_C·N with every factor BIGINT
    (subtract-first keeps products ≲ 2.4e18 at sf1-scale cents; the
    oracle carries HUGEINT headroom). Published center/limit columns
    are identical double expression trees over the exact integers.

    Scale shape: one map-side daily aggregate; one lag over the
    calendar-bounded day series (unpartitioned but never SF-scaled);
    bounded monthly rollup."""
    from pyspark.sql import Window as W

    daily = _daily_cents(orders)
    with_mr = daily.select(
        "day",
        "x",
        F.abs(F.col("x") - F.lag("x").over(W.orderBy("day"))).alias("mr"),
    )
    tot = with_mr.agg(
        F.sum("x").alias("c"),
        F.count("*").alias("n"),
        F.sum("mr").alias("mr_c"),
        F.count("mr").alias("n_mr"),
    )
    j = with_mr.crossJoin(F.broadcast(tot))
    # (x·N − C)·100·N_mr vs ±266·MR_C·N — pure BIGINT on both engines
    dev = (F.col("x") * F.col("n") - F.col("c")) * 100 * F.col("n_mr")
    lim = 266 * F.col("mr_c") * F.col("n")
    return (
        j.groupBy(F.date_trunc("month", "day").cast("date").alias("month"))
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum(F.when(dev > lim, 1).otherwise(0))
            .cast("long")
            .alias("n_above_ucl"),
            F.sum(F.when(-dev > lim, 1).otherwise(0))
            .cast("long")
            .alias("n_below_lcl"),
            (F.first("c").cast("double") / F.first("n").cast("double")).alias(
                "center_cents"
            ),
            (
                F.first("mr_c").cast("double")
                / F.first("n_mr").cast("double")
            ).alias("mrbar_cents"),
        )
        .orderBy("month")
    )


def ljung_box_test(orders: DataFrame, h: int = 7) -> DataFrame:
    """Ljung–Box portmanteau autocorrelation test (Ljung & Box 1978 —
    public) on the daily total-revenue series: Q = n(n+2)·Σ_{k≤h}
    ρ_k²/(n−k) over the first ``h`` lags — the "is there structure
    left?" screen behind seasonality fits (events_stl_decompose) and
    the i.i.d. assumption every bootstrap CI quietly makes
    (dq_bootstrap_ci). Published with the per-lag autocorrelations so
    the report shows WHICH lag carries the signal (lag 7 = weekly).

    Determinism: with daily cents x, deviations are scaled exact
    integers dev_i = x_i·n − C (DECIMAL(38,0)/HUGEINT — dev² sums
    reach ~1e27 at sf1-scale, far inside 38 digits); every ρ_k is ONE
    double division of two exact integer sums (the n² scale cancels),
    and Q sums its h terms in ONE FIXED-ORDER expression tree (not an
    aggregate — float aggregation order is the audited hazard). The
    one conversion that crosses 2⁵³ — the exact integer sums → double
    — is CORRECTLY ROUNDED on both engines by construction: Spark's
    decimal→double is BigDecimal.doubleValue; the oracle routes
    DuckDB's hugeint through VARCHAR (strtod), because the native
    hugeint→double cast double-rounds via double(upper)·2⁶⁴ +
    double(lower) and can land one ulp off.

    Scale shape: one map-side daily aggregate; h lead() columns over
    the calendar-bounded day series (unpartitioned window, never
    SF-scaled); ONE aggregate row out."""
    from pyspark.sql import Window as W

    daily = _daily_cents(orders)
    tot = daily.agg(F.sum("x").alias("c"), F.count("*").alias("n"))
    w = W.orderBy("day")
    dev = (
        F.col("x").cast("decimal(38,0)") * F.col("n") - F.col("c")
    ).alias("dev")
    staged = daily.crossJoin(F.broadcast(tot)).select(
        "day", "n", dev
    )
    with_leads = staged.select(
        "n",
        "dev",
        *[F.lead("dev", k).over(w).alias(f"dev_{k}") for k in range(1, h + 1)],
    )
    agg = with_leads.groupBy("n").agg(
        F.sum(F.col("dev") * F.col("dev")).alias("den"),
        *[
            F.sum(F.col("dev") * F.col(f"dev_{k}")).alias(f"num_{k}")
            for k in range(1, h + 1)
        ],
    )
    # r19 guard (ANSI division-by-zero class): a constant daily series
    # (or a single day) zeroes the deviation denominator — previously a
    # hard DIVIDE_BY_ZERO under Spark 4's default ANSI mode where the
    # oracle's x/0 NULLs; both engines now publish NULL rho/Q.
    rho = [
        F.when(
            F.col("den") > 0,
            F.col(f"num_{k}").cast("double") / F.col("den").cast("double"),
        )
        for k in range(1, h + 1)
    ]
    nd = F.col("n").cast("double")
    q = nd * (nd + 2)
    terms = rho[0] * rho[0] / (nd - 1)
    for k in range(2, h + 1):
        terms = terms + rho[k - 1] * rho[k - 1] / (nd - F.lit(float(k)))
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        *[rho[k - 1].alias(f"rho_{k}") for k in range(1, h + 1)],
        (q * terms).alias("q_stat"),
    )


#: chi-square 0.95 quantile at 6 dof — the standard Ljung-Box cutoff
#: for h = 6 lags (Ljung & Box 1978 use the chi2(h) null). Embedded as
#: the same decimal string in the DuckDB oracle (CAST(str AS DOUBLE) =
#: strtod = python float parse → identical double), so the reject flag
#: compares bit-identical statistics against the identical constant.
_CHI2_95_DOF6 = 12.591587243743977

#: tabulated chi2 0.95 cutoffs by dof — lb_reject must use the cutoff
#: matching ``h`` (r16 review find: a parameterized h with a hardcoded
#: dof-6 cutoff silently mis-flags); untabulated h raises instead of
#: guessing.
_CHI2_95 = {6: _CHI2_95_DOF6}


def hw_residual_ljung_box(events: DataFrame, h: int = 6) -> DataFrame:
    """Forecast-residual diagnostics: the Ljung-Box portmanteau test
    (Ljung & Box 1978) applied to the ONE-STEP-AHEAD residuals of the
    Holt-Winters additive fit (windows.holt_winters_forecast) — the
    textbook "is there structure the seasonal fit missed?" check that
    closes the forecasting family (EWMA → Holt → Holt-Winters →
    residual diagnostics). A well-specified fit leaves white-noise
    residuals: significant lag-k autocorrelation means the smoothing
    constants or the period are wrong. One row per event_type series:
    n_obs, rho_1..rho_h, Q, and the chi2(h) 5% reject flag.

    Determinism (the r15/r16 fold toolbox, applied to DOUBLE inputs):
    the residuals are already bit-identical cross-engine (the
    events_holt_winters recursion), and every aggregate here is an
    EXPLICIT LEFT FOLD over the hour-ordered residual list — mean,
    squared-deviation denominator, and each lag-k cross product
    (zip_with over aligned slices) start from 0.0 and add in series
    order, so Spark's aggregate() and DuckDB's list_reduce(prepend)
    produce the same doubles bit-for-bit; each rho_k is ONE double
    division, Q is one fixed-shape expression tree, and nothing is
    rounded (unrounded doubles are the hash-safe form). Engine-ordered
    float aggregation — the audited hazard — never occurs.

    Scale shape: the fit is the existing applyInPandas recursion (per
    event_type partitions); the diagnostics collapse each series to
    ONE row via collect_list over the (bounded-by-calendar) hourly
    grain — a per-series fold, never a global window. At 100 TB the
    series count scales, not the series length, and each fold stays
    a few thousand doubles."""
    from datalake_local_spark.operators.windows import holt_winters_forecast

    if h not in _CHI2_95:
        raise ValueError(
            f"no tabulated chi2(0.95) cutoff for h={h}; add it to"
            " _CHI2_95 (the reject flag must match the lag count)"
        )
    crit = _CHI2_95[h]
    hw = holt_winters_forecast(events)
    per = (
        hw.groupBy("event_type")
        .agg(
            F.array_sort(F.collect_list(F.struct("hour", "error"))).alias(
                "pts"
            )
        )
        .select(
            "event_type", F.expr("transform(pts, p -> p.error)").alias("errs")
        )
        .withColumn("n_obs", F.size("errs"))
        .filter(F.col("n_obs") > h)
        .withColumn(
            "m",
            F.expr("aggregate(errs, 0D, (a, x) -> a + x)")
            / F.col("n_obs").cast("double"),
        )
        .withColumn("devs", F.expr("transform(errs, x -> x - m)"))
        .withColumn(
            "den",
            F.expr(
                "aggregate(transform(devs, d -> d * d), 0D,"
                " (a, x) -> a + x)"
            ),
        )
    )
    for k in range(1, h + 1):
        per = per.withColumn(
            f"num_{k}",
            F.expr(
                f"aggregate(zip_with(slice(devs, 1, n_obs - {k}),"
                f" slice(devs, {k + 1}, n_obs - {k}),"
                " (a, b) -> a * b), 0D, (a, x) -> a + x)"
            ),
        )
    # r19 guard: perfectly-fit (constant-residual) series zero den —
    # NULL rho/Q/reject on both engines instead of an ANSI crash
    rho = [
        F.when(F.col("den") > 0, F.col(f"num_{k}") / F.col("den"))
        for k in range(1, h + 1)
    ]
    nd = F.col("n_obs").cast("double")
    terms = rho[0] * rho[0] / (nd - 1)
    for k in range(2, h + 1):
        terms = terms + rho[k - 1] * rho[k - 1] / (nd - F.lit(float(k)))
    q = (nd * (nd + 2)) * terms
    return per.select(
        "event_type",
        F.col("n_obs").cast("long").alias("n_obs"),
        *[rho[k - 1].alias(f"rho_{k}") for k in range(1, h + 1)],
        q.alias("q_stat"),
        (q > F.lit(crit)).alias("lb_reject"),
    )


def cross_series_correlation(events: DataFrame) -> DataFrame:
    """Pairwise Pearson correlation matrix of the hourly event-type
    series — the cross-SERIES analytic the per-series screens (EWMA,
    CUSUM, Holt) don't cover: which activity streams move together
    (clicks ↔ purchases coupling, error bursts anti-correlated with
    views). One row per unordered type pair over their COMMON hours.

    Determinism (the dq_ljung_box integer discipline, pair-joined):
    the hourly series are exact integer cents sums; Pearson is the
    textbook five-sum identity r = (nΣab − ΣaΣb) /
    (sqrt(nΣa² − (Σa)²)·sqrt(nΣb² − (Σb)²)) with every sum an EXACT
    integer (DECIMAL(38,0) Spark-side, HUGEINT oracle-side; products
    ~1e18 at sf1-scale, far inside 38 digits — order-invariant, so the
    shuffle may aggregate in any order). Three conversions cross to
    double — num and the two variance terms — each correctly rounded
    (Spark BigDecimal.doubleValue; the oracle routes DuckDB's HUGEINT
    through VARCHAR/strtod, whose native cast can land one ulp off);
    then two correctly-rounded sqrts and one division, identical op
    shape both engines → bit-identical unrounded r.

    Scale shape: one map-side hourly aggregate, one self-join keyed on
    the (calendar-bounded) hour spine — pair fanout is types², never
    data-sized; the five sums reduce map-side. Constant series
    (zero variance) drop out with an exact integer guard, not a float
    epsilon."""
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.sum(
            (F.col("value").cast("decimal(18,6)") * 100).cast("long")
        ).alias("x")
    )
    a = hourly.select(
        F.col("event_type").alias("type_a"), "hour", F.col("x").alias("xa")
    )
    b = hourly.select(
        F.col("event_type").alias("type_b"), "hour", F.col("x").alias("xb")
    )
    d38 = "decimal(38,0)"
    sums = (
        a.join(b, "hour")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").alias("n_hours"),
            F.sum(F.col("xa").cast(d38)).alias("sa"),
            F.sum(F.col("xb").cast(d38)).alias("sb"),
            # multiply IN decimal(38,0): a BIGINT*BIGINT product wraps
            # silently past 2^63 (hourly cents ~1e10 at sf1000 -> 1e20
            # products); the oracle mirrors with HUGEINT multiplies
            F.sum(F.col("xa").cast(d38) * F.col("xb").cast(d38)).alias("sab"),
            F.sum(F.col("xa").cast(d38) * F.col("xa").cast(d38)).alias("saa"),
            F.sum(F.col("xb").cast(d38) * F.col("xb").cast(d38)).alias("sbb"),
        )
    )
    n = F.col("n_hours").cast(d38)
    num = n * F.col("sab") - F.col("sa") * F.col("sb")
    dena = n * F.col("saa") - F.col("sa") * F.col("sa")
    denb = n * F.col("sbb") - F.col("sb") * F.col("sb")
    return (
        sums.select(
            "type_a",
            "type_b",
            F.col("n_hours").cast("long").alias("n_hours"),
            num.alias("num"),
            dena.alias("dena"),
            denb.alias("denb"),
        )
        # exact integer guard: either series constant on the common
        # spine -> correlation undefined, row dropped
        .filter((F.col("dena") > 0) & (F.col("denb") > 0))
        .select(
            "type_a",
            "type_b",
            "n_hours",
            (
                F.col("num").cast("double")
                / (
                    F.sqrt(F.col("dena").cast("double"))
                    * F.sqrt(F.col("denb").cast("double"))
                )
            ).alias("pearson_r"),
        )
    )


#: F(dof1=4, dof2=inf) 0.95 cutoff = chi2(0.95, 4) / 4 — derivable
#: from the published chi-square table (9.487729 / 4; Abramowitz &
#: Stegun 26.8), pinned at 4dp. Embedded as the same decimal string in
#: the DuckDB oracle so the decision compares bit-identical statistics
#: against the identical constant (the _CHI2_95_DOF6 precedent).
#: dq_levene's orders fixture always yields 5 priority groups -> dof1
#: = 4; the full dof1 = 1..9 row covers any other observed group count
#: (r19 advice #2: look the cutoff up by the COMPUTED k-1, never
#: hard-wire dof 4). Values are the large-sample asymptote
#: F(0.95; d, inf) = chi2(0.95, d)/d (Abramowitz & Stegun 26.8 —
#: exact for the N >> k fixtures this screen runs on); outside the
#: table the decision publishes NULL rather than a silently-wrong
#: cutoff (the r16 ljung-box cutoff lesson).
_F95 = {
    1: 3.8415,
    2: 2.9957,
    3: 2.6049,
    4: 2.3719,
    5: 2.2141,
    6: 2.0986,
    7: 2.0096,
    8: 1.9384,
    9: 1.8799,
}


def levene_variance_screen(orders: DataFrame) -> DataFrame:
    """Brown–Forsythe / Levene variance-equality screen (Levene 1960;
    Brown & Forsythe 1974, "Robust Tests for the Equality of
    Variances", JASA — public) across the order-priority classes on
    order price: the one-way ANOVA F statistic over MEDIAN-based
    absolute deviations z_ij = |x_ij − med_i| — the robust "are the
    group variances even comparable?" gate that belongs in front of
    ``ab_welch_ttest``'s mean comparison (Welch tolerates unequal
    variances; Levene tells you HOW unequal, and a pooled-variance
    consumer whether pooling is defensible at all).

    Exactness: per-group medians use the ×2-median order statistic
    (the runs_test idiom — one row for odd n, the two-middle sum for
    even n, all integer cents), so deviations d_ij = |2c_ij − m2_i|
    are EXACT integers at ×2 scale; n_i, Σd, Σd² are DECIMAL(38,0)/
    HUGEINT sums (order-invariant), and W = ((N−k)/(k−1)) · SSB/SSW
    with SSB = Σs_i²/n_i − S²/N, SSW = Q − Σs_i²/n_i is one identical
    IEEE double tree over those exact integers (4dp — sqrt-free but
    division-derived, never on a grid half).

    Degenerate guards (built in from the start — the r19 ANSI audit
    class): k = 1 (single priority class) zeroes k−1; N = k (every
    group a single row) zeroes both N−k and every SSW term; constant
    groups zero SSW alone. All publish NULL W/decision through nested
    lazy whens, with the oracle branching on the same exact-integer
    conditions.

    Scale shape: one map-side grouped aggregate for counts, one
    rank-window per group for the median (priority-partitioned — a
    bounded class dimension, never a global window), one deviation
    aggregate, a k-row reduce. Nothing rescans orders beyond the two
    grouped passes."""
    from pyspark.sql import Window as W

    cents = (F.col("o_totalprice").cast("decimal(18,6)") * 100).cast("long")
    base = orders.select(F.col("o_orderpriority").alias("grp"), cents.alias("c"))
    nd = base.groupBy("grp").agg(F.count("*").alias("n"))
    wd = W.partitionBy("grp").orderBy("c", "grp")
    ordered = base.select(
        "grp", "c", F.row_number().over(wd).alias("rk")
    ).join(nd, "grp")
    med2 = (
        ordered.filter(
            (F.col("rk") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rk") == F.floor(F.col("n") / 2) + 1)
        )
        .groupBy("grp")
        .agg(F.sum("c").alias("msum"), F.count("*").alias("mcnt"))
        .select(
            "grp",
            F.when(F.col("mcnt") == 1, 2 * F.col("msum"))
            .otherwise(F.col("msum"))
            .alias("m2"),
        )
    )
    dev = (
        base.join(med2, "grp")
        .select("grp", F.abs(2 * F.col("c") - F.col("m2")).alias("d"))
    )
    dd = F.col("d").cast("decimal(38,0)")
    g = dev.groupBy("grp").agg(
        F.count("*").alias("ni"),
        F.sum(dd).alias("si"),
        F.sum(dd * dd).alias("qi"),
    )
    agg = g.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("ni").cast("long").alias("n_total"),
        F.sum(F.col("si").cast("double") * F.col("si").cast("double")
              / F.col("ni").cast("double")).alias("ssb_part"),
        F.sum(F.col("si")).cast("double").alias("s_all"),
        F.sum(F.col("qi")).cast("double").alias("q_all"),
    )
    n_f = F.col("n_total").cast("double")
    k_f = F.col("k").cast("double")
    ssb = F.col("ssb_part") - F.col("s_all") * F.col("s_all") / n_f
    ssw = F.col("q_all") - F.col("ssb_part")
    w_stat = ((n_f - k_f) / (k_f - 1.0)) * (ssb / ssw)
    wr = F.round(w_stat, 4) + F.lit(0.0)
    # cutoff looked up by the COMPUTED dof1 = k-1 (r19 advice #2); a
    # when-chain over the shared _F95 table — NULL past the table, so
    # an unforeseen group count yields a NULL decision, never a wrong
    # one. The chain mirrors the oracle's CASE chain term-for-term.
    crit = F.lit(None).cast("double")
    for dof in sorted(_F95, reverse=True):
        crit = F.when(F.col("k") == dof + 1, F.lit(_F95[dof])).otherwise(crit)
    return agg.select(
        "k",
        "n_total",
        # nested lazy guards (the r19 codegen rule): the size checks
        # must pass before ssw's own derivation divides anything, and
        # ssw > 0 must gate the final division
        F.when(
            (F.col("k") >= 2) & (F.col("n_total") > F.col("k")),
            F.when(ssw > 0, wr),
        ).alias("w_stat"),
        F.when(
            (F.col("k") >= 2) & (F.col("n_total") > F.col("k")) & (ssw > 0),
            wr >= crit,
        ).alias("unequal_at_05"),
    )


#: chi2(0.95, 2) = 5.9915 (4dp; Abramowitz & Stegun 26.8 — the
#: Jarque-Bera null is asymptotically chi-square with 2 dof). Same
#: decimal embedded in the oracle (the _CHI2_95_DOF6 precedent).
_CHI2_95_DOF2 = 5.9915


def jarque_bera_screen(orders: DataFrame) -> DataFrame:
    """Jarque–Bera normality screen (Jarque & Bera 1980, "Efficient
    tests for normality, homoscedasticity and serial independence of
    regression residuals", Economics Letters — public) of order price
    per priority class: JB = n·(g₁²/6 + g₂²/24) over the population
    skewness g₁ = m₃/m₂^1.5 and excess kurtosis g₂ = m₄/m₂² − 3 —
    the "is a Gaussian assumption even on the table?" gate in front of
    every z/t-based screen on this shelf (``ab_welch_ttest``,
    ``dq_levene`` and the control charts all quietly lean on
    approximate normality; JB says per class how hard they lean).

    Exactness: the four power sums are DECIMAL(38,0)/HUGEINT sums of
    integer cents (order-invariant; c⁴ ≤ ~1e28 at test price scales —
    inside 38 digits), the central-moment/JB chain is ONE identical
    IEEE double tree over them (4dp — sqrt/ratio-derived, never on a
    grid half), and the decision compares the bit-identical statistic
    against the chi²(2) cutoff embedded as the same decimal string in
    both engines.

    Degenerate guards (built in — the r19 ANSI audit class): a
    constant class has m₂ exactly 0 (or float-cancelled a hair
    negative) and a 1-row class trivially so — both publish NULL
    JB/decision through a branch on the SAME double both engines
    compute. Nothing else divides by data.

    Scale shape: ONE grouped aggregate (map-side combined power sums)
    and map-only arithmetic on the k-row result — no window, no
    second scan, skew-free (the class dimension is bounded)."""
    c = (F.col("o_totalprice").cast("decimal(18,6)") * 100).cast("long")
    cd = c.cast("decimal(38,0)")
    g = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("nl"),
        F.sum(cd).alias("s1"),
        F.sum(cd * cd).alias("s2"),
        F.sum(cd * cd * cd).alias("s3"),
        F.sum(cd * cd * cd * cd).alias("s4"),
    )
    n = F.col("nl").cast("double")
    s1, s2, s3, s4 = (F.col(x).cast("double") for x in ("s1", "s2", "s3", "s4"))
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - 3 * mean * s2 / n + 2 * mean * mean * mean
    m4 = (
        s4 / n
        - 4 * mean * s3 / n
        + 6 * mean * mean * s2 / n
        - 3 * mean * mean * mean * mean
    )
    g1 = m3 / F.pow(m2, 1.5)
    g2 = m4 / (m2 * m2) - 3.0
    jb = n * (g1 * g1 / 6.0 + g2 * g2 / 24.0)
    jbr = F.round(jb, 4) + F.lit(0.0)
    gm = m2 > 0
    return g.select(
        "priority",
        F.col("nl").cast("long").alias("n_orders"),
        F.when(gm, F.round(g1, 4) + F.lit(0.0)).alias("skew"),
        F.when(gm, F.round(g2, 4) + F.lit(0.0)).alias("kurt_excess"),
        F.when(gm, jbr).alias("jb_stat"),
        F.when(gm, jbr >= F.lit(_CHI2_95_DOF2)).alias("non_normal_at_05"),
    ).orderBy("priority")
