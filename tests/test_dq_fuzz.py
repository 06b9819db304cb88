"""Cross-engine fuzz for the orders-based dq screens (r19).

The ANSI division-by-zero audit proved the hash gate's blind spot:
benchmark data never produces the degenerate shapes (1-row groups,
constant columns, single classes, two-day calendars) where an
unguarded kernel crashes or diverges from its oracle. This fuzzer
closes the loop mechanically — seeded random TINY orders tables with
the degeneracy knobs turned way up, each query run through BOTH
engines (the Spark kernel and the committed oracle SQL over the same
rows registered in DuckDB) and compared row-for-row. The oracles are
designed hash-exact, so the comparison is EXACT (same IEEE trees →
same doubles; the +0.0 normalization already handles signed zero).

Runtime: tiny frames, a handful of seeds — seconds per query."""

from __future__ import annotations

import datetime as dt
import math
import random

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as em
from datalake_local_spark.operators import quality

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]

#: query name -> kernel callable over the orders DataFrame. Every
#: entry must also exist in oracle_sql(). Keep to orders-input screens
#: (one generator serves all).
DQ_ORDERS = {
    "dq_benford": quality.benford_profile,
    "dq_ks_test": quality.ks_two_sample,
    "dq_mann_whitney": quality.mann_whitney_u,
    "dq_runs_test": quality.runs_test,
    "dq_pettitt_changepoint": quality.pettitt_changepoint,
    "dq_mann_kendall": quality.mann_kendall_trend,
    "dq_ljung_box": quality.ljung_box_test,
    "dq_cramers_v": quality.cramers_v_screen,
    "dq_levene": quality.levene_variance_screen,
    "dq_control_chart": quality.control_chart_monthly,
    "dq_theil_sen": quality.theil_sen_slope,
    "dq_page_hinkley": quality.page_hinkley_drift,
    "dq_jarque_bera": quality.jarque_bera_screen,
    "dq_psi_drift": quality.psi_drift,
    "dq_bootstrap_ci": quality.bootstrap_mean_ci,
}

#: events-input screens (welch/cuped/chi2/ewma take the events table)
DQ_EVENTS = {
    "dq_ab_ttest": quality.ab_welch_ttest,
    "dq_cuped": quality.cuped_adjustment,
    "dq_chi_squared": quality.chi_squared_screen,
    "dq_ewma_chart": quality.ewma_control_chart,
}


def _random_orders(rng: random.Random):
    """A tiny orders table with degeneracy knobs: tiny row counts,
    constant-price regimes, collapsed priority/status/date domains."""
    n = rng.choice([1, 2, 3, 5, 8, 13, 21])
    const_price = rng.random() < 0.4
    one_prio = rng.random() < 0.35
    one_status = rng.random() < 0.35
    few_days = rng.random() < 0.5
    base = dt.date(2023, 1, 1)
    rows = []
    for i in range(n):
        price = 250.0 if const_price else round(rng.uniform(1, 5000), 2)
        prio = PRIORITIES[0] if one_prio else rng.choice(PRIORITIES)
        status = STATUSES[0] if one_status else rng.choice(STATUSES)
        day = base + dt.timedelta(days=rng.randint(0, 2 if few_days else 400))
        rows.append((i + 1, prio, status, day, price))
    return rows


def _norm(rows):
    """Order-insensitive, NaN-tolerant normal form of a result set."""
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(v + 0.0)  # normalize -0.0
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def _random_events(rng: random.Random):
    """A tiny events table with the same degeneracy knobs: single
    event type (empty welch complement), constant values (zero
    variances), one-user regimes (1-user cuped arms), collapsed
    timelines."""
    n = rng.choice([1, 2, 3, 5, 8, 13, 21])
    const_value = rng.random() < 0.4
    one_type = rng.random() < 0.35
    one_user = rng.random() < 0.35
    t0 = dt.datetime(2024, 3, 1)
    types = ["click", "view", "purchase"]
    rows = []
    for i in range(n):
        rows.append((
            i + 1,
            t0 + dt.timedelta(hours=rng.randint(0, 3 if rng.random() < 0.5 else 200)),
            7 if one_user else rng.randint(1, 4),
            types[0] if one_type else rng.choice(types),
            50.0 if const_value else round(rng.uniform(0, 500), 2),
            "{}",
        ))
    return rows


@pytest.mark.parametrize("name", sorted(DQ_EVENTS))
def test_dq_events_fuzz_cross_engine(spark, name):
    fn = DQ_EVENTS[name]
    sql = em.oracle_sql()[name]
    rng = random.Random(hash(name) & 0xFFFF)
    for trial in range(5):
        rows = _random_events(rng)
        sdf = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        got = _norm(tuple(r) for r in fn(sdf).collect())
        con = duckdb.connect()
        con.register(
            "events",
            pd.DataFrame(rows, columns=[
                "event_id", "ts", "user_id", "event_type", "value", "props"]),
        )
        want = _norm(con.execute(sql).fetchall())
        assert got == want, (
            f"{name} trial {trial}: cross-engine divergence on\n{rows}\n"
            f"spark={got}\noracle={want}"
        )


def _docs_registry():
    from datalake_local_spark.llm import dedup as lm_dedup
    from datalake_local_spark.llm import text as lm_text

    return {
        "dedup_exact": lm_dedup.exact_dedup,
        "dedup_exact_substring": lm_dedup.exact_substring_spans,
        "dedup_substring_probe": lm_dedup.exact_substring_probe,
        "dedup_substring_clean": lm_dedup.exact_substring_clean,
        "dedup_substring_hashed": lm_dedup.exact_substring_spans_hashed,
        "text_quality": lm_text.quality_scores,
        "text_token_stats": lm_text.token_stats,
        "text_lang_id": lm_text.language_id,
        "text_fingerprint": lm_text.fingerprints,
    }


def _random_documents(rng: random.Random):
    """Tiny documents tables stressing the text-family edge shapes:
    EMPTY strings, whitespace-only, single chars, punctuation-only,
    NULL text, verbatim duplicates, and ordinary short prose."""
    shapes = [
        "", "   ", "\t \n", "a", "!!!", "a b", "the the the the the",
        "the quick brown fox jumps over the lazy dog",
        "spark sql window join merge " * 3,
        # r20: self-overlapping periodic runs longer than SUBSTR_K —
        # the ExactSubstr gram-grain self-overlap semantics must agree
        # across engines, not only on prose-shaped corpora
        "ab" * 40,
        "z" * 80,
        None,
    ]
    n = rng.choice([1, 2, 4, 7, 12])
    rows = []
    for i in range(n):
        if rng.random() < 0.25 and rows:
            t = rows[rng.randrange(len(rows))][1]  # verbatim duplicate
        else:
            t = rng.choice(shapes)
        rows.append((i, t, rng.choice(["en", "es", "xx"]),
                     rng.choice(["web", "books"]),
                     len(t) if t is not None else None))
    return rows


@pytest.mark.parametrize("name", sorted(_docs_registry()))
def test_docs_fuzz_cross_engine(spark, name):
    fn = _docs_registry()[name]
    sql = em.oracle_sql()[name]
    rng = random.Random(hash(name) & 0xFFFF)
    for trial in range(5):
        rows = _random_documents(rng)
        sdf = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        got = _norm(tuple(r) for r in fn(sdf).collect())
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(rows, columns=[
            "doc_id", "text", "lang", "source", "n_chars"]))
        want = _norm(con.execute(sql).fetchall())
        assert got == want, (
            f"{name} trial {trial}: cross-engine divergence on\n{rows}\n"
            f"spark={got}\noracle={want}"
        )


#: lineitem-input aggregate screens hardened in r19
AGG_LINEITEM = {}


def _agg_lineitem_registry():
    from datalake_local_spark.operators import aggregates as agg

    return {
        "agg_regression_funcs": agg.regression_family,
        "agg_higher_moments": agg.higher_moment_family,
        "agg_weighted_median": agg.weighted_median_family,
    }


def _random_lineitem(rng: random.Random):
    """Tiny lineitem with the degenerate shapes the r19 aggregate
    guards exist for: 1-row flags, constant quantities (dxx = 0),
    constant prices (m2 = 0, dyy = 0)."""
    n = rng.choice([1, 2, 3, 5, 8, 13])
    const_qty = rng.random() < 0.4
    const_price = rng.random() < 0.4
    one_flag = rng.random() < 0.35
    rows = []
    for i in range(n):
        rows.append((
            "N" if one_flag else rng.choice(["A", "N", "R"]),
            rng.choice(["F", "O"]),
            3.0 if const_qty else float(rng.randint(1, 50)),
            199.0 if const_price else round(rng.uniform(10, 9000), 2),
        ))
    return rows


@pytest.mark.parametrize("name", ["agg_regression_funcs",
                                  "agg_higher_moments",
                                  "agg_weighted_median"])
def test_agg_fuzz_cross_engine(spark, name):
    fn = _agg_lineitem_registry()[name]
    sql = em.oracle_sql()[name]
    rng = random.Random(hash(name) & 0xFFFF)
    for trial in range(5):
        rows = _random_lineitem(rng)
        sdf = spark.createDataFrame(
            rows,
            "l_returnflag string, l_linestatus string, l_quantity double,"
            " l_extendedprice double",
        )
        got = _norm(tuple(r) for r in fn(sdf).collect())
        con = duckdb.connect()
        con.register("lineitem", pd.DataFrame(rows, columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"]))
        want = _norm(con.execute(sql).fetchall())
        assert got == want, (
            f"{name} trial {trial}: cross-engine divergence on\n{rows}\n"
            f"spark={got}\noracle={want}"
        )


def test_agg_rounding_tie_pinned_cross_engine(spark):
    """The salted fuzzer's r20 find, pinned as a deterministic case:
    both 2-row groups here have a population stddev of exactly
    |a-b|/200 — a 3-decimal rational ending in 5 (1246.975, 135.265).
    At the old 2dp publish, Spark's round (half-up on the double's
    SHORTEST decimal repr, "…975") went UP while DuckDB's (on the true
    binary value, a hair below the midpoint) went DOWN. The 6dp
    publish is exact on that grid; this fixture must stay cross-engine
    equal for both affected families."""
    rows = [("N", "F", 12.0, 7754.64), ("A", "O", 27.0, 1939.27),
            ("R", "F", 18.0, 5966.71), ("N", "O", 3.0, 5260.69),
            ("R", "F", 41.0, 5696.18)]
    sdf = spark.createDataFrame(
        rows,
        "l_returnflag string, l_linestatus string, l_quantity double,"
        " l_extendedprice double",
    )
    con = duckdb.connect()
    con.register("lineitem", pd.DataFrame(rows, columns=[
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"]))
    reg = _agg_lineitem_registry()
    for name in ("agg_higher_moments", "agg_regression_funcs"):
        got = _norm(tuple(r) for r in reg[name](sdf).collect())
        want = _norm(con.execute(em.oracle_sql()[name]).fetchall())
        assert got == want, f"{name}: {got} != {want}"
    moments = {r[0]: r for r in reg["agg_higher_moments"](sdf).collect()}
    assert moments["N"]["stddev_pop"] == 1246.975
    assert moments["R"]["stddev_pop"] == 135.265


def _streaming_registry():
    """Streaming kernels drivable from one events.parquet file, each
    with a committed oracle reading only the events table."""
    import __spark_entry__ as entrymod

    q = entrymod._all_queries()
    return {
        n: q[n]
        for n in (
            "streaming_sessionize",
            "streaming_sliding",
            "streaming_dedup",
            "streaming_stream_join",
            "streaming_stateful_counter",
            "streaming_foreachbatch_upsert",
        )
    }


def _random_stream_events(rng: random.Random):
    """Seeded degenerate micro-batch shapes for the streaming kernels
    (r19 verdict #4): EMPTY stream, single event, zero-gap sessions
    (identical timestamps), sub-second gaps, an in-batch late straggler
    far behind the watermark lag, and multi-day spreads. Event types
    biased toward click/purchase so the stream-stream join carries
    real load. Values stay non-NULL (the events-table contract the
    kernels run on)."""
    shape = rng.choice(
        ["empty", "single", "zero_gap", "subsecond", "straggler", "spread"]
    )
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    types = ["click", "purchase", "view"]
    rows = []
    if shape == "empty":
        n = 0
    elif shape == "single":
        n = 1
    else:
        n = rng.choice([2, 3, 5, 8, 13])
    for i in range(n):
        if shape == "zero_gap":
            ts = t0  # every event at the same instant
        elif shape == "subsecond":
            ts = t0 + dt.timedelta(milliseconds=rng.randint(0, 900))
        elif shape == "straggler" and i == 0:
            ts = t0 - dt.timedelta(days=30)  # far behind the watermark
        elif shape == "spread":
            ts = t0 + dt.timedelta(minutes=rng.randint(0, 5 * 24 * 60))
        else:
            ts = t0 + dt.timedelta(seconds=rng.randint(0, 3600))
        user = 7 if (shape == "zero_gap" or rng.random() < 0.4) else rng.randint(1, 3)
        rows.append((
            i + 1,
            ts,
            user,
            rng.choice(types),
            50.0 if rng.random() < 0.3 else round(rng.uniform(0, 500), 2),
            "{}",
        ))
    return shape, rows


def _stage_events_file(spark, rows, target_dir):
    """Write rows as the single leaf FILE <target_dir>/events.parquet
    (the file-source kernels pathGlobFilter the leaf name; a parquet
    DIRECTORY named events.parquet matches nothing)."""
    import glob as globmod
    import os
    import shutil

    sdf = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).repartition(1)
    stage = os.path.join(target_dir, "_stage")
    sdf.write.mode("overwrite").parquet(stage)
    (part,) = globmod.glob(os.path.join(stage, "part-*.parquet"))
    shutil.move(part, os.path.join(target_dir, "events.parquet"))
    shutil.rmtree(stage)


@pytest.mark.parametrize("name", sorted(_streaming_registry()))
def test_streaming_fuzz_cross_engine(spark, name, tmp_path):
    """r20 (r19 verdict #4): the streaming kernels through the REAL
    structured-streaming path (file source -> watermark/state operator
    -> availableNow drain) on seeded degenerate micro-batches, each
    compared exactly against the committed oracle replayed in DuckDB
    over the same parquet file."""
    import os

    fn = _streaming_registry()[name]
    sql = em.oracle_sql()[name]
    rng = random.Random(hash(name) & 0xFFFF)
    for trial in range(4):
        shape, rows = _random_stream_events(rng)
        sf_dir = tmp_path / f"{name}_{trial}"
        sf_dir.mkdir()
        _stage_events_file(spark, rows, str(sf_dir))
        got = _norm(tuple(r) for r in fn(spark, str(sf_dir)).collect())
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"'{os.path.join(str(sf_dir), 'events.parquet')}'"
        )
        want = _norm(con.execute(sql).fetchall())
        assert got == want, (
            f"{name} trial {trial} shape={shape}: cross-engine divergence"
            f" on\n{rows}\nspark={got}\noracle={want}"
        )


@pytest.mark.parametrize("name", sorted(DQ_ORDERS))
def test_dq_fuzz_cross_engine(spark, name):
    fn = DQ_ORDERS[name]
    sql = em.oracle_sql()[name]
    rng = random.Random(hash(name) & 0xFFFF)
    for trial in range(5):
        rows = _random_orders(rng)
        sdf = spark.createDataFrame(
            rows,
            "o_orderkey long, o_orderpriority string, o_orderstatus string,"
            " o_orderdate date, o_totalprice double",
        )
        got = _norm(tuple(r) for r in fn(sdf).collect())
        con = duckdb.connect()
        con.register(
            "orders",
            pd.DataFrame(rows, columns=[
                "o_orderkey", "o_orderpriority", "o_orderstatus",
                "o_orderdate", "o_totalprice"]),
        )
        want = _norm(con.execute(sql).fetchall())
        assert got == want, (
            f"{name} trial {trial}: cross-engine divergence on\n{rows}\n"
            f"spark={got}\noracle={want}"
        )
