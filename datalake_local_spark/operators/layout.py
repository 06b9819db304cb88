"""Data-layout analytics: does the physical sort order of the lake
actually support the query patterns? (The OPTIMIZE/ZORDER decision
support a 100 TB lakehouse runs before rewriting petabytes.)"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_local_spark.functions.zorder import normalize_sql, zvalue_sql


def zorder_layout(orders: DataFrame, bucket_bits: int = 8) -> DataFrame:
    """Z-order clustering report for orders over (custkey, orderdate):
    every order gets a 32-bit Morton key interleaving the two
    normalized dimensions; keys are grouped into the top
    ``bucket_bits`` buckets (the files an OPTIMIZE ZORDER rewrite
    would produce) and each bucket reports its min/max envelope on
    BOTH dimensions plus the envelope area — the number a layout
    advisor compares against the 1-D-sorted baseline (z-buckets keep
    both envelopes ~√n tight; a custkey sort leaves the date envelope
    at full width, so date predicates prune nothing).

    All integer arithmetic end to end (affine normalization and bit
    interleave via div/mod terms — :mod:`..functions.zorder`), so the
    oracle computes bit-identical keys. One scan + one broadcast 1-row
    bounds aggregate + one bucket-grain aggregate; nothing here
    scales past the bucket count after the scan."""
    bounds = orders.agg(
        F.min("o_custkey").alias("min_c"),
        F.max("o_custkey").alias("max_c"),
        F.min(F.datediff("o_orderdate", F.lit("1990-01-01"))).alias("min_d"),
        F.max(F.datediff("o_orderdate", F.lit("1990-01-01"))).alias("max_d"),
    )
    x = normalize_sql("o_custkey", "min_c", "max_c", 16, "div")
    y = normalize_sql(
        "datediff(o_orderdate, date'1990-01-01')", "min_d", "max_d", 16, "div"
    )
    z = zvalue_sql(x, y, 16, "div")
    keyed = orders.crossJoin(F.broadcast(bounds)).select(
        F.expr(f"{z} div {1 << (32 - bucket_bits)}").cast("int").alias("zbucket"),
        F.col("o_custkey"),
        F.datediff("o_orderdate", F.lit("1990-01-01")).alias("dday"),
    )
    return (
        keyed.groupBy("zbucket")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.min("dday").alias("min_day"),
            F.max("dday").alias("max_day"),
        )
        .select(
            "zbucket", "n_orders", "min_custkey", "max_custkey",
            "min_day", "max_day",
            (
                (F.col("max_custkey") - F.col("min_custkey") + 1)
                * (F.col("max_day") - F.col("min_day") + 1)
            )
            .cast("long")
            .alias("envelope_area"),
        )
        .orderBy("zbucket")
    )


def skipping_report(events: DataFrame, n_files: int = 64, n_preds: int = 4) -> DataFrame:
    """File-skipping effectiveness report — the "so what" number next to
    :func:`zorder_layout`'s envelope areas: given a clustering layout
    and a predicate workload, what fraction of data files does min/max
    envelope pruning actually skip? (The statistics-based file pruning
    every lakehouse scan planner performs — Delta/Iceberg data
    skipping, public; this quantifies it BEFORE rewriting petabytes.)

    Two candidate layouts of ``n_files`` equal-width files (cluster by
    event time vs by user id) × two predicate families (``n_preds``
    time windows and ``n_preds`` user ranges, 1/16th-of-span each,
    derived from the data bounds so the report is self-calibrating).
    The diagonal reads ~15/16 skipped; the off-diagonal reads ~0 —
    users are active across the whole time span, so a user-clustered
    layout leaves time envelopes at full width and vice versa. One row
    per (layout, predicate): files hit, skip rate, and the
    layout-independent selected-row count.

    Determinism: file ids, envelopes, predicate bounds and hit tests
    are exact integer arithmetic (epoch microseconds, integer div);
    the single skip-rate division rounds half-up on both engines.

    Scale shape: ONE scan materializes the narrow (e, u) projection,
    which feeds the bounds aggregate, the per-(layout, file) envelope
    aggregate (map-side combined, ≤ 2·n_files groups) and the
    per-predicate row counts (8-row broadcast, map-side predicate
    evaluation); the hit test joins file-grain metadata against
    predicate-grain metadata — nothing after the scan exceeds metadata
    grain."""
    # ONE parquet scan: the narrow (e, u) projection is materialized
    # once and feeds the bounds aggregate, the envelope aggregate and
    # the per-predicate row counts (uncheckpointed, each consumer
    # re-expanded the scan — 6 finalized scans, plan census audit);
    # 16 bytes/row dwarfed by the fact table it profiles
    base = events.select(
        F.unix_micros("ts").alias("e"), F.col("user_id").alias("u")
    ).localCheckpoint()
    b = base.agg(
        F.min("e").alias("min_e"),
        F.max("e").alias("max_e"),
        F.min("u").alias("min_u"),
        F.max("u").alias("max_u"),
    )
    keyed = base.crossJoin(F.broadcast(b)).select(
        "e",
        "u",
        F.expr(
            f"least({n_files - 1}, (e - min_e) * {n_files}"
            " div (max_e - min_e + 1))"
        ).cast("long").alias("f_ts"),
        F.expr(
            f"least({n_files - 1}, (u - min_u) * {n_files}"
            " div (max_u - min_u + 1))"
        ).cast("long").alias("f_user"),
    ).localCheckpoint()
    env = (
        keyed.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("by_ts").alias("layout"), F.col("f_ts").alias("file_id")
                    ),
                    F.struct(
                        F.lit("by_user").alias("layout"),
                        F.col("f_user").alias("file_id"),
                    ),
                )
            ).alias("x"),
            "e",
            "u",
        )
        .select(F.col("x.layout").alias("layout"), F.col("x.file_id").alias("file_id"), "e", "u")
        .groupBy("layout", "file_id")
        .agg(
            F.min("e").alias("f_emin"),
            F.max("e").alias("f_emax"),
            F.min("u").alias("f_umin"),
            F.max("u").alias("f_umax"),
        )
        # ≤ 2·n_files rows feeding two consumers (hits, nfiles) — the
        # 2x-exploded row-grain aggregate must run once, not per
        # consumer (r16 review-pass find)
        .localCheckpoint()
    )
    preds = b.select(
        F.explode(
            F.flatten(
                F.array(
                    F.expr(
                        f"""transform(sequence(0, {n_preds - 1}), k -> struct(
                            'ts' as family, k as k,
                            min_e + CAST(k AS BIGINT) * (max_e - min_e + 1) div {n_preds} as lo,
                            min_e + CAST(k AS BIGINT) * (max_e - min_e + 1) div {n_preds}
                                + (max_e - min_e + 1) div 16 as hi))"""
                    ),
                    F.expr(
                        f"""transform(sequence(0, {n_preds - 1}), k -> struct(
                            'user' as family, k as k,
                            min_u + CAST(k AS BIGINT) * (max_u - min_u + 1) div {n_preds} as lo,
                            min_u + CAST(k AS BIGINT) * (max_u - min_u + 1) div {n_preds}
                                + (max_u - min_u + 1) div 16 as hi))"""
                    ),
                )
            )
        ).alias("p")
    ).select(
        F.concat(F.col("p.family"), F.lit("_"), F.col("p.k")).alias("pred"),
        F.col("p.family").alias("family"),
        F.col("p.lo").alias("lo"),
        F.col("p.hi").alias("hi"),
    ).localCheckpoint()  # 2·n_preds rows; three consumers below
    # base is dead once keyed/env/preds are materialized (preds is its
    # last reader via the bounds aggregate b); release its blocks
    # eagerly instead of waiting for ContextCleaner GC — keyed/env/preds
    # must stay: the returned lazy plan reads them (r17 ADVICE).
    from datalake_local_spark.llm.dedup import _release_checkpoint

    _release_checkpoint(base)
    hits = (
        env.crossJoin(F.broadcast(preds))
        .where(
            F.when(
                F.col("family") == "ts",
                (F.col("f_emin") < F.col("hi")) & (F.col("f_emax") >= F.col("lo")),
            ).otherwise(
                (F.col("f_umin") < F.col("hi")) & (F.col("f_umax") >= F.col("lo"))
            )
        )
        .groupBy("layout", "pred")
        .agg(F.count("*").cast("long").alias("files_hit"))
    )
    nfiles = env.groupBy("layout").agg(F.count("*").cast("long").alias("n_files"))
    rows_sel = (
        keyed.crossJoin(F.broadcast(preds))
        .where(
            F.when(
                F.col("family") == "ts",
                (F.col("e") >= F.col("lo")) & (F.col("e") < F.col("hi")),
            ).otherwise((F.col("u") >= F.col("lo")) & (F.col("u") < F.col("hi")))
        )
        .groupBy("pred")
        .agg(F.count("*").cast("long").alias("rows_selected"))
    )
    grid = nfiles.select("layout").crossJoin(preds.select("pred"))
    return (
        grid.join(nfiles, "layout")
        .join(hits, ["layout", "pred"], "left")
        .join(rows_sel, "pred", "left")
        .select(
            "layout",
            "pred",
            "n_files",
            F.coalesce(F.col("files_hit"), F.lit(0)).cast("long").alias("files_hit"),
            F.round(
                (F.col("n_files") - F.coalesce(F.col("files_hit"), F.lit(0))).cast(
                    "double"
                )
                / F.col("n_files").cast("double"),
                6,
            ).alias("skip_rate"),
            F.coalesce(F.col("rows_selected"), F.lit(0)).cast("long").alias(
                "rows_selected"
            ),
        )
    )


def zorder_skipping_report(
    events: DataFrame, n_files: int = 64, n_preds: int = 4, bits: int = 16
) -> DataFrame:
    """The layout trio's closing argument (r17): the
    :func:`skipping_report` framework with a THIRD candidate layout —
    ``by_zorder``, files assigned by the top bits of the Morton key over
    (event time, user id) — so zorder → skipping → compaction reads as
    one certified narrative: :func:`zorder_layout` shows the interleaved
    key keeps BOTH envelopes tight, this report converts that into the
    planner's actual number (files skipped per predicate), and
    ``maintenance.compaction_plan`` sizes the rewrite. Expected shape:
    the single-column layouts skip ~15/16 on their own dimension and ~0
    on the other; ``by_zorder`` skips a large fraction on BOTH families
    (the √-proportional envelope argument, Morton 1966).

    File assignment is pure integer arithmetic end to end: both
    dimensions are affine-normalized onto [0, 2^bits) (exact integer
    div, degenerate-range guard), interleaved with the shared
    :func:`..functions.zorder.zvalue_sql` term sum, and divided into
    ``n_files`` equal Z-RANGES (file = zv div (2^(2·bits) / n_files);
    ``n_files`` must divide 2^(2·bits), true for any power of two) —
    exactly what OPTIMIZE ZORDER BY produces physically. The DuckDB
    oracle renders the same expressions with ``//``, so keys and file
    ids are bit-identical cross-engine.

    Scale shape: identical to :func:`skipping_report` — one scan
    materializes the narrow (e, u) projection; everything downstream is
    file-grain (≤ 3·n_files envelope rows) or predicate-grain (2·n_preds
    broadcast); the 3x explode happens AFTER the projection, at 24
    bytes/row. The checkpoint-release discipline follows the r17
    skipping_report fix."""
    from datalake_local_spark.functions.zorder import normalize_sql, zvalue_sql
    from datalake_local_spark.llm.dedup import _release_checkpoint

    assert (1 << (2 * bits)) % n_files == 0, "n_files must divide 2^(2*bits)"
    zdiv = (1 << (2 * bits)) // n_files

    base = events.select(
        F.unix_micros("ts").alias("e"), F.col("user_id").alias("u")
    ).localCheckpoint()
    b = base.agg(
        F.min("e").alias("min_e"),
        F.max("e").alias("max_e"),
        F.min("u").alias("min_u"),
        F.max("u").alias("max_u"),
    )
    # Morton input at MILLISECOND resolution (r17 review-pass find):
    # normalize_sql multiplies the offset by 2^bits - 1, and a
    # microsecond span past ~4.4 years overflows BIGINT (Spark wraps
    # silently, DuckDB raises — a cross-engine seam invisible at test
    # SFs whose span is ~2 months). Milliseconds keep span × 65535
    # inside BIGINT for ~4.4 MILLENNIA with zero effect on file
    # assignment (floor-div of a NON-NEGATIVE value is monotone, so
    # min/max commute with the rescale). The prescale divides the
    # min-OFFSET value (e - min_e), never the raw epoch (r18, r17
    # ADVICE): e - min_e >= 0 by construction, so Spark `div`
    # (truncates toward zero) and DuckDB `//` (floors) agree — raw
    # pre-1970 epochs are negative, where -1 div 1000 = 0 but
    # -1 // 1000 = -1 would silently shift keys cross-engine. The
    # offset form needs no engine-side non-negativity precondition at
    # all. The equal-width f_ts assignment stays at µs: its factor is
    # only n_files and it already subtracts min_e first.
    ne = normalize_sql("((e - min_e) div 1000)", "0", "((max_e - min_e) div 1000)", bits=bits)
    nu = normalize_sql("u", "min_u", "max_u", bits=bits)
    zv = zvalue_sql(ne, nu, bits=bits)
    keyed = base.crossJoin(F.broadcast(b)).select(
        "e",
        "u",
        F.expr(
            f"least({n_files - 1}, (e - min_e) * {n_files}"
            " div (max_e - min_e + 1))"
        ).cast("long").alias("f_ts"),
        F.expr(
            f"least({n_files - 1}, (u - min_u) * {n_files}"
            " div (max_u - min_u + 1))"
        ).cast("long").alias("f_user"),
        F.expr(f"({zv}) div {zdiv}").cast("long").alias("f_z"),
    ).localCheckpoint()
    env = (
        keyed.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("by_ts").alias("layout"), F.col("f_ts").alias("file_id")
                    ),
                    F.struct(
                        F.lit("by_user").alias("layout"),
                        F.col("f_user").alias("file_id"),
                    ),
                    F.struct(
                        F.lit("by_zorder").alias("layout"),
                        F.col("f_z").alias("file_id"),
                    ),
                )
            ).alias("x"),
            "e",
            "u",
        )
        .select(F.col("x.layout").alias("layout"), F.col("x.file_id").alias("file_id"), "e", "u")
        .groupBy("layout", "file_id")
        .agg(
            F.min("e").alias("f_emin"),
            F.max("e").alias("f_emax"),
            F.min("u").alias("f_umin"),
            F.max("u").alias("f_umax"),
        )
        .localCheckpoint()
    )
    preds = b.select(
        F.explode(
            F.flatten(
                F.array(
                    F.expr(
                        f"""transform(sequence(0, {n_preds - 1}), k -> struct(
                            'ts' as family, k as k,
                            min_e + CAST(k AS BIGINT) * (max_e - min_e + 1) div {n_preds} as lo,
                            min_e + CAST(k AS BIGINT) * (max_e - min_e + 1) div {n_preds}
                                + (max_e - min_e + 1) div 16 as hi))"""
                    ),
                    F.expr(
                        f"""transform(sequence(0, {n_preds - 1}), k -> struct(
                            'user' as family, k as k,
                            min_u + CAST(k AS BIGINT) * (max_u - min_u + 1) div {n_preds} as lo,
                            min_u + CAST(k AS BIGINT) * (max_u - min_u + 1) div {n_preds}
                                + (max_u - min_u + 1) div 16 as hi))"""
                    ),
                )
            )
        ).alias("p")
    ).select(
        F.concat(F.col("p.family"), F.lit("_"), F.col("p.k")).alias("pred"),
        F.col("p.family").alias("family"),
        F.col("p.lo").alias("lo"),
        F.col("p.hi").alias("hi"),
    ).localCheckpoint()
    # env and preds are eagerly materialized above, so neither base nor
    # keyed has a remaining consumer (unlike skipping_report, whose
    # returned plan still reads keyed for rows_selected) — release both
    # here instead of leaving keyed's full row-grain projection cached
    # until ContextCleaner GC (r17 ADVICE).
    _release_checkpoint(base)
    _release_checkpoint(keyed)
    hits = (
        env.crossJoin(F.broadcast(preds))
        .where(
            F.when(
                F.col("family") == "ts",
                (F.col("f_emin") < F.col("hi")) & (F.col("f_emax") >= F.col("lo")),
            ).otherwise(
                (F.col("f_umin") < F.col("hi")) & (F.col("f_umax") >= F.col("lo"))
            )
        )
        .groupBy("layout", "pred")
        .agg(F.count("*").cast("long").alias("files_hit"))
    )
    nfiles = env.groupBy("layout").agg(F.count("*").cast("long").alias("n_files"))
    grid = nfiles.select("layout").crossJoin(preds.select("pred"))
    return (
        grid.join(nfiles, "layout")
        .join(hits, ["layout", "pred"], "left")
        .select(
            "layout",
            "pred",
            "n_files",
            F.coalesce(F.col("files_hit"), F.lit(0)).cast("long").alias("files_hit"),
            F.round(
                (F.col("n_files") - F.coalesce(F.col("files_hit"), F.lit(0))).cast(
                    "double"
                )
                / F.col("n_files").cast("double"),
                6,
            ).alias("skip_rate"),
        )
    )


def hilbert_skipping_report(
    events: DataFrame, n_files: int = 64, n_preds: int = 4, bits: int = 16
) -> DataFrame:
    """The "which space-filling curve" A/B (r18, r17 verdict #7a):
    :func:`zorder_skipping_report`'s framework with the two CURVE
    layouts head-to-head — ``by_zorder`` (Morton interleave) vs
    ``by_hilbert`` (the rotate/reflect Hilbert index,
    :mod:`..functions.hilbert`) — over the same self-calibrating
    predicate workload, so the layout advisor's curve choice is a
    certified number: Hilbert's unit-step adjacency keeps file
    envelopes at least as tight as Morton's (no curve jumps across the
    square), typically buying a few extra skipped files per predicate
    family at identical write cost.

    Both keys are pure engine-portable integer arithmetic over the SAME
    normalized inputs (offset-first ms prescale, r18 discipline): the
    Morton key is the shared :func:`..functions.zorder.zvalue_sql` term
    sum; the Hilbert index is the shared :func:`..functions.hilbert.
    hilbert_chain` projection chain (``bits`` chained selects — Spark
    evaluates each projection against its input row, so every level's
    simultaneous (x, y, d) update is exact; the DuckDB oracle runs the
    same text as chained CTEs). File = index div (4^bits / n_files):
    equal index-ranges, exactly what an OPTIMIZE-by-curve rewrite
    produces physically.

    Scale shape: identical to the siblings — one scan materializes the
    narrow (e, u) projection; the chain is row-local projection
    arithmetic (no shuffle); everything downstream is file-grain
    (≤ 2·n_files envelope rows) or predicate-grain (2·n_preds
    broadcast). Checkpoint-release discipline as zorder_skipping_report."""
    from datalake_local_spark.functions.hilbert import hilbert_chain
    from datalake_local_spark.functions.zorder import normalize_sql, zvalue_sql
    from datalake_local_spark.llm.dedup import _release_checkpoint

    assert (1 << (2 * bits)) % n_files == 0, "n_files must divide 4^bits"
    zdiv = (1 << (2 * bits)) // n_files

    base = events.select(
        F.unix_micros("ts").alias("e"), F.col("user_id").alias("u")
    ).localCheckpoint()
    b = base.agg(
        F.min("e").alias("min_e"),
        F.max("e").alias("max_e"),
        F.min("u").alias("min_u"),
        F.max("u").alias("max_u"),
    )
    ne = normalize_sql("((e - min_e) div 1000)", "0", "((max_e - min_e) div 1000)", bits=bits)
    nu = normalize_sql("u", "min_u", "max_u", bits=bits)
    zv = zvalue_sql(ne, nu, bits=bits)
    cur = base.crossJoin(F.broadcast(b)).select(
        "e",
        "u",
        F.expr(f"({zv}) div {zdiv}").cast("long").alias("f_z"),
        F.expr(ne).cast("long").alias("hx"),
        F.expr(nu).cast("long").alias("hy"),
        F.lit(0).cast("long").alias("hd"),
        "min_e", "max_e", "min_u", "max_u",
    )
    # prefix property: file = index div (4^bits / n_files) only reads
    # the top log2(n_files) index bits, which the first
    # ceil(log2(n_files)/2) levels determine exactly (hilbert_chain
    # docstring) — 3 projection levels for 64 files, not 16
    levels = -(-(n_files - 1).bit_length() // 2)
    for d_sql, x_sql, y_sql in hilbert_chain(bits=bits, levels=levels):
        cur = cur.select(
            "e", "u", "f_z",
            F.expr(x_sql).cast("long").alias("hx"),
            F.expr(y_sql).cast("long").alias("hy"),
            F.expr(d_sql).cast("long").alias("hd"),
            "min_e", "max_e", "min_u", "max_u",
        )
    keyed = cur.select(
        "e", "u", "f_z",
        F.expr(f"hd div {zdiv}").cast("long").alias("f_h"),
        "min_e", "max_e", "min_u", "max_u",
    ).localCheckpoint()
    env = (
        keyed.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("by_zorder").alias("layout"),
                        F.col("f_z").alias("file_id"),
                    ),
                    F.struct(
                        F.lit("by_hilbert").alias("layout"),
                        F.col("f_h").alias("file_id"),
                    ),
                )
            ).alias("x"),
            "e",
            "u",
        )
        .select(F.col("x.layout").alias("layout"), F.col("x.file_id").alias("file_id"), "e", "u")
        .groupBy("layout", "file_id")
        .agg(
            F.min("e").alias("f_emin"),
            F.max("e").alias("f_emax"),
            F.min("u").alias("f_umin"),
            F.max("u").alias("f_umax"),
        )
        .localCheckpoint()
    )
    preds = b.select(
        F.explode(
            F.flatten(
                F.array(
                    F.expr(
                        f"""transform(sequence(0, {n_preds - 1}), k -> struct(
                            'ts' as family, k as k,
                            min_e + CAST(k AS BIGINT) * (max_e - min_e + 1) div {n_preds} as lo,
                            min_e + CAST(k AS BIGINT) * (max_e - min_e + 1) div {n_preds}
                                + (max_e - min_e + 1) div 16 as hi))"""
                    ),
                    F.expr(
                        f"""transform(sequence(0, {n_preds - 1}), k -> struct(
                            'user' as family, k as k,
                            min_u + CAST(k AS BIGINT) * (max_u - min_u + 1) div {n_preds} as lo,
                            min_u + CAST(k AS BIGINT) * (max_u - min_u + 1) div {n_preds}
                                + (max_u - min_u + 1) div 16 as hi))"""
                    ),
                )
            )
        ).alias("p")
    ).select(
        F.concat(F.col("p.family"), F.lit("_"), F.col("p.k")).alias("pred"),
        F.col("p.family").alias("family"),
        F.col("p.lo").alias("lo"),
        F.col("p.hi").alias("hi"),
    ).localCheckpoint()
    _release_checkpoint(base)
    _release_checkpoint(keyed)
    hits = (
        env.crossJoin(F.broadcast(preds))
        .where(
            F.when(
                F.col("family") == "ts",
                (F.col("f_emin") < F.col("hi")) & (F.col("f_emax") >= F.col("lo")),
            ).otherwise(
                (F.col("f_umin") < F.col("hi")) & (F.col("f_umax") >= F.col("lo"))
            )
        )
        .groupBy("layout", "pred")
        .agg(F.count("*").cast("long").alias("files_hit"))
    )
    nfiles = env.groupBy("layout").agg(F.count("*").cast("long").alias("n_files"))
    grid = nfiles.select("layout").crossJoin(preds.select("pred"))
    return (
        grid.join(nfiles, "layout")
        .join(hits, ["layout", "pred"], "left")
        .select(
            "layout",
            "pred",
            "n_files",
            F.coalesce(F.col("files_hit"), F.lit(0)).cast("long").alias("files_hit"),
            F.round(
                (F.col("n_files") - F.coalesce(F.col("files_hit"), F.lit(0))).cast(
                    "double"
                )
                / F.col("n_files").cast("double"),
                6,
            ).alias("skip_rate"),
        )
    )
