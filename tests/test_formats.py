"""Snapshot-table (time travel / rollback) tests on the parquet fallback."""

from pyspark.sql import functions as F

from datalake_local_spark.formats import SnapshotTable, preferred_format


def test_preferred_format_probes(spark):
    assert preferred_format(spark) in ("delta", "iceberg", "parquet")


def test_snapshot_write_read_time_travel(spark):
    t = SnapshotTable(spark, "fmtdb", "events_small")
    v1 = t.write(spark.range(5).withColumn("tag", F.lit("a")))
    v2 = t.write(spark.range(8).withColumn("tag", F.lit("b")))
    assert (v1, v2) == (1, 2)
    assert t.read().count() == 8  # latest
    assert t.read(version=1).count() == 5  # as-of
    assert t.latest_version() == 2


def test_snapshot_rollback_non_destructive(spark):
    t = SnapshotTable(spark, "fmtdb", "rollback_t")
    t.write(spark.range(3))
    t.write(spark.range(10))
    v3 = t.rollback(1)
    assert v3 == 3
    assert t.read().count() == 3  # latest now equals v1
    assert t.read(version=2).count() == 10  # old version still readable
    ops = [r["op"] for r in t.history().collect()]
    assert ops == ["overwrite", "overwrite", "rollback_to_1"]


def test_compaction_reduces_file_count_preserves_data(spark, tmp_path):
    from datalake_local_spark import maintenance

    path = str(tmp_path / "frag")
    src = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    src.repartition(64).write.parquet(path)  # fragment: 64 tiny files
    before_sum = spark.read.parquet(path).agg(F.sum("v")).collect()[0][0]
    stats = maintenance.compact_small_files(spark, path, target_file_bytes=1 << 30)
    assert stats["files_before"] >= 60
    assert stats["files_after"] == 1
    after = spark.read.parquet(path)
    assert after.count() == 10_000
    assert after.agg(F.sum("v")).collect()[0][0] == before_sum


def test_clustered_write_yields_tight_disjoint_ranges(spark, tmp_path):
    """Range-clustered files must have nearly disjoint min/max envelopes
    on the cluster column (the property file skipping relies on); an
    unclustered write of the same data has every file spanning ~the whole
    domain."""
    from datalake_local_spark import maintenance

    df = spark.range(0, 50_000).withColumn(
        "k", (F.col("id") * 2654435761 % 50_000).cast("long")
    )
    clustered = str(tmp_path / "clustered")
    maintenance.write_clustered(df, clustered, ["k"], n_files=8)
    ranges = sorted(maintenance.clustered_file_ranges(clustered, "k"))
    assert len(ranges) == 8
    spans = [hi - lo for lo, hi in ranges]
    assert max(spans) < 50_000 / 4  # each file covers a narrow slice
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert lo_next >= hi_prev  # range partitioning → no overlap

    unclustered = str(tmp_path / "unclustered")
    df.repartition(8).write.parquet(unclustered)
    u_spans = [hi - lo for lo, hi in maintenance.clustered_file_ranges(unclustered, "k")]
    assert min(u_spans) > 50_000 / 2  # every unclustered file spans the domain


def test_overwrite_changed_partitions_only(spark, tmp_path):
    from datalake_local_spark import maintenance

    spark.sql("CREATE DATABASE IF NOT EXISTS maint_t")
    spark.sql("DROP TABLE IF EXISTS maint_t.daily")
    base = spark.createDataFrame(
        [(1, 10.0, "2024-01-01"), (2, 20.0, "2024-01-01"), (3, 30.0, "2024-01-02")],
        "id long, v double, day string",
    )
    base.write.partitionBy("day").saveAsTable("maint_t.daily")
    updates = spark.createDataFrame(
        [(3, 99.0, "2024-01-02"), (4, 40.0, "2024-01-02")], "id long, v double, day string"
    )
    n = maintenance.overwrite_changed_partitions(spark, "maint_t.daily", updates, "day")
    assert n == 1
    rows = {(r["id"], r["v"], r["day"]) for r in spark.table("maint_t.daily").collect()}
    # 2024-01-01 untouched; 2024-01-02 fully replaced by the update set
    assert rows == {(1, 10.0, "2024-01-01"), (2, 20.0, "2024-01-01"),
                    (3, 99.0, "2024-01-02"), (4, 40.0, "2024-01-02")}


def test_profile_table_reports_nulls_and_ranges(spark):
    from datalake_local_spark import maintenance

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "id long, s string"
    )
    prof = {r["column"]: r for r in maintenance.profile_table(df).collect()}
    assert prof["id"]["null_frac"] == 0.0 and prof["id"]["n_distinct"] == 4
    assert prof["id"]["min_value"] == "1" and prof["id"]["max_value"] == "4"
    assert prof["s"]["null_frac"] == 0.5 and prof["s"]["n_distinct"] == 2


def test_zorder_files_bound_both_dimensions(spark, tmp_path):
    """Z-ordered files must cover small rectangles of (x, y) space —
    every file's span on BOTH columns well under the domain — while
    x-only clustering leaves y spanning ~the whole domain per file."""
    from datalake_local_spark import maintenance

    df = (
        spark.range(0, 40_000)
        .withColumn("x", (F.col("id") * 2654435761 % 10_000).cast("long"))
        .withColumn("y", (F.col("id") * 40503 % 10_000).cast("long"))
    )
    zpath = str(tmp_path / "zorder")
    maintenance.write_zordered(df, zpath, "x", "y", n_files=16)
    x_spans = [hi - lo for lo, hi in maintenance.clustered_file_ranges(zpath, "x")]
    y_spans = [hi - lo for lo, hi in maintenance.clustered_file_ranges(zpath, "y")]
    assert len(x_spans) == 16
    # 16 files ≈ 4×4 grid of squares → typical span ≈ domain/4
    assert sorted(x_spans)[len(x_spans) // 2] <= 10_000 / 2
    assert sorted(y_spans)[len(y_spans) // 2] <= 10_000 / 2

    xpath = str(tmp_path / "xonly")
    maintenance.write_clustered(df, xpath, ["x"], n_files=16)
    y_only = [hi - lo for lo, hi in maintenance.clustered_file_ranges(xpath, "y")]
    assert min(y_only) > 10_000 * 0.8  # x-clustering leaves y unbounded


def test_hilbert_files_bound_both_dimensions(spark, tmp_path):
    """r18 write-side of the curve A/B: Hilbert-clustered files must
    cover small rectangles of (x, y) space exactly like the Morton
    writer's contract — every file's span on BOTH columns well under
    the domain — and the row set must survive the rewrite intact."""
    from datalake_local_spark import maintenance

    df = (
        spark.range(0, 40_000)
        .withColumn("x", (F.col("id") * 2654435761 % 10_000).cast("long"))
        .withColumn("y", (F.col("id") * 40503 % 10_000).cast("long"))
    )
    hpath = str(tmp_path / "hilbert")
    maintenance.write_hilbert_clustered(df, hpath, "x", "y", n_files=16)
    x_spans = [hi - lo for lo, hi in maintenance.clustered_file_ranges(hpath, "x")]
    y_spans = [hi - lo for lo, hi in maintenance.clustered_file_ranges(hpath, "y")]
    assert len(x_spans) == 16
    assert sorted(x_spans)[len(x_spans) // 2] <= 10_000 / 2
    assert sorted(y_spans)[len(y_spans) // 2] <= 10_000 / 2
    back = spark.read.parquet(hpath)
    assert back.count() == 40_000
    assert set(back.columns) == {"id", "x", "y"}  # helper columns dropped


def test_multi_format_roundtrip_orc_json_csv(spark, tmp_path):
    """Source/sink parity beyond parquet: the same frame round-trips
    through ORC (columnar, native), JSON lines, and headered CSV with
    values intact — the formats a landing zone actually delivers."""
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, 3.5)], "id long, s string, v double"
    )
    expected = {(r["id"], r["s"], r["v"]) for r in df.collect()}

    orc = str(tmp_path / "t.orc")
    df.write.orc(orc)
    assert {(r["id"], r["s"], r["v"]) for r in spark.read.orc(orc).collect()} == expected

    js = str(tmp_path / "t.json")
    df.write.json(js)
    back = spark.read.json(js, schema="id long, s string, v double")
    assert {(r["id"], r["s"], r["v"]) for r in back.collect()} == expected

    csv = str(tmp_path / "t.csv")
    df.write.option("header", "true").csv(csv)
    back = spark.read.option("header", "true").csv(csv, schema="id long, s string, v double")
    assert {(r["id"], r["s"], r["v"]) for r in back.collect()} == expected


def test_bucketed_join_plans_without_pre_join_shuffle(spark, tables):
    """Co-bucketed orders/lineitem join: the executed plan must read the
    bucketed scans directly into the SortMergeJoin with NO exchange on
    either join side (the only exchange in the query is the final
    groupBy), and must match the plain-parquet join's results."""
    from datalake_local_spark.operators import bucketing

    bucketing.write_bucketed(tables["orders"], "b_orders", "o_orderkey", 8)
    bucketing.write_bucketed(tables["lineitem"], "b_lineitem", "l_orderkey", 8)
    # at sf0.001 AQE would BROADCAST the small side (also a fine plan);
    # disable it here because the property under test is the
    # shuffle-free SMJ that the bucketing buys at fact×fact scale
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        df = bucketing.bucketed_order_revenue(spark, "b_orders", "b_lineitem")
        rows = {r["o_orderpriority"]: (r["revenue"], r["n_items"]) for r in df.collect()}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    final = (
        df._jdf.queryExecution().executedPlan().toString().split("+- == Initial Plan ==")[0]
    )
    assert "SortMergeJoin" in final
    assert "SelectedBucketsCount" in final  # bucket pruning metadata present
    # exactly ONE hash exchange: the post-join groupBy; the join sides
    # read buckets directly (this is the whole point of the layout)
    assert final.count("Exchange hashpartitioning") == 1, final

    from pyspark.sql import functions as F

    plain = (
        tables["orders"].select("o_orderkey", "o_orderpriority")
        .join(
            tables["lineitem"].select(
                "l_orderkey",
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"), F.count("*").alias("n_items"))
    )
    want = {r["o_orderpriority"]: (r["revenue"], r["n_items"]) for r in plain.collect()}
    assert rows == want
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_orc_scan_predicate_pushdown(spark, tables):
    """The ORC reader pushes predicates and prunes columns like parquet:
    a filtered two-column projection over the converted copy shows
    PushedFilters and a narrow ReadSchema in the scan node."""
    from datalake_local_spark import formats

    formats.orc_scan_parity(tables["orders"]).collect()  # ensure written
    path, _ = formats._format_cache_dir(tables["orders"], "orc")
    o = spark.read.orc(path)
    df = o.filter(F.col("o_totalprice") > 100000).select("o_orderkey", "o_totalprice")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:120]
    assert "o_orderstatus" not in plan.split("ReadSchema")[-1]


def test_schema_evolution_null_contract(spark, tables):
    """mergeSchema add-column contract: v1 rows surface the new column
    as NULL; v2 rows keep their values; per-version totals match the
    source table exactly."""
    from datalake_local_spark import formats

    out = {r["schema_version"]: r for r in
           formats.schema_evolution_scan(tables["orders"]).collect()}
    orders = tables["orders"]
    n_even = orders.filter(F.col("o_orderkey") % 2 == 0).count()
    n_odd = orders.filter(F.col("o_orderkey") % 2 == 1).count()
    assert out[1]["n_rows"] == n_even and out[1]["null_priority_rows"] == n_even
    assert out[2]["n_rows"] == n_odd and out[2]["null_priority_rows"] == 0


def test_snapshot_vacuum_retention(spark, tables):
    """VACUUM contract: old version tables are dropped, the newest
    retain_last stay readable, manifest history survives in full, and
    time travel to an expired version fails fast with the available
    list."""
    import pytest

    t = SnapshotTable(spark, "fmt_test", "vac_orders")
    base = tables["orders"].select("o_orderkey", "o_totalprice").limit(50)
    for i in range(4):
        t.write(base.withColumn("rev", F.lit(i)))
    assert sorted(t._versions_available()) == [1, 2, 3, 4]
    audit = {r["version"]: r["status"] for r in t.vacuum(retain_last=2).collect()}
    assert audit == {1: "vacuumed", 2: "vacuumed", 3: "retained", 4: "retained"}
    assert sorted(t._versions_available()) == [3, 4]
    assert t.read_checked(4).count() == 50
    assert t.read_checked(3).count() == 50
    with pytest.raises(ValueError, match="vacuumed.*available.*3, 4"):
        t.read_checked(1)
    # manifest keeps ALL versions as history
    assert [r["version"] for r in t.history().collect()] == [1, 2, 3, 4]


def test_publish_with_audit_wap_contract(spark, tables, tmp_path):
    """WAP: a good write publishes a manifest-complete version behind an
    atomically-flipped symlink; a failed audit publishes NOTHING and
    keeps its unique staging dir for forensics (a later publish cannot
    destroy it); a replacement publish flips to the new version and
    RETAINS the old one (in-flight readers keep a valid path) until an
    explicit vacuum_published; expected_checksum verifies staged
    content."""
    import glob
    import json
    import os

    import pytest

    from datalake_local_spark import maintenance

    target = str(tmp_path / "published")
    orders = tables["orders"].select("o_orderkey", "o_totalprice")
    want_sum = orders.agg(
        F.bit_xor(F.xxhash64(F.col("o_orderkey"))).alias("c")
    ).collect()[0]["c"]
    m = maintenance.publish_with_audit(
        orders,
        target,
        expected_rows=orders.count(),
        key_col="o_orderkey",
        expected_checksum=want_sum,
    )
    assert os.path.islink(target)
    assert os.path.exists(os.path.join(target, "_MANIFEST.json"))
    assert m["n_rows"] == orders.count() and m["checksum"] == want_sum
    assert spark.read.parquet(target).count() == orders.count()

    # failed audit: symlink untouched, unique staging preserved
    with pytest.raises(ValueError, match="WAP audit failed"):
        maintenance.publish_with_audit(orders.limit(5), target, expected_rows=999)
    assert spark.read.parquet(target).count() == orders.count()
    forensics = glob.glob(target + ".staging-*")
    assert forensics, "failed-audit staging must be kept"
    manifest = json.load(open(os.path.join(target, "_MANIFEST.json")))
    assert manifest["n_rows"] == orders.count()

    # replacement publish flips atomically; forensics dir survives it;
    # the PREVIOUS version is retained so an in-flight reader that
    # resolved the symlink pre-flip still has a valid path
    prev_target = os.path.join(
        os.path.dirname(target), os.readlink(target)
    )
    half = orders.filter(F.col("o_orderkey") % 2 == 0)
    maintenance.publish_with_audit(half, target, key_col="o_orderkey")
    assert spark.read.parquet(target).count() == half.count()
    assert all(os.path.exists(f) for f in forensics)
    assert os.path.isdir(prev_target), "pre-flip version must survive the flip"
    assert spark.read.parquet(prev_target).count() == orders.count()
    assert len(glob.glob(target + ".v*")) == 2

    # explicit vacuum: re-reads the symlink, never deletes current
    report = maintenance.vacuum_published(target, keep=0, grace_seconds=0)
    assert report["deleted"] == [os.path.basename(prev_target)]
    assert len(glob.glob(target + ".v*")) == 1
    assert spark.read.parquet(target).count() == half.count()


def test_publish_with_audit_two_writer_race(spark, tables, tmp_path):
    """Two concurrent publishers: both stage, both publish; the flips
    are last-wins but NEITHER version dir is deleted or orphaned —
    the loser's version is retained (vacuumable), no staging dirs
    leak, and the symlink always resolves to a complete version."""
    import glob
    import os
    import threading

    from datalake_local_spark import maintenance

    target = str(tmp_path / "raced")
    a = tables["orders"].select("o_orderkey").filter(F.col("o_orderkey") % 2 == 0)
    b = tables["orders"].select("o_orderkey").filter(F.col("o_orderkey") % 2 == 1)
    counts = {"a": a.count(), "b": b.count()}
    errs = []

    def run(df, name):
        try:
            maintenance.publish_with_audit(df, target, expected_rows=counts[name])
        except Exception as e:  # pragma: no cover - failure is the assertion
            errs.append((name, e))

    ts = [threading.Thread(target=run, args=(a, "a")), threading.Thread(target=run, args=(b, "b"))]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs, errs
    # both versions live, zero staging leaks, symlink resolves to one of them
    versions = glob.glob(target + ".v*")
    assert len(versions) == 2
    assert glob.glob(target + ".staging-*") == []
    assert os.path.islink(target)
    got = spark.read.parquet(target).count()
    assert got in counts.values()
    # vacuum keeps only the winner
    maintenance.vacuum_published(target, keep=0, grace_seconds=0)
    assert len(glob.glob(target + ".v*")) == 1
    assert spark.read.parquet(target).count() == got


def test_publish_with_audit_auto_vacuum(spark, tables, tmp_path):
    """vacuum_keep=N on publish bounds retention in one call: after the
    flip, only the current version plus N most recent non-current ones
    remain (unbounded-accumulation guard from the r8 ADVICE), and the
    deleted names are reported in the manifest."""
    import glob
    import os

    from datalake_local_spark import maintenance

    target = str(tmp_path / "published")
    orders = tables["orders"].select("o_orderkey", "o_totalprice")
    maintenance.publish_with_audit(orders, target)
    maintenance.publish_with_audit(orders.limit(10), target)
    assert len(glob.glob(target + ".v*")) == 2  # default: retain all
    m = maintenance.publish_with_audit(
        orders.limit(5), target, vacuum_keep=0, vacuum_grace_seconds=0
    )
    assert len(m["vacuum_deleted"]) == 2
    assert len(glob.glob(target + ".v*")) == 1
    assert os.path.basename(os.path.realpath(target)) not in m["vacuum_deleted"]
    assert spark.read.parquet(target).count() == 5
    # the PERSISTED manifest carries the vacuum outcome too, not just
    # the returned dict
    import json

    with open(os.path.join(os.path.realpath(target), "_MANIFEST.json")) as f:
        persisted = json.load(f)
    assert persisted["vacuum_deleted"] == m["vacuum_deleted"]


# ---------------------------------------------------------------------------
# incremental view maintenance (operators/ivm.py)
# ---------------------------------------------------------------------------


def test_ivm_refresh_matches_full_recompute(spark, tables):
    """The IVM correctness property end-to-end on real data: the
    incrementally-maintained rollup equals a from-scratch recompute of
    the post-change base state, value-exact on every column."""
    from datalake_local_spark.operators import ivm

    orders = tables["orders"]
    refreshed = ivm.ivm_rollup_refresh(orders).collect()
    _, _, new_base = ivm.derive_cdc_states(orders)
    recomputed = (
        ivm.publish_rollup(ivm.monthly_rollup_internal(new_base))
        .orderBy("order_month", "orderstatus")
        .collect()
    )
    assert len(refreshed) > 0
    assert [tuple(r) for r in refreshed] == [tuple(r) for r in recomputed]


def test_ivm_delta_merge_minmax_branches(spark):
    """Hand-built micro-case exercising every merge branch: a delete
    that removes a group's max (forces the affected-group recompute), a
    fully-deleted group (leaves the view), a brand-new group (enters),
    and an insert-only group whose min comes from least() without any
    base rescan."""
    import datetime

    from datalake_local_spark.operators import ivm

    def frame(rows):
        return spark.createDataFrame(
            [(datetime.date(2024, m, 1), s, v) for m, s, v in rows],
            "o_orderdate date, o_orderstatus string, o_totalprice double",
        )

    base = frame([(1, "O", 10.0), (1, "O", 20.0), (2, "O", 5.0), (4, "O", 3.0)])
    old_internal = ivm.monthly_rollup_internal(base)
    delta_minus = frame([(1, "O", 20.0), (2, "O", 5.0)])
    delta_plus = frame([(1, "O", 1.0), (3, "O", 7.25), (4, "O", 2.0)])
    new_base = frame([(1, "O", 10.0), (1, "O", 1.0), (3, "O", 7.25),
                      (4, "O", 3.0), (4, "O", 2.0)])
    out = {
        (r["order_month"].month, r["orderstatus"]): r
        for r in ivm.rollup_delta_merge(
            old_internal, delta_plus, delta_minus, new_base
        ).collect()
    }
    assert set(out) == {(1, "O"), (3, "O"), (4, "O")}  # month 2 left the view
    jan = out[(1, "O")]
    assert (jan["n_orders"], jan["sum_cents"]) == (2, 1100)
    assert (jan["min_price"], jan["max_price"]) == (1.0, 10.0)  # recomputed
    mar = out[(3, "O")]
    assert (mar["n_orders"], mar["sum_cents"], mar["min_price"]) == (1, 725, 7.25)
    apr = out[(4, "O")]  # insert-only: least/greatest path, no rescan
    assert (apr["n_orders"], apr["min_price"], apr["max_price"]) == (2, 2.0, 3.0)


def test_cdc_states_single_scan_forms_match_definitional(spark, tables):
    """The r20 single-scan change derivation (array_compact + explode
    variants / one disjunctive filter) must emit EXACTLY the row
    multisets of the definitional two-scan unionAll forms, for every
    returned relation — and each delta relation's executed plan must
    read the base at most once (the optimization being pinned)."""
    from pyspark.sql import functions as F

    from datalake_local_spark.operators import ivm

    orders = tables["orders"]
    k = F.col("o_orderkey")
    is_del = k % 97 == 0
    is_upd = (k % 53 == 0) & ~is_del
    cols = ["o_orderdate", "o_orderstatus", "o_totalprice"]
    deleted = orders.filter(is_del).select(*cols)
    upd_pre = orders.filter(is_upd).select(*cols)
    upd_post = upd_pre.withColumn("o_totalprice", F.col("o_totalprice") + 100.0)
    inserts = (
        orders.filter(k % 101 == 0)
        .select(*cols)
        .withColumn("o_totalprice", F.col("o_totalprice") + 55.25)
    )
    want = {
        "delta_plus": upd_post.unionAll(inserts),
        "delta_minus": deleted.unionAll(upd_pre),
        "new_base": orders.filter(~is_del)
        .withColumn(
            "o_totalprice",
            F.when(is_upd, F.col("o_totalprice") + 100.0).otherwise(
                F.col("o_totalprice")
            ),
        )
        .select(*cols)
        .unionAll(inserts),
    }
    got = dict(zip(("delta_plus", "delta_minus", "new_base"),
                   ivm.derive_cdc_states(orders)))
    for name, g in got.items():
        w = want[name]
        assert g.count() == w.count(), name
        assert g.exceptAll(w).count() == 0 and w.exceptAll(g).count() == 0, name
        g.collect()
        final = (
            g._jdf.queryExecution().executedPlan().toString()
            .split("+- == Initial Plan ==")[0]
        )
        assert final.count("FileScan parquet") <= 1, name


def test_ivm_rollup_refresh_plan_scan_bound(spark, tables):
    """Census regression guard for the r20 merge restructure: the
    refreshed rollup's executed plan reads the base parquet at most 4
    times (one tagged delta aggregate, one affected-keys probe, one
    repair scan, slack for AQE variation) — the pre-r20 shape replayed
    the whole merge subtree for the delete-affected probe and finalized
    at 10 scans."""
    from datalake_local_spark.operators import ivm

    df = ivm.ivm_rollup_refresh(tables["orders"])
    df.collect()
    final = (
        df._jdf.queryExecution().executedPlan().toString()
        .split("+- == Initial Plan ==")[0]
    )
    assert final.count("FileScan parquet") <= 4


def test_ivm_refresh_table_untouched_partitions_keep_files(spark, tables):
    """The lakehouse MERGE contract: after the materialized refresh,
    every month partition the delta did not touch keeps its data files
    byte-for-byte (same paths, sizes, and mtimes), and the refreshed
    table equals the full recompute."""
    import os

    from datalake_local_spark.operators import ivm

    orders = tables["orders"]
    ivm.materialize_rollup_table(spark, "ivm_rollup_t", orders)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    root = f"{warehouse}/ivm_rollup_t"

    def file_state():
        state = {}
        for dirpath, _, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    st = os.stat(p)
                    state[p] = (st.st_size, st.st_mtime_ns)
        return state

    before = file_state()
    stats = ivm.refresh_rollup_table(spark, "ivm_rollup_t", orders)
    after = file_state()
    touched = set(stats["touched_months"])

    def month_of(path):
        return path.split("month_key=")[1].split("/")[0]

    untouched_before = {p: s for p, s in before.items() if month_of(p) not in touched}
    untouched_after = {p: s for p, s in after.items() if month_of(p) not in touched}
    assert stats["partitions_overwritten"] > 0
    assert len(untouched_before) > 0  # the delta must not touch everything
    # byte-identical survival: same paths, sizes, AND mtimes
    assert untouched_before == untouched_after
    _, _, new_base = ivm.derive_cdc_states(orders)
    got = {
        tuple(r)
        for r in spark.table("ivm_rollup_t")
        .drop("month_key")
        .select("order_month", "orderstatus", "n_orders", "sum_cents",
                "min_price", "max_price")
        .collect()
    }
    want = {
        tuple(r) for r in ivm.monthly_rollup_internal(new_base).collect()
    }
    assert got == want


def test_ivm_multigrain_lattice_matches_recompute(spark, tables):
    """r13 (r12 verdict #3): every level of the maintained ROLLUP
    lattice equals a from-scratch recompute of the post-change base at
    that grain, and the lattice is internally consistent (the total
    row counts the whole post-change base)."""
    from datalake_local_spark.operators import ivm

    orders = tables["orders"]
    lattice = ivm.ivm_multigrain_refresh(orders).collect()
    _, _, new_base = ivm.derive_cdc_states(orders)
    by_grain = {}
    for r in lattice:
        by_grain.setdefault(r["grain"], []).append(r)
    assert set(by_grain) == {"day", "month", "year", "year_all", "total"}
    # month level ≡ direct recompute at month grain
    want_month = {
        (r["order_month"], r["orderstatus"], r["n_orders"], r["sum_price"],
         r["avg_price"], r["min_price"], r["max_price"])
        for r in ivm.publish_rollup(
            ivm.monthly_rollup_internal(new_base)
        ).collect()
    }
    got_month = {
        (r["period_start"], r["orderstatus"], r["n_orders"], r["sum_price"],
         r["avg_price"], r["min_price"], r["max_price"])
        for r in by_grain["month"]
    }
    assert got_month == want_month
    # grand total counts the whole post-change base, status rolled away
    (total,) = by_grain["total"]
    assert total["n_orders"] == new_base.count()
    assert total["orderstatus"] == "ALL" and total["period_start"] is None
    # additivity across every level of the lattice
    n_day = sum(r["n_orders"] for r in by_grain["day"])
    n_year = sum(r["n_orders"] for r in by_grain["year"])
    assert n_day == n_year == total["n_orders"]


def test_ivm_bitmap_distinct_matches_recompute(spark, tables):
    """r13 (r12 verdict #3): the counted-support maintained distinct
    view equals count(DISTINCT) recomputed from the post-change base —
    the non-self-maintainable aggregate done right via the auxiliary."""
    from pyspark.sql import functions as F

    from datalake_local_spark.operators import ivm

    orders = tables["orders"]
    got = {
        (r["order_month"], r["n_distinct_cust"], r["n_orders"],
         r["n_repeat_cust"])
        for r in ivm.ivm_bitmap_distinct(orders).collect()
    }
    cols = ["o_orderdate", "o_orderstatus", "o_totalprice", "o_custkey"]
    _, _, new_base = ivm.derive_cdc_states(orders, cols)
    per = new_base.groupBy(
        F.date_trunc("month", "o_orderdate").alias("order_month"), "o_custkey"
    ).agg(F.count("*").alias("cnt"))
    want = {
        (r["order_month"], r["d"], r["n"], r["m"])
        for r in per.groupBy("order_month")
        .agg(
            F.count("*").cast("long").alias("d"),
            F.sum("cnt").cast("long").alias("n"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
            .cast("long")
            .alias("m"),
        )
        .collect()
    }
    assert len(got) > 0 and got == want


def test_ivm_day_grain_table_untouched_partitions_keep_files(spark, tables):
    """r13: the materialized path generalizes to the lattice's finest
    grain — a DAY-grain state table partitioned by month refreshes
    with untouched month partitions byte-identical, and the refreshed
    state equals the day-grain recompute."""
    import os

    from datalake_local_spark.operators import ivm

    orders = tables["orders"]
    ivm.materialize_rollup_table(
        spark, "ivm_day_t", orders, "day", "period_start"
    )
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    root = f"{warehouse}/ivm_day_t"

    def file_state():
        state = {}
        for dirpath, _, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    st = os.stat(p)
                    state[p] = (st.st_size, st.st_mtime_ns)
        return state

    before = file_state()
    stats = ivm.refresh_rollup_table(
        spark, "ivm_day_t", orders, "day", "period_start"
    )
    after = file_state()
    touched = set(stats["touched_months"])

    def month_of(path):
        return path.split("month_key=")[1].split("/")[0]

    untouched_before = {p: s for p, s in before.items() if month_of(p) not in touched}
    untouched_after = {p: s for p, s in after.items() if month_of(p) not in touched}
    assert stats["partitions_overwritten"] > 0
    assert len(untouched_before) > 0
    assert untouched_before == untouched_after
    _, _, new_base = ivm.derive_cdc_states(orders)
    got = {
        tuple(r)
        for r in spark.table("ivm_day_t")
        .drop("month_key")
        .select("period_start", "orderstatus", "n_orders", "sum_cents",
                "min_price", "max_price")
        .collect()
    }
    want = {
        tuple(r)
        for r in ivm.grain_rollup_internal(
            new_base, "day", "period_start"
        ).collect()
    }
    assert got == want


def test_json_scan_parity_write_once(spark, tables):
    """r13: the JSONL parity scan writes its converted copy once per
    source (signature-keyed dir) and reconstructs the parquet-side
    aggregate exactly, dates and doubles round-tripping through text."""
    import glob
    import os

    from pyspark.sql import functions as F

    from datalake_local_spark import formats

    orders = tables["orders"]
    got = {tuple(r) for r in formats.json_scan_parity(orders).collect()}
    want = {
        tuple(r)
        for r in orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.min(F.col("o_orderdate").cast("date")).alias("first_order"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        )
        .collect()
    }
    assert got == want
    path, stable = formats._format_cache_dir(orders, "jsonl")
    assert stable
    state = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(path, "*.json"))
    }
    assert state
    formats.json_scan_parity(orders).collect()  # second call: no rewrite
    assert {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(path, "*.json"))
    } == state


def test_csv_dialect_scan_parity_roundtrip(spark, tables):
    """r13: the dialect-stressed CSV round-trip (embedded quotes,
    commas, LF, CRLF, backslash under RFC-4180 quote-doubling) is
    byte-exact — the from-CSV aggregate equals the parquet-side
    aggregate computed with the same derivation — and the converted
    copy is written once per source."""
    import glob
    import os

    from pyspark.sql import functions as F

    from datalake_local_spark import formats

    docs = tables["documents"]
    got = {tuple(r) for r in formats.csv_dialect_scan_parity(docs).collect()}
    want = {
        tuple(r)
        for r in docs.select(
            "lang", formats._dialect_stressed(F.col("text")).alias("stressed")
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.conv(F.substring(F.md5("stressed"), 1, 8), 16, 10).cast(
                    "long"
                )
            ).alias("fp_sum"),
            F.sum(F.length("stressed")).cast("long").alias("len_sum"),
        )
        .collect()
    }
    assert got == want
    path, stable = formats._format_cache_dir(docs, formats._CSV_DIALECT_TAG)
    assert stable
    state = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(path, "*.csv"))
    }
    assert state
    formats.csv_dialect_scan_parity(docs).collect()  # no rewrite
    assert {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(path, "*.csv"))
    } == state


def test_ivm_join_refresh_hand_computed(spark):
    """r18 join-view IVM: the delta-join refresh (dV = dO join C — the
    post-change fact table is never rescanned; derive_cdc_states'
    new_base is deliberately unused) matches a hand-computed view on a
    fixture exercising every change class: a surviving row, an update
    (+100), a delete that KILLS its (segment, month) group, and an
    insert-clone (+55.25) that grows its group to two rows."""
    import datetime as dt

    from datalake_local_spark.operators import ivm

    orders = spark.createDataFrame(
        [
            (1, 1, dt.date(2024, 1, 15), 100.0),   # plain: survives as-is
            (53, 2, dt.date(2024, 1, 20), 200.0),  # update: -> 300.00
            (97, 1, dt.date(2024, 2, 10), 400.0),  # delete: (A, Feb) dies
            (101, 2, dt.date(2024, 2, 5), 500.0),  # stays + clone at 555.25
        ],
        "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(1, "SEG_A"), (2, "SEG_B")], "c_custkey long, c_mktsegment string"
    )
    got = {
        (r["segment"], str(r["order_month"])[:7]): (r["n_orders"], r["sum_price"])
        for r in ivm.ivm_join_refresh(orders, customer).collect()
    }
    assert got == {
        ("SEG_A", "2024-01"): (1, 100.00),
        ("SEG_B", "2024-01"): (1, 300.00),
        ("SEG_B", "2024-02"): (2, 1055.25),
    }, got
