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
