"""Structured Streaming tests: file-source ingestion with checkpointed
exactly-once, and streaming window aggregates equal to batch results."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_local_spark.streaming import event_windows, file_ingest
from tests.conftest import SF_DIR


def test_streaming_tumbling_equals_batch(spark, tables):
    stream_out = event_windows.run_streaming_tumbling(
        spark, SF_DIR, query_name="t_stream_eq_batch"
    )
    batch_out = event_windows.tumbling_window_counts(tables["events"])
    assert stream_out.count() == batch_out.count()
    assert stream_out.exceptAll(batch_out).count() == 0


def test_sessionize_gap_invariant(tables):
    """No session may contain an internal gap above the threshold, and
    consecutive sessions of one user must be separated by more than it."""
    sessions = event_windows.sessionize_batch(tables["events"], gap_minutes=30).collect()
    by_user: dict = {}
    for r in sessions:
        by_user.setdefault(r["user_id"], []).append(r)
    for user_sessions in by_user.values():
        user_sessions.sort(key=lambda r: r["session_seq"])
        for prev, nxt in zip(user_sessions, user_sessions[1:]):
            gap = (nxt["session_start"] - prev["session_end"]).total_seconds()
            assert gap > 30 * 60


def test_file_ingest_exactly_once(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = tmp_path / "ckpt"
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("val", T.StringType())]
    )
    (landing / "a.csv").write_text("id,val\n1,x\n2,y\n")

    q = file_ingest.stream_csv_ingest(
        spark, str(landing), "stream_test.ingested", schema, str(ckpt)
    )
    q.awaitTermination(120)
    assert spark.table("stream_test.ingested").count() == 2

    # second batch picks up ONLY the new file (checkpointed progress)
    (landing / "b.csv").write_text("id,val\n3,z\n")
    q2 = file_ingest.stream_csv_ingest(
        spark, str(landing), "stream_test.ingested", schema, str(ckpt)
    )
    q2.awaitTermination(120)
    out = spark.table("stream_test.ingested")
    assert out.count() == 3
    assert out.agg(F.countDistinct("id")).collect()[0][0] == 3


def test_streaming_dedup_equals_batch_distinct(spark, tables):
    out = event_windows.run_streaming_dedup(spark, SF_DIR, query_name="t_dedup_eq")
    batch = tables["events"].select("user_id", "event_type").distinct()
    assert out.count() == batch.count()
    assert out.exceptAll(batch).count() == 0


def test_streaming_stream_join_equals_batch_theta(spark, tables):
    out = event_windows.run_streaming_stream_join(spark, SF_DIR, query_name="t_ssj_eq")
    ev = tables["events"]
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("u"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    batch = c.join(
        p,
        (F.col("u") == F.col("pu"))
        & (F.col("pts") > F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 60 MINUTES")),
    ).select("click_id", "purchase_id", F.col("u").alias("user_id"))
    assert out.count() == batch.count()
    assert out.exceptAll(batch).count() == 0
