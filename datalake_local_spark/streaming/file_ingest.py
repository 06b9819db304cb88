"""Streaming file ingestion — the Spark-native replacement for the
reference's cron micro-batch (every 30 min, assets/__init__.py:51-57) with
delete-after-read at-most-once consumption (assets.py:66) and
archive-to-configuration (assets.py:289-291).

Structured Streaming file source gives exactly-once (checkpointed file
tracking), and ``cleanSource`` archive/delete reproduces the reference's
post-ingest file handling without its at-most-once data-loss window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def stream_csv_ingest(
    spark: SparkSession,
    landing_dir: str,
    target_table: str,
    schema: T.StructType,
    checkpoint_dir: str,
    archive_dir: str | None = None,
    header: bool = True,
) -> StreamingQuery:
    """Continuously ingest CSV files landing in ``landing_dir`` into a
    managed table. ``availableNow`` trigger = catch-up-and-stop, the exact
    semantics of the reference's 30-min cron without losing files between
    runs. Archive mirrors the reference's configuration-bucket copy."""
    reader = (
        spark.readStream.schema(schema)
        .option("header", str(header).lower())
        .option("pathGlobFilter", "*.csv")
    )
    if archive_dir is not None:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    stream = reader.csv(landing_dir)

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        if "." in target_table:
            db = target_table.split(".", 1)[0]
            spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        df.write.mode("append").format("parquet").saveAsTable(target_table)
        # invalidate the cached file index so concurrent readers in the
        # main session see the appended files immediately
        spark.catalog.refreshTable(target_table)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
