"""Catalog + provenance: the reference's ``info.files`` registry and
SQL-replay durability model, Spark-native.

Reference behavior (SURVEY.md §1.1): every ingested table is recorded in
``info.files(table_name, creation)`` (assets.py:418-425, inserts at
413-415/166-168); every DDL/DML is replayed to a ``.sql`` file in the
``configuration`` bucket for rebuild-after-loss (assets.py:70-74, 214-218).

Here Parquet managed tables are durable by construction, so the replay log
becomes an append-only ``info.operations`` audit table — the capability
(provenance + auditability) survives, the mechanism is columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class InfoCatalog:
    """Provenance registry over managed tables (``info.files`` +
    ``info.operations``)."""

    def __init__(self, spark: SparkSession, db: str = "info"):
        self.spark = spark
        self.db = db
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {db}.files "
            "(table_name STRING, creation TIMESTAMP) USING PARQUET"
        )
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {db}.operations "
            "(op STRING, target STRING, detail STRING, ts TIMESTAMP) USING PARQUET"
        )

    def ensure_database(self, name: str) -> None:
        """D1: CREATE SCHEMA IF NOT EXISTS (assets.py:35-36)."""
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")
        self.log_operation("create_database", name)

    def database_exists(self, name: str) -> bool:
        """D4: schema-existence probe (assets.py:393-401) via native catalog."""
        return self.spark.catalog.databaseExists(name)

    def register_table(self, table_name: str) -> None:
        """D5: provenance insert (assets.py:413-415)."""
        self.spark.createDataFrame([(table_name,)], "table_name string").withColumn(
            "creation", F.current_timestamp()
        ).write.mode("append").insertInto(f"{self.db}.files")

    def log_operation(self, op: str, target: str, detail: str = "") -> None:
        """S8 replacement: append-only audit instead of .sql replay files."""
        self.spark.createDataFrame(
            [(op, target, detail)], "op string, target string, detail string"
        ).withColumn("ts", F.current_timestamp()).write.mode("append").insertInto(
            f"{self.db}.operations"
        )

    def files(self) -> DataFrame:
        return self.spark.table(f"{self.db}.files")

    def save_ingested(
        self, df: DataFrame, database: str, table: str, mode: str = "overwrite"
    ) -> str:
        """D2+D3: batch, schema-checked, injection-free-by-construction
        managed-table write (vs the reference's per-row committed string-
        spliced INSERTs, assets.py:105-115, 385-390 — the documented
        anti-pattern SURVEY.md §4 says not to reproduce)."""
        self.ensure_database(database)
        fqn = f"{database}.{table}"
        df.write.mode(mode).format("parquet").saveAsTable(fqn)
        self.register_table(fqn)
        self.log_operation("ingest", fqn, f"mode={mode}")
        return fqn
