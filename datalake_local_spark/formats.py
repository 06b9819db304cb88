"""Table-format abstraction: Delta/Iceberg when their jars are present,
plain Parquet managed tables otherwise — with snapshot versioning and
time-travel emulated on the Parquet path so the *capabilities* (versioned
writes, read-as-of, rollback) exist in every runtime.

The north star names "DataFrame read/write + Delta/Iceberg table ops" as
the approach; this runtime ships no format jars, so:

- ``preferred_format()`` probes availability (import-try, never a hard dep);
- ``SnapshotTable`` keeps every write as ``<table>__v<n>`` plus a
  ``<table>__snapshots`` manifest (version, ts, op, rowcount) — exactly the
  metadata a format's transaction log records — and exposes
  ``read(version=...)``, ``latest()``, ``rollback(version)``;
- on Delta/Iceberg the same API maps to native ``VERSION AS OF`` /
  snapshot-id reads (left as the documented upgrade path).

Scale notes: version manifests are rows, not files-on-driver; old versions
are whole immutable tables (storage-heavy but simple — a real format dedups
at file level, which is why the upgrade path exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delta_available() -> bool:
    try:  # pragma: no cover - environment probe
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def iceberg_available(spark: SparkSession) -> bool:
    try:  # pragma: no cover - environment probe
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


def preferred_format(spark: SparkSession) -> str:
    if delta_available():
        return "delta"
    if iceberg_available(spark):
        return "iceberg"
    return "parquet"


class SnapshotTable:
    """Versioned managed table with time travel, format-agnostic."""

    def __init__(self, spark: SparkSession, database: str, name: str):
        self.spark = spark
        self.db = database
        self.name = name
        self.fmt = preferred_format(spark)
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
        self._manifest = f"{database}.{name}__snapshots"
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._manifest} "
            "(version INT, op STRING, n_rows LONG, ts TIMESTAMP) USING PARQUET"
        )

    def _versions(self) -> list[int]:
        return [
            r["version"]
            for r in self.spark.table(self._manifest).select("version").distinct().collect()
        ]

    def latest_version(self) -> int | None:
        vs = self._versions()
        return max(vs) if vs else None

    def write(self, df: DataFrame, op: str = "overwrite") -> int:
        """Append a new immutable version; returns its number."""
        version = (self.latest_version() or 0) + 1
        fqn = f"{self.db}.{self.name}__v{version}"
        df.write.mode("overwrite").format("parquet").saveAsTable(fqn)
        n = self.spark.table(fqn).count()
        self.spark.createDataFrame(
            [(version, op, n)], "version int, op string, n_rows long"
        ).withColumn("ts", F.current_timestamp()).write.mode("append").insertInto(
            self._manifest
        )
        return version

    def read(self, version: int | None = None) -> DataFrame:
        """Time travel: read a specific version (default latest). Fails
        fast with a clear error for unknown or vacuumed versions (so
        rollback() inherits the same contract) instead of Spark's raw
        TABLE_OR_VIEW_NOT_FOUND."""
        version = version if version is not None else self.latest_version()
        if version is None:
            raise ValueError(f"{self.db}.{self.name} has no snapshots")
        if version not in self._versions():
            raise ValueError(
                f"version {version} of {self.db}.{self.name} was never "
                f"written; history has {sorted(self._versions())}"
            )
        if not self.spark.catalog.tableExists(f"{self.db}.{self.name}__v{version}"):
            raise ValueError(
                f"version {version} of {self.db}.{self.name} was vacuumed; "
                f"available: {sorted(self._versions_available())}"
            )
        return self.spark.table(f"{self.db}.{self.name}__v{version}")

    def rollback(self, version: int) -> int:
        """Restore an old version as the new latest (non-destructive —
        records a new snapshot pointing at the old data)."""
        return self.write(self.read(version), op=f"rollback_to_{version}")

    def vacuum(self, retain_last: int = 2) -> DataFrame:
        """Retention maintenance (Delta's VACUUM / Iceberg's
        expire_snapshots, format-agnostic): drop every version table
        older than the newest ``retain_last``, keep every manifest row
        as audit history, and return the audit of what happened. Time
        travel to a vacuumed version fails fast via ``read_checked``;
        retained versions stay readable. The manifest is never
        truncated — lineage survives the data, exactly as lakehouse
        formats keep metadata for expired snapshots.

        At 100 TB this is the job that caps storage growth of an
        append-only versioned table: one DROP per expired version
        (metadata + file deletion), no data rewrite."""
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        versions = sorted(self._versions())
        keep = set(versions[-retain_last:])
        audit = []
        for v in versions:
            if v in keep:
                audit.append((v, "retained"))
                continue
            self.spark.sql(f"DROP TABLE IF EXISTS {self.db}.{self.name}__v{v}")
            audit.append((v, "vacuumed"))
        return self.spark.createDataFrame(audit, "version int, status string")

    def _versions_available(self) -> list[int]:
        """Versions whose data tables still exist (survive vacuum)."""
        return [
            v
            for v in self._versions()
            if self.spark.catalog.tableExists(f"{self.db}.{self.name}__v{v}")
        ]

    def read_checked(self, version: int | None = None) -> DataFrame:
        """Alias kept for the vacuum-era call sites; ``read`` itself now
        carries the fail-fast contract."""
        return self.read(version)

    def history(self) -> DataFrame:
        return self.spark.table(self._manifest).orderBy("version")


def _format_cache_dir(df, tag: str) -> tuple[str, bool]:
    """(path, stable): write-once scratch location keyed on the source
    dataset's file signatures (the ivf_partitioned_probe discipline) —
    same inputs → same directory → the converted copy is built once per
    corpus; ``stable`` is False for in-memory frames with no file
    identity (callers then rebuild unconditionally)."""
    import hashlib
    import os
    import tempfile

    from datalake_local_spark.llm.dedup import source_signature

    src = source_signature(df)
    key = hashlib.md5(repr((tag, src)).encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_{tag}_{key}"), bool(src)


def orc_scan_parity(orders: DataFrame) -> DataFrame:
    """ORC read path: the orders table converted once to ORC (Spark's
    second bundled columnar format — the reference's Trino stack reads
    both), then aggregated FROM THE ORC FILES. Certified by the same
    ANSI oracle as the parquet-side aggregate, so a hash-green row
    proves the ORC reader returns byte-identical data: format parity,
    not just "it didn't crash". ORC also pushes predicates and prunes
    columns (PushedFilters appears in the scan node like parquet's);
    the write is once-per-source (signature-keyed scratch dir)."""
    path, stable = _format_cache_dir(orders, "orc")
    import os

    spark = orders.sparkSession
    if not stable or not os.path.exists(os.path.join(path, "_SUCCESS")):
        orders.write.mode("overwrite").orc(path)
    o = spark.read.orc(path)
    return (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def schema_evolution_scan(orders: DataFrame) -> DataFrame:
    """Schema evolution on a parquet dataset: version-1 files carry
    (o_orderkey, o_custkey, o_totalprice); version-2 files add
    o_orderpriority. ``mergeSchema`` unifies the dataset — v1 rows read
    the new column as NULL, exactly the add-column contract a lakehouse
    format formalizes (Delta/Iceberg do this in metadata; plain parquet
    pays a footer merge at read).

    The split is deterministic (o_orderkey % 2), the dataset is written
    once per source (signature-keyed dir), and the aggregate — row
    counts and priority-null accounting per version — is certified by
    an ANSI oracle computing the same thing straight from orders."""
    path, stable = _format_cache_dir(orders, "schevo")
    import os

    spark = orders.sparkSession
    if not stable or not os.path.exists(os.path.join(path, "v2", "_SUCCESS")):
        v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
        )
        v1.write.mode("overwrite").parquet(os.path.join(path, "v1"))
        v2.write.mode("overwrite").parquet(os.path.join(path, "v2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "v1"), os.path.join(path, "v2")
    )
    return (
        merged.withColumn(
            "schema_version",
            F.when(F.col("o_orderkey") % 2 == 0, 1).otherwise(2),
        )
        .groupBy("schema_version")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("null_priority_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )



def json_scan_parity(orders: DataFrame) -> DataFrame:
    """JSON-lines read path (S6, the reference's README-declared JSON
    assets): orders converted once to JSONL (signature-keyed scratch
    dir, the orc_scan_parity discipline), then aggregated FROM THE
    JSON FILES with an explicit schema (schema-on-read: dates written
    as ISO strings parse back to DATE; doubles round-trip exactly via
    shortest-repr). Certified by the same ANSI oracle as the
    parquet-side aggregate, so a hash-green row proves the JSON reader
    reconstructs byte-identical values — format parity for the
    semi-structured path, alongside ORC's columnar parity.

    Scale shape: JSONL is the interchange format, not the analytics
    layout — no pushdown beyond partition pruning, whole-row parse per
    record; this query exists to CERTIFY the reader, and the write is
    once-per-source."""
    import os

    path, stable = _format_cache_dir(orders, "jsonl")
    spark = orders.sparkSession
    cols = orders.select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
    )
    if not stable or not os.path.exists(os.path.join(path, "_SUCCESS")):
        cols.write.mode("overwrite").json(path)
    j = spark.read.schema(
        "o_orderkey long, o_orderstatus string, o_orderpriority string, "
        "o_totalprice double, o_orderdate date"
    ).json(path)
    return (
        j.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


#: Cache-dir tag for the CSV-dialect scratch files.  The tag carries a
#: derivation VERSION: unlike the orc/json caches this directory bakes a
#: code-derived column into the files, so any edit to
#: ``_dialect_stressed`` must bump the suffix (together with the oracle)
#: to miss the old cache.  Tests derive the directory through this
#: constant so a bump can never silently point them at a stale dir.
_CSV_DIALECT_TAG = "csvdial1"


def _dialect_stressed(text_col):
    """Deterministic dialect-stress derivation: wraps a text fragment in
    every character class RFC 4180 makes delimiting decisions about —
    double quotes, the comma separator, LF and CRLF line breaks, and a
    backslash (a normal byte under quote-doubling, an escape under the
    lazy dialect). Built from substr/concat only so the DuckDB oracle
    derives the IDENTICAL value straight from parquet."""
    return F.concat(
        F.lit('"'),
        F.substring(text_col, 1, 40),
        F.lit('",\n'),
        F.lit("mid\r\n"),
        F.substring(text_col, 11, 30),
        F.lit('\\"tail'),
    )


def csv_dialect_scan_parity(documents: DataFrame) -> DataFrame:
    """CSV dialect round-trip parity (the reference's CSV surface is its
    PRIMARY ingest format — assets.py:136-215 `transform_csv` parses
    sale lines out of raw CSV text): documents get a dialect-stressed string
    column (embedded quotes, commas, LF, CRLF, backslash — the four
    delimiting decisions RFC 4180 defines), written once as quoted CSV
    (quote-doubling escape, signature-keyed scratch dir), then read
    back with multiLine quoted-newline parsing and aggregated FROM THE
    CSV FILES into an md5 content fingerprint per language. The ANSI
    oracle computes the same fingerprint from the ORIGINAL parquet, so
    a hash-green row proves the writer+reader preserve every stressed
    byte — dialect parity, not just "it parsed".

    Scale shape: the parse is per-record and embarrassingly parallel;
    multiLine=true does force whole-file splits (quoted newlines defeat
    line-boundary splitting), which is the documented trade-off of the
    dialect itself — ingest pipelines that need splittable CSV must
    forbid embedded newlines, exactly what this certifier would catch.
    The write is once-per-source; the fingerprint sum is exact BIGINT
    (first 8 md5 hex digits per row, max 2^32 per row — no overflow
    below ~2^21 rows per group; shard the fingerprint beyond)."""
    import os

    path, stable = _format_cache_dir(documents, _CSV_DIALECT_TAG)
    spark = documents.sparkSession
    stressed = documents.select(
        "doc_id",
        "lang",
        _dialect_stressed(F.col("text")).alias("stressed"),
    )
    if not stable or not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            stressed.write.mode("overwrite")
            .option("header", True)
            .option("quote", '"')
            .option("escape", '"')
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
            .csv(path)
        )
    c = (
        spark.read.schema("doc_id long, lang string, stressed string")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)
        .csv(path)
    )
    return (
        c.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.conv(F.substring(F.md5("stressed"), 1, 8), 16, 10).cast("long")
            ).alias("fp_sum"),
            F.sum(F.length("stressed")).cast("long").alias("len_sum"),
        )
        .orderBy("lang")
    )
