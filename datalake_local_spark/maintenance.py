"""Table-maintenance operators — the OPTIMIZE / CLUSTER BY / partition
refresh surface of a lakehouse (BASELINE.json north star: "DataFrame
read/write + Delta/Iceberg table ops", emulated on plain parquet the way
formats.SnapshotTable emulates snapshots).

Scale rationale:
- small-file compaction: streaming/cron ingest (the reference writes one
  object per tick, assets.py:70-74) accumulates files whose per-file open
  cost dominates scans; compaction rewrites to ~target-sized files.
- clustered write: repartitionByRange + sortWithinPartitions gives every
  parquet file a narrow min/max envelope on the cluster columns, so
  predicate scans skip whole files/row-groups (the poor man's Z-order —
  single-dimension-dominant, which covers time-series and key-range
  queries; true multi-dim interleaving slots into the same write path).
- dynamic partition overwrite: incremental refresh of a derived table
  touches ONLY the partitions present in the update — the 100 TB
  alternative to full-table rewrites for late-arriving data.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def data_file_stats(path: str) -> list[dict]:
    """Per-file (path, bytes) for a parquet directory — driver-side
    metadata listing only (no data read)."""
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out.append({"path": p, "bytes": os.path.getsize(p)})
    return out


def compact_small_files(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> dict:
    """OPTIMIZE-style compaction: rewrite a parquet directory into
    ~target-sized files. Returns {files_before, files_after, bytes}.

    The rewrite is a plain scan → repartition(ceil(bytes/target)) →
    overwrite; at scale, run per partition-directory so only small-file
    partitions rewrite (and take a snapshot first — formats.SnapshotTable
    — for rollback)."""
    before = data_file_stats(path)
    total = sum(f["bytes"] for f in before)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    # write to a sibling tmp dir then swap: the source of a self-overwrite
    # cannot be read lazily while being truncated
    tmp = path.rstrip("/") + "__compact_tmp"
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    import shutil

    # swap via rename-aside so every failure point leaves a recoverable
    # directory: old data survives (as __old) until the new one is live
    old_aside = path.rstrip("/") + "__old"
    shutil.rmtree(old_aside, ignore_errors=True)
    os.rename(path, old_aside)
    os.rename(tmp, path)
    shutil.rmtree(old_aside)
    after = data_file_stats(path)
    return {"files_before": len(before), "files_after": len(after), "bytes": total}


def write_clustered(
    df: DataFrame, path: str, cluster_cols: list[str], n_files: int = 8
) -> None:
    """CLUSTER BY emulation: range-partition on the cluster columns and
    sort within each output file, so parquet min/max statistics on those
    columns are tight per file → scans with predicates on them skip
    non-matching files entirely."""
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def clustered_file_ranges(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) of ``column`` from parquet footer statistics —
    the evidence data skipping acts on. Footer-only read via pyarrow."""
    import pyarrow.parquet as pq

    ranges = []
    for f in data_file_stats(path):
        md = pq.ParquetFile(f["path"]).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            ranges.append((lo, hi))
    return ranges


def overwrite_changed_partitions(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    partition_col: str,
) -> int:
    """Incremental refresh: INSERT OVERWRITE only the partitions present
    in ``updates`` (dynamic partitionOverwriteMode) — untouched partitions
    keep their files. Returns the number of partitions replaced.

    insertInto is POSITIONAL (partition column last in the table schema),
    so ``updates`` is realigned to the target's column order by name
    first — a caller whose column order differs would otherwise silently
    write values into the wrong columns."""
    n_parts = updates.select(partition_col).distinct().count()
    aligned = updates.select(*spark.table(table).columns)
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        aligned.write.mode("overwrite").insertInto(table)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    return n_parts


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """ANALYZE-style column profile: one output row per column with null
    fraction, distinct count, min/max (stringified). The stats a catalog
    keeps for optimizer costing and a data-quality gate checks on ingest.

    One pass, one job: every column's aggregates are computed in a single
    wide aggregation (partial/map-side combined), then unpivoted with
    stack() — never one scan per column (the naive ANALYZE trap at
    100 TB). exact countDistinct is used here because the profile is
    per-ingest-batch; swap approx_count_distinct for full-history
    profiles."""
    cols = columns or df.columns
    total = F.count(F.lit(1))
    aggs = []
    for c in cols:
        aggs.extend(
            [
                F.round(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)) / total, 6).alias(f"{c}__nullfrac"),
                F.countDistinct(F.col(c)).alias(f"{c}__ndv"),
                F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            ]
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__nullfrac`, `{c}__ndv`, `{c}__min`, `{c}__max`" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args})"
        ).alias("column", "null_frac", "n_distinct", "min_value", "max_value")
    )


def _cluster_bounds(df: DataFrame, col_x: str, col_y: str):
    """One metadata-grade min/max aggregate shared by the clustering
    writers, with an explicit guard: an empty (or all-NULL) input
    yields NULL bounds, which previously surfaced as a TypeError deep
    inside the bucketizer arithmetic (r18 advice). Raise a clear error
    at the seam instead."""
    lo_hi = df.agg(
        F.min(col_x).alias("xlo"), F.max(col_x).alias("xhi"),
        F.min(col_y).alias("ylo"), F.max(col_y).alias("yhi"),
    ).collect()[0]
    if any(lo_hi[k] is None for k in ("xlo", "xhi", "ylo", "yhi")):
        raise ValueError(
            "cannot cluster an empty (or all-NULL) input: min/max bounds "
            f"of ({col_x!r}, {col_y!r}) are undefined"
        )
    return lo_hi


def _morton_code(x_col, y_col, bits: int = 8):
    """Bit-interleaved (Morton / Z-order) code of two bucketized columns —
    pure shift/mask expressions, whole-stage-codegen friendly."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftrightunsigned(x_col.cast("long"), i).bitwiseAND(F.lit(1))
        ybit = F.shiftrightunsigned(y_col.cast("long"), i).bitwiseAND(F.lit(1))
        code = code.bitwiseOR(F.shiftleft(xbit, 2 * i)).bitwiseOR(
            F.shiftleft(ybit, 2 * i + 1)
        )
    return code


def write_zordered(
    df: DataFrame, path: str, col_x: str, col_y: str, n_files: int = 16, bits: int = 8
) -> None:
    """Z-order clustering on TWO dimensions: bucketize each column to
    2^bits buckets (min/max from one metadata-grade aggregate — the same
    stats a catalog already keeps), interleave the bucket bits into a
    Morton code, then range-partition + sort on it. Every output file
    covers a small SQUARE of (x, y) space, so predicates on EITHER column
    skip most files — single-column clustering gets tight x-envelopes but
    every file spans all of y."""
    lo_hi = _cluster_bounds(df, col_x, col_y)
    span = (1 << bits) - 1
    bx = F.least(
        F.lit(span),
        ((F.col(col_x) - lo_hi["xlo"]) * span / max(lo_hi["xhi"] - lo_hi["xlo"], 1)).cast("long"),
    )
    by = F.least(
        F.lit(span),
        ((F.col(col_y) - lo_hi["ylo"]) * span / max(lo_hi["yhi"] - lo_hi["ylo"], 1)).cast("long"),
    )
    (
        df.withColumn("__z", _morton_code(bx, by, bits))
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_hilbert_clustered(
    df: DataFrame, path: str, col_x: str, col_y: str, n_files: int = 16, bits: int = 8
) -> None:
    """Hilbert-curve clustering on TWO dimensions — the write-side
    companion of :func:`write_zordered` and the physical half of the
    r18 curve A/B (``layout.hilbert_skipping_report`` measures the
    read-side skip rates). Same metadata-grade bounds aggregate and
    bucketization; the cluster key is the Hilbert index computed by the
    shared :func:`..functions.hilbert.hilbert_chain` projections
    (simultaneous per-level (x, y, d) updates via ``withColumns``),
    then range-partition + sort on it. Hilbert's unit-step adjacency
    keeps every file's (x, y) envelope at least as tight as Morton's —
    no curve jumps across the square."""
    from datalake_local_spark.functions.hilbert import hilbert_chain

    lo_hi = _cluster_bounds(df, col_x, col_y)
    span = (1 << bits) - 1
    bx = F.least(
        F.lit(span),
        ((F.col(col_x) - lo_hi["xlo"]) * span / max(lo_hi["xhi"] - lo_hi["xlo"], 1)).cast("long"),
    )
    by = F.least(
        F.lit(span),
        ((F.col(col_y) - lo_hi["ylo"]) * span / max(lo_hi["yhi"] - lo_hi["ylo"], 1)).cast("long"),
    )
    cur = (
        df.withColumn("__hx", bx)
        .withColumn("__hy", by)
        .withColumn("__hd", F.lit(0).cast("long"))
    )
    for d_sql, x_sql, y_sql in hilbert_chain(bits=bits, x="__hx", y="__hy", d="__hd"):
        cur = cur.withColumns(
            {
                "__hd": F.expr(d_sql).cast("long"),
                "__hx": F.expr(x_sql).cast("long"),
                "__hy": F.expr(y_sql).cast("long"),
            }
        )
    (
        cur.repartitionByRange(n_files, F.col("__hd"))
        .sortWithinPartitions("__hd")
        .drop("__hx", "__hy", "__hd")
        .write.mode("overwrite")
        .parquet(path)
    )


def publish_with_audit(
    df: DataFrame,
    publish_dir: str,
    expected_rows: int | None = None,
    key_col: str | None = None,
    expected_checksum: int | None = None,
    vacuum_keep: int | None = None,
    vacuum_grace_seconds: float = 300.0,
) -> dict:
    """Write-Audit-Publish (the WAP pattern Iceberg formalizes with
    branches; Netflix's original data-eng discipline — public): write to
    a UNIQUE staging directory, AUDIT by re-reading the STAGED files
    (row count, optional ``expected_rows``, optional
    ``expected_checksum`` — an order-independent
    ``bit_xor(xxhash64(key_col))`` the caller computed upstream), then
    PUBLISH atomically: data lives in an immutable ``<dir>.v<N>``
    version directory and ``publish_dir`` is a SYMLINK flipped with an
    atomic rename — readers resolving it see the old version or the new
    one, never a missing or half-written path. The audit reads only the
    staged files (the source plan is never re-executed: a
    nondeterministic source — LIMIT without ORDER BY, sampling — still
    publishes the one materialization that was staged). A failed audit
    keeps ITS OWN staging dir for forensics (unique suffix — retries
    and concurrent publishes cannot destroy it) and the published
    symlink untouched; concurrent publishers are last-flip-wins, each
    flip atomic.

    PREVIOUS versions are RETAINED after the flip: an in-flight reader
    that resolved the symlink just before the flip keeps a valid path,
    and concurrent publishers cannot double-delete or orphan each
    other's version dirs (each version dir name is unique; the loser of
    a flip race simply holds a non-current retained version). NOTE the
    retention contract: every publish retains one full version dir, so
    callers that never vacuum accumulate one per publish, unbounded —
    pass ``vacuum_keep=N`` to auto-vacuum right after the flip (keeps
    the current version plus the N most recent non-current ones; their
    names land in the manifest under ``vacuum_deleted``), or call
    :func:`vacuum_published` on your own cadence. Vacuum reads the
    symlink target once at listing time, before any delete, and never
    touches the current version.

    Returns the manifest dict (also written as ``_MANIFEST.json``
    inside the version dir BEFORE the flip, so a published version is
    always manifest-complete)."""
    import json
    import os
    import time as _time
    import uuid

    base = publish_dir.rstrip("/")
    staging = f"{base}.staging-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)

    spark = df.sparkSession
    staged = spark.read.parquet(staging)
    n = staged.count()
    if expected_rows is not None and n != expected_rows:
        raise ValueError(
            f"WAP audit failed: staged {n} rows, expected {expected_rows}; "
            f"staging kept at {staging}, nothing published"
        )
    checksum = None
    if key_col is not None:
        checksum = staged.agg(
            F.bit_xor(F.xxhash64(F.col(key_col))).alias("c")
        ).collect()[0]["c"]
        if expected_checksum is not None and checksum != expected_checksum:
            raise ValueError(
                f"WAP audit failed: staged checksum {checksum} != expected "
                f"{expected_checksum}; staging kept at {staging}, nothing published"
            )
    # unique version dir: millisecond stamp + random suffix, so two
    # publishers landing in the same millisecond cannot collide
    version = int(_time.time() * 1000)
    vdir = f"{base}.v{version}-{uuid.uuid4().hex[:8]}"
    manifest = {
        "version": version,
        "n_rows": n,
        "checksum_key": key_col,
        "checksum": checksum,
        "n_files": len([f for f in os.listdir(staging) if f.endswith(".parquet")]),
        "published_unix": int(_time.time()),
    }
    with open(os.path.join(staging, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f)
    os.rename(staging, vdir)  # version dir is complete before the flip
    if os.path.exists(base) and not os.path.islink(base):
        # migrate a legacy plain directory into the versioned layout
        os.rename(base, f"{base}.v0-legacy")
    tmp_link = f"{base}.link-{uuid.uuid4().hex[:8]}"
    os.symlink(os.path.basename(vdir), tmp_link)
    os.rename(tmp_link, base)  # atomic symlink replace: readers never miss
    # previous versions are deliberately retained (see docstring) —
    # removal is vacuum_published's job, opted into via vacuum_keep
    if vacuum_keep is not None:
        manifest["vacuum_deleted"] = vacuum_published(
            publish_dir, keep=vacuum_keep, grace_seconds=vacuum_grace_seconds
        )["deleted"]
        # rewrite the persisted copy atomically so the on-disk manifest
        # carries the vacuum outcome too (it was previously written
        # before this field existed and never updated)
        mpath = os.path.join(vdir, "_MANIFEST.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
    return manifest


def list_published_versions(publish_dir: str) -> list[dict]:
    """All retained version dirs for a WAP-published path, oldest first,
    with the currently-linked one flagged. Driver-side metadata only."""
    import os

    base = publish_dir.rstrip("/")
    parent = os.path.dirname(base) or "."
    stem = os.path.basename(base) + ".v"
    current = os.readlink(base) if os.path.islink(base) else None
    out = []
    for name in sorted(os.listdir(parent)):
        if name.startswith(stem) and os.path.isdir(os.path.join(parent, name)):
            out.append({
                "name": name,
                "path": os.path.join(parent, name),
                "current": name == current,
            })
    return out


def vacuum_published(
    publish_dir: str, keep: int = 1, grace_seconds: float = 300.0
) -> dict:
    """Explicit retention step for :func:`publish_with_audit`: delete
    old version dirs, keeping the CURRENT one plus the ``keep`` most
    recent non-current versions (grace window for in-flight readers —
    the Iceberg `expire_snapshots` contract on plain directories).

    The symlink target is read ONCE at listing time (inside
    :func:`list_published_versions`), before any delete, so a version
    published after the caller's last look is never deleted, and the
    current version is never touched regardless of ``keep``.

    ``grace_seconds`` additionally protects any version dir whose mtime
    is within the window (the `expire_snapshots` ``older_than``
    contract): a CONCURRENT publisher that has renamed its staging into
    a version dir but not yet flipped the symlink looks like a
    non-current version — without the age gate a keep=0 vacuum racing
    that flip would delete the dir out from under the flip and leave
    the published symlink dangling. Pass 0 only when no concurrent
    publisher can exist (tests, single-writer maintenance)."""
    import os
    import shutil
    import time as _time

    versions = list_published_versions(publish_dir)
    non_current = [v for v in versions if not v["current"]]
    doomed = non_current[: max(0, len(non_current) - keep)] if keep >= 0 else []
    cutoff = _time.time() - max(0.0, grace_seconds)
    aged = []
    for v in doomed:
        try:
            if os.path.getmtime(v["path"]) <= cutoff:
                aged.append(v)
        except OSError:
            pass  # vanished under a concurrent vacuum — nothing to do
    for v in aged:
        shutil.rmtree(v["path"], ignore_errors=True)
    return {
        "deleted": [v["name"] for v in aged],
        "retained": [v["name"] for v in versions if v not in aged],
    }


def compaction_plan(manifest: DataFrame) -> DataFrame:
    """OPTIMIZE *planner*: given a file manifest (``part``, ``file_id``,
    ``size_bytes``), assign files to compaction groups by first-fit-
    decreasing bin packing (Johnson 1973 — the classic 11/9·OPT+1
    heuristic) with a per-partition capacity of 2× the largest file —
    the plan a compaction executor (:func:`compact_small_files`
    rewrites; Delta's OPTIMIZE does the same server-side) would hand
    to its rewrite tasks. Emitting the PLAN as a relation makes the
    decision auditable and testable separately from the rewrite I/O —
    the same split the reference's maintenance story implies between
    deciding and doing.

    Sequential-greedy per partition → the applyInPandas discipline
    (one partition's manifest is bounded — thousands of files, never
    data-sized), and ALL-INTEGER state: sort (size DESC, file_id ASC),
    place each file in the first bin with enough remaining capacity,
    open a new bin otherwise. No floats anywhere, so the DuckDB
    list-state recursive CTE replays the plan file-for-file with no
    rounding discipline needed at all.

    Scale shape: the manifest is file-grain metadata (100 TB of 128 MB
    files ≈ 800k rows — KB-scale per partition after the groupBy);
    planning shuffles metadata only, never data bytes."""
    import pandas as pd

    def kernel(key, pdf):
        pdf = pdf.sort_values(
            ["size_bytes", "file_id"], ascending=[False, True]
        ).reset_index(drop=True)
        cap = int(pdf["size_bytes"].max()) * 2
        bins: list = []  # remaining capacity per open bin
        rows = []
        for _, r in pdf.iterrows():
            size = int(r["size_bytes"])
            placed = None
            for i, rem in enumerate(bins):
                if rem >= size:
                    placed = i
                    break
            if placed is None:
                bins.append(cap - size)
                placed = len(bins) - 1
            else:
                bins[placed] = bins[placed] - size
            rows.append((key[0], int(r["file_id"]), size, placed + 1))
        return pd.DataFrame(
            rows, columns=["part", "file_id", "size_bytes", "bin_id"]
        )

    return manifest.groupBy("part").applyInPandas(
        kernel, "part string, file_id long, size_bytes long, bin_id long"
    )


def document_file_manifest(documents: DataFrame, buckets: int = 16) -> DataFrame:
    """Deterministic harness manifest for :func:`compaction_plan`: the
    documents corpus bucketed into per-source pseudo-files
    (doc_id % buckets), sized by exact UTF-8 byte length — the same
    relation an ingest's info.files table would carry, derived from
    data both engines can see so the planner is oracle-checkable
    end-to-end."""
    return (
        documents.groupBy(
            F.col("source").alias("part"),
            (F.col("doc_id") % buckets).alias("file_id"),
        )
        .agg(F.sum(F.octet_length("text")).alias("size_bytes"))
    )
