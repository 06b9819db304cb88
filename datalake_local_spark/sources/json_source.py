"""JSON ingestion — closes the reference's doc/code gap (S6): README.md
:123-127 documents ``obtain_data_from_json`` / ``tranform_json_data``
assets that don't exist in assets.py. Implemented natively.

Two shapes:
- file ingestion: ``spark.read.json`` (schema-on-read or explicit schema —
  prefer explicit at scale so a bad file can't silently widen types);
- embedded JSON columns (``events.props``): ``from_json`` /
  ``get_json_object`` projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_local_spark.catalog import InfoCatalog


def ingest_json(
    spark: SparkSession,
    path: str,
    database: str,
    table: str,
    schema: T.StructType | None = None,
    multiline: bool = False,
    catalog: InfoCatalog | None = None,
) -> DataFrame:
    """Read JSON (one object per line by default) and persist as a managed
    table with provenance."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.option("multiLine", str(multiline).lower()).json(path)
    (catalog or InfoCatalog(spark)).save_ingested(df, database, table)
    return df


def parse_props_column(
    events: DataFrame, schema: str = "k BIGINT", column: str = "props"
) -> DataFrame:
    """Typed extraction of an embedded JSON column via from_json."""
    return events.withColumn("props_struct", F.from_json(F.col(column), schema))
