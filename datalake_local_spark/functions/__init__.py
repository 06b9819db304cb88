"""Pure functions + column helpers: identifier sanitization, the ingestion
type-inference lattice, and scalar expression builders."""

from datalake_local_spark.functions.sanitize import (
    fix_string,
    identify_string_type,
    infer_column_types,
    sanitize_db_name,
)

__all__ = [
    "fix_string",
    "identify_string_type",
    "infer_column_types",
    "sanitize_db_name",
]
