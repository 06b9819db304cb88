"""datalake_local_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
reference data-lake stack (N1QU1/Datalake-local: MinIO landing zone + Dagster
ingestion + Postgres storage + Trino SQL; see SURVEY.md):

- ``sources``   — ingestion operators (Excel/CSV/JSON landing-zone readers,
                  reference projects/dagster/assets/assets.py).
- ``functions`` — identifier sanitization + the 4-type inference lattice
                  (reference assets.py:253-344) and scalar column helpers.
- ``operators`` — the relational operator library (joins, aggregates, windows,
                  set ops, top-k, as-of) the reference delegates to Trino.
- ``llm``       — large-scale training-data-pipeline operators (dedup,
                  similarity search, text analysis, multimodal columns).
- ``streaming`` — Structured Streaming equivalents of the reference's cron
                  micro-batch ingestion plus net-new event-window operators.
- ``catalog``   — ``info.files`` provenance (reference assets.py:418-425).

Everything is DataFrame/Catalyst-native: declarative plans, predicate
pushdown, broadcast joins for bounded dims, no driver-side row loops.
"""

__version__ = "0.1.0"
