"""Ingestion sources: the reference's landing-zone readers re-done
Spark-first (SURVEY.md §2.1 S1-S12, §3.1-3.2).

Bucket → database, file(+sheet) → table, with the 4-type inference lattice
and identifier sanitization from functions.sanitize.
"""
