"""Training-data-pipeline operators designed for 100 TB scale:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
embedding similarity search, text analysis, multimodal column plumbing.

None of these exist in the reference (its analytical surface stops at the
Cube OHLCV schema); they are the BASELINE.json north-star capabilities
(SURVEY.md §2.9) built natively on DataFrame ops.
"""
