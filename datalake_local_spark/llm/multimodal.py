"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The container has no image/audio codecs, so the decode kernel is a
deterministic fake (clearly marked); everything around it — schema,
Arrow-batched mapInPandas signature, partitioning, metadata extraction — is
the real 100 TB design:

- payloads live in a ``binary`` column next to typed metadata, one row per
  asset (at scale: parquet with a large row-group size, payload column
  pruned unless projected);
- decode/feature-extract runs in ``mapInPandas`` so bytes stream through
  Arrow record batches (no per-row pickling, no driver involvement);
- derived metadata (dims, duration, hashes) is computed once and stored
  columnar so later filters never touch the payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, byte_len int, width int, height int, channels int, format string"
)


def attach_fake_payload(documents: DataFrame) -> DataFrame:
    """Manufacture a deterministic binary payload per document (UTF-8 bytes
    of the text — stands in for image bytes). Real pipelines read payloads
    with ``spark.read.format('binaryFile')`` or from parquet binary cols."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("fake/img").alias("mime"),
    )


def _fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """FAKE DECODE KERNEL — deterministic stand-in for an image decoder.

    A real implementation would `PIL.Image.open(io.BytesIO(b))`; PIL is not
    in this container. Width/height/channels are pure functions of the byte
    length so results are reproducible and oracle-checkable.
    """
    for pdf in batches:
        byte_len = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": byte_len.astype("int32"),
                "width": (byte_len % 640 + 16).astype("int32"),
                "height": (byte_len % 480 + 16).astype("int32"),
                "channels": (byte_len % 3 + 1).astype("int32"),
                "format": "fakeimg",
            }
        )


def decode_image_metadata(documents: DataFrame) -> DataFrame:
    """Decode payloads to typed metadata via Arrow-batched mapInPandas.
    This is the full multimodal plumbing path: binary column → vectorized
    Python kernel → typed columnar output."""
    with_payload = attach_fake_payload(documents)
    return with_payload.mapInPandas(_fake_decode_batch, schema=DECODED_SCHEMA)


def decode_image_real(documents: DataFrame) -> DataFrame:
    """Real decoder entry point — requires an image codec library.

    Kept as the documented integration point; raises until PIL/cv2 exist in
    the runtime.
    """
    raise NotImplementedError(
        "No image codec library in this container; use decode_image_metadata "
        "(deterministic fake kernel) for plumbing tests."
    )


def frame_sample_plan(n_frames: int = 4):
    """Frame-sampling schedule for video payloads: deterministic evenly
    spaced frame indices given a frame count — the pure-planning half of a
    video sampler (decode half stubbed like images)."""

    def indices(total_frames: int) -> list[int]:
        if total_frames <= 0:
            return []
        step = max(total_frames // n_frames, 1)
        return list(range(0, total_frames, step))[:n_frames]

    return indices


def payload_size_profile(documents: DataFrame) -> DataFrame:
    """Metadata-only profiling: byte-length stats per source WITHOUT
    decoding — the query shape that must prune the payload column at scan
    time (verify via ReadSchema in explain)."""
    with_payload = attach_fake_payload(documents).select(
        "doc_id", F.octet_length("payload").alias("byte_len")
    )
    meta = documents.select("doc_id", "source")
    return (
        meta.join(with_payload, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("byte_len").alias("total_bytes"),
            F.round(F.avg("byte_len"), 4).alias("avg_bytes"),
            F.max("byte_len").alias("max_bytes"),
        )
    )
