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


RESIZED_SCHEMA = (
    "doc_id bigint, orig_w int, orig_h int, new_w int, new_h int, resized_payload binary"
)


def resize_images(documents: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Aspect-preserving resize kernel over binary payloads (mapInPandas).

    The geometry (fit-within-box scale, floor, min 1px) is the real
    contract; the pixel resample is a deterministic fake (payload bytes
    truncated/cycled to the new byte budget) because no codec exists in
    this container — a real kernel swaps ONLY the inner two lines for
    PIL/cv2 calls. Output carries the resized bytes next to the metadata;
    queries that only need dimensions must prune the binary column
    (ReadSchema-checked pattern, see payload_size_profile)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            byte_len = pdf["payload"].map(len)
            w = (byte_len % 640 + 16).astype("int64")  # same fake geometry as decode
            h = (byte_len % 480 + 16).astype("int64")
            scale = pd.concat([target_w / w, target_h / h], axis=1).min(axis=1).clip(upper=1.0)
            new_w = (w * scale).astype("int64").clip(lower=1)
            new_h = (h * scale).astype("int64").clip(lower=1)
            out_bytes = [
                bytes((p * (tw * th // max(len(p), 1) + 1))[: tw * th])
                for p, tw, th in zip(pdf["payload"], new_w, new_h)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_w": w.astype("int32"),
                    "orig_h": h.astype("int32"),
                    "new_w": new_w.astype("int32"),
                    "new_h": new_h.astype("int32"),
                    "resized_payload": out_bytes,
                }
            )

    return attach_fake_payload(documents).mapInPandas(kernel, schema=RESIZED_SCHEMA)


def sample_video_frames(documents: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling over fake 'video' payloads: one input row → up to
    ``n_frames`` output rows at evenly spaced frame indices (the
    frame_sample_plan schedule). The per-frame 'decode' is a slice hash —
    the real kernel would seek+decode those frames only, which is the
    point: sampled access, never a full decode."""
    import hashlib

    plan = frame_sample_plan(n_frames)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, fidxs, totals, hashes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                total_frames = len(payload) % 100 + 1
                for idx in plan(total_frames):
                    doc_ids.append(doc_id)
                    fidxs.append(idx)
                    totals.append(total_frames)
                    hashes.append(hashlib.md5(payload[idx : idx + 16]).hexdigest())
            yield pd.DataFrame(
                {"doc_id": doc_ids, "frame_idx": fidxs,
                 "total_frames": totals, "frame_hash": hashes}
            )

    return attach_fake_payload(documents).mapInPandas(
        kernel, schema="doc_id bigint, frame_idx int, total_frames int, frame_hash string"
    )
